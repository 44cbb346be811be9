package graft

import graft.lda.LdaPipeline

/** Statistical invariants for the LDA slice (SURVEY §5.2.4 — golden match is
  * impossible by construction, so assert structure + invariants). */
class LdaSpec extends SparkSpec {

  test("topicReport: T rows, 20 terms each, weights positive and sorted") {
    val rows = LdaPipeline.topicReport(spark, sf0001,
      vocabSize = 200, numTopics = 3, maxIter = 5).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    rows.foreach { r =>
      val terms = r.getString(1).split(" ").toSeq
      val weights = r.getString(2).split(" ").map(_.toDouble).toSeq
      assert(terms.size == 20 && weights.size == 20)
      assert(terms.distinct.size == terms.size)
      assert(weights.forall(_ > 0))
      assert(weights == weights.sorted.reverse)
    }
  }

  test("docTopics: every doc gets a topic in [0,T) with weight in (0,1]") {
    val rows = LdaPipeline.docTopics(spark, sf0001,
      vocabSize = 200, numTopics = 3, maxIter = 3).collect()
    assert(rows.length > 400) // docs with no surviving tokens may drop
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < 3)
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0)
    }
  }

  test("preprocess drops docs with no surviving tokens and keeps doc_id") {
    import spark.implicits._
    val df = Seq((1L, "the a of"), (2L, "merge join filter")).toDF("doc_id", "text")
    val out = LdaPipeline.preprocess(df).select("doc_id").as[Long].collect()
    // doc 1 is all stopwords → vanishes (the reference's corpus shrink)
    assert(out.toSet == Set(2L))
  }
}
