package graft

import graft.lda.GibbsLda

/** Invariants for the distributed collapsed Gibbs sampler (SURVEY §5.2.4:
  * transcripts can't be golden-matched, invariants can). */
class GibbsSpec extends SparkSpec {

  test("count conservation: Φ totals equal the corpus token count every fit") {
    val m = GibbsLda.fit(spark, sf0001, vocabSize = 200, numTopics = 3, maxIter = 2)
    val phiTotal = m.phi.map(_.sum).sum
    val nzTotal = m.nz.sum
    val tokenTotal = m.docs.collect().map(_.words.length.toLong).sum
    assert(phiTotal == tokenTotal)
    assert(nzTotal == tokenTotal)
    assert(m.phi.forall(_.forall(_ >= 0)))
    m.docs.unpersist()
  }

  test("same seed reproduces the same topic assignment; topics in range") {
    val a = GibbsLda.fit(spark, sf0001, vocabSize = 100, numTopics = 3,
      maxIter = 2, seed = 7L)
    val b = GibbsLda.fit(spark, sf0001, vocabSize = 100, numTopics = 3,
      maxIter = 2, seed = 7L)
    val ta = a.docs.collect().sortBy(_.docId).map(_.topics.toSeq).toSeq
    val tb = b.docs.collect().sortBy(_.docId).map(_.topics.toSeq).toSeq
    assert(ta == tb)
    assert(ta.flatten.forall(t => t >= 0 && t < 3))
    a.docs.unpersist(); b.docs.unpersist()
  }

  test("topic report has T rows of top-20 vocabulary words") {
    val rows = GibbsLda.topicReport(spark, sf0001, vocabSize = 100,
      numTopics = 3, maxIter = 2).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    rows.foreach { r =>
      val terms = r.getString(1).split(" ").toSeq
      assert(terms.size == 20 && terms.distinct.size == 20)
      val w = r.getString(2).split(" ").map(_.toLong).toSeq
      assert(w == w.sorted.reverse) // counts non-increasing
    }
  }
}
