package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.Cleaning

/** r21 optimization guard: pipeline_curate's stats aggregate was re-keyed
  * from (doc_id, clean) to doc_id + first(clean) so the partial hash agg
  * stops hashing/shuffling the full cleaned text per token row. This spec
  * pins the optimized query to the original (doc_id, clean)-keyed
  * formulation, row for row. */
class CurateAggSpec extends SparkSpec {

  test("pipeline_curate equals the (doc_id, clean)-keyed reference shape") {
    val sw = array(operators.TextOps.StopWords.map(lit): _*)
    val rawTok = Tables.documents(spark, sf0001).select(
        col("doc_id"), Cleaning.cleanText(col("text")).as("clean"))
      .select(col("doc_id"), col("clean"),
        explode(split(col("clean"), " ")).as("t"))
    val stats = rawTok.groupBy(col("doc_id"), col("clean"))
      .agg(sum(when(col("t") =!= "", 1L).otherwise(0L)).as("n_tokens"),
        sum(when(array_contains(sw, col("t")), 1L).otherwise(0L)).as("n_stop"))
      .withColumn("stop_bp",
        when(col("n_tokens") > 0,
          floor(lit(10000) * col("n_stop") / col("n_tokens"))).otherwise(0L)
          .cast("long"))
      .withColumn("doc_md5", md5(col("clean").cast("binary")))
    val w = Window.partitionBy(col("doc_md5"))
    val reference = stats
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("canonical_id") &&
        col("n_tokens") >= 20 && col("stop_bp") <= 2000)
      .select(col("doc_id"), col("n_tokens"), col("stop_bp"))
      .orderBy(col("doc_id"))
      .collect()

    val optimized = Catalog.byName("pipeline_curate")
      .run(spark, sf0001).collect()

    assert(optimized.nonEmpty)
    assert(optimized.toSeq == reference.toSeq)
  }
}
