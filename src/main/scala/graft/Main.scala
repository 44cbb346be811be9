package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lda.LdaPipeline

/** CLI with the reference's exact surface (SURVEY §7.1):
  *   graft.Main <DataDir> <Vocab_size> <Number_of_Topics>
  * mirroring `LDATopicModelingWithGibbs.py <DataFile> <Vocab_size>
  * <Number_of_Topics>` (/root/reference/src/LDATopicModelingWithGibbs.py:10-22)
  * including its argument validation (P6), top-10 corpus-word preview (T2,
  * py:57) and per-topic top-20 word report (M5, py:199-203). <DataDir> is a
  * fixture directory containing documents.parquet.
  */
object Main {
  def main(args: Array[String]): Unit = {
    // P6: the reference's argc + int-parse validation, same messages' intent
    if (args.length != 3) {
      System.err.println(
        "Usage: graft.Main <DataDir> <Vocab_size:int> <Number_of_Topics:int>")
      sys.exit(1)
    }
    val dir = args(0)
    val vocabSize = args(1).toIntOption.getOrElse {
      System.err.println(s"Vocab_size must be an integer, got '${args(1)}'")
      sys.exit(1)
    }
    val numTopics = args(2).toIntOption.getOrElse {
      System.err.println(s"Number_of_Topics must be an integer, got '${args(2)}'")
      sys.exit(1)
    }
    if (vocabSize <= 0 || numTopics <= 0) {
      System.err.println("Vocab_size and Number_of_Topics must be positive")
      sys.exit(1)
    }

    val spark = SparkSession.builder()
      .appName("graft-lda")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // T2: top-10 corpus words preview (py:57)
    println("Top 10 corpus words (word, count):")
    Catalog.byName("text_vocab").run(spark, dir)
      .limit(10).collect()
      .foreach(r => println(s"  ${r.getString(0)}\t${r.getLong(1)}"))

    // M1–M5: fit + report (py:199-203 output contract)
    val report = LdaPipeline.topicReport(spark, dir,
      vocabSize = vocabSize, numTopics = numTopics, maxIter = 10)
    report.collect().foreach { r =>
      val terms = r.getSeq[String](1)
      println(s"Topic ${r.getInt(0)}: ${terms.mkString(" ")}")
    }
    spark.stop()
  }
}
