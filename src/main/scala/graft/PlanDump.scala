package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan (and optionally times) for named
  * catalog queries: runMain graft.PlanDump <sfDir> <name> [name...] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Catalog.all.map(_.name)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = Catalog.byName(n).run(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"[plandump] $n rows=$c time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
