package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Structured Streaming path: the same transform must produce the same
  * result in micro-batch streaming mode as in batch mode. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, minute: Int, typ: String, v: Double) =
    Ev(id, Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), id % 3, typ, v, s"""{"k": $id}""")

  test("streaming windowed counts equal batch windowed counts") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      ev(1, 1, "click", 1.0), ev(2, 5, "click", 2.0), ev(3, 40, "view", 3.0),
      ev(4, 59, "click", 4.0), ev(5, 10, "view", 0.5))

    val mem = MemoryStream[Ev]
    mem.addData(data: _*)
    val q = EventStreams.streamingWindowedTypeCounts(mem.toDF())
      .writeStream.outputMode("complete").format("memory")
      .queryName("win_test").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_test")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventStreams.windowedTypeCounts(data.toDF())
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // one 1-hour window, two types
    assert(batch.map(_.getString(1)).toSet == Set("click", "view"))
  }

  test("file-source stream over the events fixture equals the batch result") {
    val stream = EventStreams.readEventStream(spark, sf0001)
    assert(stream.isStreaming)
    val q = EventStreams.startToMemory(
      EventStreams.streamingWindowedTypeCounts(stream), "file_win_test").start()
    q.awaitTermination() // AvailableNow terminates after draining the files
    val streamed = spark.table("file_win_test")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventStreams.windowedTypeCounts(
        graft.sources.Tables.events(spark, sf0001))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("append-mode watermark finalizes windows and drops late data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // append mode only emits windows the watermark has closed
    val agg = EventStreams.streamingWindowedTypeCounts(mem.toDF())
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("wm_test").start()
    mem.addData(ev(1, 1, "click", 1.0), ev(2, 5, "click", 1.0))
    q.processAllAvailable()
    // nothing emitted yet: the 00:00 window is still open
    assert(spark.table("wm_test").count() == 0)
    // an event 4 hours later moves the watermark past 00:00 + 2h
    mem.addData(Ev(3, java.sql.Timestamp.valueOf("2024-01-01 04:00:00"), 0L, "view", 1.0, "{}"))
    q.processAllAvailable()
    val closed = spark.table("wm_test").collect()
    assert(closed.length == 1 && closed.head.getLong(2) == 2L) // finalized window
    // a LATE event for the closed 00:00 window must be dropped
    mem.addData(ev(9, 30, "click", 1.0))
    mem.addData(Ev(10, java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), 0L, "view", 1.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val after = spark.table("wm_test").collect()
      .filter(_.getString(0) == "2024-01-01 00:00")
    assert(after.length == 1 && after.head.getLong(2) == 2L,
      "late event mutated a finalized window")
  }

  test("json extraction pulls typed k") {
    val df = EventStreams.withJsonK(Seq(ev(7, 1, "click", 1.0)).toDF())
    assert(df.select(col("k")).collect().head.getLong(0) == 7L)
  }
}
