package graft

import org.apache.spark.sql.functions._
import graft.streaming.{Event, Sessionize}
import graft.sources.Tables

/** The stateful flatMapGroupsWithState sessionizer must agree with the
  * SQL gaps-and-islands formulation (events_sessions) on the fixture. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("batch stateful sessionizer matches the window-function query") {
    val events = Tables.events(spark, sf0001).as[Event]
    val stateful = Sessionize.sessionizeBatch(events)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val sql = Catalog.byName("events_sessions").run(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    assert(stateful.nonEmpty)
    assert(stateful.toSeq == sql.toSeq)
  }

  test("session durations are non-negative and bounded by event span") {
    val events = Tables.events(spark, sf0001).as[Event]
    val sessions = Sessionize.sessionizeBatch(events).collect()
    assert(sessions.nonEmpty)
    sessions.foreach { s =>
      assert(s.n_events >= 1)
      assert(s.duration_sec >= 0)
    }
  }
}
