package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.OutputMode

import graft.queries.Events
import graft.streaming.EventStreams
import org.scalatest.funsuite.AnyFunSuite

/** Batch/streaming parity: each EventStreams query drains the same
  * parquet input with Trigger.AvailableNow and must reproduce the batch
  * surface's result (SURVEY §2.2 watermark / streaming-window /
  * stateful rows). */
class StreamingParitySpec extends AnyFunSuite {
  import TestSpark._

  private def stream() = EventStreams.eventsStream(spark, sf)

  private def sortedRows(df: org.apache.spark.sql.DataFrame, cols: String*): Seq[Row] =
    df.select(cols.head, cols.tail: _*).orderBy(cols.head, cols.tail: _*).collect().toSeq

  test("tumbling window: streaming == batch (q37)") {
    val got = EventStreams.runToMemory(spark, EventStreams.tumbling(stream()),
      "m_tumbling", OutputMode.Complete())
    val want = Events.queries("q37_tumbling_window")(spark, sf)
    assert(sortedRows(got, "w_start", "event_type", "n", "total_value") ==
           sortedRows(want, "w_start", "event_type", "n", "total_value"))
  }

  test("sliding window: streaming == batch (q38)") {
    val got = EventStreams.runToMemory(spark, EventStreams.sliding(stream()),
      "m_sliding", OutputMode.Complete())
    val want = Events.queries("q38_sliding_window")(spark, sf)
    assert(sortedRows(got, "w_start", "n") == sortedRows(want, "w_start", "n"))
  }

  test("session window: streaming == batch (q39)") {
    val got = EventStreams.runToMemory(spark, EventStreams.sessionized(stream()),
      "m_session", OutputMode.Complete())
    val want = Events.queries("q39_session_window")(spark, sf)
    assert(sortedRows(got, "user_id", "s_start", "n_events", "session_value") ==
           sortedRows(want, "user_id", "s_start", "n_events", "session_value"))
  }

  test("streaming dedup keeps exactly the batch key set (q40)") {
    val got = EventStreams.runToMemory(spark, EventStreams.dedup(stream()),
      "m_dedup", OutputMode.Append())
    val want = Events.queries("q40_event_dedup")(spark, sf)
    val gotKeys = got.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val wantKeys = want.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gotKeys == wantKeys)
    // exactly one survivor per key
    assert(got.count() == gotKeys.size)
  }

  test("mapGroupsWithState user counts match batch groupBy (stateful op)") {
    val got = EventStreams.runToMemory(spark,
      EventStreams.statefulUserCounts(spark, stream()).toDF("user_id", "n"),
      "m_state", OutputMode.Update())
    // AvailableNow over a static directory = one micro-batch, so the
    // final emitted count per user is the lifetime count.
    val gotMap = got.groupBy("user_id").agg(org.apache.spark.sql.functions.max("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantMap = graft.core.Tables.events(spark, sf)
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotMap == wantMap)
  }
}
