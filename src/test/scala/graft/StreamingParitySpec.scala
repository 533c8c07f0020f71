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

  test("generator source feeds streaming windowed analytics end to end") {
    // the two halves joined: the ingest engine's rate+generator stream
    // (graft.ingest) is itself a streaming analytics input — parse the
    // generated ISO event_time, window it, and account for every row
    import graft.ingest.{Ingest, IngestConfig}
    import org.apache.spark.sql.functions._
    val cfg = IngestConfig(outputPath = None, parallelism = 2,
      eventsPerSecond = 3000, timeoutMs = 3000)
    val frame = Ingest.streamingFrame(spark, cfg)
      .withColumn("ts", to_timestamp(col("event_time"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "90 days").getField("start").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = frame.writeStream.format("memory").queryName("m_genwin")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(500))
      .start()
    q.awaitTermination(8000)
    q.stop()
    val agg = spark.table("m_genwin")
    val total = agg.agg(sum("n")).collect().head.getLong(0)
    assert(total > 0, "windowed aggregate over the generated stream is empty")
    val types = agg.select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("view", "click", "purchase")) && types.nonEmpty)
  }

  test("flatMapGroupsWithState sessionization matches batch session_window") {
    import org.apache.spark.sql.functions._
    val gapMin = 30
    val got = EventStreams.runToMemory(spark,
      EventStreams.flatSessionize(spark, stream(), gapMin)
        .toDF("user_id", "s_start_us", "s_end_us", "n_events"),
      "m_flatsession", OutputMode.Append())
    // Expected: the batch session set, restricted to sessions the
    // stream can CLOSE. Two close paths, modelled exactly:
    //  - EVENT-closed: every session except a user's LAST one — the next
    //    event (> gap later, all in one AvailableNow batch) closes it
    //    immediately, watermark-independent;
    //  - TIMEOUT-closed: a user's last session flushes only if its
    //    ms-floored (end + gap) is STRICTLY below the ms watermark
    //    (Spark fires event-time timeouts on timeoutMs < watermarkMs).
    val ev = graft.core.Tables.events(spark, sf)
    val gapUs = gapMin * 60L * 1000000
    val batch = ev
      .groupBy(session_window(col("ts"), s"$gapMin minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s_start_us"),
        // session_window.end = last event + gap; the operator reports
        // the last event itself
        (unix_micros(col("session_window.end")) - gapUs).as("s_end_us"),
        col("n_events"))
    val maxTsUs = ev.agg(max(unix_micros(col("ts")))).collect().head.getLong(0)
    val watermarkMs = maxTsUs / 1000 - 3600L * 1000
    val lastOfUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("s_start_us").desc)
    val want = batch
      .withColumn("rn", row_number().over(lastOfUser))
      .filter(col("rn") > 1 ||
        // integer division: Spark's `/` on longs is double division,
        // and the engine compares ms-FLOORED timestamps
        expr(s"(s_end_us + $gapUs) div 1000") < watermarkMs)
      .drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val gotSet = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty, "fixture should close at least one session")
    assert(gotSet == want,
      s"closed-session sets differ: extra=${gotSet -- want} missing=${want -- gotSet}")
  }

  test("streaming funnel progress matches the batch funnel (q154's streaming form)") {
    import org.apache.spark.sql.functions._
    val steps = Seq("signup", "view", "click", "purchase")
    val got = EventStreams.runToMemory(spark,
      EventStreams.funnelProgress(spark, stream(), steps).toDF("user_id", "steps"),
      "m_funnel", OutputMode.Update())
    // update mode appends a row per touched user per batch — progress
    // is monotone, so the final state is the per-user max
    val streamed = got.groupBy("user_id").agg(max("steps").as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.api.Profiling.funnel(
        graft.core.Tables.events(spark, sf), "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // batch reports users reaching step i; streaming per-user progress
    // aggregates to the same counts
    (0 until steps.length).foreach { i =>
      val streamedCount = streamed.values.count(_ > i).toLong
      assert(streamedCount == batch(i),
        s"step $i: streaming $streamedCount vs batch ${batch(i)}")
    }
    assert(batch(0) > 0, "fixture should start the funnel")
  }

  test("streaming funnel carries step state across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d")
    val src = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = src.toDF().toDF("user_id", "ts", "event_type")
    val out = EventStreams.funnelProgress(spark, df, Seq("A", "B"))
      .toDF("user_id", "steps")
    val q = out.writeStream.format("memory").queryName("m_funnel_x")
      .outputMode("update").start()
    try {
      // batch 1: user 1 reaches A; user 2 sees B first (no progress)
      src.addData((1L, t(1), "A"), (2L, t(1), "B"))
      q.processAllAvailable()
      // batch 2: user 1's B (later ts) must advance using the STORED
      // t0; user 2's A starts its funnel
      src.addData((1L, t(5), "B"), (2L, t(6), "A"))
      q.processAllAvailable()
      val last = spark.table("m_funnel_x").groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("steps").as("steps"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(last == Map(1L -> 2, 2L -> 1),
        s"cross-batch state must advance user 1 to B, user 2 to A: $last")
    } finally q.stop()
  }

  test("stream-stream interval join emits exactly the batch pair set (q77)") {
    import org.apache.spark.sql.functions._
    // two independent source instances of the same directory — a
    // stream-stream join needs two streaming relations
    val got = EventStreams.runToMemory(spark,
      EventStreams.viewAttribution(stream(), stream()),
      "m_ssjoin", OutputMode.Append())
    val ev = graft.core.Tables.events(spark, sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    val want = p.join(v, Seq("user_id"))
      .filter(col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
              col("v_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gotSet = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "fixture should attribute at least one purchase")
    assert(gotSet == want,
      s"pair sets differ: extra=${(gotSet -- want).take(5)} missing=${(want -- gotSet).take(5)}")
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
