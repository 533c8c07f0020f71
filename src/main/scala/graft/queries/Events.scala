package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.Tables._

/** Streaming-style operators run in batch form over the `events` table:
  * tumbling / sliding / session windows, event dedup, ordered-rate stats.
  * The same transformations run unchanged on `spark.readStream` inputs
  * (see graft.ingest for the live streaming engine + watermark usage);
  * batch execution here is what the DuckDB oracle can check.
  *
  * Window semantics: Spark `window(ts, W)` buckets are epoch-aligned;
  * DuckDB `time_bucket(INTERVAL W, ts)` aligns to midnight boundaries,
  * identical for divisors of a day. Session windows use Spark's
  * `session_window` (gap-based); the oracle reproduces gap semantics
  * with LAG + a running session counter — the standard SQL islands
  * construction.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  val queries: Map[String, Q] = Map(
    "q37_tumbling_window" -> ((s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "6 hours").getField("start").as("w_start"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(dec(col("value"))).cast(DoubleType).as("total_value"))
        .orderBy(col("w_start"), col("event_type"))
    }),

    "q38_sliding_window" -> ((s, d) => {
      // 12h windows sliding every 6h: each event lands in 2 buckets
      events(s, d)
        .groupBy(window(col("ts"), "12 hours", "6 hours").getField("start").as("w_start"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("w_start"))
    }),

    "q39_session_window" -> ((s, d) => {
      // gap-based sessionization: a session per user closes after 30 min idle
      events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             sum(dec(col("value"))).cast(DoubleType).as("session_value"))
        .select(col("user_id"),
                col("session_window").getField("start").as("s_start"),
                col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("s_start"))
        // deterministic bounded output — sessions scale with the stream
        .limit(10000)
    }),

    "q40_event_dedup" -> ((s, d) => {
      // streaming dropDuplicates analogue: first event per (user, type)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"))
        .limit(10000) // bounded output — keys scale with users
    }),

    "q41_hourly_rate" -> ((s, d) => {
      events(s, d)
        .groupBy(hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("hod"))
    }),

    "q42_user_activity" -> ((s, d) => {
      // per-user lifetime stats: span, counts, monetary total
      events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
             min(col("ts")).as("first_ts"),
             max(col("ts")).as("last_ts"),
             sum(dec(col("value"))).cast(DoubleType).as("total_value"),
             countDistinct(col("event_type")).as("n_types"))
        .orderBy(col("user_id"))
        .limit(10000) // bounded output — one row per user
    }),

    "q77_view_attribution" -> ((s, d) => {
      // interval join: each purchase attributed to the same user's views
      // in the preceding hour — the batch form of the stream-stream
      // time-bound join (EventStreams.viewAttribution; parity asserted
      // in StreamingParitySpec). The join is a keyed equi-join on
      // user_id with the time bound as a residual predicate — the shape
      // that scales (state/shuffle keyed by user, never a time-range
      // explode).
      val ev = events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      p.join(v, Seq("user_id"))
        .filter(col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
                col("v_ts") <= col("p_ts"))
        .groupBy(col("user_id"), col("purchase_id"))
        .agg(count(lit(1)).as("n_views"), max(col("view_id")).as("last_view_id"))
        .orderBy(col("user_id"), col("purchase_id"))
        .limit(10000) // bounded output — one row per attributed purchase
    }),

    // Event-rate anomaly flags with an INTEGER-exact z-test (no float
    // mean/variance ever exists — the 2σ comparison cross-multiplies
    // to pure int64 arithmetic, immune to partial-agg order): every
    // 37th event's timestamp collapses onto one instant, planting a
    // burst that window must flag while the uniform background stays
    // quiet. The oracle replays counts, moments, and the squared test.
    "q148_rate_anomaly" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts2",
        when(col("event_id") % 37 === 0,
          lit("2024-01-05 03:00:00").cast("timestamp"))
          .otherwise(col("ts")))
      graft.api.Profiling.rateAnomalies(ev, tsCol = "ts2")
        .orderBy("w_start")
    }),

    // Sequential funnel (signup → view → click → purchase, each step
    // strictly after the previous): restricted to each user's first 20
    // events ((ts, event_id)-ordered, a deterministic tie-break) so the
    // synthetic stream — where every user eventually does everything —
    // produces a real drop-off (146 → 133 → 112 → 80 at sf0.01). Gap
    // accounting stays in integer microseconds; the oracle replays the
    // chained min-after-previous logic step by step.
    "q154_event_funnel" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val ev = events(s, d)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 20).drop("__rn")
      graft.api.Profiling.funnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"))
    }),

    // Cross-corpus overlap from sketches alone (q150's lifecycle
    // composed): two user populations (congruence-class filters give a
    // 50/60-user split with a 20-user true overlap at sf0.01) are
    // sketched independently and their intersection estimated by
    // inclusion-exclusion — the "how much of corpus B is already in
    // corpus A" question answered without scanning either corpus. The
    // oracle replays the exact set sizes; the estimate gates ride as
    // booleans (±10% — inclusion-exclusion compounds both sketches'
    // error).
    "q157_overlap_contract" -> ((s, d) => {
      val ev = events(s, d)
      val a = ev.filter(col("user_id") % 3 === 0)
        .withColumn("part", lit("a"))
      val b = ev.filter(col("user_id") % 5 < 2)
        .withColumn("part", lit("b"))
      val est = graft.api.Profiling.estimateOverlap(
        graft.api.Profiling.cardinalitySketches(a, Seq("part"), "user_id"),
        graft.api.Profiling.cardinalitySketches(b, Seq("part"), "user_id"))
      val exact = a.select(col("user_id")).distinct()
        .join(b.select(col("user_id")).distinct(), Seq("user_id"), "full_outer")
        .agg(count(lit(1)).as("exact_union"))
        .crossJoin(a.agg(countDistinct("user_id").as("exact_a")))
        .crossJoin(b.agg(countDistinct("user_id").as("exact_b")))
        .withColumn("exact_overlap",
          col("exact_a") + col("exact_b") - col("exact_union"))
      est.crossJoin(exact)
        .select(col("exact_a"), col("exact_b"), col("exact_overlap"),
          (abs(col("est_a") - col("exact_a")) <= col("exact_a") * 0.05)
            .as("est_a_ok"),
          (abs(col("est_b") - col("exact_b")) <= col("exact_b") * 0.05)
            .as("est_b_ok"),
          (abs(col("est_overlap") - col("exact_overlap")) <=
            greatest(col("exact_overlap").cast("double") * 0.1, lit(5.0)))
            .as("est_overlap_ok"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q37_tumbling_window" ->
      """SELECT TIME_BUCKET(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) AS w_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "q38_sliding_window" ->
      """SELECT w_start, COUNT(*) AS n FROM (
        |  SELECT TIME_BUCKET(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) AS w_start FROM events
        |  UNION ALL
        |  SELECT TIME_BUCKET(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) - INTERVAL '6 hours' AS w_start FROM events
        |) t GROUP BY w_start ORDER BY w_start""".stripMargin,

    "q39_session_window" ->
      """WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL '30 minutes'
        |         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM ev),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS s_start, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, s_start LIMIT 10000""".stripMargin,

    "q40_event_dedup" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type LIMIT 10000""".stripMargin,

    "q41_hourly_rate" ->
      """SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hod, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY hod""".stripMargin,

    "q42_user_activity" ->
      """SELECT user_id, COUNT(*) AS n,
        |  CAST(MIN(ts) AS TIMESTAMP) AS first_ts, CAST(MAX(ts) AS TIMESTAMP) AS last_ts,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        |  COUNT(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id LIMIT 10000""".stripMargin,

    "q77_view_attribution" ->
      """WITH v AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) v_ts, event_id AS view_id
        |  FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) p_ts, event_id AS purchase_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, COUNT(*) AS n_views,
        |  MAX(v.view_id) AS last_view_id
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND v.v_ts >= p.p_ts - INTERVAL '1 hour' AND v.v_ts <= p.p_ts
        |GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 10000""".stripMargin,

    "q148_rate_anomaly" ->
      """WITH ev AS (
        |  SELECT CASE WHEN event_id % 37 = 0
        |    THEN TIMESTAMP '2024-01-05 03:00:00'
        |    ELSE CAST(ts AS TIMESTAMP) END AS ts2
        |  FROM events
        |), w AS (
        |  SELECT TIME_BUCKET(INTERVAL '6 hours', ts2) AS w_start,
        |    count(*) AS n_events
        |  FROM ev GROUP BY 1
        |), st AS (
        |  SELECT count(*) AS nw, CAST(sum(n_events) AS BIGINT) AS s,
        |    CAST(sum(n_events * n_events) AS BIGINT) AS ss
        |  FROM w
        |)
        |SELECT w.w_start, w.n_events,
        |  (w.n_events * st.nw - st.s > 0 AND
        |   (w.n_events * st.nw - st.s) * (w.n_events * st.nw - st.s) >
        |     4 * (st.nw * st.ss - st.s * st.s)) AS anomaly
        |FROM w CROSS JOIN st ORDER BY w.w_start""".stripMargin,

    "q154_event_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, ts, event_id FROM (
        |    SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |    FROM events) WHERE rn <= 20
        |),
        |s0 AS (SELECT user_id, min(ts) AS t0 FROM ev WHERE event_type = 'signup' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t1, min(s0.t0) AS t0
        |       FROM ev e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE e.event_type = 'view' AND e.ts > s0.t0 GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
        |       FROM ev e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3, min(s2.t2) AS t2
        |       FROM ev e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
        |r AS (
        |  SELECT 0 AS step, 'signup' AS event_type, count(*) AS users,
        |    CAST(0 AS BIGINT) AS sum_gap_micros FROM s0
        |  UNION ALL SELECT 1, 'view', count(*),
        |    CAST(coalesce(sum(epoch_us(t1) - epoch_us(t0)), 0) AS BIGINT) FROM s1
        |  UNION ALL SELECT 2, 'click', count(*),
        |    CAST(coalesce(sum(epoch_us(t2) - epoch_us(t1)), 0) AS BIGINT) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*),
        |    CAST(coalesce(sum(epoch_us(t3) - epoch_us(t2)), 0) AS BIGINT) FROM s3
        |)
        |SELECT step, event_type, users, sum_gap_micros,
        |  CASE WHEN step = 0 THEN 1.0
        |       ELSE round(CAST(users AS DOUBLE) / lag(users) OVER (ORDER BY step), 6)
        |  END AS conv_from_prev
        |FROM r ORDER BY step""".stripMargin,

    "q157_overlap_contract" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events WHERE user_id % 3 = 0),
        |     b AS (SELECT DISTINCT user_id FROM events WHERE user_id % 5 < 2)
        |SELECT (SELECT count(*) FROM a) AS exact_a,
        |       (SELECT count(*) FROM b) AS exact_b,
        |       (SELECT count(*) FROM a JOIN b USING (user_id)) AS exact_overlap,
        |       TRUE AS est_a_ok, TRUE AS est_b_ok, TRUE AS est_overlap_ok""".stripMargin
  )
}
