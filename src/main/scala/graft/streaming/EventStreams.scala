package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured-Streaming execution of the event-window operators: the
  * same transformations the batch surface runs (graft.queries.Events
  * q37–q40) expressed over `readStream`, with watermarks, streaming
  * windows (tumbling / sliding / session), streaming dedup, and a
  * `mapGroupsWithState` custom-state counter.
  *
  * Batch/streaming parity is enforced by StreamingParitySpec: each
  * streaming query processes the same parquet input via
  * `Trigger.AvailableNow` and must produce the batch query's result.
  *
  * Scale notes: every stateful op keys its state by a high-cardinality
  * column (window × event_type, user_id), so state shards evenly across
  * executors; watermarks bound state size — late data beyond 1 hour is
  * dropped, and closed windows/sessions are evicted from the store.
  */
object EventStreams {

  /** Unbounded view of the events table: file-stream source over the
    * same parquet directory (schema from a batch peek — streaming
    * sources require a declared schema), with the same dtype-adaptive
    * `ts` normalization the batch loader applies
    * (graft.core.Tables.normalizeEventTs — the fixture's physical
    * timestamp type has changed across driver regenerations). */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    // The file-stream source wants a directory: stream the parent dir
    // with a glob filter selecting just the events file(s).
    graft.core.Tables.normalizeEventTs(
      s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  /** q37 streaming form: watermarked tumbling window aggregate. */
  def tumbling(df: DataFrame): DataFrame =
    df.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours").getField("start").as("w_start"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("value"))).cast(DoubleType).as("total_value"))

  /** q38 streaming form: watermarked sliding window count. */
  def sliding(df: DataFrame): DataFrame =
    df.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "12 hours", "6 hours").getField("start").as("w_start"))
      .agg(count(lit(1)).as("n"))

  /** q39 streaming form: gap-based session windows per user. */
  def sessionized(df: DataFrame): DataFrame =
    df.withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(dec(col("value"))).cast(DoubleType).as("session_value"))
      .select(col("user_id"),
              col("session_window").getField("start").as("s_start"),
              col("n_events"), col("session_value"))

  /** q40 streaming form: stateful dedup on (user_id, event_type).
    * Streaming `dropDuplicates` keeps the FIRST ARRIVAL per key (state
    *-store semantics) — arrival order is file order, so the surviving
    * event_id may differ from the batch query's min-(ts,event_id) pick;
    * the key set is identical. Parity is asserted on the key set. */
  def dedup(df: DataFrame): DataFrame =
    df.withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"))

  /** Custom-state operator: running event count per user via
    * `mapGroupsWithState` — the arbitrary-stateful-processing API the
    * built-in aggregates don't cover. Emits the updated lifetime count
    * for each user seen in the micro-batch. */
  def statefulUserCounts(s: SparkSession, df: DataFrame): Dataset[(Long, Long)] = {
    import s.implicits._
    df.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[Long], state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + events.size
          state.update(n)
          (uid, n)
      }
  }

  /** Custom-state operator with MULTI-ROW emission and event-time
    * timeout: gap-based sessionization via `flatMapGroupsWithState` —
    * the fully-general stateful API (mapGroupsWithState is its
    * one-row-per-group restriction). Each user's open session lives in
    * the state store; an event within `gap` of the session's end extends
    * it, a later event closes it and opens a new one; on event-time
    * timeout (watermark passed the open session's end + gap) the final
    * session is flushed. Emits one row per CLOSED session — zero, one,
    * or many per group per batch, which is exactly why this needs
    * flatMap. State is keyed by user_id (high cardinality — shards
    * evenly) and bounded by the watermark.
    *
    * Batch form of the same semantics: q39's `session_window`; parity
    * on the session set is asserted in StreamingParitySpec.
    *
    * Late-data caveat: events inside the watermark but earlier than the
    * open session's start − gap are emitted as singleton sessions (the
    * single-open-session state cannot retro-merge history); within
    * [start − gap, end + gap] late events widen the open session
    * exactly like `session_window`'s merge. */
  def flatSessionize(s: SparkSession, df: DataFrame,
                     gapMinutes: Int = 30): Dataset[(Long, Long, Long, Long)] = {
    import s.implicits._
    import org.apache.spark.sql.streaming.GroupState
    val gapUs = gapMinutes.toLong * 60 * 1000000
    // the watermark both drives the event-time timeout and bounds
    // state; the watermarked `ts` column itself must flow into the
    // stateful operator (projecting it away drops the event-time tag),
    // so the row carries (user, ts, ts µs) and the function reads µs
    df.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, events: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's gap — flush it
            val (st, en, n) = state.get
            state.remove()
            Iterator((uid, st, en, n))
          } else {
            val sorted = events.map(_._3).toArray.sorted
            var closed = List.empty[(Long, Long, Long, Long)]
            var open = state.getOption
            sorted.foreach { t =>
              open = open match {
                // extend with min/max, not blind assignment: a LATE
                // cross-batch event inside the gap (t < en, or even
                // t < st when st - t <= gap) must widen the session the
                // way session_window merges overlapping windows, never
                // regress its end below its start
                case Some((st, en, n)) if t - en <= gapUs && st - t <= gapUs =>
                  Some((math.min(st, t), math.max(en, t), n + 1))
                case Some((st, en, n)) if t > en =>
                  closed ::= ((uid, st, en, n)); Some((t, t, 1L))
                case Some((st, en, n)) =>
                  // t < st - gap: a late event belonging BEFORE the open
                  // session; an incremental single-session state cannot
                  // retro-merge it, so emit it as its own closed
                  // singleton (bounded by the watermark — see scaladoc)
                  closed ::= ((uid, t, t, 1L)); Some((st, en, n))
                case None => Some((t, t, 1L))
              }
            }
            open.foreach { o =>
              state.update(o)
              // close the session when event time passes its end + gap
              state.setTimeoutTimestamp((o._2 + gapUs) / 1000)
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream-stream interval join (q77's streaming form): purchases
    * joined to the same user's views in the preceding hour. Both sides
    * are watermarked and the join condition carries the event-time
    * bound, so Spark can size the join state: a buffered view is
    * dropped once the watermark passes `v_ts + 1 hour` (no purchase
    * can match it anymore), a buffered purchase once the watermark
    * passes `p_ts`. State is keyed by user_id — high cardinality,
    * shards evenly; the time bound is a residual predicate, never a
    * range explode. Emits one row per (purchase, view) match in append
    * mode; the batch aggregation over the same pairs is
    * `q77_view_attribution`. */
  def viewAttribution(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    p.join(v, expr(
        "p_user = v_user AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"))
  }

  /** Streaming form of [[graft.api.Profiling.funnel]]'s per-user step
    * progress: state (the timestamps of steps reached so far, strictly
    * increasing) lives in the state store keyed by user; each batch's
    * events advance the greedy in-order scan — an event advances the
    * funnel only when it matches the NEXT unreached step with a
    * strictly later timestamp. Processing a user's events in
    * nondecreasing event-time order yields exactly the batch
    * min-after-previous times (greedy-earliest == sequential minima),
    * so final per-user progress matches the batch funnel when events
    * arrive in order across batches (parity spec); an event for an
    * already-passed step position that arrives across batches out of
    * order is ignored — the documented streaming caveat, same family
    * as flatSessionize's no-retro-merge. Emits (user, steps_reached)
    * per touched user per batch — Update mode, monotone per user.
    * State is a handful of longs per user; at cluster scale it shards
    * by the user key. */
  def funnelProgress(s: SparkSession, df: DataFrame,
                     steps: Seq[String]): Dataset[(Long, Int)] = {
    import s.implicits._
    import org.apache.spark.sql.streaming.GroupState
    require(steps.nonEmpty && steps.distinct.size == steps.size)
    val stepArr = steps.toArray
    df.select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[(Long, String, Long)],
         state: GroupState[List[Long]]) =>
          // head = latest reached-step time (list reversed)
          var times = state.getOption.getOrElse(Nil)
          events.toArray.sortBy(_._3).foreach { case (_, typ, t) =>
            val k = times.length
            if (k < stepArr.length && typ == stepArr(k) &&
              (times.isEmpty || t > times.head)) times = t :: times
          }
          state.update(times)
          (uid, times.length)
      }
  }

  /** Drain a streaming frame into an in-memory table with
    * `Trigger.AvailableNow` (process everything currently in the
    * source, then stop) and return the result. */
  def runToMemory(s: SparkSession, df: DataFrame, name: String,
                  mode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }
}
