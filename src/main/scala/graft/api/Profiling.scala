package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic data-quality profiling — the first query anyone runs
  * against an unfamiliar 100 TB table: per-column null counts,
  * cardinalities, and value bounds, in ONE corpus scan.
  */
object Profiling {

  /** Per-column profile: (column, n_rows, n_nulls, n_distinct,
    * min_value, max_value) — one row per requested column, min/max
    * rendered as strings so heterogeneous column types stack into one
    * frame.
    *
    * One scan: all counters ride a single aggregation; the per-column
    * rows then unstack from that ONE aggregated row (k unions of a
    * 1-row frame — free). Exact distinct counts make Catalyst Expand
    * the scan k-ways (the standard multi-distinct cost); pass
    * `approxDistinct = true` at corpus scale to ride HLL sketches
    * (±~2.3%) in a plain single-pass aggregate instead — the q54
    * contract pattern covers how approx results gate. */
  def columnProfile(df: DataFrame, cols: Seq[String],
                    approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    require(cols.distinct.size == cols.size,
      s"duplicate columns requested: ${cols.diff(cols.distinct).distinct}")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    // intermediate aliases are indexed (__dist_0), never name-derived:
    // a requested column containing a dot ("a.b") would make the
    // re-resolving col("__dist_a.b") parse as field access and throw;
    // the source column itself resolves through df(c), which treats
    // the name literally
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(df(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
        (if (approxDistinct) approx_count_distinct(df(c))
         else countDistinct(df(c))).as(s"__dist_$i"),
        min(df(c)).cast("string").as(s"__min_$i"),
        max(df(c)).cast("string").as(s"__max_$i"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    // one exploded array of structs over the single aggregated row —
    // NOT k unions of it: a union re-executes the aggregate (and its
    // scan) once per branch, the k-scans cost the one-scan contract
    // forbids (the runChecks lesson, PlanShapeSpec-pinned there)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col("__rows").as("n_rows"),
        col(s"__nulls_$i").as("n_nulls"), col(s"__dist_$i").as("n_distinct"),
        col(s"__min_$i").as("min_value"), col(s"__max_$i").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.column").as("column"), col("__r.n_rows").as("n_rows"),
        col("__r.n_nulls").as("n_nulls"), col("__r.n_distinct").as("n_distinct"),
        col("__r.min_value").as("min_value"), col("__r.max_value").as("max_value"))
  }

  /** Event-rate anomaly flags: bucket events into tumbling windows,
    * flag any window whose count exceeds the all-window mean by more
    * than `z` standard deviations. The z-test is INTEGER-exact — with
    * N windows, S = Σn, SS = Σn², the test
    * `n > mean + z·σ` cross-multiplies to
    * `n·N − S > 0 AND (n·N − S)² > z²·(N·SS − S²)` — no float mean or
    * variance ever exists, so the flags are bit-portable and immune
    * to partial-aggregation order. Output: (w_start, n_events,
    * anomaly), one row per non-empty window.
    *
    * Shape: one keyed window count, a 1-row stats aggregate crossed
    * back (broadcast), a narrow flag projection. The squared terms run
    * in DECIMAL(38,0) — int64 would overflow the diff² term once
    * n·N passes ~3e9 (ordinary at corpus scale) and flip flags
    * silently; 38 digits hold any workload with n·N below ~10^19. */
  def rateAnomalies(events: DataFrame, tsCol: String = "ts",
                    windowDur: String = "6 hours", z: Int = 2): DataFrame = {
    require(z >= 1, s"z must be >= 1, got $z")
    val wins = events
      .groupBy(window(col(tsCol), windowDur).getField("start").as("w_start"))
      .agg(count(lit(1)).as("n_events"))
    val stats = wins.agg(count(lit(1)).as("__N"),
      sum(col("n_events")).as("__S"),
      sum(col("n_events") * col("n_events")).as("__SS"))
    // the squared comparison runs in DECIMAL(38,0): still exact
    // integer arithmetic (order-independent, bit-portable), but with
    // 38-digit headroom — in int64 the diff² term overflows silently
    // once n·N exceeds ~3e9 (e.g. 3M-event windows across a year of
    // 6-hour windows), flipping flags with no error
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    def dec(c: Column) = c.cast(d38)
    val diff = dec(col("n_events")) * dec(col("__N")) - dec(col("__S"))
    wins.crossJoin(stats)
      .withColumn("anomaly",
        diff > 0 && diff * diff >
          lit(z.toLong * z).cast(d38) *
            (dec(col("__N")) * dec(col("__SS")) - dec(col("__S")) * dec(col("__S"))))
      .drop("__N", "__S", "__SS")
  }

  /** Mergeable distinct-count sketch table: one Apache DataSketches
    * HLL sketch (binary, ~KBs at lgK=12) per `partCols` group over
    * `valueCol`. THE 100 TB distinct-counting pattern: build sketches
    * once per ingest partition (day, source, ...), persist them as an
    * ordinary parquet table, then answer "distinct users over ANY
    * partition range" by unioning a metadata-sized sketch table —
    * never rescanning the corpus. Union is associative and
    * commutative, so sketches compose across days, backfills, and
    * engines that share the DataSketches format. */
  def cardinalitySketches(df: DataFrame, partCols: Seq[String],
                          valueCol: String, lgK: Int = 12): DataFrame = {
    require(partCols.nonEmpty, "cardinalitySketches needs partition columns")
    df.groupBy(partCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))
  }

  /** Merge a sketch table down to `groupCols` (empty = one global row)
    * and estimate the distinct count of the original value column over
    * each merged group. Input is [[cardinalitySketches]] output — or
    * that table read back from parquet: the sketch column is plain
    * binary, so the merge never touches source data. */
  def estimateDistinct(sketches: DataFrame, groupCols: Seq[String],
                       sketchCol: String = "sketch"): DataFrame = {
    val est = hll_sketch_estimate(hll_union_agg(col(sketchCol)))
      .as("est_distinct")
    if (groupCols.isEmpty) sketches.agg(est)
    else sketches.groupBy(groupCols.map(col): _*).agg(est)
  }

  /** Mergeable QUANTILE sketch table — the [[cardinalitySketches]]
    * lifecycle for rank/percentile queries: one Apache DataSketches
    * KLL sketch (binary, ~KB at k=200) per `partCols` group over
    * `valueCol`. Build once per ingest partition, persist as ordinary
    * parquet, answer "p50/p95/p99 over ANY partition range" from the
    * sketch table alone ([[estimateQuantiles]]) — the latency/size
    * dashboard pattern at 100 TB, where re-scanning for exact
    * percentiles is the cost that kills. Error is a PROVEN two-sided
    * normalized rank bound (~1.65% of n at k=200), not a heuristic. */
  def quantileSketches(df: DataFrame, partCols: Seq[String],
                       valueCol: String, k: Int = 200): DataFrame = {
    require(partCols.nonEmpty, "quantileSketches needs partition columns")
    val agg = udaf(new graft.functions.KllAggregators.SketchAgg(k),
      org.apache.spark.sql.Encoders.scalaDouble)
    // null values are SKIPPED, matching cardinalitySketches' HLL
    // semantics — without the filter a null would hit the typed
    // aggregator's non-nullable primitive input and abort the job
    df.filter(col(valueCol).isNotNull)
      .groupBy(partCols.map(col): _*)
      .agg(agg(col(valueCol).cast("double")).as("sketch"))
  }

  /** Merge a quantile sketch table down to `groupCols` (empty = one
    * global row) and estimate the requested quantiles over each merged
    * group. Input is [[quantileSketches]] output or its parquet
    * round-trip; only sketches move — never source rows. Output: the
    * group columns + one `q_<rank>` double column per requested
    * quantile (inclusive rank semantics). */
  def estimateQuantiles(sketches: DataFrame, groupCols: Seq[String],
                        qs: Seq[Double], sketchCol: String = "sketch",
                        k: Int = 200): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      "quantile ranks must be in [0, 1]")
    val merge = udaf(new graft.functions.KllAggregators.MergeAgg(k),
      org.apache.spark.sql.Encoders.BINARY)
    val merged =
      (if (groupCols.isEmpty) sketches.agg(merge(col(sketchCol)).as("__m"))
       else sketches.groupBy(groupCols.map(col): _*)
         .agg(merge(col(sketchCol)).as("__m")))
    val outSchema = org.apache.spark.sql.types.StructType(
      merged.schema.fields.filterNot(_.name == "__m") ++
        qs.map(q => org.apache.spark.sql.types.StructField(
          // Locale.ROOT: a comma-decimal default locale would render
          // "q_0,5000" and break every documented q_<rank> column name
          "q_" + "%.4f".formatLocal(java.util.Locale.ROOT, q).replace(".", "_"),
          org.apache.spark.sql.types.DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val n = merged.schema.fields.length - 1
    merged.map { r =>
      val ests = graft.functions.KllAggregators.quantilesOf(
        r.getAs[Array[Byte]]("__m"), qs)
      org.apache.spark.sql.Row.fromSeq(
        (0 until n).map(r.get) ++ ests)
    }(enc)
  }

  /** Population-Stability-Index feature drift between a REFERENCE
    * frame (the distribution training/curation decisions were made
    * against) and a CURRENT frame (this week's crawl, the post-filter
    * corpus): per feature,
    * `PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)` over `bins`
    * equal-width bins anchored to the reference's [min, max] (current
    * rows outside the reference range clamp into the edge bins — mass
    * leaving the reference support is exactly what PSI must see).
    * Proportions are Laplace-smoothed, `p = (count + 0.5) / (n +
    * 0.5·bins)`, so empty bins never produce ln(0) and the statistic
    * stays defined for disjoint supports. Output: (feature, n_ref,
    * n_cur, psi), psi rounded to 6. Rule-of-thumb thresholds: < 0.1
    * stable, 0.1–0.25 moderate, > 0.25 action. A reference feature
    * with a single value degenerates to one bin and PSI 0 — profile
    * such columns with [[columnProfile]] instead.
    *
    * Both sides reduce to (feature, bin) counts in one keyed
    * aggregation each — two corpus scans total, nothing row-sized
    * shuffles, the bin spine is features × bins rows. NULLs are
    * excluded per feature (count the gap with [[columnProfile]]). */
  def featureDrift(ref: DataFrame, cur: DataFrame, cols: Seq[String],
                   bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val refM = meltFeatures(ref, cols)
    // a single-valued reference feature has ONE bin (its spine and
    // smoothing divisor shrink with it) — so identical degenerate
    // frames score exactly 0 instead of smoothing noise
    val edges = refM.groupBy("feature")
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .withColumn("nb", when(col("hi") === col("lo"), 1).otherwise(bins))
    driftFromParts(edges, binFeatures(refM, edges, bins), cur, cols, bins)
  }

  private def meltFeatures(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "featureDrift needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("feature"), df(c).cast("double").as("v"))): _*))
        .as("fv"))
      .select(col("fv.feature").as("feature"), col("fv.v").as("v"))
      .filter(col("v").isNotNull)
  }

  private def binFeatures(m: DataFrame, edges: DataFrame, bins: Int): DataFrame =
    m.join(edges, "feature")
      .select(col("feature"),
        when(col("hi") === col("lo"), 0)
          .otherwise(least(lit(bins - 1), greatest(lit(0),
            floor((col("v") - col("lo")) / (col("hi") - col("lo")) * bins)
              .cast("int")))).as("bin"))
      .groupBy("feature", "bin").agg(count(lit(1)).as("cnt"))

  /** Shared PSI tail: reference edges + reference bin counts (live or
    * frozen) against a current frame. */
  private def driftFromParts(edges: DataFrame, refC: DataFrame,
                             cur: DataFrame, cols: Seq[String],
                             bins: Int): DataFrame = {
    val curC = binFeatures(meltFeatures(cur, cols), edges, bins)
    val spine = edges.select(col("feature"), col("nb"),
      explode(sequence(lit(0), col("nb") - 1)).as("bin"))
    val joined = spine
      .join(refC, Seq("feature", "bin"), "left")
      .withColumnRenamed("cnt", "ref_cnt")
      .join(curC, Seq("feature", "bin"), "left")
      .withColumnRenamed("cnt", "cur_cnt")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
    val withN = joined
      .withColumn("n_ref", sum(col("ref_cnt"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("feature")))
      .withColumn("n_cur", sum(col("cur_cnt"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("feature")))
    val pr = (col("ref_cnt") + 0.5) / (col("n_ref") + col("nb") * 0.5)
    val pc = (col("cur_cnt") + 0.5) / (col("n_cur") + col("nb") * 0.5)
    withN
      .withColumn("contrib", (pc - pr) * log(pc / pr))
      .groupBy("feature")
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        round(sum(col("contrib")), 6).as("psi"))
  }

  /** FROZEN drift reference: the edges and bin counts of the
    * reference era, collected once (features × bins rows — metadata-
    * sized) so every later batch scores against the SAME yardstick.
    * Re-fitting edges per batch would let the yardstick drift with
    * the drift — the monitoring bug frozen references exist to
    * prevent (the [[graft.api.Similarity]] frozen-quantizer rule,
    * applied to quality monitoring). */
  final case class DriftReference(bins: Int, features: Seq[String],
      edges: Seq[(String, Double, Double, Int)],
      counts: Seq[(String, Int, Long)])

  /** Fit a [[DriftReference]] over the reference frame — two keyed
    * aggregations, one tiny collect. */
  def fitDriftReference(ref: DataFrame, cols: Seq[String],
                        bins: Int = 10): DriftReference = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val refM = meltFeatures(ref, cols)
    val edges = refM.groupBy("feature")
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .withColumn("nb", when(col("hi") === col("lo"), 1).otherwise(bins))
    val e = edges.collect().map(r => (r.getString(0), r.getDouble(1),
      r.getDouble(2), r.getInt(3))).toSeq.sortBy(_._1)
    val c = binFeatures(refM, edges, bins).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      .sortBy(x => (x._1, x._2))
    DriftReference(bins, cols, e, c)
  }

  /** PSI of a current frame against a FROZEN reference — identical
    * output to [[featureDrift]] on the frames the reference was fit
    * from (the frozen parts are the same edges and counts, re-entered
    * as literals). The per-batch scoring path of
    * [[featureDriftStream]]. */
  def featureDriftFrozen(cur: DataFrame, ref: DriftReference): DataFrame = {
    val spark = cur.sparkSession
    import spark.implicits._
    val edges = ref.edges.toDF("feature", "lo", "hi", "nb")
    val refC = ref.counts.toDF("feature", "bin", "cnt")
    driftFromParts(edges, refC, cur, ref.features, ref.bins)
  }

  /** Continuous drift monitoring: score every micro-batch against the
    * frozen reference and APPEND (batch_id, feature, n_ref, n_cur,
    * psi) to a parquet ledger — the alert feed a weekly-crawl
    * pipeline tails (PSI > 0.25 on any feature = stop and look).
    * Per batch: one narrow scan of the batch + features × bins
    * literals; the ledger grows by features rows per batch. */
  def featureDriftStream(stream: DataFrame, ref: DriftReference,
                         ledgerPath: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        featureDriftFrozen(batch, ref)
          .withColumn("batch_id", lit(batchId))
          .select(col("batch_id"), col("feature"), col("n_ref"),
            col("n_cur"), col("psi"))
          .write.mode("append").parquet(ledgerPath)
      }
      .start()

  /** Mergeable HEAVY-HITTERS sketch table — the frequency third of
    * the sketch-table family ([[cardinalitySketches]] = distinct,
    * [[quantileSketches]] = rank): one DataSketches Frequent-Items
    * sketch (Misra-Gries reverse-purge map, bounded at `maxMapSize`
    * entries) per `partCols` group over `keyCol`. Build once per
    * ingest partition, persist as parquet binary, answer "which
    * terms/domains/users dominate ANY partition range?" from the
    * sketch table alone — with one-sided guarantees (every item whose
    * true count exceeds the merged sketch's max error IS reported;
    * reported bounds always bracket the true count), where exact
    * heavy-hitters would re-run a corpus-wide keyed aggregation. */
  def frequencySketches(df: DataFrame, partCols: Seq[String],
                        keyCol: String, maxMapSize: Int = 1024): DataFrame = {
    require(partCols.nonEmpty, "frequencySketches needs partition columns")
    val agg = udaf(new graft.functions.FreqAggregators.FreqSketchAgg(maxMapSize),
      org.apache.spark.sql.Encoders.STRING)
    df.filter(col(keyCol).isNotNull)
      .groupBy(partCols.map(col): _*)
      .agg(agg(col(keyCol).cast("string")).as("sketch"))
  }

  /** Merge a frequency sketch table down to `groupCols` (empty = one
    * global row) and report each merged group's frequent items: one
    * row per item — (group..., item, estimate, lower_bound,
    * upper_bound, max_error, stream_length). NO_FALSE_NEGATIVES
    * reporting by default (complete above the error bound, possibly
    * with borderline extras); only sketches move, never source rows.
    * NOTE estimates/borderline membership depend on insertion order —
    * gate downstream checks on the bounds and the coverage guarantee,
    * not on raw estimates (unless the group's distinct keys fit the
    * map, in which case the sketch is exact and max_error = 0). */
  def estimateHeavyHitters(sketches: DataFrame, groupCols: Seq[String],
                           sketchCol: String = "sketch",
                           maxMapSize: Int = 1024,
                           noFalseNegatives: Boolean = true): DataFrame = {
    val merge = udaf(new graft.functions.FreqAggregators.FreqMergeAgg(maxMapSize),
      org.apache.spark.sql.Encoders.BINARY)
    val merged =
      (if (groupCols.isEmpty) sketches.agg(merge(col(sketchCol)).as("__m"))
       else sketches.groupBy(groupCols.map(col): _*)
         .agg(merge(col(sketchCol)).as("__m")))
    val outSchema = org.apache.spark.sql.types.StructType(
      merged.schema.fields.filterNot(_.name == "__m") ++ Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("estimate",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lower_bound",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("upper_bound",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("max_error",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("stream_length",
          org.apache.spark.sql.types.LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val n = merged.schema.fields.length - 1
    merged.flatMap { r =>
      val bytes = r.getAs[Array[Byte]]("__m")
      val err = graft.functions.FreqAggregators.maxError(bytes)
      val len = graft.functions.FreqAggregators.streamLength(bytes)
      graft.functions.FreqAggregators
        .heavyHittersOf(bytes, noFalseNegatives)
        .map { case (item, est, lb, ub) =>
          org.apache.spark.sql.Row.fromSeq(
            (0 until n).map(r.get) ++ Seq(item, est, lb, ub, err, len))
        }
    }(enc)
  }

  /** Estimated distinct-value overlap between two sketch tables
    * ([[cardinalitySketches]] output, any partitioning): |A∩B| by
    * inclusion–exclusion over the merged sketches — est(A) + est(B) −
    * est(A∪B) — plus both margins and the containment ratio
    * |A∩B|/|A|. The 100 TB question this answers: "how much of corpus
    * B's user/document population is already in corpus A?" — from two
    * metadata-sized sketch tables, scanning neither corpus.
    * Inclusion–exclusion inherits BOTH sketches' error (±~1.6%·each at
    * lgK=12), so small true overlaps can estimate slightly negative —
    * clamped to 0. One row: (est_a, est_b, est_union, est_overlap,
    * containment_a). */
  def estimateOverlap(sketchesA: DataFrame, sketchesB: DataFrame,
                      sketchCol: String = "sketch"): DataFrame = {
    val a = sketchesA.agg(hll_union_agg(col(sketchCol)).as("__sa"))
    val b = sketchesB.agg(hll_union_agg(col(sketchCol)).as("__sb"))
    a.crossJoin(b)
      .select(
        hll_sketch_estimate(col("__sa")).as("est_a"),
        hll_sketch_estimate(col("__sb")).as("est_b"),
        hll_sketch_estimate(hll_union(col("__sa"), col("__sb")))
          .as("est_union"))
      .withColumn("est_overlap",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .withColumn("containment_a",
        when(col("est_a") > 0,
          round(col("est_overlap").cast("double") / col("est_a"), 6))
          .otherwise(lit(0.0)))
  }

  /** Sequential funnel over an event stream: for each prefix of
    * `steps`, the users who performed those event types IN ORDER
    * (each step strictly after the previous one — the first qualifying
    * occurrence), with per-step reach counts, conversion from the
    * previous step, and the exact summed time-to-convert.
    *
    * Shape: step 0 is one keyed min; each later step joins the
    * surviving users back to that step's events (filter pushdown means
    * each pass scans ONLY its own event type) and takes the min
    * qualifying timestamp — k-1 co-keyed joins that reuse the same
    * hash partitioning on the user key, never a cross-step shuffle of
    * the full stream. Survivor sets shrink monotonically, so each join
    * is smaller than the last. Gap accounting stays in integer
    * microseconds (`sum_gap_micros`) — no float time arithmetic, so
    * results are bit-portable; `conv_from_prev` is the one rounded
    * convenience ratio. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val spark = events.sparkSession
    val u = col(userCol).as("__u")
    var reached = events.filter(col(typeCol) === steps.head)
      .groupBy(u).agg(min(col(tsCol)).as("__t0"))
    val perStep = scala.collection.mutable.Buffer(
      reached.agg(lit(0).as("step"), lit(steps.head).as("event_type"),
        count(lit(1)).as("users"), lit(0L).as("sum_gap_micros")))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = s"__t${i - 1}"
      val cur = s"__t$i"
      val stepEvents = events.filter(col(typeCol) === st)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      // carried earlier-step times are constant per user — min picks
      // that constant deterministically
      val aggs = Seq(min(col("__ts")).as(cur)) ++
        (0 until i).map(j => min(col(s"__t$j")).as(s"__t$j"))
      reached = stepEvents.join(reached, "__u")
        .filter(col("__ts") > col(prev))
        .groupBy(col("__u"))
        .agg(aggs.head, aggs.tail: _*)
      perStep += reached.agg(lit(i).as("step"), lit(st).as("event_type"),
        count(lit(1)).as("users"),
        coalesce(sum(unix_micros(col(cur)) - unix_micros(col(prev))), lit(0L))
          .as("sum_gap_micros"))
    }
    // k one-row frames; the lag window runs over k rows — free
    val w = org.apache.spark.sql.expressions.Window.orderBy("step")
    perStep.reduce(_ union _)
      .withColumn("conv_from_prev",
        when(col("step") === 0, lit(1.0))
          .otherwise(round(col("users").cast("double") /
            lag(col("users"), 1).over(w), 6)))
      .orderBy("step")
  }

  /** A declarative data-quality expectation (the Deequ/
    * great-expectations shape): each case compiles to aggregate
    * expressions so [[runChecks]] can evaluate a whole suite in ONE
    * scan of the table — at 100 TB the scan IS the cost, and a
    * constraint suite that runs k scans for k checks is unusable. */
  sealed trait Check
  object Check {
    /** Non-null rate of `column` must be >= `minRate` (1.0 = strictly
      * no nulls). Observed = the rate. */
    final case class NotNull(column: String, minRate: Double = 1.0) extends Check
    /** `columns` together must form a unique key. Observed = number of
      * EXCESS rows (rows beyond the first per duplicated key). */
    final case class Unique(columns: Seq[String]) extends Check
    /** Every non-null value of `column` must be one of `allowed`.
      * Observed = violation count. */
    final case class InSet(column: String, allowed: Seq[String]) extends Check
    /** Every non-null value of `column` must lie in [lo, hi].
      * Observed = violation count. */
    final case class InRange(column: String, lo: Double, hi: Double) extends Check
    /** Table row count must lie in [lo, hi]. Observed = row count. */
    final case class RowCountBetween(lo: Long, hi: Long) extends Check
    /** Every non-null value of `column` must exist in
      * `parentKey` of `parent` (referential integrity). Observed =
      * count of DISTINCT orphaned child keys. */
    final case class ReferencedIn(column: String, parent: DataFrame,
                                  parentKey: String) extends Check
  }

  /** ROW-LEVEL expectations (the write-path twin of [[runChecks]]'s
    * scan-level suite — Delta-Live-Tables-style `expect_or_drop`
    * semantics): tag every row with the names of the rules it
    * violates (`violations: array<string>`, rule order = argument
    * order) and a `quarantined` flag. Supported rules are the
    * row-decidable ones — [[Check.NotNull]] (hard: any null violates,
    * `minRate` is a scan-level knob and is ignored here),
    * [[Check.InSet]], [[Check.InRange]] (non-castable values violate,
    * like runChecks) — corpus-shaped rules (Unique, RowCountBetween,
    * ReferencedIn) throw: a ROW cannot know them. Splitting is then
    * `filter(!quarantined)` / `filter(quarantined)` — the valid slice
    * proceeds to the committed write, the quarantine slice lands in a
    * side table WITH its rule names, so ingestion never silently
    * drops and the quarantine is re-processable after a rule fix.
    * One codegen'd projection, no shuffle. */
  def applyExpectations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "applyExpectations needs at least one rule")
    import Check._
    val tags = checks.map {
      case NotNull(c, _) =>
        when(col(c).isNull, lit(s"not_null($c)"))
      case InSet(c, allowed) =>
        when(col(c).isNotNull && !col(c).isin(allowed: _*),
          lit(s"in_set($c)"))
      case InRange(c, lo, hi) =>
        when(col(c).isNotNull &&
          (col(c).try_cast("double").isNull ||
            col(c).try_cast("double") < lo ||
            col(c).try_cast("double") > hi),
          lit(s"in_range($c)"))
      case other => throw new IllegalArgumentException(
        s"applyExpectations supports row-decidable rules " +
          s"(NotNull/InSet/InRange), got $other")
    }
    df.withColumn("violations", array_compact(array(tags: _*)))
      .withColumn("quarantined", size(col("violations")) > 0)
  }

  /** Evaluate a constraint suite against `df` in one pass: every
    * scan-shaped check (null rates, set/range membership, uniqueness,
    * row count) compiles into a single wide aggregation — ONE table
    * scan regardless of suite size; each [[Check.ReferencedIn]] adds
    * one keys-only join (both sides collapse to distinct keys first,
    * so the join is O(distinct keys), never O(rows) — the
    * [[graft.api.Joins.integrityProfile]] shape).
    *
    * Output: one row per check — (check, target, observed, passed),
    * `observed` rounded to 6 dp, ordered by (check, target) so a suite
    * report is stable across runs and engines. */
  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "runChecks needs at least one check")
    import Check._
    val n = count(lit(1))
    // one aggregate expression (aliased __c<i>) per scan-shaped check
    val scanAggs = checks.zipWithIndex.collect {
      case (NotNull(c, _), i) =>
        (sum(when(col(c).isNotNull, 1L).otherwise(0L)) / n).as(s"__c$i")
      case (Unique(cols), i) =>
        (n - countDistinct(struct(cols.map(col): _*))).cast("double").as(s"__c$i")
      case (InSet(c, allowed), i) =>
        sum(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1L)
          .otherwise(0L)).cast("double").as(s"__c$i")
      case (InRange(c, lo, hi), i) =>
        // a non-null value that fails the double cast (e.g. "abc" in a
        // string column) is a VIOLATION, not a silent pass — and under
        // ANSI mode a plain cast would ABORT the whole suite on the
        // first malformed value, so the probe rides try_cast
        sum(when(col(c).isNotNull &&
            (col(c).try_cast("double").isNull ||
              col(c).try_cast("double") < lo ||
              col(c).try_cast("double") > hi), 1L)
          .otherwise(0L)).cast("double").as(s"__c$i")
      case (RowCountBetween(_, _), i) => n.cast("double").as(s"__c$i")
    }
    // ONE array-of-structs exploded over the single aggregated row —
    // NOT k unions of that row: a union re-executes the aggregate (and
    // its scan) once per branch, which is exactly the k-scans cost
    // this operator exists to avoid (PlanShapeSpec pins the scan count)
    def entry(name: String, target: String, observed: Column,
              passed: Column): Column =
      struct(lit(name).as("check"), lit(target).as("target"),
        round(observed, 6).as("observed"), passed.as("passed"))
    val scanRows = checks.zipWithIndex.collect {
      case (NotNull(c, minRate), i) =>
        entry("not_null", c, col(s"__c$i"), col(s"__c$i") >= minRate)
      case (Unique(cols), i) =>
        entry("unique", cols.mkString(","), col(s"__c$i"), col(s"__c$i") === 0.0)
      case (InSet(c, _), i) =>
        entry("in_set", c, col(s"__c$i"), col(s"__c$i") === 0.0)
      case (InRange(c, _, _), i) =>
        entry("in_range", c, col(s"__c$i"), col(s"__c$i") === 0.0)
      case (RowCountBetween(lo, hi), i) =>
        entry("row_count", "*", col(s"__c$i"),
          col(s"__c$i") >= lo.toDouble && col(s"__c$i") <= hi.toDouble)
    }
    val scanned =
      if (scanRows.isEmpty) None
      else Some(df.agg(scanAggs.head, scanAggs.tail: _*)
        .select(explode(array(scanRows: _*)).as("__r"))
        .select(col("__r.check").as("check"), col("__r.target").as("target"),
          col("__r.observed").as("observed"), col("__r.passed").as("passed")))
    val refRows = checks.collect {
      case ReferencedIn(c, parent, pk) =>
        // keys-only anti join: collapse child to distinct keys, drop
        // those present in the parent's distinct keys, count survivors
        df.filter(col(c).isNotNull).select(col(c).as("__k"))
          .distinct()
          .join(parent.select(col(pk).as("__k")).distinct(), Seq("__k"),
            "left_anti")
          .agg(count(lit(1)).cast("double").as("__o"))
          .select(lit("referenced_in").as("check"), lit(c).as("target"),
            round(col("__o"), 6).as("observed"), (col("__o") === 0.0).as("passed"))
    }
    (scanned.toSeq ++ refRows).reduce(_ union _).orderBy("check", "target")
  }
}
