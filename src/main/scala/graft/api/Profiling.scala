package graft.api

import org.apache.spark.sql.DataFrame
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
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    cols.map { c =>
      one.select(lit(c).as("column"),
        col("__rows").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }.reduce(_ union _)
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
    * back (broadcast), a narrow flag projection. The squares bound:
    * counts up to ~3M per window with ~1M windows stay inside int64
    * ((n·N)² < 2⁶³); beyond that, pre-aggregate to coarser windows. */
  def rateAnomalies(events: DataFrame, tsCol: String = "ts",
                    windowDur: String = "6 hours", z: Int = 2): DataFrame = {
    require(z >= 1, s"z must be >= 1, got $z")
    val wins = events
      .groupBy(window(col(tsCol), windowDur).getField("start").as("w_start"))
      .agg(count(lit(1)).as("n_events"))
    val stats = wins.agg(count(lit(1)).as("__N"),
      sum(col("n_events")).as("__S"),
      sum(col("n_events") * col("n_events")).as("__SS"))
    val diff = col("n_events") * col("__N") - col("__S")
    wins.crossJoin(stats)
      .withColumn("anomaly",
        diff > 0 && diff * diff >
          lit(z.toLong * z) * (col("__N") * col("__SS") - col("__S") * col("__S")))
      .drop("__N", "__S", "__SS")
  }
}
