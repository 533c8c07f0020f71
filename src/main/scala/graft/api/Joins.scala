package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, composed scale-safely from
  * the operators it has. */
object Joins {

  /** Left as-of join: for every left row, the value columns of the
    * latest right row with `right.tsCol <= left.tsCol` for the same
    * key (ASOF >= semantics — an exact-tie right row IS visible).
    *
    * Built as union + one keyed window with last-non-null carry-forward
    * — ONE shuffle on the key, no range explode, no per-row backward
    * scan, no broadcast: both sides may be corpus-sized. This is the
    * shape that survives 100 TB; engines with a native ASOF JOIN
    * (DuckDB oracles q55) plan it the same way.
    *
    * Output: all left columns plus `right`'s value columns (null where
    * no prior right row exists). Right value column names must not
    * collide with left column names. If `right` can hold several rows
    * per (key, ts), dedupe it first — which of the tied rows wins is
    * otherwise unspecified.
    *
    * The right row's value columns are carried forward as ONE struct,
    * so the output row is always the intact latest right row — never a
    * per-column mix of different right rows when the latest one holds
    * NULLs in some value columns (ADVICE r3).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           tsCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightVals = right.columns.toSeq.filterNot(c => c == keyCol || c == tsCol)
    require(rightVals.nonEmpty, "right side needs at least one value column")
    require(rightVals.intersect(leftCols).isEmpty,
      s"right value columns ${rightVals.mkString(",")} must not collide with left columns")
    // align schemas: the right row travels as a single non-null struct
    // of its value columns (atomic carry-forward); left rows carry a
    // null struct of the same type
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val leftTagged = left
      .withColumn("__rv", lit(null).cast(rvType))
      .withColumn("__side", lit(1))
    // a right row with a NULL timestamp can never be "as of" anything,
    // but ascending sort would place it FIRST and its values would leak
    // into every left row before the first real right row — drop them.
    // (A NULL-ts left row likewise sorts first and correctly gets no
    // match.)
    val rightTagged = right
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol),
        struct(rightVals.map(col): _*).as("__rv"))
      .withColumn("__side", lit(0))
    val leftOnly = leftCols.filterNot(c => c == keyCol || c == tsCol)
    val rightAligned = leftOnly.foldLeft(rightTagged)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    // right rows sort before left rows at the same ts (0 < 1), so an
    // exact-tie right row is visible to the left row — ASOF >= semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = leftTagged.unionByName(rightAligned)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(c => col("__rv").getField(c).as(c)): _*)
  }

  /** Salted inner equi-join for a SKEWED join key: the big side gets a
    * per-row salt in [0, salts); the other side is replicated once per
    * salt value; the join runs on (key, salt), so one hot key's rows
    * spread over `salts` shuffle partitions instead of hammering one
    * reducer. The result is exactly the plain equi-join (every big row
    * meets every matching small row exactly once — at its own salt).
    *
    * When to reach for it: the right side is too big to broadcast, the
    * big side's key distribution is heavy-tailed, and AQE's post-shuffle
    * skew split isn't available or isn't enough (it re-splits oversized
    * shuffle partitions after the fact; a single hot KEY still lands in
    * one partition of any downstream agg keyed the same way — the salt
    * here spreads it before the shuffle). Cost: `salts ×` replication of the
    * right side — keep `right` the smaller input and `salts` modest.
    * The salt is derived from the big side's physical row position
    * (partition id + local id), so it needs no extra columns, costs no
    * shuffle of its own, and spreads rows uniformly whatever the key
    * distribution. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keyCol: String,
                     salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(big.columns.intersect(small.columns).toSeq == Seq(keyCol),
      s"sides must share exactly the join column '$keyCol'")
    val salted = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** Hot-key-scoped form of [[saltedEquiJoin]]: only rows whose key is
    * in `hotKeys` (a handful of known-skewed values — from profiling or
    * an approx top-k pass) take the salted path; everything else runs
    * the plain equi-join. This keeps the `salts ×` replication bill
    * proportional to the HOT subset of `small`, not the whole side —
    * the shape to use when `small` is itself large. The result is
    * exactly the plain equi-join. */
  def saltedEquiJoinHotKeys(big: DataFrame, small: DataFrame,
                            keyCol: String, hotKeys: Seq[Any],
                            salts: Int = 8): DataFrame = {
    require(hotKeys.nonEmpty, "provide at least one hot key (or use the plain join)")
    val hot = col(keyCol).isin(hotKeys: _*)
    saltedEquiJoin(big.filter(hot), small.filter(hot), keyCol, salts)
      .unionByName(big.filter(!hot).join(small.filter(!hot), keyCol))
  }

  /** Skew diagnostic for a join/groupBy key: the `topN` heaviest keys
    * with their row counts, corpus share, and a salt recommendation —
    * the profiling pass that decides between the plain join,
    * [[saltedEquiJoinHotKeys]] (feed it these keys), and a full
    * [[saltedEquiJoin]]. `salt_hint` is how many partitions-worth of
    * rows the key occupies at `partitions` shuffle partitions
    * (⌈n·partitions/total⌉, floored at 1): a key with hint s hammers
    * one reducer with s partitions of work, so salting it by s levels
    * the stage. One keyed agg + a single-row broadcast — runs on the
    * full corpus, output is topN rows. */
  def skewProfile(df: DataFrame, keyCol: String, topN: Int = 5,
                  partitions: Int = 32): DataFrame = {
    require(topN >= 1 && partitions >= 1)
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(total)
      .select(col(keyCol), col("n"),
        round(col("n") / col("__total"), 6).as("share"),
        greatest(lit(1), ceil(col("n") * partitions / col("__total")))
          .cast("int").as("salt_hint"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(topN)
  }

  /** Referential-integrity profile of a parent/child key pair — the
    * data-quality gate a pipeline runs before joining two corpus
    * tables (documents ↔ embeddings, orders ↔ lineitem): one row with
    * row/key counts per side, orphan child rows and keys (no matching
    * parent), childless parent keys, and duplicate parent keys (a
    * "primary key" that isn't). Each side collapses to its key
    * profile FIRST (map-side-combined aggregation), then ONE
    * full-outer join of the two key sets — the tables' rows are never
    * row-joined, so cost after the two aggs is O(distinct keys), not
    * O(rows), and no side needs to fit anywhere. */
  def integrityProfile(parent: DataFrame, child: DataFrame,
                       parentKey: String, childKey: String): DataFrame = {
    val p = parent.groupBy(col(parentKey).as("k")).agg(count(lit(1)).as("pc"))
    val c = child.groupBy(col(childKey).as("k")).agg(count(lit(1)).as("cc"))
    p.join(c, Seq("k"), "full_outer")
      .agg( // sums coalesce so two EMPTY tables profile as zeros, not nulls
        coalesce(sum(col("pc")), lit(0L)).as("parent_rows"),
        coalesce(sum(col("cc")), lit(0L)).as("child_rows"),
        count(col("pc")).as("parent_keys"),
        count(col("cc")).as("child_keys"),
        coalesce(sum(when(col("pc").isNull, col("cc")).otherwise(0L)), lit(0L))
          .as("orphan_child_rows"),
        count(when(col("pc").isNull, lit(1))).as("orphan_child_keys"),
        count(when(col("pc").isNotNull && col("cc").isNull, lit(1)))
          .as("childless_parent_keys"),
        count(when(col("pc") > 1, lit(1))).as("dup_parent_keys"))
  }

  /** Bloom-prefiltered equi-join: build a Bloom filter over the dim
    * side's join keys (distributed treeAggregate; only the sketch —
    * KBs to a few MB — reaches the driver), then filter the big side
    * with a codegen'd `might_contain` BEFORE its shuffle, then run the
    * plain equi-join. With a selective dim side this drops most of the
    * big side's shuffle I/O — the manual form of the runtime filter
    * Spark injects when statistics allow, for when they don't (freshly
    * computed dims, non-catalog sources). Bloom filters have no false
    * negatives and the join re-checks survivors, so the result is
    * EXACTLY the plain join (q90's oracle). Keys are hashed to 64 bits
    * on both sides (xxhash64) so any key type works and the filter
    * stores fixed-width longs; `expectedItems` should bound the dim
    * side's distinct keys — oversizing costs bits, undersizing costs
    * false-positive rate (never correctness). */
  def bloomPrefilteredJoin(big: DataFrame, dim: DataFrame, bigKeyCol: String,
                           dimKeyCol: String, expectedItems: Long = 1000000L,
                           fpp: Double = 0.03,
                           joinType: String = "inner"): DataFrame = {
    import org.apache.spark.sql.GraftExprBridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val bf = dim.stat.bloomFilter(xxhash64(col(dimKeyCol)), expectedItems, fpp)
    val bytes = {
      val os = new java.io.ByteArrayOutputStream()
      bf.writeTo(os)
      os.toByteArray
    }
    val mightContain = GraftExprBridge.column(BloomFilterMightContain(
      GraftExprBridge.expression(lit(bytes)),
      GraftExprBridge.expression(xxhash64(col(bigKeyCol)))))
    big.filter(mightContain).join(dim, col(bigKeyCol) === col(dimKeyCol), joinType)
  }

  /** Banded range join of a fact frame against a SMALL bands dimension
    * (lo ≤ value < hi): broadcast-nested-loop with the tiny side
    * broadcast — each fact row scans a handful of in-memory bands, the
    * fact table never shuffles. For two LARGE range sides, bucket the
    * range key and equi-join on the bucket instead. */
  def bandedRange(facts: DataFrame, bands: DataFrame, valueCol: String,
                  loCol: String = "lo", hiCol: String = "hi"): DataFrame =
    facts.join(broadcast(bands),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))

  /** Interval-OVERLAP join of two LARGE interval sets — the case
    * [[bandedRange]]'s broadcast shape cannot take (sessions ×
    * campaign windows, genomic ranges, validity periods): closed
    * intervals [lStart, lEnd] and [rStart, rEnd] pair when
    * lStart ≤ rEnd AND rStart ≤ lEnd. A naive inequality join is a
    * product; here both sides explode to fixed-width bucket ids
    * covering their interval and pair on a bucket EQUI-join, so cost
    * is ∝ true overlap density, and both sides shuffle ONLY on the
    * bucket key — the two-big-sides range pattern.
    *
    * Duplicate-free by construction, not by distinct: a pair whose
    * intervals share several buckets is emitted only in the bucket
    * containing max(lStart, rStart) — the overlap's first bucket — so
    * no corpus-sized dedup pass exists. Malformed rows (end < start)
    * are dropped before bucketing (a hostile end would otherwise
    * explode a descending bucket sequence). `bucketWidth` trades
    * explode factor (long intervals ÷ width) against join selectivity
    * (collisions per bucket); set it near the typical interval
    * length. Column names must be disjoint across the two frames —
    * both sides' columns survive into the output. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val collide = left.columns.toSet.intersect(right.columns.toSet)
    require(collide.isEmpty,
      s"left/right column names must be disjoint, both collide on: $collide")
    def bucketOf(c: Column): Column =
      floor(c.cast("double") / lit(bucketWidth.toDouble)).cast("long")
    val lb = left.filter(col(lEnd) >= col(lStart))
      .withColumn("__lb", explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))))
    val rb = right.filter(col(rEnd) >= col(rStart))
      .withColumn("__rb", explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))))
    lb.join(rb,
        col("__lb") === col("__rb") &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          col("__lb") === bucketOf(greatest(col(lStart), col(rStart))))
      .drop("__lb", "__rb")
  }
}
