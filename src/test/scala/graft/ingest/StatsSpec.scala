package graft.ingest

import java.nio.file.Files

import graft.TestSpark
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-level stats manifests + reader-side skipping: pruning must be
  * provably safe (files without usable stats are read), exact (the
  * pruned result equals the unpruned filter), and effective (provably
  * disjoint files never enter the scan's file list — measured with
  * `df.inputFiles`, the pre-filter list). */
class StatsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-stats").toString

  /** Commit a frame through the marker protocol, unpartitioned, keeping
    * the source's file layout (range partitions = contiguous values). */
  private def commit(dir: String, from: Long, until: Long, parts: Int): Unit = {
    val df = spark.range(from, until, 1, parts)
      .select(col("id").as("k"), col("id").as("v"))
    Mutate.merge(spark, dir, df, Seq("k"), partitionCols = Seq.empty)
  }

  test("pruning scans only files whose range can match; result equals the unpruned filter") {
    val dir = tmp()
    commit(dir, 0, 1000, 4)    // token A: 4 files, 250-wide ranges
    commit(dir, 1000, 2000, 4) // token B: 4 files
    assert(Stats.refresh(spark, dir, Seq("v")) == 2, "one manifest per token")
    assert(Stats.refresh(spark, dir, Seq("v")) == 0, "refresh is incremental")
    val pruned = Stats.prunedCommittedView(spark, dir, "v", 100, 199)
    val oracle = Tables.committedView(spark, dir)
      .filter(col("v").between(100, 199))
    assert(pruned.exceptAll(oracle).isEmpty && oracle.exceptAll(pruned).isEmpty,
      "pruned result must equal the unpruned filter")
    assert(oracle.inputFiles.length == 8, "the unpruned scan lists every file")
    assert(pruned.inputFiles.length == 1,
      s"[100, 199] fits one 250-wide file; listed ${pruned.inputFiles.toSeq}")
    // a window spanning the token boundary keeps one file per side
    val span = Stats.prunedCommittedView(spark, dir, "v", 900, 1100)
    assert(span.count() == 201 && span.inputFiles.length == 2)
    // a disjoint window lists nothing and stays correctly typed
    val none = Stats.prunedCommittedView(spark, dir, "v", 5000, 6000)
    assert(none.isEmpty && none.columns.sameElements(Seq("k", "v")))
  }

  test("files without stats are never pruned; all-null columns are; string types never prune") {
    val dir = tmp()
    commit(dir, 0, 100, 1)
    // an all-null token: BETWEEN can't match NULL, so stats may skip it
    Mutate.merge(spark, dir,
      spark.range(100, 200, 1, 1)
        .select(col("id").as("k"), lit(null).cast("long").as("v")),
      Seq("k"), partitionCols = Seq.empty)
    assert(Stats.refresh(spark, dir, Seq("v", "k")) == 2)
    // a token committed AFTER the refresh has no manifest: must be read
    commit(dir, 200, 300, 1)
    val pruned = Stats.prunedCommittedView(spark, dir, "v", 0, 50)
    assert(pruned.count() == 51, "0..50 from the first token")
    assert(pruned.inputFiles.length == 2,
      "the unprofiled file is read (safety), the all-null file is skipped")
    // string column: lexicographic min/max of {"9", "10"} is ["10", "9"],
    // which parses numerically as the FALSE interval [10, 9] — the type
    // gate must keep the file so the lexicographic match "10" survives
    val strDir = tmp()
    Mutate.merge(spark, strDir,
      Seq(("a", "9"), ("b", "10")).toDF("k", "s").repartition(1),
      Seq("k"), partitionCols = Seq.empty)
    Stats.refresh(spark, strDir, Seq("s"))
    val sPruned = Stats.prunedCommittedView(spark, strDir, "s", "1", "2")
    val sOracle = Tables.committedView(spark, strDir)
      .filter(col("s").between("1", "2"))
    assert(sOracle.count() == 1, "lexicographically only \"10\" is in [1, 2]")
    assert(sPruned.exceptAll(sOracle).isEmpty && sOracle.exceptAll(sPruned).isEmpty,
      "a string column must never be pruned numerically")
  }

  test("manifests compose with mutation: rewrites get fresh tokens, safety then tightening") {
    val dir = tmp()
    commit(dir, 0, 1000, 4)
    assert(Stats.refresh(spark, dir, Seq("v")) == 1)
    // a mutation rewrites the token; its new files have NO manifest yet,
    // so they are read (safety), and the result is still exact
    Mutate.deleteWhere(spark, dir, col("v") === 500, partitionCols = Seq.empty)
    val afterMutate = Stats.prunedCommittedView(spark, dir, "v", 400, 600)
    assert(afterMutate.count() == 200, "400..600 minus the deleted 500")
    // refresh covers the rewrite; a fresh disjoint commit prunes away
    assert(Stats.refresh(spark, dir, Seq("v")) == 1)
    commit(dir, 1000, 2000, 2)
    assert(Stats.refresh(spark, dir, Seq("v")) == 1)
    val tight = Stats.prunedCommittedView(spark, dir, "v", 0, 10)
    assert(tight.count() == 11)
    val full = Tables.committedView(spark, dir)
    assert(tight.inputFiles.length < full.inputFiles.length,
      s"pruning must list fewer files (${tight.inputFiles.length}) than the " +
        s"full scan (${full.inputFiles.length})")
    // none of token B's files (values >= 1000) may be listed
    val tokenBFiles = Stats.prunedCommittedView(spark, dir, "v", 1500, 1500)
      .inputFiles.toSet
    assert(tight.inputFiles.toSet.intersect(tokenBFiles).isEmpty)
  }

  test("OPTIMIZE-ZORDER compaction gives a randomly-ingested table skipping post-hoc") {
    val dir = tmp()
    // two commits whose rows carry NO locality: x/y scattered by hash
    val scattered = spark.range(0, 4096)
      .selectExpr("id % 64 as x", "id div 64 as y", "id as k")
      .repartition(8) // round-robin: every file spans the full range
    Mutate.append(spark, dir, scattered, partitionCols = Seq.empty)
    assert(Stats.refresh(spark, dir, Seq("x")) == 1)
    val before = Stats.prunedCommittedView(spark, dir, "x", 0, 15)
    assert(before.count() == 1024 &&
      before.inputFiles.length == Tables.committedView(spark, dir).inputFiles.length,
      "no locality -> stats cannot skip anything")
    // compact with re-clustering; the fresh token needs a fresh manifest
    val res = Compact.compact(spark, dir, partitionCols = Seq.empty,
      zorderCols = Seq("x", "y"), zorderBits = 6, zorderFiles = 16).get
    assert(res.rows == 4096)
    assert(Stats.refresh(spark, dir, Seq("x", "y")) == 1)
    val px = Stats.prunedCommittedView(spark, dir, "x", 0, 15)
    val py = Stats.prunedCommittedView(spark, dir, "y", 0, 15)
    assert(px.count() == 1024 && py.count() == 1024, "still exact")
    val total = Tables.committedView(spark, dir).inputFiles.length
    assert(px.inputFiles.length <= total / 2 &&
      py.inputFiles.length <= total / 2,
      s"post-optimize skip: x ${px.inputFiles.length}, y " +
        s"${py.inputFiles.length} of $total")
  }

  test("a z-ordered commit skips files on EVERY z column") {
    val dir = tmp()
    // 64x64 uniform grid: both dimensions high-cardinality
    val grid = spark.range(0, 4096)
      .selectExpr("id % 64 as x", "id div 64 as y", "id as k")
    Mutate.appendZOrdered(spark, dir, grid, Seq("x", "y"),
      bits = 6, numFiles = 16)
    assert(Stats.refresh(spark, dir, Seq("x", "y")) == 1)
    val full = Tables.committedView(spark, dir)
    assert(full.inputFiles.length == 16 && full.count() == 4096)
    // a quarter-range predicate on EITHER dimension must skip at least
    // half the files (a linear sort would skip only on its leading
    // column — LayoutSpec proves that distinction; here the point is
    // the protocol-integrated loop: z-write -> manifest -> skip)
    val px = Stats.prunedCommittedView(spark, dir, "x", 0, 15)
    val py = Stats.prunedCommittedView(spark, dir, "y", 0, 15)
    assert(px.count() == 1024 && py.count() == 1024,
      "pruned results stay exact")
    assert(px.inputFiles.length <= 8 && py.inputFiles.length <= 8,
      s"x listed ${px.inputFiles.length}, y listed ${py.inputFiles.length} of 16")
    val ox = full.filter(col("x").between(0, 15))
    assert(px.exceptAll(ox).isEmpty && ox.exceptAll(px).isEmpty)
  }
}
