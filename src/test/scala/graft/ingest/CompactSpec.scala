package graft.ingest

import java.nio.file.Files

import graft.TestSpark
import graft.core.Tables
import org.scalatest.funsuite.AnyFunSuite

/** The compaction half of the commit protocol: rewrites are published
  * as superseding commits, the marker content swap is the atomic
  * point, concurrent commits survive, vacuum only touches superseded
  * files. */
class CompactSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft-compact").toString

  private def cfg(dir: String) =
    IngestConfig(outputPath = Some(dir), parallelism = 2, buckets = 2)

  private def batch(n: Int) =
    spark.range(0, n, 1, 2).selectExpr("id as value", "cast(0 as int) as __pid")

  private def dataFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.startsWith("b") && !f.getPath.contains("/_")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
  }

  test("compact merges committed batches into one file per partition dir") {
    val dir = tmp()
    (0 until 4).foreach(i => Ingest.commitBatch(cfg(dir), dir, batch(500), i))
    val before = Tables.committedView(spark, dir).count()
    assert(before == 2000 && dataFiles(dir).size >= 8, "4 batches x 2 buckets")
    val res = Compact.compact(spark, dir).get
    assert(res.rows == 2000 && res.filesBefore >= 8 && res.filesAfter == 1)
    assert(Tables.committedView(spark, dir).count() == 2000,
      "compaction must not change the committed row set")
    // superseded files still on disk until vacuum, but invisible
    val view = Tables.committedView(spark, dir)
    import org.apache.spark.sql.functions.input_file_name
    val readFrom = view.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(readFrom.length == 1 && readFrom.head.contains(s"b${res.token}-"),
      "the view must read only the compacted file")
  }

  test("a commit landing after the snapshot survives compaction; compactions chain") {
    val dir = tmp()
    (0 until 3).foreach(i => Ingest.commitBatch(cfg(dir), dir, batch(300), i))
    val first = Compact.compact(spark, dir).get
    // a batch committed AFTER the compaction stays live alongside it
    Ingest.commitBatch(cfg(dir), dir, batch(111), 99)
    assert(Tables.committedView(spark, dir).count() == 900 + 111)
    // the second compaction supersedes both the first's token and the
    // late batch
    val second = Compact.compact(spark, dir).get
    assert(second.rows == 1011 && second.token != first.token)
    assert(Tables.committedView(spark, dir).count() == 1011)
    // vacuum drops every superseded file; the view is unchanged and
    // now equals the plain directory read (nothing stale left)
    val deleted = Compact.vacuum(spark, dir)
    assert(deleted > 0)
    assert(Tables.committedView(spark, dir).count() == 1011)
    assert(spark.read.orc(dir).count() == 1011,
      "after vacuum the plain reader agrees with the committed view")
    assert(Compact.vacuum(spark, dir) == 0, "vacuum is idempotent")
  }

  test("committedViewAsOf reconstructs earlier snapshots until vacuum destroys them") {
    val dir = tmp()
    (0 until 3).foreach(i => Ingest.commitBatch(cfg(dir), dir, batch(100 * (i + 1)), i))
    // snapshots at each batch boundary: 100, 100+200, 100+200+300
    assert(Tables.committedViewAsOf(spark, dir, 0).count() == 100)
    assert(Tables.committedViewAsOf(spark, dir, 1).count() == 300)
    assert(Tables.committedViewAsOf(spark, dir, 2).count() == 600)
    // beyond-head pins to head; before-first is empty but typed
    assert(Tables.committedViewAsOf(spark, dir, 99).count() == 600)
    // (commitBatch generates the event schema from the input row index)
    val pre = Tables.committedViewAsOf(spark, dir, -1)
    assert(pre.isEmpty && pre.columns.contains("user_id"))
    // compaction leaves the originals on disk — history still readable
    Compact.compact(spark, dir).get
    assert(Tables.committedViewAsOf(spark, dir, 1).count() == 300,
      "snapshots must survive compaction until vacuum")
    assert(Tables.committedView(spark, dir).count() == 600)
    // vacuum destroys the superseded originals: the snapshot fails
    // LOUDLY instead of returning a silently partial table
    Compact.vacuum(spark, dir)
    val e = intercept[IllegalStateException] {
      Tables.committedViewAsOf(spark, dir, 1)
    }
    assert(e.getMessage.contains("vacuum"))
    assert(Tables.committedView(spark, dir).count() == 600,
      "the head view is unaffected by lost history")
  }

  test("committedViewDelta reads exactly the batches between two snapshots") {
    val dir = tmp()
    (0 until 3).foreach(i => Ingest.commitBatch(cfg(dir), dir, batch(100 * (i + 1)), i))
    // delta (0, 2] = batches 1 and 2 = 200 + 300 rows — and it must
    // read ONLY those batches' files (O(delta), not O(snapshot))
    val delta = Tables.committedViewDelta(spark, dir, 0, 2)
    assert(delta.count() == 500)
    import org.apache.spark.sql.functions.input_file_name
    val readFrom = delta.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(readFrom.forall(f => f.contains("/b1-") || f.contains("/b2-")),
      s"delta must touch only batch 1/2 files, read: ${readFrom.mkString(", ")}")
    // boundary semantics: (from, to] — empty and full windows
    assert(Tables.committedViewDelta(spark, dir, 2, 2).isEmpty)
    assert(Tables.committedViewDelta(spark, dir, -1, 2).count() == 600)
    assert(Tables.committedViewDelta(spark, dir, 1, 99).count() == 300,
      "beyond-head upper bound pins to head")
    intercept[IllegalArgumentException] {
      Tables.committedViewDelta(spark, dir, 3, 1)
    }
    // diff IS the set difference of the two snapshots (append-only log)
    val viaExcept = Tables.committedViewAsOf(spark, dir, 2)
      .exceptAll(Tables.committedViewAsOf(spark, dir, 0))
    assert(delta.exceptAll(viaExcept).isEmpty && viaExcept.exceptAll(delta).isEmpty)
    // compaction leaves originals: delta still readable; vacuum kills it
    Compact.compact(spark, dir).get
    assert(Tables.committedViewDelta(spark, dir, 0, 2).count() == 500)
    Compact.vacuum(spark, dir)
    val e = intercept[IllegalStateException] {
      Tables.committedViewDelta(spark, dir, 0, 2)
    }
    assert(e.getMessage.contains("delta (0, 2]"))
  }

  test("a crashed compaction is invisible and scrubbed by the next run") {
    val dir = tmp()
    (0 until 2).foreach(i => Ingest.commitBatch(cfg(dir), dir, batch(200), i))
    // crash model: compacted files published, marker never written
    val orphanDir = new java.io.File(dir, "year=2018/month=0")
    val donor = orphanDir.listFiles().filter(_.getName.startsWith("b")).head
    val orphan = new java.io.File(orphanDir, "bc111-crashed.orc")
    Files.copy(donor.toPath, orphan.toPath)
    assert(Tables.committedView(spark, dir).count() == 400,
      "unmarked compaction files must stay invisible")
    val res = Compact.compact(spark, dir).get
    assert(!orphan.exists, "the next compaction scrubs the crashed leftovers")
    assert(res.rows == 400 && Tables.committedView(spark, dir).count() == 400)
  }
}
