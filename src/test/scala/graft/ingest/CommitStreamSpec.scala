package graft.ingest

import java.nio.file.Files

import graft.TestSpark
import graft.streaming.CommitLogStream
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

/** Incremental commit-log consumption (CommitLogStream): each newly
  * landed commit marker is delivered exactly once with a DataFrame over
  * exactly that batch's files; compactions are never re-delivered;
  * vacuumed history fails loudly instead of silently dropping rows. */
class CommitStreamSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-cstream").toString

  private def raw(from: Long, until: Long) =
    spark.range(from, until, 1, 2)
      .selectExpr("id as value", "cast(0 as int) as __pid")

  test("foreachCommit delivers each committed batch once, in marker order") {
    val dir = tmp()
    val cfg = IngestConfig(outputPath = Some(dir), parallelism = 2, buckets = 2)
    assert(Ingest.commitBatch(cfg, dir, raw(0, 1000), batchId = 1) == 1000)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Seq[String], Long)]()
    val q = CommitLogStream.foreachCommit(spark, dir, tmp()) { (rows, toks, _) =>
      seen.add((toks, rows.count()))
    }
    try {
      q.processAllAvailable()
      // batch 1 existed before the stream started — delivered on attach
      assert(seen.size == 1)
      assert(seen.peek() == (Seq("1"), 1000L))

      // a new commit lands while the stream runs
      assert(Ingest.commitBatch(cfg, dir, raw(1000, 1500), batchId = 2) == 500)
      q.processAllAvailable()
      assert(seen.size == 2)
      val delivered = seen.toArray(Array.empty[(Seq[String], Long)])
      assert(delivered.map(_._2).sum == 1500)
      assert(delivered.flatMap(_._1).toSet == Set("1", "2"))

      // nothing new -> nothing delivered
      q.processAllAvailable()
      assert(seen.size == 2)
    } finally q.stop()
  }

  test("delivered rows carry partition columns and match the committed view") {
    val dir = tmp()
    val cfg = IngestConfig(outputPath = Some(dir), parallelism = 2, buckets = 2)
    assert(Ingest.commitBatch(cfg, dir, raw(0, 800), batchId = 1) == 800)
    var cols: Array[String] = Array.empty
    var n = 0L
    val q = CommitLogStream.foreachCommit(spark, dir, tmp()) { (rows, _, _) =>
      cols = rows.columns; n += rows.count()
    }
    try {
      q.processAllAvailable()
      assert(cols.contains("year") && cols.contains("month"))
      assert(n == graft.core.Tables.committedView(spark, dir).count())
    } finally q.stop()
  }

  test("a compaction marker is not re-delivered; vacuumed history fails loudly") {
    val dir = tmp()
    val cfg = IngestConfig(outputPath = Some(dir), parallelism = 2, buckets = 2)
    assert(Ingest.commitBatch(cfg, dir, raw(0, 1000), batchId = 1) == 1000)
    assert(Ingest.commitBatch(cfg, dir, raw(1000, 1500), batchId = 2) == 500)

    // consumer A is attached BEFORE compaction and must see both
    // commits but never the compaction rewrite
    var total = 0L
    val a = CommitLogStream.foreachCommit(spark, dir, tmp()) { (rows, _, _) =>
      total += rows.count()
    }
    try {
      a.processAllAvailable()
      assert(total == 1500)
      Compact.compact(spark, dir)
      a.processAllAvailable()
      assert(total == 1500, "compaction rewrites must not be re-delivered")
    } finally a.stop()

    // consumer B attaches fresh AFTER compaction + vacuum: the original
    // batch files are gone, so replaying the log would lose rows — the
    // stream must fail loudly, not deliver empty batches
    Compact.vacuum(spark, dir)
    var bTotal = 0L
    val b = CommitLogStream.foreachCommit(spark, dir, tmp()) { (rows, _, _) =>
      bTotal += rows.count()
    }
    try {
      val e = intercept[StreamingQueryException] {
        b.processAllAvailable()
        b.awaitTermination(2000)
      }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(_.isInstanceOf[IllegalStateException]),
        s"expected IllegalStateException in cause chain, got: $e")
    } finally b.stop()
    assert(bTotal == 0L)
  }
}
