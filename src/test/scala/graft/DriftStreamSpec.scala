package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Profiling

/** Frozen-reference drift monitoring: the streaming ledger appends
  * exactly the frozen per-batch computation, batch ids intact, and
  * the frozen path equals the direct two-frame statistic on the
  * frames the reference was fit from. */
class DriftStreamSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("featureDriftStream ledger rows = featureDriftFrozen per batch") {
    val ref = (1 to 200).map(i => (i.toDouble % 10, i.toDouble % 3))
      .toDF("a", "b")
    val frozen = Profiling.fitDriftReference(ref, Seq("a", "b"), bins = 5)
    val b1 = (1 to 50).map(i => (i.toDouble % 10, i.toDouble % 3))
    val b2 = (1 to 80).map(i => (i.toDouble % 4 + 20.0, 0.0)) // shifted era
    val ledger = Files.createTempDirectory("graft-drift-ledger").toString
    val ckpt = Files.createTempDirectory("graft-drift-ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Double, Double)]
    val q = Profiling.featureDriftStream(
      ms.toDF().toDF("a", "b"), frozen, ledger, ckpt)
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(ledger).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("feature")) ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"), r.getAs[Double]("psi")))
      .toMap
    val want = Seq(0L -> b1, 1L -> b2).flatMap { case (id, rows) =>
      Profiling.featureDriftFrozen(rows.toDF("a", "b"), frozen).collect()
        .map(r => (id, r.getString(0)) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3)))
    }.toMap
    assert(got == want, s"ledger $got != per-batch frozen $want")
    // the planted era-2 shift (all mass clamped above reference range)
    // must alarm on feature a and on collapsed-constant feature b
    assert(got((1L, "a"))._3 > 1.0)
    // same batch vs frozen == direct two-frame computation
    val direct = Profiling.featureDrift(ref, b1.toDF("a", "b"),
      Seq("a", "b"), bins = 5).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(Seq("a", "b").forall(f => got((0L, f)) == direct(f)))
  }
}
