package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Profiling
import graft.functions.FreqAggregators

/** Frequent-items sketch lifecycle: exactness when the key space fits
  * the map, and the one-sided guarantees (coverage above max error,
  * bounds bracketing) under genuine purge pressure — the properties
  * that hold regardless of insertion order. */
class FreqSketchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("vocab fits the map: merged sketch is exact, all items reported") {
    val rows = (1 to 300).map(i => (s"g${i % 3}", s"k${i % 10}"))
      .toDF("grp", "key")
    val sketches = Profiling.frequencySketches(rows, Seq("grp"), "key",
      maxMapSize = 64)
    assert(sketches.count() == 3)
    val hh = Profiling.estimateHeavyHitters(sketches, Seq.empty,
      maxMapSize = 64).collect()
    assert(hh.length == 10)
    assert(hh.forall(_.getAs[Long]("max_error") == 0L))
    assert(hh.forall(r => r.getAs[Long]("estimate") == 30L))
    assert(hh.forall(_.getAs[Long]("stream_length") == 300L))
  }

  test("purge pressure: heavy item guaranteed reported, bounds always bracket") {
    // one dominant key in a sea of uniques: 4000 tail keys overflow a
    // 64-entry map, so purges happen and max_error > 0; the sketch's
    // one-sided contract must still hold
    val heavy = Seq.fill(2000)("hot")
    val tail = (1 to 4000).map(i => s"tail$i")
    val rows = (heavy ++ tail).zipWithIndex
      .map { case (k, i) => (s"g${i % 4}", k) }.toDF("grp", "key")
    val sketches = Profiling.frequencySketches(rows, Seq("grp"), "key",
      maxMapSize = 64)
    val hh = Profiling.estimateHeavyHitters(sketches, Seq.empty,
      maxMapSize = 64).collect()
    val err = hh.head.getAs[Long]("max_error")
    assert(err > 0L, "4000 uniques through a 64-entry map must purge")
    val hot = hh.find(_.getAs[String]("item") == "hot")
    assert(hot.isDefined, "2000 > max_error, NO_FALSE_NEGATIVES guarantees it")
    assert(hot.get.getAs[Long]("lower_bound") <= 2000L &&
      2000L <= hot.get.getAs[Long]("upper_bound"))
    // every reported item's bounds bracket its exact count
    val exact = (heavy ++ tail).groupBy(identity).view.mapValues(_.size.toLong).toMap
    hh.foreach { r =>
      val e = exact(r.getAs[String]("item"))
      assert(r.getAs[Long]("lower_bound") <= e &&
        e <= r.getAs[Long]("upper_bound"),
        s"bounds miss exact for ${r.getAs[String]("item")}")
    }
    assert(hh.head.getAs[Long]("stream_length") == 6000L)
  }

  test("serialized round-trip preserves guarantees (parquet binary column)") {
    val rows = (1 to 500).map(i => ("g", if (i <= 400) "dominant" else s"u$i"))
      .toDF("grp", "key")
    val dir = java.nio.file.Files.createTempDirectory("graft-freq-spec").toString
    Profiling.frequencySketches(rows, Seq("grp"), "key", maxMapSize = 32)
      .write.mode("overwrite").parquet(dir)
    val hh = Profiling.estimateHeavyHitters(spark.read.parquet(dir),
      Seq("grp"), maxMapSize = 32).collect()
    val dom = hh.find(_.getAs[String]("item") == "dominant").get
    assert(dom.getAs[Long]("lower_bound") <= 400L &&
      400L <= dom.getAs[Long]("upper_bound"))
    assert(dom.getAs[String]("grp") == "g")
  }

  test("null keys are skipped like the HLL/KLL tables") {
    val rows = Seq(("g", "a"), ("g", null), ("g", "a")).toDF("grp", "key")
    val hh = Profiling.estimateHeavyHitters(
      Profiling.frequencySketches(rows, Seq("grp"), "key", maxMapSize = 8),
      Seq.empty, maxMapSize = 8).collect()
    assert(hh.map(_.getAs[String]("item")).toSet == Set("a"))
    assert(hh.head.getAs[Long]("stream_length") == 2L)
  }

  test("FreqSketchAgg rejects non-power-of-2 map sizes") {
    intercept[IllegalArgumentException] {
      new FreqAggregators.FreqSketchAgg(100)
    }
  }
}
