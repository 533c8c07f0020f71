package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Layout

/** Z-ordered layout: the Morton code interleaves correctly, the write
  * preserves rows, and — the property the whole feature exists for —
  * EVERY z column's per-file value span collapses versus a linear
  * sort, where only the leading column clusters. */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("withZValue interleaves bucketed bits (closed-form cases)") {
    val s = spark
    import s.implicits._
    // two columns spanning [0, 255] at 8 bits: bucket == value, so the
    // z-value is the classic Morton interleave of (x, y)
    val df = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L), (3L, 5L))
      .toDF("x", "y")
      .union(Seq((0L, 0L)).toDF("x", "y").limit(0))
    // pin the bucket domain: add the extremes so min/max = (0, 255)
    val z = Layout.withZValue(df, Seq("x", "y"), bits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    assert(z((0L, 0L)) == 0L)
    assert(z((255L, 255L)) == morton(255, 255))
    assert(z((3L, 5L)) == morton(3, 5))
    assert(z((255L, 0L)) == morton(255, 0) && z((0L, 255L)) == morton(0, 255))
  }

  test("zorderWrite clusters EVERY z column; linear sort only the leading one") {
    val s = spark
    import s.implicits._
    // two independent uniform dims — the case where a linear sort
    // cannot help the second column at all
    val n = 20000
    val rows = (0 until n).map { i =>
      val h1 = graft.functions.expr.TextHash.splitmix64(i)
      val h2 = graft.functions.expr.TextHash.splitmix64(i + 1000000)
      (math.floorMod(h1, 10000L), math.floorMod(h2, 10000L))
    }.toDF("a", "b")
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft-lin").toString
    Layout.zorderWrite(rows, zDir, Seq("a", "b"), numFiles = 16)
    rows.repartitionByRange(16, org.apache.spark.sql.functions.col("a"))
      .sortWithinPartitions("a")
      .write.mode("overwrite").parquet(linDir)

    // rows preserved exactly
    assert(spark.read.parquet(zDir).count() == n)
    val back = spark.read.parquet(zDir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back == rows.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    def factors(dir: String) = Layout.clusteringFactor(spark, dir, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val zf = factors(zDir)
    val lf = factors(linDir)
    // linear: a clusters hard, b not at all
    assert(lf("a") < 0.2, s"linear sort must cluster its leading column: ${lf("a")}")
    assert(lf("b") > 0.8, s"linear sort cannot cluster the second column: ${lf("b")}")
    // z-order: BOTH dimensions cluster (16 files ~ 4x4 grid -> ~0.25
    // spans plus bucket quantization slack)
    assert(zf("a") < 0.5 && zf("b") < 0.5,
      s"z-order must cluster both: a=${zf("a")}, b=${zf("b")}")
  }

  test("shardedExport: pure-function membership, manifest attests the files") {
    val s = spark
    import s.implicits._
    val df = (0L until 200L).map(i => (i, s"doc $i")).toDF("id", "body")
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val manifest = Layout.shardedExport(df, "id", 4, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(manifest.keySet == Set(0L, 1L, 2L, 3L))
    assert(manifest.values.map(_._1).sum == 200L, "every row in exactly one shard")
    // membership is a pure function of the id: the written shard dirs
    // must agree with shardOf recomputed on the read-back rows
    val back = spark.read.parquet(dir)
    assert(back.filter(col("shard") =!=
      Layout.shardOf(col("id"), 4)).isEmpty, "disk shard == derived shard")
    // one file per shard: the export is the training-job handoff unit
    val files = back.select(input_file_name()).distinct().count()
    assert(files == 4L, s"expected 4 shard files, got $files")
    // manifest detects a substituted row: recompute on a tampered frame
    val tampered = df.withColumn("id",
      when(col("id") === 7L, lit(9999L)).otherwise(col("id")))
    val m2 = Layout.shardedExport(tampered, "id", 4,
      java.nio.file.Files.createTempDirectory("graft-shards2").toString)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m2 != manifest, "checksum must change when an id changes")
    // a column name needing quoting must survive the manifest path
    val spaced = df.withColumnRenamed("id", "user id")
    val m3 = Layout.shardedExport(spaced, "user id", 4,
      java.nio.file.Files.createTempDirectory("graft-shards3").toString)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m3 == manifest, "same ids under a quoted name, same manifest")
  }

  test("skew degrades z-order bucketing gracefully, rows never lost") {
    val s = spark
    import s.implicits._
    // one massively skewed column (99% a single value) + one uniform
    val rows = (0 until 5000).map { i =>
      val a = if (i % 100 == 0) i.toLong else 7L
      (a, (i % 997).toLong)
    }.toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft-zskew").toString
    Layout.zorderWrite(rows, dir, Seq("a", "b"), numFiles = 8)
    assert(spark.read.parquet(dir).count() == 5000)
  }
}
