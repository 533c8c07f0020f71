package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Similarity

/** Persistent-index lifecycle: drift profiling after frozen-quantizer
  * appends, atomic versioned reindex, post-reindex routing of searches
  * and appends, and version vacuum. */
class IndexLifecycleSpec extends AnyFunSuite {
  import TestSpark._

  private def freshIndex(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lifecycle").toString
    val emb = graft.core.Tables.embeddings(spark, sf)
    Similarity.buildIvfIndex(emb, dir)
    (dir, emb)
  }

  /** A hot blob: `n` jittered near-duplicates of one direction — all
    * land in one cell under the build-time quantizer, but are
    * separable once the quantizer refits. */
  private def hotBlob(emb: org.apache.spark.sql.DataFrame, n: Int) = {
    import org.apache.spark.sql.functions._
    val base = emb.orderBy("vec_id").limit(1)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      val v = base.clone()
      v(i % v.length) = v(i % v.length) + 0.05f * ((i % 7) + 1)
      (1000000L + i, v)
    }.toDF("vec_id", "embedding")
  }

  test("ivfDriftProfile: shares sum to 1; skewed appends spike occupancy and error") {
    val (dir, emb) = freshIndex()
    val before = Similarity.ivfDriftProfile(spark, dir).collect()
    assert(math.abs(before.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
    val total = before.map(_.getAs[Long]("n")).sum
    assert(total == emb.count())

    Similarity.appendToIvfIndex(hotBlob(emb, 300), dir)
    val after = Similarity.ivfDriftProfile(spark, dir).collect()
    assert(after.map(_.getAs[Long]("n")).sum == total + 300)
    val maxBefore = before.map(_.getAs[Double]("occupancy")).max
    val maxAfter = after.map(_.getAs[Double]("occupancy")).max
    assert(maxAfter > maxBefore,
      f"hot-blob append must skew occupancy: $maxAfter%.3f <= $maxBefore%.3f")
  }

  test("reindex swaps to a new version atomically; searches and appends follow it") {
    val (dir, emb) = freshIndex()
    Similarity.appendToIvfIndex(hotBlob(emb, 300), dir)
    val skewed = Similarity.ivfDriftProfile(spark, dir).collect()

    val v = Similarity.reindex(spark, dir)
    assert(v == "v1")
    assert(new java.io.File(dir, "_current").exists())
    assert(Similarity.resolveIndexRoot(spark, dir) == s"$dir/v1")
    // old layout untouched until vacuum — in-flight readers stay valid
    assert(new java.io.File(dir, "centroids").exists())

    // every vector survived the rebuild, and the refit quantizer models
    // the hot blob: occupancy skew drops
    val re = Similarity.ivfDriftProfile(spark, dir).collect()
    assert(re.map(_.getAs[Long]("n")).sum == skewed.map(_.getAs[Long]("n")).sum)
    val skewMax = skewed.map(_.getAs[Double]("occupancy")).max
    val reMax = re.map(_.getAs[Double]("occupancy")).max
    assert(reMax < skewMax,
      f"reindex must level occupancy: $reMax%.3f >= $skewMax%.3f")

    // searches resolve the new version and stay sane
    val got = Similarity.ivfSearchIndex(spark, dir, emb.limit(5), k = 3, nprobe = 2)
    assert(got.count() > 0)

    // appends now land in the new version's tree
    Similarity.appendToIvfIndex(hotBlob(emb, 10), dir)
    val v1Total = Similarity.ivfDriftProfile(spark, dir).collect()
      .map(_.getAs[Long]("n")).sum
    assert(v1Total == re.map(_.getAs[Long]("n")).sum + 10)

    // a second reindex chains to v2
    assert(Similarity.reindex(spark, dir) == "v2")
    assert(Similarity.resolveIndexRoot(spark, dir) == s"$dir/v2")

    // vacuum drops v1 + the legacy root halves, keeps v2
    val deleted = Similarity.vacuumIndexVersions(spark, dir)
    assert(deleted.contains("v1") && deleted.contains("centroids") &&
      deleted.contains("vectors") && !deleted.contains("v2"))
    assert(Similarity.ivfSearchIndex(spark, dir, emb.limit(3), k = 3, nprobe = 2)
      .count() > 0, "search must survive vacuum")
  }

  test("reindex of an IVF+PQ index refits codebooks and preserves m/ksub") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lifecycle-pq").toString
    val emb = graft.core.Tables.embeddings(spark, sf)
    Similarity.buildIvfPqIndex(emb, dir, m = 8, ksub = 8)
    Similarity.appendToIvfPqIndex(hotBlob(emb, 100), dir)
    assert(Similarity.reindex(spark, dir) == "v1")
    // the rebuilt version carries both halves of the index
    assert(new java.io.File(s"$dir/v1/codebooks").exists())
    assert(new java.io.File(s"$dir/v1/codes").exists())
    val cb = spark.read.parquet(s"$dir/v1/codebooks")
    import org.apache.spark.sql.functions._
    val dims = cb.agg(countDistinct("subspace"), countDistinct("codeword"))
      .collect().head
    assert(dims.getLong(0) == 8 && dims.getLong(1) == 8)
    val got = Similarity.ivfPqSearchIndex(spark, dir, emb.limit(5),
      k = 3, nprobe = 2, rescoreDepth = 9)
    assert(got.count() > 0)
  }
}
