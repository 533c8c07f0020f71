package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Similarity
import graft.functions.MomentAggregators

/** Covariance aggregation (Welford/Chan mergeable co-moments), the
  * cyclic-Jacobi eigensolver, and PCA whitening end-to-end. */
class PcaSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9) =
    math.abs(a - b) <= tol

  test("CovarianceAgg matches the brute-force covariance, any partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)(Array.fill(3)(rnd.nextFloat() * 4f - 2f))
    def brute(k: Int, l: Int): Double = {
      val mk = rows.map(_(k).toDouble).sum / rows.size
      val ml = rows.map(_(l).toDouble).sum / rows.size
      rows.map(r => (r(k) - mk) * (r(l) - ml)).sum / rows.size
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.map(r => Tuple1(r.toSeq)).toDF("v").repartition(parts)
      val agg = udaf(new MomentAggregators.CovarianceAgg(3),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
      val st = df.agg(agg(col("v")).as("s"))
        .select(col("s.n"), col("s.mean"), col("s.m2")).collect()(0)
      val cov = MomentAggregators.covarianceMatrix(MomentAggregators.CovStats(
        st.getAs[Long](0), st.getSeq[Double](1).toSeq, st.getSeq[Double](2).toSeq))
      assert(st.getAs[Long](0) == 500L)
      for (k <- 0 until 3; l <- 0 until 3)
        assert(approx(cov(k)(l), brute(k, l), 1e-10),
          s"cov($k)($l) ${cov(k)(l)} != brute ${brute(k, l)} at $parts parts")
    }
  }

  test("symmetricEigen recovers a known eigensystem, sorted desc, sign-fixed") {
    // A = diag(5, 2) rotated by 30°: eigenvalues exactly 5 and 2
    val c = math.cos(math.Pi / 6); val s = math.sin(math.Pi / 6)
    val m = Array(
      Array(5 * c * c + 2 * s * s, (5 - 2) * c * s),
      Array((5 - 2) * c * s, 5 * s * s + 2 * c * c))
    val (vals, vecs) = MomentAggregators.symmetricEigen(m)
    assert(approx(vals(0), 5.0, 1e-12) && approx(vals(1), 2.0, 1e-12))
    // eigenvector of 5 is (cos30, sin30), largest component positive
    assert(approx(math.abs(vecs(0)(0)), c, 1e-12))
    assert(approx(math.abs(vecs(0)(1)), s, 1e-12))
    assert(vecs(0)(0) > 0 && vecs(1).map(math.abs).max ==
      vecs(1).map(math.abs).zipWithIndex.maxBy(_._1)._1)
    // orthonormal
    val dp = vecs(0).zip(vecs(1)).map { case (a, b) => a * b }.sum
    assert(approx(dp, 0.0, 1e-12))
  }

  test("whitenEmbeddings decorrelates: whitened covariance is the identity") {
    val rnd = new scala.util.Random(11)
    // correlated 4-dim data: x2 = x1 + noise, x3 independent, x4 scaled
    val rows = Seq.fill(800) {
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      val cc = rnd.nextGaussian(); val dd = rnd.nextGaussian()
      Seq(a.toFloat, (a + 0.1 * b).toFloat, cc.toFloat, (3 * dd).toFloat)
    }
    val df = rows.zipWithIndex.map { case (r, i) => (i.toLong, r) }
      .toDF("vec_id", "embedding")
    val model = Similarity.fitPcaWhitening(df, components = 4)
    assert(model.n == 800L && model.dim == 4)
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    val wh = Similarity.whitenEmbeddings(df, model)
    val aggD = udaf(new MomentAggregators.CovarianceAggDouble(4),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    val st = wh.agg(aggD(col("whitened")).as("s"))
      .select(col("s.n"), col("s.mean"), col("s.m2")).collect()(0)
    val cov = MomentAggregators.covarianceMatrix(MomentAggregators.CovStats(
      st.getAs[Long](0), st.getSeq[Double](1).toSeq, st.getSeq[Double](2).toSeq))
    for (k <- 0 until 4; l <- 0 until 4)
      assert(approx(cov(k)(l), if (k == l) 1.0 else 0.0, 1e-3),
        s"whitened cov($k)($l) = ${cov(k)(l)}")
    assert(st.getSeq[Double](1).forall(m => math.abs(m) < 1e-8),
      "whitened means must be ~0")
  }

  test("whitening model save/load/refit/vacuum: versioned atomic lifecycle") {
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 2f)), (3L, Seq(2f, 1f)),
      (4L, Seq(3f, 4f))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-pca-spec").toString
    val m1 = Similarity.fitPcaWhitening(df, components = 2)
    Similarity.savePcaWhitening(spark, m1, dir)
    val loaded = Similarity.loadPcaWhitening(spark, dir)
    assert(loaded.dim == m1.dim && loaded.components == m1.components &&
      loaded.n == m1.n && loaded.eps == m1.eps)
    assert(loaded.mean.toSeq == m1.mean.toSeq)
    assert(loaded.eigenvalues.toSeq == m1.eigenvalues.toSeq)
    assert(loaded.basis.map(_.toSeq).toSeq == m1.basis.map(_.toSeq).toSeq)
    // loaded model whitens identically to the in-memory one
    val a = Similarity.whitenEmbeddings(df, m1).select("whitened").collect()
      .map(_.getSeq[Double](0))
    val b = Similarity.whitenEmbeddings(df, loaded).select("whitened").collect()
      .map(_.getSeq[Double](0))
    assert(a.zip(b).forall { case (x, y) => x == y })
    // refit on more data publishes v2; vacuum drops v1
    val m2 = Similarity.fitPcaWhitening(
      df.union(Seq((5L, Seq(9f, 9f))).toDF("vec_id", "embedding")),
      components = 1)
    Similarity.savePcaWhitening(spark, m2, dir)
    assert(Similarity.loadPcaWhitening(spark, dir).n == 5L)
    assert(Similarity.vacuumPcaWhitening(spark, dir) == Seq("v1"))
    assert(Similarity.loadPcaWhitening(spark, dir).components == 1)
  }

  test("appendToPcaWhitening: incremental refit == full refit, batch-only scan") {
    val rnd = new scala.util.Random(23)
    val all = Seq.fill(600)(Seq.fill(3)((rnd.nextGaussian() * 2).toFloat))
    val (half1, half2) = all.splitAt(350)
    def df(rows: Seq[Seq[Float]]) = rows.zipWithIndex
      .map { case (r, i) => (i.toLong, r) }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-pca-inc").toString
    Similarity.savePcaWhitening(spark,
      Similarity.fitPcaWhitening(df(half1), components = 3), dir)
    val inc = Similarity.appendToPcaWhitening(spark, df(half2), dir)
    val full = Similarity.fitPcaWhitening(df(all), components = 3)
    assert(inc.n == 600L && full.n == 600L)
    // merge order differs from the one-pass plan, so equality is to
    // floating tolerance, not bit-exact
    inc.eigenvalues.zip(full.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"eig $a vs $b") }
    inc.mean.zip(full.mean).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12) }
    // the published version is the merged one
    assert(Similarity.loadPcaWhitening(spark, dir).n == 600L)
  }

  test("fitPcaWhitening skips nulls and rejects bad component counts") {
    val df = Seq((1L, Some(Seq(1f, 2f))), (2L, None), (3L, Some(Seq(3f, 5f))))
      .toDF("vec_id", "embedding")
    val m = Similarity.fitPcaWhitening(df, components = 1)
    assert(m.n == 2L && m.dim == 2 && m.components == 1)
    intercept[IllegalArgumentException] {
      Similarity.fitPcaWhitening(df, components = 3)
    }
    // top-1 whitening emits length-1 arrays
    val wh = Similarity.whitenEmbeddings(df.filter(col("embedding").isNotNull), m)
    assert(wh.select(size(col("whitened"))).as[Int].collect().forall(_ == 1))
  }
}
