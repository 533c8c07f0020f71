package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distributed second-moment (covariance) accumulation for embedding
  * columns, plus a driver-side symmetric eigensolver — the two halves
  * of PCA whitening. The aggregator keeps numerically-stable CENTERED
  * co-moments (Welford update, Chan pairwise merge), never raw Σx·xᵀ:
  * raw moments cancel catastrophically once n grows past ~1e9 rows of
  * similar vectors, exactly the 100 TB regime. Buffer size is
  * d + d(d+1)/2 doubles (d=64 → ~17 KB) regardless of row count — one
  * map-side-combined pass over the corpus, a metadata-sized result on
  * the driver. */
object MomentAggregators {

  /** n, running mean[d], centered co-moment upper triangle
    * M2[d(d+1)/2] with M2_ij = Σ (x_i−μ_i)(x_j−μ_j); population
    * covariance = M2/n. */
  final case class CovBuf(var n: Long, mean: Array[Double], m2: Array[Double])

  final case class CovStats(n: Long, mean: Seq[Double], m2: Seq[Double])

  @inline private def tri(i: Int, j: Int): Int = // i <= j
    j * (j + 1) / 2 + i

  sealed abstract class CovarianceAggBase[T](dim: Int)(toD: T => Double)
      extends Aggregator[Seq[T], CovBuf, CovStats] {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    private val triN = dim * (dim + 1) / 2

    override def zero: CovBuf =
      CovBuf(0L, new Array[Double](dim), new Array[Double](triN))

    override def reduce(b: CovBuf, row: Seq[T]): CovBuf = {
      if (row == null) return b
      require(row.length == dim,
        s"embedding length ${row.length} != configured dim $dim")
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) { x(i) = toD(row(i)); i += 1 }
      b.n += 1
      val inv = 1.0 / b.n
      // Welford: dx uses the OLD mean, co-moment uses the NEW mean
      val dx = new Array[Double](dim)
      i = 0
      while (i < dim) { dx(i) = x(i) - b.mean(i); b.mean(i) += dx(i) * inv; i += 1 }
      var j = 0
      while (j < dim) {
        val dyj = x(j) - b.mean(j) // post-update residual
        var k = 0
        while (k <= j) { b.m2(tri(k, j)) += dx(k) * dyj; k += 1 }
        j += 1
      }
      b
    }

    override def merge(a: CovBuf, b: CovBuf): CovBuf = chanMerge(dim, a, b)

    override def finish(b: CovBuf): CovStats =
      CovStats(b.n, b.mean.toSeq, b.m2.toSeq)
    override def bufferEncoder: Encoder[CovBuf] = Encoders.kryo[CovBuf]
    override def outputEncoder: Encoder[CovStats] = ExpressionEncoder[CovStats]()
  }

  /** `array<float>` input (embedding columns). */
  final class CovarianceAgg(dim: Int)
      extends CovarianceAggBase[Float](dim)(_.toDouble)

  /** `array<double>` input (whitened/derived columns). */
  final class CovarianceAggDouble(dim: Int)
      extends CovarianceAggBase[Double](dim)(identity)

  /** Chan pairwise merge of two co-moment buffers (in place into `a`).
    * Exactly what executors run between partial buffers — exposed so a
    * PERSISTED stats record can merge with a fresh batch's without
    * re-scanning the rows behind it (incremental PCA refits). */
  private[graft] def chanMerge(dim: Int, a: CovBuf, b: CovBuf): CovBuf = {
    if (b.n == 0L) return a
    if (a.n == 0L) return b
    val n = a.n + b.n
    val fa = a.n.toDouble / n
    val fb = b.n.toDouble / n
    val scale = a.n.toDouble * b.n.toDouble / n
    val delta = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      delta(i) = b.mean(i) - a.mean(i)
      a.mean(i) = a.mean(i) * fa + b.mean(i) * fb
      i += 1
    }
    var j = 0
    while (j < dim) {
      var k = 0
      while (k <= j) {
        val t = tri(k, j)
        a.m2(t) += b.m2(t) + delta(k) * delta(j) * scale
        k += 1
      }
      j += 1
    }
    a.n = n
    a
  }

  /** [[chanMerge]] over immutable [[CovStats]] records. */
  def mergeStats(a: CovStats, b: CovStats): CovStats = {
    require(a.mean.length == b.mean.length,
      s"dim mismatch: ${a.mean.length} vs ${b.mean.length}")
    val buf = chanMerge(a.mean.length,
      CovBuf(a.n, a.mean.toArray, a.m2.toArray),
      CovBuf(b.n, b.mean.toArray, b.m2.toArray))
    CovStats(buf.n, buf.mean.toSeq, buf.m2.toSeq)
  }

  /** Expand a [[CovStats]] upper triangle into the full symmetric
    * population covariance matrix (M2 / n). */
  def covarianceMatrix(s: CovStats): Array[Array[Double]] = {
    val dim = s.mean.length
    require(s.n > 0, "covariance of an empty frame")
    val c = Array.ofDim[Double](dim, dim)
    val m2 = s.m2
    var j = 0
    while (j < dim) {
      var i = 0
      while (i <= j) {
        val v = m2(tri(i, j)) / s.n
        c(i)(j) = v; c(j)(i) = v
        i += 1
      }
      j += 1
    }
    c
  }

  /** Eigen-decomposition of a symmetric matrix by cyclic Jacobi
    * rotations — deterministic (fixed sweep order, fixed convergence
    * threshold), O(d³) per sweep, machine precision in ≤ ~12 sweeps
    * for d ≤ a few hundred (PCA whitening runs it ONCE on the driver
    * over a d×d matrix; corpus size never enters). Returns
    * (eigenvalues, eigenvectors-as-rows) sorted by DESCENDING
    * eigenvalue (ties keep sweep order), each vector sign-normalized
    * so its largest-magnitude component is positive (first such index
    * wins) — the convention that makes refits bit-comparable. */
  def symmetricEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    while (off > 1e-13 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    val pairs = (0 until d).map { i =>
      val vec = Array.tabulate(d)(k => v(k)(i))
      // sign convention: largest-|component| positive, first index wins
      var best = 0
      var k = 1
      while (k < d) { if (math.abs(vec(k)) > math.abs(vec(best))) best = k; k += 1 }
      if (vec(best) < 0) { k = 0; while (k < d) { vec(k) = -vec(k); k += 1 } }
      (a(i)(i), vec)
    }.sortBy(-_._1)
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    val d = a.length
    var s = 0.0
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
