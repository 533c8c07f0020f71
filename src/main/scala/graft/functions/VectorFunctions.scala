package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with` / `aggregate` /
  * `transform`) — no UDFs, so the expressions inline into whole-stage
  * codegen and survive column pruning.
  *
  * Precision contract: elements are cast FLOAT→DOUBLE before any
  * arithmetic and folded strictly left-to-right, matching the oracle's
  * `list_sum(list_transform(...))` evaluation order, so dot products
  * and cosines are bit-identical across engines.
  */
object VectorFunctions {

  /** Sequential left-fold sum of a double array. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** Dot product of two float-array columns, computed in double via the
    * native codegen'd expression (same left-to-right fold as the HOF
    * form, ~15× faster on all-pairs kernels — see FloatVecExprs). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      graft.functions.expr.FloatDotProduct(
        org.apache.spark.sql.GraftExprBridge.expression(a),
        org.apache.spark.sql.GraftExprBridge.expression(b)))

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val den = sqrt(normSq(a) * normSq(b))
    when(den === 0.0, 0.0).otherwise(d / den)
  }

  /** Cosine from precomputed norms (join-side optimization: norms are
    * computed once per row before the pair join, not once per pair). */
  def cosinePrenormed(dotCol: Column, normA: Column, normB: Column): Column =
    when(normA * normB === 0.0, 0.0).otherwise(dotCol / (normA * normB))

  /** Random-hyperplane (SimHash) signature of an embedding: `planes`
    * sign bits packed into a long. Hyperplane weights are deterministic
    * ±1 derived from xxhash64(salt, plane, dim) — reproducible across
    * runs and executors with no broadcast state. Distinct `salt`s yield
    * independent hash tables for multi-table LSH.
    */
  def hyperplaneSignature(emb: Column, planes: Int, salt: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      // w(p,d) = +1 if bit 0 of xxhash64(salt, p, d) else -1
      val proj = fsum(zip_with(emb, sequence(lit(0), size(emb) - 1), (x, d) =>
        x.cast("double") *
          when(pmod(xxhash64(lit(salt), lit(p), d), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))))
      when(proj > 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Cell id of the nearest centroid (relative squared euclidean
    * `|c|² − 2·⟨e,c⟩`; ties → lowest cell id) — one native expression
    * over the KB-sized centroid model (the standard broadcast-model
    * formulation). The earlier `least(struct(dist, cell)…)` Column
    * shape built `cells` dot-product subtrees per row — a
    * thousand-field expression at wide quantizers, the reason a
    * 10M-vector index build sat 15+ minutes in its assignment
    * projection. Arithmetic order, tie-breaks, and the degenerate
    * null-embedding behavior are bit-preserved — see
    * [[graft.functions.expr.CellGeom]]. */
  def nearestCell(emb: Column, centroids: Array[Array[Float]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    org.apache.spark.sql.GraftExprBridge.column(
      graft.functions.expr.NearestCellId(
        org.apache.spark.sql.GraftExprBridge.expression(emb), centroids))
  }

  /** (cell, d2) of the nearest centroid: the cell id plus the TRUE
    * squared euclidean distance — the row's own |e|² term (dropped by
    * [[nearestCell]] because it cannot affect the per-row argmin) is
    * restored here, so distances are comparable ACROSS rows, which is
    * what intra-cell prototype/outlier ranking needs. */
  def nearestCellDist(emb: Column, centroids: Array[Array[Float]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    org.apache.spark.sql.GraftExprBridge.column(
      graft.functions.expr.NearestCellD2(
        org.apache.spark.sql.GraftExprBridge.expression(emb), centroids))
  }

  /** The `nprobe` nearest cell ids, nearest first — the multi-probe
    * query side of an IVF search. */
  def nearestCells(emb: Column, centroids: Array[Array[Float]], nprobe: Int): Column = {
    require(nprobe >= 1 && nprobe <= centroids.length)
    org.apache.spark.sql.GraftExprBridge.column(
      graft.functions.expr.NearestCellIds(
        org.apache.spark.sql.GraftExprBridge.expression(emb), centroids, nprobe))
  }

  /** splitmix64 — the standard 64-bit finalizer, used to derive
    * deterministic hyperplane weights driver-side. */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Fast hyperplane signature for a KNOWN dimension: the ±1 weight
    * vectors are data-independent, so they are precomputed once on the
    * driver and folded into the plan as float-array literals; each
    * plane's projection is then one native `vec_dot`. Versus the
    * dimension-from-data variant above (which re-hashes every
    * (salt, plane, dim) triple per ROW) this removes rows × planes ×
    * dims hash evaluations from the hot path. Weights differ from the
    * xxhash64 variant's — signatures are internal bucketing keys, not a
    * cross-version contract. */
  def hyperplaneSignatureFast(emb: Column, planes: Int, salt: Int, dim: Int): Column = {
    require(dim > 0, "dimension must be known and positive")
    val bits = (0 until planes).map { p =>
      val w = Array.tabulate(dim) { d =>
        if ((splitmix64(salt.toLong << 40 | p.toLong << 20 | d) & 1L) == 0L) 1f else -1f
      }
      when(dot(emb, lit(w)) > 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }
}
