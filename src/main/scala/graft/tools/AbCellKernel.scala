package graft.tools

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

/** A/B microbench for the r17 [[graft.functions.expr.CellGeom]] kernel
  * reshape (blocked 4-cells-per-pass scan + one-time embedding
  * conversion) vs the r16 single-cell scan — guide §1: measure the
  * per-task change in isolation, where operator-level smoke legs on
  * this box swing 3× run-to-run on IDENTICAL code (r17 before-leg:
  * gen_corpus 83.3 s vs 24.4 s across two quiet-ambient runs).
  *
  * Pure-JVM: no Spark session, rows as UnsafeArrayData (the same
  * accessor the scan path feeds the kernel). Legs ALTERNATE
  * legacy/blocked per rep so box drift cancels; every row's result is
  * asserted EQUAL across variants (the bit-identity contract
  * VectorFunctionsSpec pins against the Column reference).
  *
  * The LEGACY kernel lives here, not in the library — it exists only
  * to be measured against (the AbIndexBuild discipline).
  *
  * Usage: runMain graft.tools.AbCellKernel [rows] [cells] [dim] [reps] [out.json]
  */
object AbCellKernel {

  // --- r16 kernel, verbatim ---
  private def distOf(e: ArrayData, flat: Array[Float], dim: Int,
                     cc: Array[Double], i: Int, n: Int): Double = {
    var acc = 0.0
    val base = i * dim
    var j = 0
    while (j < n) {
      acc += e.getFloat(j).toDouble * flat(base + j).toDouble
      j += 1
    }
    cc(i) - 2.0 * acc
  }

  private def legacyBestCell(e: ArrayData, flat: Array[Float], dim: Int,
                             cc: Array[Double]): Int = {
    val n = math.min(e.numElements(), dim)
    var best = 0
    var bd = distOf(e, flat, dim, cc, 0, n)
    var i = 1
    while (i < cc.length) {
      val d = distOf(e, flat, dim, cc, i, n)
      if (java.lang.Double.compare(d, bd) < 0) { best = i; bd = d }
      i += 1
    }
    best
  }

  private def legacyTopCells(e: ArrayData, flat: Array[Float], dim: Int,
                             cc: Array[Double], nprobe: Int): Array[Int] = {
    val n = math.min(e.numElements(), dim)
    val bd = new Array[Double](nprobe)
    val bc = new Array[Int](nprobe)
    var filled = 0
    var i = 0
    while (i < cc.length) {
      val d = distOf(e, flat, dim, cc, i, n)
      var pos = filled
      while (pos > 0 && java.lang.Double.compare(d, bd(pos - 1)) < 0) pos -= 1
      if (pos < nprobe) {
        val last = math.min(filled, nprobe - 1)
        var k = last
        while (k > pos) { bd(k) = bd(k - 1); bc(k) = bc(k - 1); k -= 1 }
        bd(pos) = d; bc(pos) = i
        if (filled < nprobe) filled += 1
      }
      i += 1
    }
    bc
  }

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toInt).getOrElse(200000)
    val cells = args.lift(1).map(_.toInt).getOrElse(2048)
    val dim = args.lift(2).map(_.toInt).getOrElse(16)
    val reps = args.lift(3).map(_.toInt).getOrElse(5)
    val outJson = args.lift(4).getOrElse("bench_ab_r17_cellkernel.json")
    val nprobe = 2

    // deterministic synthetic embeddings + centroids (splitmix-ish)
    def f(seed: Long): Float = {
      var x = seed + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      (((x ^ (x >>> 31)) & 0xffff) / 32768.0f) - 1.0f
    }
    val centroids = Array.tabulate(cells, dim)((i, j) => f(i.toLong * 31 + j))
    val flat = graft.functions.expr.CellGeom.flatten(centroids)
    val cc = graft.functions.expr.CellGeom.selfDots(centroids)
    val embs: Array[ArrayData] = Array.tabulate(rows) { r =>
      UnsafeArrayData.fromPrimitiveArray(
        Array.tabulate(dim)(j => f(r.toLong * 131 + j)))
    }

    var sinkA = 0L; var sinkB = 0L
    def timeBest(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def legLegacyBest(): Double = timeBest {
      var r = 0
      while (r < rows) { sinkA += legacyBestCell(embs(r), flat, dim, cc); r += 1 }
    }
    def legBlockedBest(): Double = timeBest {
      var r = 0
      while (r < rows) {
        sinkB += graft.functions.expr.CellGeom.bestCell(embs(r), flat, dim, cc)
        r += 1
      }
    }
    def legLegacyTop(): Double = timeBest {
      var r = 0
      while (r < rows) {
        sinkA += legacyTopCells(embs(r), flat, dim, cc, nprobe)(0); r += 1 }
    }
    def legBlockedTop(): Double = timeBest {
      var r = 0
      while (r < rows) {
        sinkB += graft.functions.expr.CellGeom
          .topCells(embs(r), flat, dim, cc, nprobe).getInt(0)
        r += 1
      }
    }

    // bit-identity gate before timing: every row, both kernels
    var r = 0
    while (r < rows) {
      val a = legacyBestCell(embs(r), flat, dim, cc)
      val b = graft.functions.expr.CellGeom.bestCell(embs(r), flat, dim, cc)
      require(a == b, s"bestCell drift at row $r: legacy=$a blocked=$b")
      val ta = legacyTopCells(embs(r), flat, dim, cc, nprobe)
      val tb = graft.functions.expr.CellGeom
        .topCells(embs(r), flat, dim, cc, nprobe)
      var k = 0
      while (k < nprobe) {
        require(ta(k) == tb.getInt(k),
          s"topCells drift at row $r probe $k: legacy=${ta(k)} blocked=${tb.getInt(k)}")
        k += 1
      }
      r += 1
    }
    System.err.println(s"[ab] equality gate passed over $rows rows")

    // warm both paths, then alternate timed reps
    legLegacyBest(); legBlockedBest(); legLegacyTop(); legBlockedTop()
    val lb = new StringBuilder; val bb = new StringBuilder
    val lt = new StringBuilder; val bt = new StringBuilder
    var bestLegacyBest = Double.MaxValue; var bestBlockedBest = Double.MaxValue
    var bestLegacyTop = Double.MaxValue; var bestBlockedTop = Double.MaxValue
    def app(sb: StringBuilder, v: Double): Unit = {
      if (sb.nonEmpty) sb.append(','); sb.append(f"$v%.3f"); ()
    }
    (1 to reps).foreach { _ =>
      val a = legLegacyBest(); app(lb, a); bestLegacyBest = math.min(bestLegacyBest, a)
      val b = legBlockedBest(); app(bb, b); bestBlockedBest = math.min(bestBlockedBest, b)
      val c = legLegacyTop(); app(lt, c); bestLegacyTop = math.min(bestLegacyTop, c)
      val d = legBlockedTop(); app(bt, d); bestBlockedTop = math.min(bestBlockedTop, d)
    }
    val json =
      s"""{"tool":"AbCellKernel","rows":$rows,"cells":$cells,"dim":$dim,"reps":$reps,"nprobe":$nprobe,""" +
      s""""equality_gate_rows":$rows,"sink":${sinkA - sinkB},""" +
      s""""best_cell_legacy_sec":[$lb],"best_cell_blocked_sec":[$bb],""" +
      s""""top_cells_legacy_sec":[$lt],"top_cells_blocked_sec":[$bt],""" +
      f""""best_cell_speedup":${bestLegacyBest / bestBlockedBest}%.2f,""" +
      f""""top_cells_speedup":${bestLegacyTop / bestBlockedTop}%.2f}""" + "\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    print(json)
  }
}
