package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared kernel for the coarse-quantizer assignment expressions: the
  * per-cell relative squared-euclidean distance `dist(i) = |c_i|² −
  * 2·⟨e, c_i⟩` (the row's own |e|² term is constant within the row and
  * cannot change any ordering), folded in EXACTLY the arithmetic order
  * of the Column formulation it replaces — `lit(cc) − 2.0 · vec_dot(e,
  * lit(c))` with vec_dot's left-to-right double fold over
  * `min(len(e), dim)` elements — so cell assignments are bit-identical
  * to the `least(struct(dist, cell)…)` plan shape (ties → lowest cell
  * id, Spark's total double ordering: −0.0 < 0.0, NaN greatest).
  *
  * Why this exists: the Column formulation builds `cells` structs per
  * row, each wrapping its own dot-product subtree. At a 1024-cell
  * quantizer that is a thousand-field expression over every corpus row
  * — large enough to degrade codegen and allocate per cell per row. A
  * 10M-vector index build spent 15+ minutes in that projection; this
  * kernel is two tight primitive loops, zero per-cell allocation, and
  * the generated code is one static call, so whole-stage codegen
  * stays small no matter the cell count. */
object CellGeom {

  /** Flatten a centroid matrix row-major (validated rectangular). */
  def flatten(centroids: Array[Array[Float]]): Array[Float] = {
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim), "centroids must be rectangular")
    val flat = new Array[Float](centroids.length * dim)
    var i = 0
    while (i < centroids.length) {
      System.arraycopy(centroids(i), 0, flat, i * dim, dim)
      i += 1
    }
    flat
  }

  /** |c_i|² per cell, the same left-to-right double fold the Column
    * formulation computes driver-side. */
  def selfDots(centroids: Array[Array[Float]]): Array[Double] =
    centroids.map(_.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))

  /** dist of cell i for embedding e (see object doc for the exact
    * arithmetic contract). */
  @inline private def distOf(e: ArrayData, flat: Array[Float], dim: Int,
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

  /** The embedding copied ONCE into a primitive double[] (r17, guide
    * §1.2 "per-task work"): the per-(cell × dim) `ArrayData.getFloat` +
    * float→double conversion in the scan loops was `cells`× redundant
    * per row — at a 2048-cell quantizer, 2047 of every 2048 accessor
    * calls re-read the same 16 floats. The copied values are exactly
    * the doubles the per-cell fold converted on the fly, so every
    * downstream fold is bit-identical. */
  @inline private def toDoubles(e: ArrayData, n: Int): Array[Double] = {
    val ev = new Array[Double](n)
    var j = 0
    while (j < n) { ev(j) = e.getFloat(j).toDouble; j += 1 }
    ev
  }

  /** dist of cell i over the pre-converted embedding — the same
    * left-to-right double fold as [[distOf]], bit-identical. */
  @inline private def distOfD(ev: Array[Double], flat: Array[Float], dim: Int,
                              cc: Array[Double], i: Int, n: Int): Double = {
    var acc = 0.0
    val base = i * dim
    var j = 0
    while (j < n) { acc += ev(j) * flat(base + j).toDouble; j += 1 }
    cc(i) - 2.0 * acc
  }

  /** Cell id of the nearest centroid; ties → lowest cell id (strict-<
    * ascending scan under Double.compare = Spark's double ordering).
    *
    * r17 kernel shape (guide §1.2 step 2 — per-task work): the scan
    * runs FOUR cells per pass, each with its own accumulator. A
    * per-cell left-to-right double fold is a single serial dependency
    * chain — ~4-cycle add latency × dim, the loop's floor — while four
    * independent chains pipeline in the FPU. Each cell's fold order is
    * unchanged (accumulators never mix), so distances, the argmin, and
    * the tie rule are bit-identical to the single-cell scan; cell 0
    * still initializes (best, bd) unconditionally, exactly like the
    * r16 kernel, so NaN-first inputs resolve identically. */
  def bestCell(e: ArrayData, flat: Array[Float], dim: Int,
               cc: Array[Double]): Int = {
    val n = math.min(e.numElements(), dim)
    val ev = toDoubles(e, n)
    val m = cc.length
    var best = 0
    var bd = distOfD(ev, flat, dim, cc, 0, n)
    var i = 1
    val nb = 1 + ((m - 1) / 4) * 4
    while (i < nb) {
      var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
      val b0 = i * dim; val b1 = b0 + dim; val b2 = b1 + dim; val b3 = b2 + dim
      var j = 0
      while (j < n) {
        val x = ev(j)
        a0 += x * flat(b0 + j).toDouble
        a1 += x * flat(b1 + j).toDouble
        a2 += x * flat(b2 + j).toDouble
        a3 += x * flat(b3 + j).toDouble
        j += 1
      }
      val d0 = cc(i) - 2.0 * a0
      if (java.lang.Double.compare(d0, bd) < 0) { best = i; bd = d0 }
      val d1 = cc(i + 1) - 2.0 * a1
      if (java.lang.Double.compare(d1, bd) < 0) { best = i + 1; bd = d1 }
      val d2 = cc(i + 2) - 2.0 * a2
      if (java.lang.Double.compare(d2, bd) < 0) { best = i + 2; bd = d2 }
      val d3 = cc(i + 3) - 2.0 * a3
      if (java.lang.Double.compare(d3, bd) < 0) { best = i + 3; bd = d3 }
      i += 4
    }
    while (i < m) {
      val d = distOfD(ev, flat, dim, cc, i, n)
      if (java.lang.Double.compare(d, bd) < 0) { best = i; bd = d }
      i += 1
    }
    best
  }

  /** (nearest cell, its TRUE squared distance dist + |e|²) — the
    * cross-row-comparable form [[NearestCellD2]] returns; |e|² folds
    * over the FULL embedding length (vec_dot(e, e) semantics). */
  def bestCellD2(e: ArrayData, flat: Array[Float], dim: Int,
                 cc: Array[Double]): InternalRow = {
    val best = bestCell(e, flat, dim, cc)
    val n = math.min(e.numElements(), dim)
    var nsq = 0.0
    var j = 0
    val len = e.numElements()
    while (j < len) {
      val x = e.getFloat(j).toDouble; nsq += x * x; j += 1
    }
    InternalRow(best, distOf(e, flat, dim, cc, best, n) + nsq)
  }

  /** One streaming insertion into the (dist, cell)-ascending nprobe
    * window; returns the new fill count. Identical logic to the r16
    * inline body — extracted so the blocked scan below feeds it once
    * per cell in ascending order. */
  @inline private def insertTop(bd: Array[Double], bc: Array[Int],
                                filled: Int, nprobe: Int,
                                d: Double, cell: Int): Int = {
    var pos = filled
    while (pos > 0 && java.lang.Double.compare(d, bd(pos - 1)) < 0) pos -= 1
    if (pos < nprobe) {
      val last = math.min(filled, nprobe - 1)
      var k = last
      while (k > pos) { bd(k) = bd(k - 1); bc(k) = bc(k - 1); k -= 1 }
      bd(pos) = d; bc(pos) = cell
      if (filled < nprobe) filled + 1 else filled
    } else filled
  }

  /** The `nprobe` nearest cell ids, (dist, cell)-ascending — the order
    * `array_sort(array(struct(dist, cell)…))` produced. Streaming
    * insertion into an nprobe-sized window; scanning cells ascending
    * makes strict-< insertion keep the lowest cell id on ties. Blocked
    * 4-cells-per-pass distance scan like [[bestCell]] (r17): per-cell
    * folds untouched, insertions run in the same ascending cell order,
    * so the probe list is bit-identical. */
  def topCells(e: ArrayData, flat: Array[Float], dim: Int,
               cc: Array[Double], nprobe: Int): ArrayData = {
    val n = math.min(e.numElements(), dim)
    val ev = toDoubles(e, n)
    val m = cc.length
    val bd = new Array[Double](nprobe)
    val bc = new Array[Int](nprobe)
    var filled = 0
    var i = 0
    val nb = m - (m % 4)
    while (i < nb) {
      var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
      val b0 = i * dim; val b1 = b0 + dim; val b2 = b1 + dim; val b3 = b2 + dim
      var j = 0
      while (j < n) {
        val x = ev(j)
        a0 += x * flat(b0 + j).toDouble
        a1 += x * flat(b1 + j).toDouble
        a2 += x * flat(b2 + j).toDouble
        a3 += x * flat(b3 + j).toDouble
        j += 1
      }
      filled = insertTop(bd, bc, filled, nprobe, cc(i) - 2.0 * a0, i)
      filled = insertTop(bd, bc, filled, nprobe, cc(i + 1) - 2.0 * a1, i + 1)
      filled = insertTop(bd, bc, filled, nprobe, cc(i + 2) - 2.0 * a2, i + 2)
      filled = insertTop(bd, bc, filled, nprobe, cc(i + 3) - 2.0 * a3, i + 3)
      i += 4
    }
    while (i < m) {
      filled = insertTop(bd, bc, filled, nprobe,
        distOfD(ev, flat, dim, cc, i, n), i)
      i += 1
    }
    val out = new Array[Any](nprobe)
    var k = 0
    while (k < nprobe) { out(k) = bc(k); k += 1 }
    new GenericArrayData(out)
  }
}

/** Base for the quantizer-assignment expressions: validates the input
  * type and replicates the Column formulation's degenerate null
  * semantics — a NULL embedding takes the all-null-dist path of
  * `least(struct(null, 0), struct(null, 1), …)`, which resolves to
  * cell 0 (nulls-first struct ordering), NOT to NULL. Output is
  * therefore non-nullable. */
abstract class CellAssignExpr extends UnaryExpression {
  // centroid emptiness/rectangularity is validated at the
  // VectorFunctions construction site and in CellGeom.flatten — NOT in
  // this constructor body, which Java deserialization re-runs before
  // the case-class fields exist
  def centroids: Array[Array[Float]]

  @transient protected lazy val flat: Array[Float] = CellGeom.flatten(centroids)
  @transient protected lazy val cc: Array[Double] = CellGeom.selfDots(centroids)
  protected def dim: Int = centroids.head.length

  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float>, got $t")
  }
  // keep plan strings compact: the centroid matrix is a model, not an
  // argument worth printing (the Column form it replaces inlined every
  // centroid as an array literal — the main reason plan dumps of IVF
  // queries were megabyte-sized)
  override def toString: String =
    s"$prettyName(${child.sql}, cells=${centroids.length})"
  override def sql: String = toString

  /** Generated code = child eval + one static kernel call (the loop
    * lives in [[CellGeom]] where HotSpot JITs it once, independent of
    * cell count — no codegen-size cliff at wide quantizers). */
  protected def genKernelCall(ctx: CodegenContext, ev: ExprCode,
                              call: (String, String, String) => String,
                              nullValue: String): ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("cellFlat", flat, "float[]")
    val ccRef = ctx.addReferenceObj("cellCc", cc, "double[]")
    val jt = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    ev.copy(isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      code = code"""
        ${childGen.code}
        $jt ${ev.value} = ${childGen.isNull} ? ($jt) $nullValue :
          ($jt) ${call(childGen.value.toString, flatRef, ccRef)};
      """)
  }
}

/** Native [[graft.functions.VectorFunctions.nearestCell]]: the cell id
  * of the nearest centroid under relative squared-euclidean distance;
  * ties → lowest cell id. */
case class NearestCellId(child: Expression, centroids: Array[Array[Float]])
    extends CellAssignExpr {
  override def dataType: DataType = IntegerType
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else CellGeom.bestCell(v.asInstanceOf[ArrayData], flat, dim, cc)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genKernelCall(ctx, ev, (c, f, d) =>
      s"graft.functions.expr.CellGeom.bestCell($c, $f, $dim, $d)", "0")
  override protected def withNewChildInternal(c: Expression): NearestCellId =
    copy(child = c)
  override def prettyName: String = "vec_nearest_cell"
}

/** Native [[graft.functions.VectorFunctions.nearestCells]]: the
  * `nprobe` nearest cell ids, nearest first. */
case class NearestCellIds(child: Expression, centroids: Array[Array[Float]],
                          nprobe: Int)
    extends CellAssignExpr {
  // nprobe ∈ [1, cells] is validated at the VectorFunctions site (a
  // constructor-body require would NPE under Java deserialization)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val nullResult: ArrayData =
    new GenericArrayData(Array.tabulate[Any](nprobe)(identity))
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) nullResult
    else CellGeom.topCells(v.asInstanceOf[ArrayData], flat, dim, cc, nprobe)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nullRef = ctx.addReferenceObj("cellNullProbe", nullResult,
      "org.apache.spark.sql.catalyst.util.ArrayData")
    genKernelCall(ctx, ev, (c, f, d) =>
      s"graft.functions.expr.CellGeom.topCells($c, $f, $dim, $d, $nprobe)",
      nullRef)
  }
  override protected def withNewChildInternal(c: Expression): NearestCellIds =
    copy(child = c)
  override def prettyName: String = "vec_nearest_cells"
}

/** Native [[graft.functions.VectorFunctions.nearestCellDist]]:
  * struct(cell, d2) with d2 the TRUE squared euclidean distance
  * (cross-row comparable); d2 is null for a null embedding. */
case class NearestCellD2(child: Expression, centroids: Array[Array[Float]])
    extends CellAssignExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("d2", DoubleType, nullable = true)))
  @transient private lazy val nullResult: InternalRow = InternalRow(0, null)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) nullResult
    else CellGeom.bestCellD2(v.asInstanceOf[ArrayData], flat, dim, cc)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nullRef = ctx.addReferenceObj("cellNullD2", nullResult,
      "org.apache.spark.sql.catalyst.InternalRow")
    genKernelCall(ctx, ev, (c, f, d) =>
      s"graft.functions.expr.CellGeom.bestCellD2($c, $f, $dim, $d)", nullRef)
  }
  override protected def withNewChildInternal(c: Expression): NearestCellD2 =
    copy(child = c)
  override def prettyName: String = "vec_nearest_cell_d2"
}
