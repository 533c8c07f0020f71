package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dimension-generic vector ops (VERDICT r1 #9): every function must
  * work for arbitrary embedding dimensions, not just the fixture's 64. */
class VectorFunctionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val dims = Seq(3, 17, 64, 100)

  test("dot / norm / cosine are exact for known vectors at any dimension") {
    dims.foreach { d =>
      val a = Array.tabulate(d)(i => (i + 1).toFloat)
      val df = Seq((a, a)).toDF("a", "b")
      val expectDot = a.map(x => x.toDouble * x).sum
      val row = df.select(
        dot(col("a"), col("b")).as("dot"),
        norm(col("a")).as("nrm"),
        cosine(col("a"), col("b")).as("cos")).collect().head
      assert(math.abs(row.getDouble(0) - expectDot) < 1e-9, s"dot at dim $d")
      assert(math.abs(row.getDouble(1) - math.sqrt(expectDot)) < 1e-9, s"norm at dim $d")
      assert(math.abs(row.getDouble(2) - 1.0) < 1e-12, s"self-cosine at dim $d")
    }
  }

  test("zero vectors yield cosine 0, not NaN") {
    val df = Seq((Array(0f, 0f, 0f), Array(1f, 2f, 3f))).toDF("a", "b")
    assert(df.select(cosine(col("a"), col("b"))).collect().head.getDouble(0) == 0.0)
  }

  test("hyperplane signature is non-null, in range, and dimension-derived") {
    dims.foreach { d =>
      val vecs = (0 until 20).map(i => Tuple1(Array.tabulate(d)(j =>
        math.sin(i * 31 + j).toFloat)))
      val df = vecs.toDF("emb")
      val sigs = df.select(hyperplaneSignature(col("emb"), 6).as("sig")).collect()
      assert(sigs.forall(r => !r.isNullAt(0)), s"NULL signature at dim $d")
      assert(sigs.forall { r => val v = r.getLong(0); v >= 0 && v < 64 },
        s"signature out of 6-bit range at dim $d")
      // different salts must give different hash tables (somewhere)
      val other = df.select(hyperplaneSignature(col("emb"), 6, salt = 1).as("sig")).collect()
      assert(sigs.map(_.getLong(0)).toSeq != other.map(_.getLong(0)).toSeq,
        s"salt has no effect at dim $d")
    }
  }

  test("signature is identical for identical vectors regardless of surrounding data") {
    val v = Array.tabulate(17)(j => (j * 0.25f) - 2f)
    val df1 = Seq(Tuple1(v)).toDF("emb")
    val df2 = (Seq(Tuple1(Array.fill(17)(9f))) ++ Seq(Tuple1(v))).toDF("emb")
    val s1 = df1.select(hyperplaneSignature(col("emb"), 8)).collect().head.getLong(0)
    val s2 = df2.select(hyperplaneSignature(col("emb"), 8)).collect().last.getLong(0)
    assert(s1 == s2)
  }

  // --- native quantizer-assignment expressions (round 12): the
  // `least(struct(dist, cell)…)` Column formulation they replaced,
  // rebuilt here verbatim as the bit-parity oracle ---

  private def refCentroidDists(emb: org.apache.spark.sql.Column,
      centroids: Array[Array[Float]]): Seq[org.apache.spark.sql.Column] =
    centroids.zipWithIndex.map { case (c, i) =>
      val cc = c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      struct((lit(cc) - lit(2.0) * dot(emb, lit(c))).as("dist"), lit(i).as("cell"))
    }.toSeq

  private def refNearestCell(emb: org.apache.spark.sql.Column,
      centroids: Array[Array[Float]]): org.apache.spark.sql.Column = {
    val scored = refCentroidDists(emb, centroids)
    if (scored.length == 1) lit(0) else least(scored: _*).getField("cell")
  }

  private def refNearestCells(emb: org.apache.spark.sql.Column,
      centroids: Array[Array[Float]], nprobe: Int): org.apache.spark.sql.Column =
    transform(slice(array_sort(array(refCentroidDists(emb, centroids): _*)),
      1, nprobe), s => s.getField("cell"))

  private def refNearestCellDist(emb: org.apache.spark.sql.Column,
      centroids: Array[Array[Float]]): org.apache.spark.sql.Column = {
    val scored = refCentroidDists(emb, centroids)
    val best = if (scored.length == 1) scored.head else least(scored: _*)
    struct(best.getField("cell").as("cell"),
      (best.getField("dist") + normSq(emb)).as("d2"))
  }

  test("native nearest-cell trio is bit-identical to the least(struct) formulation") {
    // deterministic messy sample: clustered + uniform + short/long rows
    // + exact duplicates of centroid points (distance-0 rows)
    def f(i: Int, j: Int): Float =
      (math.sin(i * 37 + j * 11) * 3).toFloat
    for (dim <- Seq(4, 16); nc <- Seq(1, 3, 64)) {
      // duplicate centroid 0 as centroid 1 (when nc > 1): forces exact
      // dist ties, the lowest-cell-wins contract
      val cents = Array.tabulate(nc, dim)((c, j) =>
        if (c == 1) f(0, j) else f(c, j))
      val rows = (0 until 200).map { i =>
        val len = if (i % 19 == 0) dim / 2 else dim // short rows: min-len dot
        (i.toLong, Array.tabulate(len)(j =>
          if (i % 7 == 0) cents(i % nc)(j % dim) else f(i + 100, j)))
      }
      val df = rows.toDF("id", "emb")
      val nprobe = math.min(2, nc)
      val got = df.select(col("id"), nearestCell(col("emb"), cents).as("c"),
          nearestCells(col("emb"), cents, nprobe).as("cs"),
          nearestCellDist(col("emb"), cents).as("cd"))
        .collect().map(r => (r.getLong(0), r.getInt(1),
          r.getSeq[Int](2).toSeq, (r.getStruct(3).getInt(0), r.getStruct(3).getDouble(1))))
      val want = df.select(col("id"), refNearestCell(col("emb"), cents).as("c"),
          refNearestCells(col("emb"), cents, nprobe).as("cs"),
          refNearestCellDist(col("emb"), cents).as("cd"))
        .collect().map(r => (r.getLong(0), r.getInt(1),
          r.getSeq[Int](2).toSeq, (r.getStruct(3).getInt(0), r.getStruct(3).getDouble(1))))
      assert(got.toSeq == want.toSeq, s"divergence at dim=$dim cells=$nc")
    }
  }

  test("native nearest-cell trio preserves the degenerate null-embedding path") {
    val cents = Array(Array(1f, 0f), Array(0f, 1f), Array(1f, 1f))
    val df = Seq((1L, Array(0.9f, 0.1f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "emb")
    val r = df.orderBy("id").select(nearestCell(col("emb"), cents),
      nearestCells(col("emb"), cents, 2), nearestCellDist(col("emb"), cents))
      .collect()
    // null embedding: all dists null → least(struct) resolved to cell 0,
    // probes [0, 1], d2 null — the Column formulation's exact behavior,
    // re-derived from the reference shape below, not just asserted
    val ref = df.orderBy("id").select(refNearestCell(col("emb"), cents),
      refNearestCells(col("emb"), cents, 2), refNearestCellDist(col("emb"), cents))
      .collect()
    assert(ref(1).getInt(0) == 0 && r(1).getInt(0) == 0)
    assert(ref(1).getSeq[Int](1).toSeq == Seq(0, 1) &&
      r(1).getSeq[Int](1).toSeq == Seq(0, 1))
    assert(ref(1).getStruct(2).getInt(0) == 0 && ref(1).getStruct(2).isNullAt(1))
    assert(r(1).getStruct(2).getInt(0) == 0 && r(1).getStruct(2).isNullAt(1))
    assert(r(0).getInt(0) == 0) // sanity: (0.9, 0.1) is nearest (1, 0)
  }
}
