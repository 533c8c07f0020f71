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
}
