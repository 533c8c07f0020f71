package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `sorted_intersect_count` (r18 optimization) replaces
  * `size(array_intersect(sh_a, sh_b))` in every exact-Jaccard /
  * containment verify — all call sites pass the SORTED DISTINCT
  * shingle-hash set representation, for which the merge count equals
  * Spark's intersect-then-size by construction. This spec pins that
  * equality on the real producer (`distinctShingleHashes` over text,
  * including its parquet round-trip, which is how the containment
  * index's persisted sketches reach the filter) and on adversarial
  * hand-built sorted-distinct arrays (empty, disjoint, identical,
  * subset, interleaved, Long extremes), plus null propagation and the
  * SQL registration. */
class SortedIntersectCountSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def both(df: org.apache.spark.sql.DataFrame): Unit = {
    val r = df
      .select(
        size(array_intersect(col("a"), col("b"))).as("legacy"),
        sortedIntersectCount(col("a"), col("b")).as("native"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.get(0) == row.get(1),
        s"legacy ${row.get(0)} vs native ${row.get(1)}")
    }
  }

  test("equals size(array_intersect) on hand-built sorted distinct arrays") {
    val cases: Seq[(Array[Long], Array[Long])] = Seq(
      (Array.empty[Long], Array.empty[Long]),
      (Array.empty[Long], Array(1L, 2L, 3L)),
      (Array(1L, 2L, 3L), Array.empty[Long]),
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),          // disjoint
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),          // identical
      (Array(1L, 3L, 5L, 7L), Array(2L, 3L, 6L, 7L)),  // interleaved
      (Array(2L, 4L), Array(1L, 2L, 3L, 4L, 5L)),      // subset
      (Array(Long.MinValue, -1L, 0L, Long.MaxValue),
        Array(Long.MinValue, 0L, 1L, Long.MaxValue)),   // extremes
      (Array(-5L, -3L, -1L), Array(-4L, -3L, -2L)))     // negatives
    both(cases.toDF("a", "b"))
  }

  test("equals size(array_intersect) on real shingle sets incl. parquet round-trip") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "the the the the the",
      "one two",
      "",
      (1 to 300).map(i => s"tok${i % 53}").mkString(" "),
      (1 to 300).map(i => s"tok${(i * 7) % 53}").mkString(" "))
    val sets = texts.zipWithIndex.toDF("text", "doc_id")
      .select(col("doc_id"), distinctShingleHashes(lower(col("text")), 3).as("sh"))
    val dir = java.nio.file.Files.createTempDirectory("graft-sic-spec").toString
    sets.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val pairs = back.as("x").crossJoin(back.as("y"))
      .select(col("x.sh").as("a"), col("y.sh").as("b"))
    both(pairs)
  }

  test("null propagation matches size(array_intersect) under ANSI") {
    val df = Seq(
      (Some(Array(1L, 2L)), None: Option[Array[Long]]),
      (None: Option[Array[Long]], Some(Array(1L, 2L))),
      (None: Option[Array[Long]], None: Option[Array[Long]]),
      (Some(Array(1L, 2L)), Some(Array(2L, 3L)))).toDF("a", "b")
    both(df)
  }

  test("null ELEMENT is a loud contract violation, not a silent wrong count") {
    val ex = intercept[Exception] {
      spark.sql(
        "SELECT sorted_intersect_count(array(1L, NULL), array(1L, 2L))")
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("sorted_intersect_count: null array element")),
      s"unexpected failure: $ex")
  }

  test("registered for SQL as sorted_intersect_count") {
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L))")
      .collect().head.getInt(0)
    assert(n == 2)
  }
}
