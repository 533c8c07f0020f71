package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass positional gram-hash kernel (r17 optimization): span
  * removal and the dup-n-gram profiles derive their per-position gram
  * hashes from ONE native `gramHashes` projection instead of the
  * interpreted transform+sequence+slice+concat_ws+xxhash64 chain. The
  * hash VALUES deliberately differ (fnv-fold vs xxhash64) — every
  * consumer only ever groups/joins/counts grams by equality — so what
  * this spec pins is the full observable contract: array length,
  * position alignment, EQUALITY CLASSES (within and across documents),
  * token count, null propagation, and single evaluation under
  * projection collapse. */
class GramHashesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "The Quick BROWN fox JUMPS over the LAZY dog",  // case-folds to the same grams
    "the the the the the",                          // heavy within-doc duplication
    "one two",                                      // fewer tokens than most n
    "single",
    "",
    "  leading and   trailing   whitespace  ",
    "a b c a b c a b c d e f",                      // repeated runs
    (1 to 200).map(i => s"tok${i % 37}").mkString(" "))

  /** The legacy chain exactly as removeDuplicatedSpansTiered /
    * dupNgramCoverage wrote it: original-case tokens, lower() inside
    * the per-gram hash. */
  private def legacyGrams(n: Int) = {
    val toks = filter(wsTokens(col("text")), t => t =!= "")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => xxhash64(lower(concat_ws(" ", slice(toks, i + 1, lit(n)))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Canonical equality-class shape of a hash array: each position
    * mapped to the first position holding the same value. Two arrays
    * have the same shape iff they group identically. */
  private def classes(a: Seq[Long]): Seq[Int] =
    a.map(v => a.indexOf(v))

  test("gram array length, positions and equality classes match the legacy chain") {
    for (n <- Seq(1, 3, 8)) {
      val rows = texts.toDF("text").select(
        legacyGrams(n).as("old"),
        gramHashes(col("text"), n).getField("g").as("new")).collect()
      rows.foreach { r =>
        val o = r.getSeq[Long](0)
        val nw = r.getSeq[Long](1)
        assert(o.length == nw.length, s"length mismatch at n=$n: $o vs $nw")
        assert(classes(o) == classes(nw),
          s"equality classes diverge at n=$n: $o vs $nw")
      }
    }
  }

  test("equality classes hold ACROSS documents (the cross-doc duplicate signal)") {
    // two docs sharing a planted 3-gram must collide on it in both
    // kernels and nowhere else
    val df = Seq(
      (1L, "alpha beta gamma unique one"),
      (2L, "other words then ALPHA BETA GAMMA tail")).toDF("doc_id", "text")
    def pairs(gramCol: org.apache.spark.sql.Column) = df
      .select(col("doc_id"), posexplode(gramCol).as(Seq("pos", "g")))
      .as("a").join(df.select(col("doc_id"),
        posexplode(gramCol).as(Seq("pos", "g"))).as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.pos"), col("b.pos")).orderBy("a.pos").collect().toSeq
    assert(pairs(legacyGrams(3)) ==
      pairs(gramHashes(col("text"), 3).getField("g")))
    assert(pairs(gramHashes(col("text"), 3).getField("g")).nonEmpty)
  }

  test("nt is the nonempty token count; short/empty/null texts behave") {
    val rows = (texts.map(Some(_)) :+ None).toDF("text").select(
      size(filter(wsTokens(col("text")), t => t =!= "")).as("nt0"),
      gramHashes(col("text"), 5).as("gh")).collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1), "null text must yield null struct")
      else {
        assert(r.getStruct(1).getInt(0) == r.getInt(0), "nt mismatch")
        val g = r.getStruct(1).getSeq[Long](1)
        assert(g.length == math.max(r.getInt(0) - 4, 0), "gram count mismatch")
      }
    }
  }

  test("aliased struct extracted twice evaluates ONCE (no projection collapse)") {
    // the dupNgramCoverage shape: alias, then extract nt and g
    val df = spark.range(8)
      .select(concat_ws(" ", lit("tok"), col("id").cast("string"),
        lit("a b c d e f")).as("text"))
      .select(gramHashes(col("text"), 3).as("__gh"))
      .select(col("__gh").getField("nt").as("n_tokens"),
        col("__gh").getField("g").as("__garr"))
    val optimized = df.queryExecution.optimizedPlan.toString
    val evals = "gram_hashes".r.findAllIn(optimized).length
    assert(evals == 1, s"gram kernel duplicated $evals times:\n$optimized")
  }
}
