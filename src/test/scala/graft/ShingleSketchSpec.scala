package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The combined one-pass text sketch (r17 optimization): the near-dup
  * build/append/LSH/suppressor paths derive BOTH Jaccard
  * representations of a batch from ONE `shingleSketch` projection
  * instead of two separate shingling passes. The optimization is only
  * legal if the combined fields are BIT-IDENTICAL to the two
  * single-output expressions — this spec pins that equality on texts
  * covering every shingle edge case, plus the derived band keys. */
class ShingleSketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the the the the the",                       // heavy duplicate shingles
    "one two",                                   // fewer tokens than n=3
    "single",                                    // one token
    "",                                          // empty text
    "  leading and   trailing   whitespace  ",
    "a b c a b c a b c d e f",                   // repeated runs
    (1 to 200).map(i => s"tok${i % 37}").mkString(" ")) // long, collisions

  test("shingleSketch.sh/.mh are bit-identical to the single-output expressions") {
    for (n <- Seq(1, 3, 5); k <- Seq(8, 64)) {
      val df = texts.toDF("text")
      val rows = df.select(
        distinctShingleHashes(lower(col("text")), n).as("sh0"),
        minHashes(lower(col("text")), n, k).as("mh0"),
        shingleSketch(lower(col("text")), n, k).as("sk")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getStruct(2).getSeq[Long](0),
          s"sh mismatch at n=$n k=$k")
        assert(r.getSeq[Long](1) == r.getStruct(2).getSeq[Long](1),
          s"mh mismatch at n=$n k=$k")
      }
    }
  }

  test("null text yields null sketch, matching the single-output expressions") {
    val df = Seq(Some("a b c d"), None).toDF("text")
    val rows = df.select(
      distinctShingleHashes(col("text"), 3).as("sh0"),
      shingleSketch(col("text"), 3, 16).as("sk")).collect()
    assert(!rows(0).isNullAt(0) && !rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("band keys derived from the combined sketch match bandedSignatures") {
    // the private derivation lives in Dedup; pin it end-to-end through
    // minHashLshPairs vs a hand-rolled legacy twin of the banding tail
    val hashes = 64
    val bands = 16
    val rowsPerBand = hashes / bands
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val legacy = df.select(col("doc_id"),
        minHashes(lower(col("text")), 3, hashes).as("mh"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(b, slice(col("mh"), b * lit(rowsPerBand) + 1,
              lit(rowsPerBand))).as("bkey")))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bkey"))
      .orderBy("doc_id", "band").collect().toSeq
    val combined = df.select(col("doc_id"),
        shingleSketch(lower(col("text")), 3, hashes).as("__sk"))
      .select(col("doc_id"), col("__sk.mh").as("mh"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(b, slice(col("mh"), b * lit(rowsPerBand) + 1,
              lit(rowsPerBand))).as("bkey")))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bkey"))
      .orderBy("doc_id", "band").collect().toSeq
    assert(legacy == combined)
  }

  test("aliased sketch extracted in a second projection evaluates ONCE (no collapse)") {
    // the one-pass sketchSig shape: alias the non-cheap sketch struct,
    // extract two fields in the next select — projection collapse must
    // NOT inline it (that would re-run the shingling per field and
    // defeat the whole optimization)
    val df = spark.range(8)
      .select(concat_ws(" ", lit("tok"), col("id").cast("string"),
        lit("a b c d e f")).as("text"))
      .select(col("text"), shingleSketch(lower(col("text")), 3, 64).as("__sk"))
      .select(col("__sk.sh").as("sh"), size(col("__sk.sh")).as("n"),
        transform(sequence(lit(0), lit(15)),
          b => xxhash64(b, slice(col("__sk.mh"), b * lit(4) + 1,
            lit(4)))).as("bkeys"))
    val optimized = df.queryExecution.optimizedPlan.toString
    val evals = "shingle_sketch".r.findAllIn(optimized).length
    assert(evals == 1, s"sketch expression duplicated $evals times:\n$optimized")
  }
}
