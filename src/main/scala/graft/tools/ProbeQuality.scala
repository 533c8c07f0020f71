package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Cost probe for the text-quality projection family (guide §1.1
  * measure first): times the `qualityScore` and `langId` projections —
  * the per-row kernels behind the curation/release pipelines
  * (q85/q96/q130/q132) — standalone over a synthetic corpus, so their
  * share of those queries' wall is known before any rewrite. Each
  * variant is consumed by a checksum aggregate (not count — count would
  * let the optimizer prune the projection).
  *
  * Usage: runMain graft.tools.ProbeQuality [rows] [tokens] [reps]
  */
object ProbeQuality {
  def main(args: Array[String]): Unit = {
    def argAt(i: Int, default: String): String =
      if (args.length > i) args(i) else default
    val rows = argAt(0, "2000000").toInt
    val tokens = argAt(1, "60").toInt
    val reps = argAt(2, "3").toInt

    val spark = graft.core.Sessions.local("graft-probe-quality", defaultCpus =
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")

    // synthetic corpus: mixed-language-ish tokens with stopwords mixed
    // in (every 6th token an en marker) plus some punctuation noise
    val corpus = spark.range(0, rows.toLong, 1, 32)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          transform(sequence(lit(0), lit(tokens - 1)), t =>
            when(pmod(t, lit(6)) === 0, lit("the"))
              .when(pmod(t, lit(11)) === 0, lit("x,y."))
              .otherwise(concat(lit("w"),
                pmod(xxhash64(col("id") * 100 + t), lit(5000)))))).as("text"))
      .localCheckpoint()

    def time(name: String, df: DataFrame): Unit = {
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe-quality] $name rep$r ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }

    time("baseline_len", corpus.select(length(col("text")).as("v")))
    time("token_count", corpus.select(tokenCount(col("text")).as("v")))
    time("bpeish_token_count",
      corpus.select(bpeishTokenCount(col("text")).as("v")))
    time("punct_ratio", corpus.select(punctRatio(col("text")).as("v")))
    time("stopword_ratio",
      corpus.select(stopwordRatio(col("text"), langMarkers("en")).as("v")))
    time("mean_token_len", corpus.select(meanTokenLen(col("text")).as("v")))
    time("quality_score",
      corpus.select(qualityScore(col("text"), langMarkers("en")).as("v")))
    time("lang_id", corpus.select(langId(lower(col("text"))).as("v")))
    time("quality_plus_langid", corpus.select(
      qualityScore(col("text"), langMarkers("en")).as("q"),
      langId(lower(col("text"))).as("l")))
    spark.stop()
  }
}
