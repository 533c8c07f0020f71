package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** A/B for the r18 one-pass quality/lang-id kernels
  * ([[graft.functions.expr.QualityScoreRaw]] /
  * [[graft.functions.expr.LangIdMarker]]) vs the legacy interpreted
  * compositions (re-declared here verbatim, the AbNearDupSuppress
  * discipline): the legacy `qualityScore` re-split the text three times
  * and ran an interpreted HOF stopword filter plus a regexp_replace
  * that materialized the stripped string; the legacy `langId`
  * re-tokenized once per language per reference (ten times for five
  * languages). Measured through the REAL consumer shape — the
  * q85-style projection (quality + langId over the same text) consumed
  * by a checksum aggregate. Legs ALTERNATE in one JVM; the equality
  * gate is the row count plus an order-insensitive checksum over
  * (doc_id, rounded score, predicted lang) — the full observable
  * contract.
  *
  * Usage: runMain graft.tools.AbQualityKernel [rows] [tokens] [reps] [out.json]
  */
object AbQualityKernel {

  // --- legacy interpreted twins, expression-identical to pre-r18 ---
  private def legacyPunctRatio(text: Column): Column = {
    val total = length(text)
    val noPunct = length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))
    when(total === 0, 0.0).otherwise((total - noPunct).cast("double") / total)
  }
  private def legacyStopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = wsTokens(text)
    val stops = filter(toks, t => t.isin(stopwords: _*))
    when(size(toks) === 0, 0.0)
      .otherwise(size(stops).cast("double") / size(toks))
  }
  private def legacyMeanTokenLen(text: Column): Column = {
    val toks = wsTokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }
  private def legacyBpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
  private def legacyQualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 20.0, lit(1.0))
    val punctScore = lit(1.0) - least(legacyPunctRatio(text) * 4.0, lit(1.0))
    val stopScore = lit(1.0) - legacyStopwordRatio(text, stopwords)
    round((lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3).cast("double"), 6)
  }
  private def legacyLangScore(text: Column, lang: String): Column =
    size(filter(wsTokens(text), t => t.isin(langMarkers(lang): _*)))
  private def legacyLangId(text: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val keyed = langs.map(l =>
      format_string("%04d|%s", lit(9999) - legacyLangScore(text, l), lit(l)))
    when(greatest(langs.map(legacyLangScore(text, _)): _*) <= 0, lit("und"))
      .otherwise(substring(least(keyed: _*), 6, 2))
  }

  def main(args: Array[String]): Unit = {
    def argAt(i: Int, default: String): String =
      if (args.length > i) args(i) else default
    val rows = argAt(0, "2000000").toInt
    val tokens = argAt(1, "60").toInt
    val reps = argAt(2, "3").toInt
    val outJson = argAt(3, "bench_ab_r18_quality.json")

    val spark = graft.core.Sessions.local("graft-ab-quality", defaultCpus =
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")

    // mixed corpus: en/de/es/fr/zh marker runs, stopword density and
    // punctuation noise varying by doc — every branch of both kernels
    // exercised (incl. 'und' docs with zero marker hits)
    val markerRun = Map(
      0 -> "the a of and to in is that", 1 -> "der die das und ist ein zu den",
      2 -> "el la de que y en un es", 3 -> "le la de et un est que des",
      4 -> "的 是 了 在 我 有 和 不", 5 -> "")
    val corpus = spark.range(0, rows.toLong, 1, 32)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          element_at(map(markerRun.toSeq.flatMap { case (k, v) =>
            Seq(lit(k), lit(v)) }: _*), pmod(col("id"), lit(6)).cast("int")),
          transform(sequence(lit(0), lit(tokens - 1)), t =>
            when(pmod(t, lit(11)) === 0, lit("x,y."))
              .otherwise(concat(lit("w"),
                pmod(xxhash64(col("id") * 100 + t), lit(5000)))))).as("text"))
      .localCheckpoint()

    def shape(q: Column, l: Column): DataFrame =
      corpus.select(col("doc_id"), q.as("q"), l.as("lang"))

    def consume(df: DataFrame): (Long, Long) = {
      val r = df.select(xxhash64(col("doc_id"), col("q"), col("lang")).as("h"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("ck"))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }

    def legacy(): (Long, Long) = consume(shape(
      legacyQualityScore(col("text"), langMarkers("en")),
      legacyLangId(lower(col("text")))))
    def native(): (Long, Long) = consume(shape(
      qualityScore(col("text"), langMarkers("en")),
      langId(lower(col("text")))))

    val g0 = legacy()
    val g1 = native()
    require(g0 == g1, s"quality/langId drift: legacy $g0 vs native $g1")

    val legacyTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val nativeTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    var checks = Set.empty[(Long, Long)]
    (1 to reps).foreach { r =>
      if (r % 2 == 1) {
        val t0 = System.nanoTime(); checks += legacy()
        val t1 = System.nanoTime(); checks += native()
        val t2 = System.nanoTime()
        legacyTimes += (t1 - t0) / 1e9; nativeTimes += (t2 - t1) / 1e9
      } else {
        val t0 = System.nanoTime(); checks += native()
        val t1 = System.nanoTime(); checks += legacy()
        val t2 = System.nanoTime()
        nativeTimes += (t1 - t0) / 1e9; legacyTimes += (t2 - t1) / 1e9
      }
    }
    require(checks.size == 1, s"cross-rep drift: $checks")
    val f = (v: Double) => "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json = s"""{"tool":"AbQualityKernel","rows":$rows,"tokens":$tokens,""" +
      s""""reps":$reps,"rows_out":${g0._1},"contents_identical":true,""" +
      s""""legacy_sec":[${legacyTimes.map(f).mkString(",")}],""" +
      s""""native_sec":[${nativeTimes.map(f).mkString(",")}],""" +
      s""""legacy_best":${f(legacyTimes.min)},"native_best":${f(nativeTimes.min)},""" +
      s""""speedup_best":${f(legacyTimes.min / nativeTimes.min)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    println(json)

    // second shape: the qualityProfile / qcFeatures projection (punct
    // ratio + stopword ratio + mean token length + bpeish count — the
    // q49/q105 per-row kernels), same alternating-leg discipline
    val out2 = argAt(4, "bench_ab_r18_textstats.json")
    def profShape(p: Column, s: Column, m: Column, b: Column): DataFrame =
      corpus.select(col("doc_id"), p.as("p"), s.as("s"), m.as("m"), b.as("b"))
    def profConsume(df: DataFrame): (Long, Long) = {
      val r = df.select(xxhash64(col("doc_id"), col("p"), col("s"),
          col("m"), col("b")).as("h"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("ck"))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    def profLegacy(): (Long, Long) = profConsume(profShape(
      legacyPunctRatio(col("text")),
      legacyStopwordRatio(col("text"), langMarkers("en")),
      legacyMeanTokenLen(col("text")),
      legacyBpeishTokenCount(col("text")).cast("int")))
    def profNative(): (Long, Long) = profConsume(profShape(
      punctRatio(col("text")),
      stopwordRatio(col("text"), langMarkers("en")),
      meanTokenLen(col("text")),
      bpeishTokenCount(col("text"))))
    val p0 = profLegacy()
    val p1 = profNative()
    require(p0 == p1, s"profile drift: legacy $p0 vs native $p1")
    val pl = scala.collection.mutable.ArrayBuffer.empty[Double]
    val pn = scala.collection.mutable.ArrayBuffer.empty[Double]
    var pchecks = Set.empty[(Long, Long)]
    (1 to reps).foreach { r =>
      if (r % 2 == 1) {
        val t0 = System.nanoTime(); pchecks += profLegacy()
        val t1 = System.nanoTime(); pchecks += profNative()
        val t2 = System.nanoTime()
        pl += (t1 - t0) / 1e9; pn += (t2 - t1) / 1e9
      } else {
        val t0 = System.nanoTime(); pchecks += profNative()
        val t1 = System.nanoTime(); pchecks += profLegacy()
        val t2 = System.nanoTime()
        pn += (t1 - t0) / 1e9; pl += (t2 - t1) / 1e9
      }
    }
    require(pchecks.size == 1, s"profile cross-rep drift: $pchecks")
    val json2 = s"""{"tool":"AbQualityKernel/profile","rows":$rows,""" +
      s""""tokens":$tokens,"reps":$reps,"rows_out":${p0._1},""" +
      s""""contents_identical":true,""" +
      s""""legacy_sec":[${pl.map(f).mkString(",")}],""" +
      s""""native_sec":[${pn.map(f).mkString(",")}],""" +
      s""""legacy_best":${f(pl.min)},"native_best":${f(pn.min)},""" +
      s""""speedup_best":${f(pl.min / pn.min)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out2), json2 + "\n")
    println(json2)
    spark.stop()
  }
}
