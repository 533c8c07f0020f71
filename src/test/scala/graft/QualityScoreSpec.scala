package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass quality/lang-id kernels (r18 optimization,
  * expr.QualityScoreRaw / expr.LangIdMarker) replace the interpreted
  * compositions behind `qualityScore` and `langId`. Their outputs are
  * oracle-pinned (q50/q85/q96/q130/q132), so this spec pins BIT
  * equality — the rounded score double and the predicted language
  * string — against the legacy interpreted formulations (re-declared
  * here verbatim, the AbNearDupSuppress discipline) on an adversarial
  * corpus AND on the real sf0.001 documents fixture. */
class QualityScoreSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

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

  private val adversarial = Seq(
    "the quick brown fox jumps over the lazy dog",
    "THE QUICK BROWN FOX",                       // case-sensitive stop match
    "",                                          // empty: split -> [""]
    "   ",                                       // whitespace only
    "  leading and trailing  ",                  // boundary empty tokens
    "a",                                         // single short token
    "!!! ??? ,,, ...",                           // all punctuation tokens
    "the, the. the! the?",                       // stopwords glued to punct
    "der die das und ist ein zu den",            // de markers
    "el la de que y en un es",                   // es + fr overlap (de/la/en/es)
    "le la de et un est que des",                // fr markers
    "的 是 了 在 我 有 和 不",                      // zh markers (CJK chars)
    "naïve café über emoji 😀 mixed",  // unicode + supplementary
    "tab\tseparated\nnewlinevtff\rcr", // every \s class char
    "a0a1a2 9to5 x,y.z",                         // alnum/punct mix
    (1 to 100).map(i => s"w$i").mkString(" "),   // 100 tokens, no stops
    ((1 to 30).map(_ => "the") ++ (1 to 10).map(i => s"w$i")).mkString(" "))

  private def docsOf(texts: Seq[String]): DataFrame =
    texts.zipWithIndex.map(_.swap).toDF("doc_id", "text")

  private def pinEqual(df: DataFrame): Unit = {
    val rows = df.select(col("doc_id"),
        legacyQualityScore(col("text"), langMarkers("en")).as("ql"),
        qualityScore(col("text"), langMarkers("en")).as("qn"),
        legacyLangId(lower(col("text"))).as("ll"),
        langId(lower(col("text"))).as("ln"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ql, qn) = (r.getDouble(1), r.getDouble(2))
      assert(java.lang.Double.doubleToRawLongBits(ql) ==
        java.lang.Double.doubleToRawLongBits(qn),
        s"doc ${r.get(0)}: quality legacy $ql vs native $qn")
      assert(r.getString(3) == r.getString(4),
        s"doc ${r.get(0)}: langId legacy ${r.getString(3)} vs native ${r.getString(4)}")
    }
  }

  private def pinStats(df: DataFrame): Unit = {
    val rows = df.select(col("doc_id"),
        legacyPunctRatio(col("text")).as("pl"),
        punctRatio(col("text")).as("pn"),
        legacyStopwordRatio(col("text"), langMarkers("en")).as("sl"),
        stopwordRatio(col("text"), langMarkers("en")).as("sn"),
        legacyMeanTokenLen(col("text")).as("ml"),
        meanTokenLen(col("text")).as("mn"),
        legacyBpeishTokenCount(col("text")).as("bl"),
        bpeishTokenCount(col("text")).as("bn"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq((1, 2, "punct"), (3, 4, "stopword"), (5, 6, "meanlen")).foreach {
        case (li, ni, what) =>
          assert(java.lang.Double.doubleToRawLongBits(r.getDouble(li)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(ni)),
            s"doc ${r.get(0)} $what: legacy ${r.getDouble(li)} vs native ${r.getDouble(ni)}")
      }
      assert(r.getInt(7) == r.getInt(8),
        s"doc ${r.get(0)} bpeish: legacy ${r.getInt(7)} vs native ${r.getInt(8)}")
    }
  }

  test("quality + langId bit-equal to the interpreted forms on adversarial texts") {
    pinEqual(docsOf(adversarial))
  }

  test("punct/stopword/meanlen/bpeish kernels bit-equal on adversarial texts") {
    pinStats(docsOf(adversarial))
  }

  test("punct/stopword/meanlen/bpeish kernels bit-equal on the sf0.001 fixture") {
    pinStats(graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")))
  }

  test("quality + langId bit-equal on the sf0.001 documents fixture") {
    pinEqual(graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")))
  }

  test("null text propagates as null in both kernels") {
    val df = Seq((0, Some("the a of")), (1, None: Option[String]))
      .toDF("doc_id", "text")
    val r = df.select(
        qualityScore(col("text"), langMarkers("en")).as("q"),
        langId(lower(col("text"))).as("l"))
      .orderBy(lit(1)).collect()
    assert(!r.exists(row => row.isNullAt(0) ^ row.isNullAt(1)))
    assert(r.count(_.isNullAt(0)) == 1)
  }
}
