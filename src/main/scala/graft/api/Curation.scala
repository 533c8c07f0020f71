package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus curation operators: URL canonicalization, registered-
  * domain extraction, per-domain caps and mix profiling, HTML tag
  * stripping. These are the source-side staples of a web-scale
  * training-data pipeline (C4 / RefinedWeb-style cleaning): dedup and
  * quality filters operate on text, but the FIRST discriminators at
  * crawl scale are the URL and the domain — canonicalize before
  * dedup-by-url, cap per-domain so one mega-site cannot dominate a
  * corpus, strip markup before any text-quality scoring.
  *
  * All ops are `DataFrame → DataFrame` with column names as
  * parameters, built from codegen'd built-in expressions
  * (regexp_replace / regexp_extract / lower / concat) — no UDFs, and
  * every transform is a narrow per-row projection except the
  * deliberately-keyed per-domain window in [[capPerDomain]].
  *
  * The regex subset used here is common to Java regex (Spark) and RE2
  * (the DuckDB oracle): no lookaround, no pattern backreferences;
  * replacement group syntax differs per engine ($1 vs \1) and each
  * side writes its own.
  */
object Curation {

  /** Two-level public suffixes the registered-domain heuristic knows.
    * A deliberately small, documented subset of the public-suffix list
    * (the real list is data, not code — at production scale it would
    * ride in as a broadcast table; the heuristic keeps the op a pure
    * narrow expression). */
  val twoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za")

  private val suffixAlt = twoLevelSuffixes.map(_.replace(".", "\\.")).mkString("|")

  /** Canonicalize a URL column. Contract (applied in order):
    *  1. strip the `#fragment`;
    *  2. lowercase the scheme and the authority (host:port) — never
    *     the path or query, which are case-sensitive;
    *  3. drop a leading `www.` host label and the scheme's default
    *     port (`:80` for http, `:443` for https);
    *  4. remove tracking query parameters (`utm_*`, `gclid`,
    *     `fbclid`, `ref`), preserving the relative order of the
    *     surviving parameters, and repair the separator chain
    *     (`?` restored on the first survivor, trailing `?`/`&`
    *     dropped);
    *  5. collapse a wholly-empty path to `/`.
    *
    * Rows that do not look like absolute URLs (`scheme://…`) pass
    * through unchanged — mixed/dirty corpora must not lose rows to a
    * canonicalizer. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth0 = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val auth1 = regexp_replace(auth0, "^www\\.", "")
    val auth = when(scheme === "http", regexp_replace(auth1, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth1, ":443$", ""))
      .otherwise(auth1)
    val tail0 = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    // '&' is a legal RFC 3986 path character and '?' is legal inside
    // query VALUES: split at the FIRST '?' and scrub tracking params
    // only in the query half — a global '?'→'&' unification would
    // corrupt the path (or even delete a path segment matching the
    // tracking pattern) and mis-split multi-'?' queries.
    val path = regexp_extract(tail0, "^([^?]*)", 1)
    val query0 = when(tail0.contains("?"),
      regexp_extract(tail0, "^[^?]*\\?(.*)$", 1)).otherwise(lit(""))
    // prefix '&' so every param (including the first) matches the one
    // &name=value removal pattern, then strip residual separators
    val q1 = regexp_replace(concat(lit("&"), query0),
      "&(utm_[A-Za-z0-9_]+|gclid|fbclid|ref)=[^&]*", "")
    val q2 = regexp_replace(regexp_replace(q1, "^&+", ""), "&+$", "")
    val t4 = when(q2 === "", path).otherwise(concat(path, lit("?"), q2))
    val tail = when(t4 === "" || t4.startsWith("?"), concat(lit("/"), t4)).otherwise(t4)
    when(scheme === "", url).otherwise(concat(scheme, lit("://"), auth, tail))
  }

  /** Registered domain (site identity) of a URL or bare host:
    * the last two host labels, or three when the last two are a known
    * two-level public suffix ([[twoLevelSuffixes]]). Unparseable /
    * single-label hosts fall back to the full host. Port is ignored. */
  def registeredDomain(url: Column): Column = {
    val auth = when(url.contains("://"),
        regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
      .otherwise(url)
    val host = regexp_replace(lower(auth), ":[0-9]+$", "")
    val reg = regexp_extract(host,
      "([a-z0-9-]+\\.(?:" + suffixAlt + "|[a-z]+))$", 1)
    when(reg === "", host).otherwise(reg)
  }

  /** Add `url_norm` and `domain` columns for a URL column — the usual
    * first projection over a crawl manifest. */
  def withUrlFeatures(df: DataFrame, urlCol: String = "url"): DataFrame = {
    // Every intermediate is staged as a temp COLUMN so each regex node
    // appears exactly once in the plan. The one-shot Column form
    // ([[normalizeUrl]]) inlines its intermediates — Catalyst has no
    // let-binding inside an expression — which multiplies ~25 regex
    // nodes (noFrag ×9, scheme ×5, …); fused into a downstream sort
    // stage that blew janino's 64 KB method limit and dropped the
    // whole stage to interpreted mode. Staged columns keep the
    // generated code additive and whole-stage codegen on.
    val a1 = regexp_replace(
      lower(regexp_extract(col("__nofrag"), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1)),
      "^www\\.", "")
    // path/query split mirrors normalizeUrl: scrub tracking params in
    // the query half only — '&' in the path must survive untouched
    val tail0 = regexp_replace(col("__nofrag"),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    val q2 = regexp_replace(regexp_replace(
      regexp_replace(
        concat(lit("&"), when(col("__tail0").contains("?"),
          regexp_extract(col("__tail0"), "^[^?]*\\?(.*)$", 1)).otherwise(lit(""))),
        "&(utm_[A-Za-z0-9_]+|gclid|fbclid|ref)=[^&]*", ""),
      "^&+", ""), "&+$", "")
    val reg = regexp_extract(col("__host"),
      "([a-z0-9-]+\\.(?:" + suffixAlt + "|[a-z]+))$", 1)
    df
      .withColumn("__nofrag", regexp_replace(col(urlCol), "#.*$", ""))
      .withColumn("__scheme",
        lower(regexp_extract(col("__nofrag"), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("__a1", a1)
      .withColumn("__auth",
        when(col("__scheme") === "http", regexp_replace(col("__a1"), ":80$", ""))
          .when(col("__scheme") === "https", regexp_replace(col("__a1"), ":443$", ""))
          .otherwise(col("__a1")))
      .withColumn("__tail0", tail0)
      .withColumn("__q2", q2)
      .withColumn("__t4", {
        val path = regexp_extract(col("__tail0"), "^([^?]*)", 1)
        when(col("__q2") === "", path)
          .otherwise(concat(path, lit("?"), col("__q2")))
      })
      .withColumn("url_norm",
        when(col("__scheme") === "", col(urlCol))
          .otherwise(concat(col("__scheme"), lit("://"), col("__auth"),
            when(col("__t4") === "" || col("__t4").startsWith("?"),
              concat(lit("/"), col("__t4"))).otherwise(col("__t4")))))
      .withColumn("__host",
        // scheme == "" ⇒ url_norm IS the raw url (pass-through), so
        // referencing the raw column avoids re-inlining the whole
        // normalization tree when a downstream plan prunes url_norm
        when(col("__scheme") === "",
          regexp_replace(lower(col(urlCol)), ":[0-9]+$", ""))
          .otherwise(regexp_replace(col("__auth"), ":[0-9]+$", "")))
      .withColumn("__reg", reg)
      .withColumn("domain",
        when(col("__reg") === "", col("__host")).otherwise(col("__reg")))
      .drop("__nofrag", "__scheme", "__a1", "__auth", "__tail0", "__q2",
        "__t4", "__host", "__reg")
  }

  /** Keep at most `n` rows per domain, by ascending `orderCol` (ties
    * broken by the order column itself being unique in practice; pass
    * a unique id for determinism). Scale: a keyed window — shuffles on
    * the domain only, never a global sort; at 100 TB the per-domain
    * partitions are the natural unit and AQE handles the mega-domain
    * skew this op exists to curb. */
  def capPerDomain(df: DataFrame, n: Int, domainCol: String = "domain",
                   orderCol: String = "doc_id"): DataFrame = {
    require(n > 0, s"capPerDomain needs n > 0, got $n")
    val w = Window.partitionBy(col(domainCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Per-domain corpus mix: doc count, share of the corpus, and the
    * count surviving a per-domain cap — the report that decides cap
    * values before committing to a curation run. One aggregation, one
    * scalar subquery for the total (broadcast, not a second scan at
    * the executor level). */
  def domainProfile(df: DataFrame, cap: Int, domainCol: String = "domain"): DataFrame = {
    require(cap > 0, s"domainProfile needs cap > 0, got $cap")
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"))
    // the total derives from the already-aggregated counts frame — a
    // df.count() here would be an eager, driver-side SECOND scan of
    // the corpus, and would run even if the caller never executes the
    // returned frame
    val total = counts.agg(sum(col("n_docs")).as("__total"))
    counts.crossJoin(total)
      .withColumn("share",
        round(col("n_docs").cast("double") / col("__total").cast("double"), 6))
      .withColumn("n_kept", least(col("n_docs"), lit(cap.toLong)))
      .drop("__total")
  }

  /** Strip HTML/XML markup from a text column: drop `<script>` /
    * `<style>` elements wholly (their text is code, not prose), drop
    * comments and tags, unescape the five named entities plus numeric
    * escapes for them, and collapse runs of whitespace to single
    * spaces. A pure narrow projection — the markup-heavy web page
    * becomes scorable prose without a parser dependency.
    *
    * Deliberately regex-based (not an HTML5 tree parser): at corpus
    * scale the input is truncated/overlapping/invalid markup and a
    * lenient strip is the documented, deterministic contract. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // block-level close tags → newline-ish space so words don't fuse
    val noTag = regexp_replace(noComment, "<[^>]+>", " ")
    // &amp; last: unescaping it first would double-decode "&amp;lt;".
    // Literal replace(), not regexp_replace — 12 stacked regex
    // evaluations broke the whole-stage-codegen method-size budget and
    // dropped the projection to interpreted mode; StringReplace keeps
    // the chain inside codegen.
    val unescaped = Seq(
      ("&lt;", "<"), ("&#60;", "<"),
      ("&gt;", ">"), ("&#62;", ">"),
      ("&quot;", "\""), ("&#34;", "\""),
      ("&#39;", "'"), ("&apos;", "'"),
      ("&nbsp;", " "), ("&#160;", " "),
      ("&amp;", "&"), ("&#38;", "&")
    ).foldLeft(noTag) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Add a `clean_text` column with markup stripped. */
  def withHtmlStripped(df: DataFrame, htmlCol: String = "text"): DataFrame =
    df.withColumn("clean_text", htmlToText(col(htmlCol)))

  /** Group-scoped boilerplate LINE removal (the CCNet/RefinedWeb
    * cleaning step): a line whose trimmed form appears in at least
    * `minDocs` DISTINCT documents of the same group (domain, source)
    * is navigation/footer/legal chrome, not content — remove every
    * occurrence, group by group, keeping each document's surviving
    * lines in their original order as `clean_text` (+`n_kept_lines`).
    * Blank lines are structure, not content: never counted, never
    * removed. Distinct-doc counting (not occurrences) means a single
    * page that repeats its own line 50 times cannot promote that line
    * to group boilerplate.
    *
    * Scale: one posexplode; the boilerplate table is ≤ one row per
    * DISTINCT (group, line) pair — corpus-shrinking, joined back with
    * a keyed left_anti (never broadcast-forced: at web scale the
    * chrome table of a big domain outgrows a driver hint); rebuild is
    * one keyed aggregation with an in-group sort by line position.
    * Nothing driver-side at any size. */
  def removeBoilerplateLines(docs: DataFrame, minDocs: Int,
                             idCol: String = "doc_id",
                             textCol: String = "text",
                             groupCol: String = "domain"): DataFrame = {
    require(minDocs >= 2, s"boilerplate needs minDocs >= 2, got $minDocs")
    val lines = docs
      .select(col(idCol).as("__id"), col(groupCol).as("__grp"),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__key", trim(col("__line")))
    val boiler = lines.filter(col("__key") =!= "")
      .groupBy(col("__grp"), col("__key"))
      .agg(countDistinct(col("__id")).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("__grp"), col("__key"))
    val kept = lines.join(boiler, Seq("__grp", "__key"), "left_anti")
    val rebuilt = kept.groupBy(col("__id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")),
          "\n").as("clean_text"),
        count(lit(1)).cast("long").as("n_kept_lines"))
      .withColumnRenamed("__id", idCol)
    docs.join(rebuilt, Seq(idCol), "left")
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
      .withColumn("n_kept_lines", coalesce(col("n_kept_lines"), lit(0L)))
  }

  /** Outbound links of an HTML column — one row per `href` attribute
    * (double- then single-quoted matches, document order within each),
    * with `is_absolute` (scheme-prefixed) and, for absolute links, the
    * [[registeredDomain]] of the target (NULL for relative links —
    * resolve them against the page URL upstream if needed). The feeder
    * for link-graph curation: absolute links keyed by (page domain,
    * target domain) are the edge list [[Graph.pageRank]] /
    * [[Graph.labelPropagation]] rank and cluster.
    *
    * Same lenient-regex contract as [[htmlToText]] (corpus HTML is
    * truncated/invalid; a parser dependency would be less
    * deterministic, not more). A narrow staged-regex projection +
    * explode — no shuffle, codegen intact. */
  def extractLinks(df: DataFrame, idCol: String = "doc_id",
                   htmlCol: String = "html"): DataFrame = {
    val dq = regexp_extract_all(col(htmlCol),
      lit("(?i)href\\s*=\\s*\"([^\"]+)\""), lit(1))
    val sq = regexp_extract_all(col(htmlCol),
      lit("(?i)href\\s*=\\s*'([^']+)'"), lit(1))
    val isAbs = col("href").rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    df.select(col(idCol), explode(concat(dq, sq)).as("href"))
      .withColumn("is_absolute", isAbs)
      .withColumn("domain", when(isAbs, registeredDomain(col("href")))
        .otherwise(lit(null).cast("string")))
  }

  /** PII patterns for [[redactPii]]/[[piiProfile]], in APPLICATION
    * ORDER (earlier redactions change later counts — e.g. an email's
    * digits must not later count as a phone): (type, regex,
    * replacement token). Every pattern is deliberately in the
    * Java-regex ∩ RE2 dialect — no lookaround, no backreferences, no
    * possessive quantifiers — so a SQL oracle (DuckDB, BigQuery,
    * anything RE2-based) replays the redaction bit-exactly; that
    * parity is the operator's correctness gate (q205), not an
    * accident. Recall trade-offs are documented per type, precision
    * over recall throughout (a redactor that eats prose is worse than
    * one that misses an exotic format — layer a learned NER pass
    * downstream if the corpus needs it):
    *  - email: practical RFC-lite (dot-atoms @ domain with a TLD);
    *  - cc: 16 digits in 4-groups with separators (spaced/dashed
    *    card-shaped strings; UNSEPARATED 16-digit runs are left —
    *    they are usually ids — and no Luhn check: a regex pass is a
    *    redactor, not a validator);
    *  - ssn: the 3-2-4 dashed shape;
    *  - ipv4: dotted quad with per-octet range checks (no bare-int
    *    hosts);
    *  - phone: +country-prefixed groups only (unprefixed local
    *    numbers are indistinguishable from prose digits at regex
    *    level). */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email",
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    ("cc", "\\b[0-9]{4}([ -][0-9]{4}){3}\\b", "<CC>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("ip",
      "\\b(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])" +
        "(\\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\\b",
      "<IP>"),
    ("phone", "\\+[0-9]{1,3}[- ][0-9]{2,4}([- ][0-9]{2,4}){2}",
      "<PHONE>"))

  /** Redact PII in `textCol` IN PLACE and count what was removed:
    * for each requested type (default: all of [[PiiPatterns]], in
    * that order) the row gains `n_<type>` = the number of
    * non-overlapping matches redacted, and `textCol` is rewritten
    * with the type's replacement token. Counting happens against the
    * text AS ALREADY REDACTED by earlier types — the counts sum to
    * the number of redactions actually made, never double-counting a
    * span two patterns both cover.
    *
    * Scale shape: one staged-regex codegen projection (Spark's
    * regexp_count/regexp_replace are codegen'd) — no shuffle, no UDF;
    * at 100 TB this runs at scan speed alongside any other
    * projection. */
  def redactPii(df: DataFrame, textCol: String = "text",
                types: Seq[String] = PiiPatterns.map(_._1)): DataFrame = {
    val byName = PiiPatterns.map(p => p._1 -> p).toMap
    val unknown = types.filterNot(byName.contains)
    require(unknown.isEmpty,
      s"unknown PII type(s): ${unknown.mkString(", ")} " +
        s"(have: ${PiiPatterns.map(_._1).mkString(", ")})")
    // keep PiiPatterns order regardless of argument order — the
    // sequential count-then-redact semantics depend on it
    PiiPatterns.filter(p => types.contains(p._1)).foldLeft(df) {
      case (d, (name, pat, tok)) =>
        // long counts: SQL engines count matches in 64-bit (DuckDB
        // len(), BigQuery ARRAY_LENGTH) — keeping the schema
        // oracle-identical costs nothing
        d.withColumn(s"n_$name",
            regexp_count(col(textCol), lit(pat)).cast("long"))
          .withColumn(textCol, regexp_replace(col(textCol), pat, tok))
    }
  }

  /** Corpus-level PII exposure profile: one row per type with the
    * total redactable match count and the number of documents
    * affected — the decision table for whether a corpus needs the
    * redaction pass at all (and the regression gate after it: a
    * profile of redacted output must be all zeros). ONE scan, one
    * explode of a types-sized array — the [[Profiling.columnProfile]]
    * one-pass shape. */
  def piiProfile(df: DataFrame, textCol: String = "text",
                 types: Seq[String] = PiiPatterns.map(_._1)): DataFrame = {
    val redacted = redactPii(df, textCol, types)
    val ordered = PiiPatterns.map(_._1).filter(types.contains)
    val aggs = ordered.flatMap { t =>
      Seq(sum(col(s"n_$t")).as(s"__m_$t"),
        sum(when(col(s"n_$t") > 0, 1L).otherwise(0L)).as(s"__d_$t"))
    }
    val one = redacted.agg(count(lit(1)).as("__rows"), aggs: _*)
    val rows = ordered.map(t =>
      struct(lit(t).as("pii_type"),
        coalesce(col(s"__m_$t"), lit(0L)).as("n_matches"),
        coalesce(col(s"__d_$t"), lit(0L)).as("n_docs"),
        col("__rows").as("n_rows")))
    one.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.pii_type").as("pii_type"),
        col("__r.n_matches").as("n_matches"),
        col("__r.n_docs").as("n_docs"),
        col("__r.n_rows").as("n_rows"))
  }
}
