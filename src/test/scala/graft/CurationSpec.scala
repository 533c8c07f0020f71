package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Curation

/** URL canonicalization / domain / HTML-strip contracts on crafted
  * inputs with non-default column names — the per-case expectations
  * are written out by hand, independent of the implementation. */
class CurationSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Curation.normalizeUrl(col("u"))).head().getString(0)

  private def dom(u: String): String =
    Seq(u).toDF("u").select(Curation.registeredDomain(col("u"))).head().getString(0)

  test("normalizeUrl canonical cases") {
    assert(norm("HTTP://WWW.Ex.COM:80/Path/3?utm_source=a&id=3&utm_campaign=x#f")
      == "http://ex.com/Path/3?id=3")
    assert(norm("https://blog.ex.co.uk:443/a/B/?ref=tw&x=1&gclid=z")
      == "https://blog.ex.co.uk/a/B/?x=1")
    // all params tracking → query gone entirely
    assert(norm("https://ex.com/p?utm_a=1&fbclid=2") == "https://ex.com/p")
    // empty path collapses to /
    assert(norm("https://Ex.com") == "https://ex.com/")
    assert(norm("https://ex.com?utm_x=1") == "https://ex.com/")
    // surviving params keep relative order; ? restored on the first
    assert(norm("https://ex.com/p?utm_a=1&b=2&c=3") == "https://ex.com/p?b=2&c=3")
    // path/query case is preserved; only scheme+host fold
    assert(norm("HTTPS://A.B/KeepCase?Q=V") == "https://a.b/KeepCase?Q=V")
    // default port only strips for the matching scheme
    assert(norm("http://ex.com:443/x") == "http://ex.com:443/x")
    // non-URLs pass through byte-identical
    assert(norm("not a url at all") == "not a url at all")
    assert(norm("") == "")
    // '&' is a legal PATH character — must survive untouched, and a
    // path segment matching the tracking pattern must never be deleted
    assert(norm("https://ex.com/a&b/c?x=1") == "https://ex.com/a&b/c?x=1")
    assert(norm("https://ex.com/a&ref=x/b?y=1") == "https://ex.com/a&ref=x/b?y=1")
    // a '?' inside a query VALUE stays part of that value
    assert(norm("https://ex.com/p?q=a?b&utm_x=1") == "https://ex.com/p?q=a?b")
  }

  test("registeredDomain two-level suffixes and fallbacks") {
    assert(dom("https://cdn.a-b.example.com/x") == "example.com")
    assert(dom("https://blog.src1-press.co.uk/a") == "src1-press.co.uk")
    assert(dom("http://deep.sub.host.com.au:8080/") == "host.com.au")
    assert(dom("bare-host.org") == "bare-host.org")
    assert(dom("localhost") == "localhost")
  }

  test("withUrlFeatures merges host variants of one site") {
    val df = Seq(
      (1L, "HTTP://WWW.Site-One.COM:80/a"),
      (2L, "https://cdn.site-one.com/b"),
      (3L, "https://other.co.uk/c")).toDF("id", "url")
    val doms = Curation.withUrlFeatures(df, "url")
      .select("domain").as[String].collect().toSeq
    assert(doms == Seq("site-one.com", "site-one.com", "other.co.uk"))
  }

  test("capPerDomain keeps n smallest per domain and nothing else") {
    val df = (1L to 20L).map(i => (i, if (i % 2 == 0) "a.com" else "b.com"))
      .toDF("doc_id", "domain")
    val kept = Curation.capPerDomain(df, 3, "domain", "doc_id")
      .as[(Long, String)].collect().toSet
    assert(kept == Set((2L, "a.com"), (4L, "a.com"), (6L, "a.com"),
      (1L, "b.com"), (3L, "b.com"), (5L, "b.com")))
    intercept[IllegalArgumentException](Curation.capPerDomain(df, 0))
  }

  test("domainProfile shares and capped counts") {
    val df = Seq.fill(8)("a.com").zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .++(Seq((100L, "b.com"), (101L, "b.com")))
      .toDF("doc_id", "domain")
    val rows = Curation.domainProfile(df, cap = 5)
      .orderBy("domain").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).toSeq == Seq(8L, 2L))
    assert(rows.map(_.getAs[Long]("n_kept")).toSeq == Seq(5L, 2L))
    assert(rows.map(_.getAs[Double]("share")).toSeq == Seq(0.8, 0.2))
  }

  test("htmlToText strips markup without double-decoding entities") {
    def strip(h: String): String =
      Seq(h).toDF("h").select(Curation.htmlToText(col("h"))).head().getString(0)
    assert(strip("<p>hello <b>world</b></p>") == "hello world")
    assert(strip("<SCRIPT>var a=1;</SCRIPT>keep<STYLE>s{}</STYLE>") == "keep")
    assert(strip("<script\nsrc=x>multi\nline</script>after") == "after")
    assert(strip("a <!-- comment --> b") == "a b")
    // &amp;lt; decodes to the LITERAL &lt; — never to <
    assert(strip("a &amp;lt; b &quot;q&quot;") == "a &lt; b \"q\"")
    assert(strip("x&nbsp;y &#39;z&#39;") == "x y 'z'")
    assert(strip("") == "")
    // broken markup stays lenient: unclosed tag eats to its >
    assert(strip("pre <b unclosed post") == "pre <b unclosed post")
  }

  test("removeBoilerplateLines: distinct-doc floor, group scoping, order kept") {
    val docs = Seq(
      (1L, "a.com", "one body\nfooter line\n\nmore one"),
      (2L, "a.com", "two body\nfooter line"),
      (3L, "a.com", "three body\nfooter line"),
      // repeats ITS OWN line 4x — must not self-promote to boilerplate
      (4L, "a.com", "self\nself\nself\nself"),
      // same footer text, different group: under b.com's floor -> kept
      (5L, "b.com", "five body\nfooter line"),
      // entirely boilerplate once the footer goes -> empty clean_text
      (6L, "a.com", "footer line")).toDF("id", "site", "body")
    val out = graft.api.Curation
      .removeBoilerplateLines(docs, minDocs = 3, idCol = "id",
        textCol = "body", groupCol = "site")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

    assert(out(1L).getAs[String]("clean_text") == "one body\n\nmore one",
      "footer removed, blank structural line preserved, order kept")
    assert(out(2L).getAs[String]("clean_text") == "two body")
    assert(out(4L).getAs[String]("clean_text") == "self\nself\nself\nself",
      "distinct-doc counting: one doc repeating a line cannot promote it")
    assert(out(5L).getAs[String]("clean_text") == "five body\nfooter line",
      "boilerplate is group-scoped")
    assert(out(6L).getAs[String]("clean_text") == "")
    assert(out(6L).getAs[Long]("n_kept_lines") == 0L)
    intercept[IllegalArgumentException](
      graft.api.Curation.removeBoilerplateLines(docs, minDocs = 1))
  }

  test("extractLinks: quote styles, case, relative vs absolute, domain") {
    val pages = Seq(
      (1L, """<a href="https://a.example.com/x">1</a> mid """ +
        """<A Href = 'HTTP://B.co.uk:8080/y#frag'>2</A>"""),
      (2L, """<a href='/rel/path'>r</a><a name="x">no href</a>"""),
      (3L, "no links at all")).toDF("id", "page")
    val out = Curation.extractLinks(pages, "id", "page").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        Option(r.getString(3))))
    assert(out.toSet == Set(
      (1L, "https://a.example.com/x", true, Some("example.com")),
      (1L, "HTTP://B.co.uk:8080/y#frag", true, Some("b.co.uk")),
      (2L, "/rel/path", false, None)), s"got ${out.toSeq}")
  }

  test("redactPii: sequential count-then-redact, no double counting, long counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "mail a.b+c@sub.example.org and card 4111 1111 1111 1111 ok"),
      (2L, "ssn 123-45-6789 ip 255.255.0.1 call +44-20-7946-0958"),
      (3L, "no pii here, just 1234 numbers and a dot. end"),
      (4L, "two mails x@y.io z@w.co and ip 10.1.255.7 10.1.255.8")
    ).toDF("doc_id", "text")
    val r = graft.api.Curation.redactPii(df).orderBy("doc_id").collect()
    val schema = graft.api.Curation.redactPii(df).schema
    Seq("n_email", "n_cc", "n_ssn", "n_ip", "n_phone").foreach(c =>
      assert(schema(c).dataType.typeName == "long", s"$c must be long"))
    val byId = r.map(x => x.getLong(0) -> x).toMap
    assert(byId(1L).getString(1) ==
      "mail <EMAIL> and card <CC> ok")
    assert(byId(2L).getString(1) == "ssn <SSN> ip <IP> call <PHONE>")
    assert(byId(3L).getString(1) ==
      "no pii here, just 1234 numbers and a dot. end")
    assert(byId(4L).getString(1) == "two mails <EMAIL> <EMAIL> and ip <IP> <IP>")
    def counts(row: org.apache.spark.sql.Row) =
      Seq("n_email", "n_cc", "n_ssn", "n_ip", "n_phone")
        .map(c => row.getLong(row.fieldIndex(c)))
    assert(counts(byId(1L)) == Seq(1L, 1L, 0L, 0L, 0L))
    assert(counts(byId(2L)) == Seq(0L, 0L, 1L, 1L, 1L))
    assert(counts(byId(3L)) == Seq(0L, 0L, 0L, 0L, 0L))
    assert(counts(byId(4L)) == Seq(2L, 0L, 0L, 2L, 0L))
    // sequential semantics: a card-shaped span is redacted by the cc
    // stage FIRST, so the later phone stage cannot double-count it
    val tricky = Seq((9L, "call +1-4111 1111 1111 1111 now")).toDF("doc_id", "text")
    val t = graft.api.Curation.redactPii(tricky).collect()(0)
    assert(t.getString(1) == "call +1-<CC> now")
    assert(t.getLong(t.fieldIndex("n_cc")) == 1L)
    assert(t.getLong(t.fieldIndex("n_phone")) == 0L)
    // profile: one row per type, matches/docs exact over the fixture
    val prof = graft.api.Curation.piiProfile(df).orderBy("pii_type").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(prof.toSeq == Seq(
      ("cc", 1L, 1L, 4L), ("email", 3L, 2L, 4L), ("ip", 3L, 2L, 4L),
      ("phone", 1L, 1L, 4L), ("ssn", 1L, 1L, 4L)))
    // unknown type fails loudly
    intercept[IllegalArgumentException] {
      graft.api.Curation.redactPii(df, types = Seq("dna"))
    }
  }
}
