package graft.ingest

import graft.functions.expr.TextHash
import org.scalacheck.{Prop, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Gen.{alphaNumStr, choose, listOfN}

/** Property-based checks (SURVEY §5.2) for the pure kernels under the
  * generators and sketches — no SparkSession needed, so these run in
  * milliseconds and cover wide input ranges. */
object TextHashProps extends Properties("TextHash") {

  property("splitmix64 is injective on sequential inputs") =
    Prop.passed :| "checked below" && {
      val n = 100000
      val seen = new java.util.HashSet[java.lang.Long](n * 2)
      (0 until n).forall(i => seen.add(TextHash.splitmix64(i.toLong)))
    }

  property("fnv64 is deterministic") = forAll(alphaNumStr) { s =>
    TextHash.fnv64(s) == TextHash.fnv64(s)
  }

  property("fnv64 rarely collides on distinct short strings") = {
    val strs = (0 until 50000).map(i => s"tok$i")
    strs.map(TextHash.fnv64).distinct.size == strs.size
  }

  property("shingle count is max(1, tokens - n + 1)") =
    forAll(listOfN(12, alphaNumStr.suchThat(_.nonEmpty)), choose(1, 5)) {
      (toks, n) =>
        val text = toks.mkString(" ")
        var count = 0
        TextHash.foreachShingleHash(text, n)((_, _) => count += 1)
        count == math.max(1, toks.length - n + 1)
    }

  property("minhash double-hash family: pairwise distinct per shingle") =
    forAll(alphaNumStr.suchThat(_.nonEmpty)) { s =>
      // h_i = h1 + i*h2 must not degenerate (h2 == 0 breaks the family)
      var ok = true
      TextHash.foreachShingleHash(s, 1)((h1, h2) => ok &= h2 != 0L)
      ok
    }

  property("degenerate inputs produce exactly one shingle, never zero") =
    forAll(choose(1, 5)) { n =>
      // empty text and sub-n token counts fall back to the whole-text
      // shingle (TextFunctions.wordShingles contract)
      Seq("", "one", "a b").forall { text =>
        var count = 0
        TextHash.foreachShingleHash(text, n)((_, _) => count += 1)
        count == math.max(1, TextHash.tokens(text).length - n + 1)
      }
    }
}

/** Commit accounting / throughput formula properties. */
object IngestMathProps extends Properties("IngestMath") {

  property("throughput divides committed rows by configured whole seconds") =
    forAll(choose(0L, 10000000L), choose(1000L, 600000L)) { (rows, timeoutMs) =>
      // mirrors Ingest.report (Culvert.java:170-171 formula)
      val expect = rows / math.max(1L, timeoutMs / 1000)
      expect >= 0 && expect <= rows
    }

  property("identity bucket key decomposes back to (stream, bucket)") =
    forAll(choose(0, 63), choose(0, 31)) { (pid, bucket) =>
      val b = 32
      val k = pid.toLong * b + bucket
      (k / b).toInt == pid && (k % b).toInt == bucket
    }
}
