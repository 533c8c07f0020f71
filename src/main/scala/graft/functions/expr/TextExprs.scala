package graft.functions.expr

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-sketch hot paths (min-shingle hash,
  * k-minhash, simhash). The higher-order-function formulations are
  * CodegenFallback in Spark AND allocate an SQL array per intermediate
  * (shingle list, per-shingle hash list, per-hash-function pass), so a
  * 64-hash minhash walks the shingles 64 times. These expressions do
  * one pass per document with primitive accumulators.
  *
  * Hashing: xxHash-style avalanche over the shingle string's hashCode
  * stream is NOT enough for minhash quality — we hash the shingle bytes
  * with a 64-bit FNV-1a then finalize with splitmix64, and derive the k
  * minhash functions by double hashing (Kirsch–Mitzenmacher):
  * h_i = h1 + i·h2. Sketch values are internal bucketing keys, not a
  * cross-version contract.
  */
object TextHash {
  private val ws = Pattern.compile("\\s+")

  /** Spark-split-compatible whitespace tokenization (limit -1). */
  def tokens(s: String): Array[String] = ws.split(s, -1)

  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    splitmix64(h)
  }

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Apply `f` to the hash pair (h1, h2) of every n-word shingle.
    * Shingle semantics mirror TextFunctions.wordShingles: fewer than n
    * tokens → one shingle of the whole text. */
  def foreachShingleHash(text: String, n: Int)(f: (Long, Long) => Unit): Unit = {
    val toks = tokens(text)
    if (toks.length < n) {
      val s = toks.mkString(" ")
      f(fnv64(s), fnv64(s + "\u0000"))
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val s = sb.toString
        f(fnv64(s), fnv64(s + "\u0000"))
        i += 1
      }
    }
  }
}

/** Minimum shingle hash (k-min sketch with k = 1): `long`. */
case class MinShingleHash(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0)
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"min_shingle_hash needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    var min = Long.MaxValue
    TextHash.foreachShingleHash(input.asInstanceOf[UTF8String].toString, n) {
      (h1, _) => if (h1 < min) min = h1
    }
    min
  }
  override protected def withNewChildInternal(c: Expression): MinShingleHash = copy(child = c)
  override def prettyName: String = "min_shingle_hash"
}

/** k MinHash values over word n-shingles: `array<long>`, one pass. */
case class MinHashes(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0 && k > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhashes needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val mins = Array.fill(k)(Long.MaxValue)
    TextHash.foreachShingleHash(input.asInstanceOf[UTF8String].toString, n) {
      (h1, h2) =>
        var i = 0
        var h = h1
        while (i < k) {
          if (h < mins(i)) mins(i) = h
          h += h2 // double hashing: h_i = h1 + i*h2
          i += 1
        }
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): MinHashes = copy(child = c)
  override def prettyName: String = "minhashes"
}

/** Sorted distinct word-n-shingle hashes: `array<long>`, one pass with
  * primitive sort+dedupe — the set representation behind the
  * Jaccard-based dedup operators (set size and pairwise intersections
  * equal the distinct-string-shingle set's, modulo 64-bit collisions).
  * Replaces an interpreted HOF chain (transform + concat_ws + slice +
  * array_distinct + array_sort) that allocated an SQL array per
  * intermediate. */
case class DistinctShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"distinct_shingle_hashes needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    var buf = new Array[Long](64)
    var m = 0
    TextHash.foreachShingleHash(input.asInstanceOf[UTF8String].toString, n) {
      (h1, _) =>
        if (m == buf.length) buf = java.util.Arrays.copyOf(buf, m * 2)
        buf(m) = h1
        m += 1
    }
    java.util.Arrays.sort(buf, 0, m)
    var w = 0
    var i = 0
    while (i < m) {
      if (w == 0 || buf(i) != buf(w - 1)) { buf(w) = buf(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, w))
  }
  override protected def withNewChildInternal(c: Expression): DistinctShingleHashes = copy(child = c)
  override def prettyName: String = "distinct_shingle_hashes"
}

/** 64-bit SimHash over whitespace tokens (frequency-weighted ±1 per
  * bit): `long`, one pass with a primitive counter array. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val counts = new Array[Int](64)
    val toks = TextHash.tokens(input.asInstanceOf[UTF8String].toString)
    var i = 0
    while (i < toks.length) {
      val h = TextHash.fnv64(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Shared char-bigram language-model kernel (27 symbols: space + a-z,
  * case-folded, with space-run collapse so punctuation/whitespace salvos
  * count once). Training and scoring use the SAME normalization, so a
  * model is valid for any text the scorer sees. */
object CharLm {
  val Symbols = 27

  @inline private def symbol(c: Char): Int = {
    val lower = Character.toLowerCase(c)
    if (lower >= 'a' && lower <= 'z') lower - 'a' + 1 else 0
  }

  /** Fold a document's bigram transitions into `counts` (length 27²,
    * row-major prev×next). Space→space transitions are skipped. */
  def accumulate(s: String, counts: Array[Long]): Unit = {
    var prev = 0
    var i = 0
    while (i < s.length) {
      val idx = symbol(s.charAt(i))
      if (idx != 0 || prev != 0) {
        counts(prev * Symbols + idx) += 1
        prev = idx
      }
      i += 1
    }
  }

  /** Row-conditional log-probabilities of a (Laplace-smoothed) count
    * table: model[p*27+n] = ln P(next=n | prev=p). */
  def logProbs(counts: Array[Long]): Array[Double] = {
    val model = new Array[Double](Symbols * Symbols)
    var p = 0
    while (p < Symbols) {
      var total = 0L
      var n = 0
      while (n < Symbols) { total += counts(p * Symbols + n); n += 1 }
      n = 0
      while (n < Symbols) {
        model(p * Symbols + n) = math.log(counts(p * Symbols + n).toDouble / total)
        n += 1
      }
      p += 1
    }
    model
  }

  /** Mean transition log-probability of a document (0.0 for documents
    * with no transitions) — the per-doc score. */
  def score(s: String, model: Array[Double]): Double = {
    var prev = 0
    var i = 0
    var n = 0
    var sum = 0.0
    while (i < s.length) {
      val idx = symbol(s.charAt(i))
      if (idx != 0 || prev != 0) {
        sum += model(prev * Symbols + idx)
        n += 1
        prev = idx
      }
      i += 1
    }
    if (n == 0) 0.0 else sum / n
  }
}

/** Mean char-bigram log-probability of a text column under a trained
  * 27-symbol model (TextAnalysis.fitCharBigramLm) — the cheap stand-in
  * for KenLM perplexity in a CCNet-style quality-filter stage. The
  * model (27² doubles, ~6 KB) rides in the expression tree, so scoring
  * is one pass per document with zero per-row allocation and no join
  * against a model table. */
case class CharBigramScore(child: Expression, model: Array[Double])
    extends UnaryExpression with CodegenFallback {
  require(model.length == CharLm.Symbols * CharLm.Symbols,
    s"model must be ${CharLm.Symbols}x${CharLm.Symbols} log-probs")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_bigram_score needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    CharLm.score(input.asInstanceOf[UTF8String].toString, model)
  override protected def withNewChildInternal(c: Expression): CharBigramScore =
    copy(child = c)
  override def prettyName: String = "char_bigram_score"
}

/** Static entry point for [[NfcNormalize]]'s generated code. */
object TextNormal {
  /** Unicode NFC normalization of a UTF8String. The `isNormalized`
    * probe short-circuits the common case (ASCII / already-composed
    * text) with zero allocation — only genuinely decomposed input pays
    * the String round-trip. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization: `string → string`. Unlike the sketch
  * expressions above (CodegenFallback — their one-pass primitive loops
  * don't benefit from inlining), this participates in whole-stage
  * codegen so the normalize → regexp_replace chain in
  * `TextAnalysis.normalizeText` stays one fused stage. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize needs string, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    TextNormal.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.TextNormal.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}
