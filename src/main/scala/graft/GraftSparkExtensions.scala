package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.expr._

/** SparkSessionExtensions hook: registers the engine's native Catalyst
  * expressions as SQL FUNCTIONS, so the whole surface is reachable from
  * `spark.sql(...)` — not just the Column/Dataset API. Same expression
  * objects as the `graft.functions` wrappers (TextFunctions /
  * VectorFunctions route through the identical case classes), so SQL
  * and DataFrame results are bit-identical and fuse into the same
  * codegen stages.
  *
  * Two ways to enable:
  *  - in code: `SparkSession.builder().withExtensions(new
  *    GraftSparkExtensions)` (what `Sessions.local` does);
  *  - by config, with no code at all: `--conf
  *    spark.sql.extensions=graft.GraftSparkExtensions` (the class is a
  *    zero-arg `SparkSessionExtensions => Unit`, the contract that
  *    conf expects).
  *
  * Registered: vec_dot(array<float>, array<float>),
  * min_shingle_hash(text, n), minhashes(text, n, k),
  * distinct_shingle_hashes(text, n), simhash64(text),
  * nfc_normalize(text). Arity and
  * literal-ness of the n/k parameters are checked at resolution time
  * (they parameterize one-pass primitive loops — a per-row value would
  * force re-planning per row, which no engine supports).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSparkExtensions.register(ext)
}

object GraftSparkExtensions {

  private def intLit(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got: $other")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${args.length}")

  private def fd(name: String, usage: String)(
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.expr", null, name, usage, ""),
      builder)

  /** The function set, exposed for registration against either a
    * SparkSessionExtensions (builder path) or an existing session's
    * FunctionRegistry. */
  private val functions = Seq(
    fd("vec_dot", "vec_dot(a, b) - double dot product of two array<float> columns") { args =>
      arity("vec_dot", 2, args)
      FloatDotProduct(args(0), args(1))
    },
    fd("min_shingle_hash", "min_shingle_hash(text, n) - min hash over word n-shingles") { args =>
      arity("min_shingle_hash", 2, args)
      MinShingleHash(args(0), intLit("min_shingle_hash", "n", args(1)))
    },
    fd("minhashes", "minhashes(text, n, k) - k minhash values over word n-shingles") { args =>
      arity("minhashes", 3, args)
      MinHashes(args(0), intLit("minhashes", "n", args(1)),
        intLit("minhashes", "k", args(2)))
    },
    fd("distinct_shingle_hashes",
      "distinct_shingle_hashes(text, n) - sorted distinct word-n-shingle hashes") { args =>
      arity("distinct_shingle_hashes", 2, args)
      DistinctShingleHashes(args(0), intLit("distinct_shingle_hashes", "n", args(1)))
    },
    fd("simhash64", "simhash64(text) - 64-bit frequency-weighted simhash") { args =>
      arity("simhash64", 1, args)
      SimHash64(args(0))
    },
    fd("nfc_normalize", "nfc_normalize(text) - Unicode NFC normalization") { args =>
      arity("nfc_normalize", 1, args)
      NfcNormalize(args(0))
    })

  def register(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}
