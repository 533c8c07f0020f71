package graft.tools

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.expr.{DistinctShingleHashes, MinHashes, ShingleSketch}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StringType

/** A/B microbench for the r17 one-pass [[ShingleSketch]] expression vs
  * the two-pass legacy (separate [[DistinctShingleHashes]] +
  * [[MinHashes]] projections) — guide §1: measure the per-task change
  * in isolation, where operator-level legs on this box swing 3×
  * run-to-run on identical code, and where the 50M smoke's synthetic
  * ~12-word docs understate real shingling cost by two orders of
  * magnitude. Pure-JVM, no Spark session; docs are synthesized at a
  * configurable token length (default 200 — a short web page;
  * real-corpus documents run 100–10k tokens). Legs ALTERNATE per rep
  * so drift cancels; every row's (sh, mh) is asserted EQUAL across
  * variants.
  *
  * Usage: runMain graft.tools.AbShingleKernel [rows] [tokens] [reps] [out.json]
  */
object AbShingleKernel {

  def main(args: Array[String]): Unit = {
    def argAt(i: Int, default: String): String =
      if (args.length > i) args(i) else default
    val rows = argAt(0, "20000").toInt
    val tokens = argAt(1, "200").toInt
    val reps = argAt(2, "5").toInt
    val outJson = argAt(3, "bench_ab_r17_shinglekernel.json")
    val n = 3
    val k = 64

    // deterministic corpus: `rows` docs of `tokens` pseudo-random
    // words over a 50k vocabulary (the ScaleSmoke.docs word model)
    val docs: Array[UTF8String] = Array.tabulate(rows) { r =>
      val sb = new java.lang.StringBuilder
      var t = 0
      var h = r * 2654435761L + 12345L
      while (t < tokens) {
        h = h * 6364136223846793005L + 1442695040888963407L
        if (t > 0) sb.append(' ')
        sb.append("w").append(java.lang.Long.toUnsignedString(h >>> 40) .take(4))
        t += 1
      }
      UTF8String.fromString(sb.toString)
    }

    val ref = BoundReference(0, StringType, nullable = false)
    val twoPassSh: Expression = DistinctShingleHashes(ref, n)
    val twoPassMh: Expression = MinHashes(ref, n, k)
    val onePass: Expression = ShingleSketch(ref, n, k)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

    def runTwoPass(): (Long, Long) = {
      var acc = 0L
      var i = 0
      while (i < docs.length) {
        row.update(0, docs(i))
        val sh = twoPassSh.eval(row)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val mh = twoPassMh.eval(row)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        acc ^= (if (sh.numElements() > 0) sh.getLong(0) else 0L) ^
          mh.getLong(0) ^ mh.getLong(k - 1) ^ sh.numElements()
        i += 1
      }
      (acc, docs.length.toLong)
    }
    def runOnePass(): (Long, Long) = {
      var acc = 0L
      var i = 0
      while (i < docs.length) {
        row.update(0, docs(i))
        val st = onePass.eval(row).asInstanceOf[InternalRow]
        val sh = st.getArray(0)
        val mh = st.getArray(1)
        acc ^= (if (sh.numElements() > 0) sh.getLong(0) else 0L) ^
          mh.getLong(0) ^ mh.getLong(k - 1) ^ sh.numElements()
        i += 1
      }
      (acc, docs.length.toLong)
    }

    // full bit-equality gate over every row first (not just the xor)
    var i = 0
    while (i < docs.length) {
      row.update(0, docs(i))
      val sh0 = twoPassSh.eval(row)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      val mh0 = twoPassMh.eval(row)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      val st = onePass.eval(row).asInstanceOf[InternalRow]
      require(java.util.Arrays.equals(sh0, st.getArray(0).toLongArray()),
        s"sh drift at row $i")
      require(java.util.Arrays.equals(mh0, st.getArray(1).toLongArray()),
        s"mh drift at row $i")
      i += 1
    }

    // warm both paths
    runTwoPass(); runOnePass()
    val twoTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val oneTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    var checks = Set.empty[Long]
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      val (a0, _) = runTwoPass()
      val t1 = System.nanoTime()
      val (a1, _) = runOnePass()
      val t2 = System.nanoTime()
      twoTimes += (t1 - t0) / 1e9
      oneTimes += (t2 - t1) / 1e9
      checks ++= Set(a0, a1)
    }
    require(checks.size == 1, s"xor checksum drift: $checks")
    val f = (v: Double) => "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json = s"""{"tool":"AbShingleKernel","rows":$rows,"tokens":$tokens,""" +
      s""""shingle":$n,"hashes":$k,"reps":$reps,"rows_identical":true,""" +
      s""""twopass_sec":[${twoTimes.map(f).mkString(",")}],""" +
      s""""onepass_sec":[${oneTimes.map(f).mkString(",")}],""" +
      s""""twopass_best":${f(twoTimes.min)},"onepass_best":${f(oneTimes.min)},""" +
      s""""speedup_best":${f(twoTimes.min / oneTimes.min)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    println(json)
  }
}
