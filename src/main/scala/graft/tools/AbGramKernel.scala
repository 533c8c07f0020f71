package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** A/B for the r17 one-pass native [[graft.functions.expr.GramHashes]]
  * kernel vs the legacy interpreted HOF gram chain
  * (posexplode(transform(sequence) + slice + concat_ws + lower +
  * xxhash64)) behind span removal and the dup-n-gram profiles — guide
  * §1.2 step 2 (per-task work), measured through the REAL consumer
  * shape: project grams positionally, count per gram, keep grams seen
  * ≥ minCount, join the positions back, aggregate. Legs ALTERNATE in
  * one JVM so box drift cancels (the AbIndexBuild discipline); the
  * equality gate is the full observable contract — the count and an
  * order-independent checksum of the MARKED (doc_id, pos) set, which
  * the gram equality classes determine and the hash values do not.
  *
  * Usage: runMain graft.tools.AbGramKernel [rows] [tokens] [n] [reps] [out.json]
  */
object AbGramKernel {

  def main(args: Array[String]): Unit = {
    def argAt(i: Int, default: String): String =
      if (args.length > i) args(i) else default
    val rows = argAt(0, "200000").toInt
    val tokens = argAt(1, "200").toInt
    val n = argAt(2, "8").toInt
    val reps = argAt(3, "3").toInt
    val outJson = argAt(4, "bench_ab_r17_gramkernel.json")

    val spark = graft.core.Sessions.local("graft-ab-gram", defaultCpus =
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic corpus: every 10th doc ends in a shared 12-token
    // boilerplate so the dup-gram set is nonempty and closed-form-ish;
    // the rest is pseudo-random words over a compact vocabulary (some
    // natural cross-doc duplicate grams arise, same in both variants)
    val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")
    val corpus = spark.range(0, rows.toLong, 1, 32)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          transform(sequence(lit(0), lit(tokens - 1)),
            t => concat(lit("w"), pmod(xxhash64(col("id") * 1000 + t),
              lit(5000)))),
          when(col("id") % 10 === 0, lit(boiler)).otherwise(lit("")))
          .as("text"))
      .localCheckpoint()

    def legacyGrams(df: DataFrame): DataFrame = {
      val toks = filter(wsTokens(col("text")), t => t =!= "")
      df.select(col("doc_id"),
        posexplode(when(size(toks) >= n,
            transform(sequence(lit(0), size(toks) - n),
              i => xxhash64(lower(concat_ws(" ", slice(toks, i + 1, lit(n)))))))
          .otherwise(array().cast("array<bigint>"))).as(Seq("pos", "g")))
    }
    def nativeGrams(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
        posexplode(gramHashes(col("text"), n).getField("g"))
          .as(Seq("pos", "g")))

    // the markedSpans consumer: grams repeated >= 2 times corpus-wide
    // mark their (doc_id, pos); the result is hash-value-independent
    def marked(grams: DataFrame): (Long, Long) = {
      val dup = grams.groupBy("g").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select("g")
      val r = grams.join(dup, "g")
        .select(col("doc_id"), col("pos"),
          xxhash64(col("doc_id"), col("pos")).as("h"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("ck"))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }

    // warm both paths once, gate equality
    val g0 = marked(legacyGrams(corpus))
    val g1 = marked(nativeGrams(corpus))
    require(g0 == g1, s"marked-position drift: legacy $g0 vs native $g1")

    val legacyTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val nativeTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    var checks = Set.empty[(Long, Long)]
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      checks += marked(legacyGrams(corpus))
      val t1 = System.nanoTime()
      checks += marked(nativeGrams(corpus))
      val t2 = System.nanoTime()
      legacyTimes += (t1 - t0) / 1e9
      nativeTimes += (t2 - t1) / 1e9
    }
    require(checks.size == 1, s"cross-rep drift: $checks")
    val f = (v: Double) => "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json = s"""{"tool":"AbGramKernel","rows":$rows,"tokens":$tokens,""" +
      s""""n":$n,"reps":$reps,"marked_identical":true,""" +
      s""""marked_count":${g0._1},""" +
      s""""legacy_sec":[${legacyTimes.map(f).mkString(",")}],""" +
      s""""native_sec":[${nativeTimes.map(f).mkString(",")}],""" +
      s""""legacy_best":${f(legacyTimes.min)},"native_best":${f(nativeTimes.min)},""" +
      s""""speedup_best":${f(legacyTimes.min / nativeTimes.min)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    println(json)
    spark.stop()
  }
}
