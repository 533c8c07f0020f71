package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** A/B for the r18 [[graft.functions.expr.SortedIntersectCount]] verify
  * kernel vs the legacy `size(array_intersect(sh_a, sh_b))` — guide
  * §1.2 step 2 (per-task work): Spark's `array_intersect` builds a
  * per-row hash set and materializes the intersection ARRAY just so
  * `size` can read its length, per CANDIDATE PAIR of the exact-Jaccard
  * verify stage (near-dup pairs, suppressors, containment). The inputs
  * are sorted distinct by construction at every call site, so one
  * allocation-free merge pass computes the identical count.
  *
  * Measured through the REAL consumer shape: the candidate pair frame
  * (sh_a/n_a/sh_b/n_b after joinBack) is built ONCE from the actual
  * PPJoin candidate join over `shingleSets`, checkpointed, and each leg
  * then runs the full verify (intersect → Jaccard → threshold filter →
  * rounded output) to an aggregate. Legs ALTERNATE in one JVM so box
  * drift cancels (the AbIndexBuild discipline); the equality gate is
  * the surviving-pair count plus an order-insensitive checksum over
  * (doc_a, doc_b, jaccard) — the full observable contract of verify.
  *
  * Usage: runMain graft.tools.AbIntersectKernel [docs] [tokens] [threshold] [reps] [out.json]
  */
object AbIntersectKernel {

  def main(args: Array[String]): Unit = {
    def argAt(i: Int, default: String): String =
      if (args.length > i) args(i) else default
    val docs = argAt(0, "400000").toInt
    val tokens = argAt(1, "120").toInt
    val threshold = argAt(2, "0.6").toDouble
    val reps = argAt(3, "3").toInt
    val outJson = argAt(4, "bench_ab_r18_intersect.json")

    val spark = graft.core.Sessions.local("graft-ab-intersect", defaultCpus =
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic corpus with real near-duplicates: docs come in
    // groups of 4 sharing a base token stream — member 0 is the base,
    // member 3 an exact dup (J = 1), member 2 perturbs every 13th
    // token (J ≈ 0.75), member 1 every 7th (J ≈ 0.55, straddling the
    // 0.6 threshold) — so the PPJoin candidate set is non-trivial AND
    // verify does real accept/reject work on realistic-size sets.
    // Cross-group docs share essentially no 3-shingles (50k vocab).
    val grp = floor(col("id") / 4).cast("long")
    val mem = pmod(col("id"), lit(4))
    val base = spark.range(0, docs.toLong, 1, 32)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          transform(sequence(lit(0), lit(tokens - 1)), t =>
            concat(lit("w"), pmod(xxhash64(grp * 1000 + t +
              when(mem === 1 && pmod(t, lit(7)) === 0, lit(7000000))
                .when(mem === 2 && pmod(t, lit(13)) === 0, lit(13000000))
                .otherwise(lit(0))),
              lit(50000))))).as("text"))

    val candEps = 1e-6
    val sets = graft.api.Dedup.shingleSets(base).localCheckpoint()
    val prefixLen = (floor(col("n") * (1 - threshold) + candEps) + 1).cast("int")
    val prefix = sets.select(col("doc_id"), col("n"),
        slice(col("sh"), lit(1), prefixLen).as("pre"))
      .select(col("doc_id"), col("n"), posexplode(col("pre")).as(Seq("pos", "tok")))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") * threshold <= col("a.n") + candEps &&
          col("a.n") * threshold <= col("b.n") + candEps &&
          least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
            (col("a.n") + col("b.n")) * lit(threshold / (1 + threshold)) - candEps)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val pairs = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("n").as("n_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("n").as("n_b")), "doc_b")
      .localCheckpoint()
    val nPairs = pairs.count()

    def verifyWith(inter: org.apache.spark.sql.Column): DataFrame =
      pairs
        .withColumn("inter", inter)
        .withColumn("jx",
          col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
        .filter(col("jx") >= threshold)
        .select(col("doc_a"), col("doc_b"), round(col("jx"), 6).as("jaccard"))

    def consume(df: DataFrame): (Long, Long) = {
      val r = df.select(xxhash64(col("doc_a"), col("doc_b"), col("jaccard")).as("h"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("ck"))
        .collect().head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    def legacy(): (Long, Long) =
      consume(verifyWith(size(array_intersect(col("sh_a"), col("sh_b")))))
    def native(): (Long, Long) =
      consume(verifyWith(sortedIntersectCount(col("sh_a"), col("sh_b"))))

    // warm both paths once, gate equality
    val g0 = legacy()
    val g1 = native()
    require(g0 == g1, s"verify drift: legacy $g0 vs native $g1")

    val legacyTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val nativeTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    var checks = Set.empty[(Long, Long)]
    (1 to reps).foreach { r =>
      // alternate leg ORDER per rep so warm-up drift cancels
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
    val json = s"""{"tool":"AbIntersectKernel","docs":$docs,"tokens":$tokens,""" +
      s""""threshold":$threshold,"reps":$reps,"candidate_pairs":$nPairs,""" +
      s""""survivors":${g0._1},"contents_identical":true,""" +
      s""""legacy_sec":[${legacyTimes.map(f).mkString(",")}],""" +
      s""""native_sec":[${nativeTimes.map(f).mkString(",")}],""" +
      s""""legacy_best":${f(legacyTimes.min)},"native_best":${f(nativeTimes.min)},""" +
      s""""speedup_best":${f(legacyTimes.min / nativeTimes.min)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    println(json)
    spark.stop()
  }
}
