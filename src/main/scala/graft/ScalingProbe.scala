package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Core-count scaling probe (VERDICT r17 #2): the driver benches the
  * suite at two core counts, but at sf0.1 every declared query runs
  * 1–5 s dominated by fixed per-job cost, so the per-query c8/c32
  * ratios read ≈1 and the driver cannot distinguish "parallelizes
  * fine" from "serial" (`suspect_cpus_ignored`). This probe times a
  * few FIXED-SIZE kernels big enough that compute, not scheduling,
  * dominates — the same work at any `SPARK_GRAFT_CPUS`, so the
  * low-core/high-core seconds ratio approximates the core ratio when
  * the engine parallelizes. All inputs are generated in-process
  * (spark.range / the smoke generators); nothing persists, nothing is
  * keyed on the test data, and the kernels are the suite's real hot
  * paths: a wide shuffle aggregation, a sort-merge join, the
  * coarse-quantizer cell kernel, and the gram-hash text kernel.
  *
  * Budget: ~20 s at 32 cores, ~70–90 s at 8 — bounded, and spent once
  * per bench run after the probe windows (its load cannot contaminate
  * a headline: the headline load1 is captured before it runs). */
object ScalingProbe {
  /** Standalone runner: `runMain graft.ScalingProbe` times the kernels
    * at the session's `SPARK_GRAFT_CPUS` without the rest of Bench. */
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("graft-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark).foreach { case (k, v) =>
      println(f"[scaling] $k%-12s $v%6.1f s") }
    spark.stop()
  }

  def run(spark: SparkSession): Seq[(String, Double)] = {
    val sc = spark.sparkContext
    // each kernel runs at 1/8 scale first (codegen/JIT warm — a single
    // cold run charges ~3-4 s of constant compile/warm cost to the
    // timed number, which at 32 cores swamps the parallel fraction and
    // flattens the very ratio this probe exists to expose), then the
    // full-size timed run
    def timed(name: String)(mk: Long => org.apache.spark.sql.DataFrame,
              rows: Long): (String, Double) = {
      sc.setJobDescription(s"scaling-probe warm: $name")
      mk(rows / 8).queryExecution.toRdd.count()
      sc.setJobDescription(s"scaling-probe: $name")
      val t0 = System.nanoTime()
      mk(rows).queryExecution.toRdd.count()
      sc.setJobDescription(null)
      name -> (System.nanoTime() - t0) / 1e9
    }
    // deterministic centroids — the cell kernel needs only A grid, not
    // a fitted one, to measure assignment throughput
    val centroids = Array.tabulate(256) { c =>
      Array.tabulate(16) { k =>
        (java.lang.Long.hashCode(c * 7919L + k * 104729L) % 2000) / 1000.0f - 1.0f
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    // wide shuffle aggregation: 120M rows → 15M groups (≥20× more keys
    // than partitions at any core count, guide §2.5)
    // hash values shift right 33 bits before any sum: ANSI mode throws
    // on long-sum overflow, and 1.2e8 × 2^31 stays far inside a long
    out += timed("scale_agg")(n =>
      spark.range(n)
        .select(pmod(xxhash64(col("id")), lit(n / 8)).as("k"),
          shiftright(xxhash64(col("id"), lit(1)), 33).as("v"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("c"), sum(col("v")).as("s"), max(col("v")).as("m")),
      120000000L)
    // sort-merge join: both sides shuffled and sorted, 40M × 40M
    out += timed("scale_join")(n => {
      val a = spark.range(n)
        .select(col("id").as("k"), shiftright(xxhash64(col("id")), 33).as("va"))
      val b = spark.range(n)
        .select(pmod(xxhash64(col("id"), lit(2)), lit(n)).as("k"),
          col("id").as("vb"))
      a.join(b, "k").groupBy(pmod(col("k"), lit(64)).as("g"))
        .agg(count(lit(1)).as("c"), sum(col("va")).as("s"), max(col("vb")).as("m"))
    }, 40000000L)
    // compute-bound cell assignment: 8M × 256 cells × 16 dims
    out += timed("scale_cell")(n =>
      ScaleSmoke.embeddings(spark, n)
        .select(graft.functions.VectorFunctions
          .nearestCell(col("embedding"), centroids).as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("c")),
      8000000L)
    // text kernel: shingle/gram hashing over 4M generated docs
    out += timed("scale_gram")(n =>
      ScaleSmoke.docs(spark, n)
        .select(graft.functions.TextFunctions
          .gramHashes(lower(col("text")), 3).as("gh"))
        .select(explode(col("gh.g")).as("g"))
        .agg(count(lit(1)).as("c"), sum(shiftright(col("g"), 33)).as("s")),
      4000000L)
    out.toSeq
  }
}
