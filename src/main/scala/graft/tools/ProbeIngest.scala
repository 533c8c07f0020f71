package graft.tools

import graft.IngestProbes

/** Standalone quiet-window ingest throughput A/B harness — the probes
  * Bench runs, without the 4-minute query suite around them:
  *
  *   runMain graft.tools.ProbeIngest stream <reps> [timeoutMs] [eps] [commitRows] [par] [groups]
  *   runMain graft.tools.ProbeIngest batch <reps> [buckets] [rows]
  *
  * Prints one line per rep plus the best, with the 1-min loadavg so a
  * contaminated window is visible. Same formulas as Bench/BASELINE.md:
  * streaming = committed rows ÷ configured timeout (the reference's
  * formula), batch = rows ÷ wall. */
object ProbeIngest {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("stream")
    def argAt(i: Int, default: Long): Long =
      if (args.length > i) args(i).toLong else default
    val reps = argAt(1, 3).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local("graft-probe")
    graft.AmbientLoad.start()
    def load1 = graft.AmbientLoad.load1Now()
    def ambient = graft.AmbientLoad.ambientNow()
    var best = -1L
    mode match {
      case "stream" =>
        val timeoutMs = argAt(2, 20000)
        // default mirrors IngestProbes.streamOnce (r10 A/B winner:
        // p=16, g=4, eps=200k per stream)
        val eps = argAt(3, 200000).toInt
        val commitRows = argAt(4, 1000000).toInt
        val par = argAt(5, 0).toInt
        val groups = argAt(6, 0).toInt
        // warmup absorbs stream startup (checkpoint init, first ORC
        // writers) — the configured-timeout formula would charge it.
        // 15 s default, matching Bench: the 5 s this tool originally
        // used is exactly the under-warm bias Bench's A/B diagnosed
        // (first timed rep ~35% low), and an A/B harness must not
        // default to the known-biased setting
        val warmupMs = argAt(7, 15000)
        IngestProbes.streamOnce(spark, cpus, warmupMs, eps, commitRows, par, groups)
        (1 to reps).foreach { i =>
          val l0 = load1
          val a0 = ambient
          val (rows, rate) = IngestProbes.streamOnce(
            spark, cpus, timeoutMs, eps, commitRows, par, groups)
          if (rate > best) best = rate
          println(f"[probe] stream rep$i: $rate%,d rows/s ($rows%,d committed, load1 $l0%.1f, ambient $a0%.2f)")
        }
      case "batch" =>
        val buckets = argAt(2, 32).toInt
        val rows = argAt(3, 10000000)
        IngestProbes.batchOnce(spark, cpus, buckets, 512 * 1024)
        (1 to reps).foreach { i =>
          val l0 = load1
          val a0 = ambient
          val io0 = graft.IoLoad.ioSome10Now()
          val rate = IngestProbes.batchOnce(spark, cpus, buckets, rows)
          if (rate > best) best = rate
          println(f"[probe] batch($buckets) rep$i: $rate%,d rows/s (load1 $l0%.1f, ambient $a0%.2f, io10 $io0%.1f)")
          // machine-parseable sample line: Bench forks this main into a
          // fresh JVM (VERDICT r15 #3) and reads rate + the gate inputs
          // measured in THIS process right before the rep. Locale.ROOT
          // (review r16): a comma-decimal default locale would corrupt
          // the comma-separated fields Bench splits on
          println("PROBE_BATCH_SAMPLE=%d,%.2f,%.1f"
            .formatLocal(java.util.Locale.ROOT, rate, a0, io0))
        }
      case other => sys.error(s"unknown mode $other")
    }
    println(f"[probe] best: $best%,d rows/s")
    spark.stop()
  }
}
