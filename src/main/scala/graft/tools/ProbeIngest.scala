package graft.tools

import graft.IngestProbes

/** Standalone quiet-window ingest throughput A/B harness — the probes
  * Bench runs, without the 4-minute query suite around them:
  *
  *   runMain graft.tools.ProbeIngest stream <reps> [timeoutMs] [eps] [commitRows] [par] [groups] [warmupMs] [gate] [ioGate] [maxAttempts] [waitQuietMs]
  *   runMain graft.tools.ProbeIngest batch <reps> [buckets] [rows] [gate] [ioGate] [maxAttempts] [waitQuietMs]
  *
  * Prints one line per rep plus the best, with the 1-min loadavg so a
  * contaminated window is visible. Same formulas as Bench/BASELINE.md:
  * streaming = committed rows ÷ configured timeout (the reference's
  * formula), batch = rows ÷ wall.
  *
  * Gate-aware retry (VERDICT r16 #1): when `gate` > 0 the probe (a)
  * waits — bounded by `waitQuietMs` per rep — for CPU-ambient < gate
  * AND PSI io10 < ioGate before each rep, and (b) after the base
  * `reps`, KEEPS taking reps (up to `maxAttempts` total) until at
  * least one sample was measured on a gate-passing window. The r16
  * record's failure mode was exactly a fixed 3-shot probe whose every
  * shot landed on a busy minute: the engine measured 1.78–2.23M
  * rows/s but all three samples were gate-rejected, so the record
  * fell back to a depressed hot-heap in-suite number. gate <= 0 (the
  * default) keeps the fixed-rep A/B behavior. */
object ProbeIngest {

  /** Bounded wait until ambient < gate and io10 < ioGate; returns the
    * seconds waited. gate <= 0 = no wait. */
  private def waitQuiet(gate: Double, ioGate: Double, budgetMs: Long): Double = {
    if (gate <= 0) return 0.0
    val t0 = System.currentTimeMillis()
    def bad: Boolean = {
      val a = graft.AmbientLoad.ambientNow()
      val io = graft.IoLoad.ioSome10Now()
      (a >= 0 && a >= gate) || (io >= 0 && io >= ioGate)
    }
    while (bad && System.currentTimeMillis() - t0 < budgetMs)
      Thread.sleep(5000)
    (System.currentTimeMillis() - t0) / 1000.0
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("stream")
    def argAt(i: Int, default: Long): Long =
      if (args.length > i) args(i).toLong else default
    def dblAt(i: Int, default: Double): Double =
      if (args.length > i) args(i).toDouble else default
    val reps = argAt(1, 3).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local("graft-probe")
    graft.AmbientLoad.start()
    def load1 = graft.AmbientLoad.load1Now()
    def ambient = graft.AmbientLoad.ambientNow()
    var best = -1L
    // gate-aware rep loop shared by both modes: runs `reps` samples,
    // then keeps going (≤ maxAttempts total) while NO sample yet
    // passed the gate — each rep preceded by a bounded wait-for-quiet
    def repLoop(gate: Double, ioGate: Double, maxAttempts: Int,
                waitQuietMs: Long)(rep: (Int, Double, Double) => Unit): Unit = {
      var i = 0
      var gatePassed = false
      while (i < reps || (gate > 0 && !gatePassed && i < maxAttempts)) {
        i += 1
        val waited = waitQuiet(gate, ioGate, waitQuietMs)
        val a0 = ambient
        val io0 = graft.IoLoad.ioSome10Now()
        if (waited > 0.5)
          System.err.println(f"[probe] waited $waited%.0f s for quiet (amb $a0%.2f, io10 $io0%.1f)")
        rep(i, a0, io0)
        if (gate > 0 && a0 >= 0 && a0 < gate && (io0 < 0 || io0 < ioGate))
          gatePassed = true
      }
      if (gate > 0 && !gatePassed)
        System.err.println(s"[probe] GATE-STARVED: no rep in $i attempts ran on a quiet window")
    }
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
        val gate = dblAt(8, 0.0)
        val ioGate = dblAt(9, 10.0)
        val maxAttempts = argAt(10, reps.toLong).toInt
        val waitQuietMs = argAt(11, 60000)
        IngestProbes.streamOnce(spark, cpus, warmupMs, eps, commitRows, par, groups)
        repLoop(gate, ioGate, maxAttempts, waitQuietMs) { (i, a0, io0) =>
          val l0 = load1
          val ph0 = graft.ingest.Ingest.CommitPhases.snap()
          val (rows, rate) = IngestProbes.streamOnce(
            spark, cpus, timeoutMs, eps, commitRows, par, groups)
          if (rate > best) best = rate
          println(f"[probe] stream rep$i: $rate%,d rows/s ($rows%,d committed, load1 $l0%.1f, ambient $a0%.2f, io10 $io0%.1f)")
          // per-phase commit-path attribution (r18, VERDICT #6): wall
          // seconds each commit phase spent this rep, summed across the
          // concurrent commit groups (so the total can exceed the rep's
          // wall when groups overlap)
          val ph1 = graft.ingest.Ingest.CommitPhases.snap()
          val deltas = ph1.map { case (k, v) => k -> (v - ph0.getOrElse(k, 0L)) }
          val nCommits = math.max(1L, deltas.getOrElse("commits", 0L))
          val phaseStr = deltas.toSeq.filter(_._1 != "commits").sortBy(-_._2)
            .map { case (k, ns) => f"$k=${ns / 1e9}%.1fs(${ns / 1e6 / nCommits}%.0fms/c)" }
            .mkString(" ")
          println(s"[probe] phases rep$i: commits=$nCommits $phaseStr")
          // machine-parseable sample line (VERDICT r16 #1: the
          // streaming probe gets the same fresh-JVM forked form the
          // batch probe grew in r16); Locale.ROOT so a comma-decimal
          // default locale cannot corrupt the field separators
          println("PROBE_STREAM_SAMPLE=%d,%d,%.2f,%.1f,%.2f"
            .formatLocal(java.util.Locale.ROOT, rows, rate, a0, io0, l0))
        }
      case "batch" =>
        val buckets = argAt(2, 32).toInt
        val rows = argAt(3, 10000000)
        val gate = dblAt(4, 0.0)
        val ioGate = dblAt(5, 10.0)
        val maxAttempts = argAt(6, reps.toLong).toInt
        val waitQuietMs = argAt(7, 60000)
        IngestProbes.batchOnce(spark, cpus, buckets, 512 * 1024)
        repLoop(gate, ioGate, maxAttempts, waitQuietMs) { (i, a0, io0) =>
          val l0 = load1
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
