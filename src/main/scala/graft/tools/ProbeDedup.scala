package graft.tools

import graft.ingest.{Gen, Ingest, IngestConfig}

/** Cost probe for the commit-path near-dup suppressor
  * (IngestConfig.suppressNearDups): interleaved off/on legs of the
  * SAME batch-committed load — a mostly-unique 100k-text round-robin
  * dictionary, so the suppressor does real fingerprint + filter work
  * without degenerate total suppression — reporting committed rows/s
  * per leg plus ambient/io provenance. Quantifies what the feature
  * costs at the commit path, the number a user sizing dedup-at-ingest
  * needs.
  *
  *   runMain graft.tools.ProbeDedup [rows] [reps]
  */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 5000000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.core.Sessions.local("graft-probe-dedup")
    graft.AmbientLoad.start()
    // 100k distinct 5-word texts, every word index-tagged so each text
    // gets its own min-shingle fingerprint; at rows >> 100k each text
    // repeats rows/100k times — the ON leg suppresses all but the
    // first, which is the heavy case for the within-batch window
    val dict = (0 until 100000).map(i => s"pa$i pb$i pc$i pd$i pe$i")
    def cfg(dir: String, dedup: Boolean) = IngestConfig(
      outputPath = Some(dir), parallelism = 8, buckets = 8,
      columns = Some(Seq(
        Gen.ColSpec("user_id", Gen.ColType.StringUuidPool),
        Gen.ColSpec("text", Gen.ColType.StringDict, dict = dict))),
      suppressNearDups = if (dedup) Some("text") else None)
    def rmrf(f: java.io.File): Unit = graft.IngestProbes.rmrfQuiet(f)
    def leg(dedup: Boolean, rep: Int, n: Long = rows): Unit = {
      val dir = java.nio.file.Files.createTempDirectory("graft-probe-dedup")
      val amb = graft.AmbientLoad.ambientNow()
      val io = graft.IoLoad.ioSome10Now()
      val t0 = System.nanoTime()
      val res = Ingest.runBatchCommitted(spark, cfg(dir.toString, dedup), n,
        batches = math.max(1, (n / 1000000L).toInt))
      val sec = (System.nanoTime() - t0) / 1e9
      // rows/s over the INPUT rows (the work done), not the kept rows
      println(f"PROBE_DEDUP dedup=$dedup rep=$rep input_rows_per_sec=${(n / sec).toLong}%d " +
        f"committed=${res.rowsCommitted}%d wall=$sec%.1f amb=$amb%.2f io10=$io%.1f")
      rmrf(dir.toFile)
    }
    // warm both paths once at 1/10 scale
    leg(dedup = false, rep = 0, n = math.max(100000L, rows / 10))
    leg(dedup = true, rep = 0, n = math.max(100000L, rows / 10))
    (1 to reps).foreach { r => leg(dedup = false, r); leg(dedup = true, r) }
    spark.stop()
  }
}
