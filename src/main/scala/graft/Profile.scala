package graft

/** Ad-hoc per-query timing harness: `runMain graft.Profile q57_ann_ivf
  * q70_ann_recall` times each named query (or every query with no
  * args) on SPARK_GRAFT_SF_DIR with the same materialization and
  * cache-scope rules as Bench, printing one `PROFILE <name> <sec>`
  * line per query. Unlike Bench it runs no ingest probes and no
  * warmup suite, so a single query's plan can be iterated in seconds.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("graft-profile")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "1").toInt
    for (name <- names; r <- 1 to reps) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $name rep$r $t%.2f s")
    }
    spark.stop()
  }
}

/** Ingest-probe timing harness: `runMain graft.IngestProfile
  * [rows] [reps]` runs the bucketed + unbucketed batch probes with
  * Bench's exact configuration and prints each rep's rows/s — for
  * tuning the ingest path without a full bench run. */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(5000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val p = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = graft.core.Sessions.local("graft-ingest-profile")
    def probe(buckets: Int): Unit = (1 to reps).foreach { r =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-probe")
      try {
        val res = graft.ingest.Ingest.runBatch(spark,
          graft.ingest.IngestConfig(outputPath = Some(tmp.toString),
            parallelism = if (buckets > 0) p else 32, buckets = buckets,
            compression = sys.env.getOrElse("SPARK_GRAFT_INGEST_COMPRESSION", "lz4")), rows)
        println(s"INGEST buckets=$buckets p=${if (buckets > 0) p else 32} rep$r ${res.throughputRowsPerSec} rows/s")
      } finally {
        def rm(f: java.io.File): Unit = {
          val k = f.listFiles(); if (k != null) k.foreach(rm); f.delete()
        }
        try rm(tmp.toFile) catch { case _: Throwable => () }
      }
    }
    probe(32); probe(0)
    spark.stop()
  }
}

/** Streaming-probe harness: `runMain graft.StreamProfile [eps] [groups]
  * [timeoutMs] [reps]` runs the streaming commit path with Bench's
  * probe shape and prints committed rows + the reference-formula
  * throughput per rep. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val eps = args.headOption.map(_.toInt).getOrElse(200000)
    val groups = args.lift(1).map(_.toInt).getOrElse(4)
    val timeoutMs = args.lift(2).map(_.toLong).getOrElse(20000L)
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val spark = graft.core.Sessions.local("graft-stream-profile")
    (1 to reps).foreach { r =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-sprobe")
      try {
        val res = graft.ingest.Ingest.run(spark, graft.ingest.IngestConfig(
          outputPath = Some(tmp.toString), parallelism = 8,
          commitGroups = groups, eventsPerSecond = eps,
          commitAfterNRows = 1000000, timeoutMs = timeoutMs))
        println(s"STREAM eps=$eps g=$groups rep$r committed=${res.rowsCommitted} ${res.throughputRowsPerSec} rows/s")
      } finally {
        def rm(f: java.io.File): Unit = {
          val k = f.listFiles(); if (k != null) k.foreach(rm); f.delete()
        }
        try rm(tmp.toFile) catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
