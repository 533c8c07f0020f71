package graft.ingest

import java.nio.file.Files


/** Throughput breakdown probe for the ingest path: generation only,
  * unbucketed write, bucketed write — isolates where the time goes so
  * tuning targets the real bottleneck. Usage:
  * `runMain graft.ingest.Probe [numRows]`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local("graft-probe")

    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $tag%-28s ${s}%8.2f s  ${(rows / s / 1000).toLong}%6d k rows/s")
    }

    val cfg = IngestConfig(outputPath = None, parallelism = cpus)
    // warmup
    Ingest.batchFrame(spark, cfg, 100000).queryExecution.toRdd.count()

    timed("generate only") {
      Ingest.batchFrame(spark, cfg, rows).queryExecution.toRdd.count()
    }
    timed("route+generate (no write)") {
      Ingest.routeAndProject(
        spark.range(0, rows, 1, cfg.parallelism)
          .selectExpr("id as value", "cast(id % 8 as int) as __pid"),
        cfg.copy(buckets = 32)).queryExecution.toRdd.count()
    }
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    // sweep stream counts for the bucketed path: files written =
    // p × 32, so p trades writer parallelism against per-file ORC
    // fixed cost (arg 2 = comma-separated p list)
    val pList = args.lift(1).map(_.split(',').map(_.toInt).toSeq)
      .getOrElse(Seq(cpus))
    for (round <- 1 to 2) {
      for ((tag, b, p) <- pList.map(p => (s"unbucketed p=$p", 0, p)) ++
             pList.map(p => (s"bucketed-32 p=$p", 32, p))) {
        val dir = Files.createTempDirectory("probe").toString
        timed(s"[$round] orc lz4 $tag") {
          Ingest.runBatch(spark,
            cfg.copy(outputPath = Some(dir), buckets = b, format = "orc",
              parallelism = p), rows)
        }
        rm(new java.io.File(dir))
      }
      // no-dictionary variant: 5 of the 10 columns draw from 1M-value
      // pools, so per-stripe dictionary attempts hash every value and
      // then abandon (threshold 0.8) — pure wasted CPU on this data
      val dir2 = Files.createTempDirectory("probe").toString
      timed(s"[$round] bucketed-32 nodict") {
        Ingest.routeAndProject(
          spark.range(0, rows, 1, 8)
            .selectExpr("id as value", "cast(spark_partition_id() as int) as __pid"),
          cfg.copy(buckets = 32, parallelism = 8))
          .write.mode("overwrite").format("orc")
          .option("compression", "lz4")
          .option("orc.compress.size", "32768")
          .option("orc.dictionary.key.threshold", "0")
          .partitionBy("year", "month").save(dir2)
      }
      rm(new java.io.File(dir2))
    }
    spark.stop()
  }
}
