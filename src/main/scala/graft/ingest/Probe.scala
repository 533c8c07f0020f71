package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Throughput breakdown probe for the ingest path: generation only,
  * unbucketed write, bucketed write — isolates where the time goes so
  * tuning targets the real bottleneck. Usage:
  * `runMain graft.ingest.Probe [numRows]`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    for (round <- 1 to 2) {
      for ((tag, b) <- Seq(("unbucketed", 0), ("bucketed-32", 32))) {
        val dir = Files.createTempDirectory("probe").toString
        timed(s"[$round] orc lz4 $tag") {
          Ingest.runBatch(spark,
            cfg.copy(outputPath = Some(dir), buckets = b, format = "orc"), rows)
        }
        rm(new java.io.File(dir))
      }
    }
    spark.stop()
  }
}
