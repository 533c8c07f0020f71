package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Jobs-per-commit counter for the streaming suppressors (VERDICT r17
  * #7: q164 is driver-job-count-bound — ~30 small jobs per rep; count
  * the jobs one suppressor commit schedules, before/after the r18 job
  * folds). Builds a small near-dup index fixture, registers a
  * SparkListener, and runs ONE `nearDupSuppressAndIndex` /
  * `semanticSuppressAndIndex` / `hammingSuppressAndIndex` commit each,
  * printing the scheduled-job count per phase.
  *
  *   runMain graft.tools.ProbeJobs [corpusRows] [batchRows]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val corpusRows = args.headOption.map(_.toLong).getOrElse(20000L)
    val batchRows = args.lift(1).map(_.toLong).getOrElse(5000L)
    val spark = graft.core.Sessions.local("graft-probe-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def counted[A](name: String)(body: => A): A = {
      // listener bus is async: give it a beat to drain before snapshots
      Thread.sleep(300)
      val j0 = jobs.get
      val t0 = System.nanoTime()
      val r = body
      Thread.sleep(300)
      println(f"[probe-jobs] $name%-28s jobs=${jobs.get - j0}%3d  ${(System.nanoTime() - t0) / 1e9 - 0.3}%6.2f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("graft-probe-jobs")
    val corpus = graft.ScaleSmoke.docs(spark, corpusRows)
    val batch = graft.ScaleSmoke.docs(spark, batchRows, offset = corpusRows,
      replayEvery = 3L).localCheckpoint()
    val emb = graft.ScaleSmoke.embeddings(spark, corpusRows)
    val embBatch = graft.ScaleSmoke.embeddings(spark, batchRows,
      offset = corpusRows, replayEvery = 3L).localCheckpoint()

    counted("buildNearDupIndex") {
      graft.api.Dedup.buildNearDupIndex(corpus, s"$root/nd") }
    // one warm commit (JIT/codegen), then the counted commit on a
    // SECOND batch (fresh token, so the append really runs)
    locally {
      val k = graft.api.Dedup.nearDupSuppressAndIndex(batch, s"$root/nd")
      k.count(); graft.api.Dedup.releaseMaterialized(k)
    }
    val batch2 = graft.ScaleSmoke.docs(spark, batchRows,
      offset = corpusRows + batchRows, replayEvery = 3L).localCheckpoint()
    counted("nearDupSuppressAndIndex") {
      val k = graft.api.Dedup.nearDupSuppressAndIndex(batch2, s"$root/nd")
      k.count(); graft.api.Dedup.releaseMaterialized(k)
    }

    counted("buildIvfIndex") {
      graft.api.Similarity.buildIvfIndex(emb, s"$root/ivf", cells = 64) }
    locally {
      val k = graft.api.Similarity.semanticSuppressAndIndex(
        embBatch, s"$root/ivf", threshold = 0.97)
      k.count(); graft.api.Dedup.releaseMaterialized(k)
    }
    val embBatch2 = graft.ScaleSmoke.embeddings(spark, batchRows,
      offset = corpusRows + batchRows, replayEvery = 3L).localCheckpoint()
    counted("semanticSuppressAndIndex") {
      val k = graft.api.Similarity.semanticSuppressAndIndex(
        embBatch2, s"$root/ivf", threshold = 0.97)
      k.count(); graft.api.Dedup.releaseMaterialized(k)
    }

    val sigOf = graft.functions.TextFunctions.simHash64(lower(col("text")))
    counted("buildHammingIndex") {
      graft.api.Dedup.buildHammingIndex(
        corpus.select(col("doc_id"), sigOf.as("sig")), s"$root/ham") }
    locally {
      val k = graft.api.Dedup.hammingSuppressAndIndex(
        batch.select(col("doc_id"), sigOf.as("sig")), s"$root/ham")
      k.count(); graft.api.Dedup.releaseMaterialized(k)
    }
    counted("hammingSuppressAndIndex") {
      val k = graft.api.Dedup.hammingSuppressAndIndex(
        batch2.select(col("doc_id"), sigOf.as("sig")), s"$root/ham")
      k.count(); graft.api.Dedup.releaseMaterialized(k)
    }

    counted("keepOne (chain 20k nodes)") {
      val edges = spark.range(19999L)
        .filter(col("id") % 100 =!= 99)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val cc = graft.api.Graph.connectedComponents(edges)
      cc.count(); graft.api.Dedup.releaseMaterialized(cc)
    }
    graft.IngestProbes.rmrfQuiet(root.toFile)
    spark.stop()
  }
}
