package graft.tools

import org.apache.spark.sql.functions._

/** Component timing for q81_ivfpq_contract (VERDICT r17 #5: q81 is the
  * slowest non-suppressor sf0.1 query, flat three rounds): times the
  * index build, the Both-search consume, and the exact-q47 subtree
  * separately, reps× each, so the 5.6 s floor is attributable.
  *
  *   runMain graft.tools.ProbeQ81 [sfDir] [reps]
  */
object ProbeQ81 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.local("graft-probe-q81")
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe-q81] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"[probe-q81] --- rep $rep ---")
      val emb = graft.core.Tables.embeddings(spark, sfDir)
      val idx = java.nio.file.Files
        .createTempDirectory("graft-probe-q81").toString
      t("build_ivfpq") { graft.api.Similarity.buildIvfPqIndex(emb, idx) }
      val (adc, res) = t("search_plan") {
        graft.api.Similarity.ivfPqSearchIndexBoth(
          spark, idx, emb, nprobe = 2, rescoreDepth = 15) }
      t("search_consume") {
        adc.queryExecution.toRdd.count()
        res.queryExecution.toRdd.count() }
      t("q47_exact") {
        graft.SparkEntry.queries("q47_cosine_topk")(spark, sfDir)
          .queryExecution.toRdd.count() }
      t("q81_full") {
        graft.SparkEntry.queries("q81_ivfpq_contract")(spark, sfDir)
          .queryExecution.toRdd.count() }
      drop()
      graft.IngestProbes.rmrfQuiet(new java.io.File(idx))
    }
    spark.stop()
  }
}
