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
