package graft.tools

/** Local iteration helper: time named SparkEntry queries (full physical
  * execution via toRdd.count, the Bench materialization) for `reps`
  * repetitions each, on an arbitrary sf dir — the per-query feedback
  * loop Bench is too heavy for. Usage:
  *   runMain graft.tools.TimeQueries <sfDir> <reps> <q1,q2,...>
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(',').toSeq
    val spark = graft.core.Sessions.local("graft-timeq")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        t
      }
      println(f"[timeq] $name%-36s ${ts.map(t => f"$t%.2f").mkString(" ")}s min=${ts.min}%.2f")
    }
    spark.stop()
  }
}
