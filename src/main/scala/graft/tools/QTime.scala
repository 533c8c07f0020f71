package graft.tools


import graft.SparkEntry

/** One-off query timer: `runMain graft.tools.QTime <sfDir> q48 q47 ...`
  * — runs each named query (after one warmup pass of the first) and
  * prints wall seconds, for A/B plan comparisons without a full bench. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = graft.core.Sessions.local("graft-qtime")
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    graft.AmbientLoad.start()
    names.headOption.foreach(once) // warmup
    names.foreach(n => println(
      f"[qtime] $n%-26s ${once(n)}%6.2f s  (amb ${graft.AmbientLoad.ambientNow()}%.2f)"))
    spark.stop()
  }
}
