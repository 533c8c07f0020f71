package graft.tools

import org.apache.spark.sql.DataFrame

/** Plan artifacts for the r17 graph-iteration co-partitioning change
  * (`plans/r17/`): dumps the EXECUTED plan of each graph bench query
  * plus every inner checkpoint stage (the per-iteration frames the
  * PlanAudit probe sees — the loop bodies where the Exchange count
  * per iteration is the whole claim).
  *
  * Usage: runMain graft.tools.ExplainGraphR17 [sfDir] [outDir] [suffix]
  *   suffix: "_before" (run at the pre-change commit) or "_after".
  */
object ExplainGraphR17 {
  private def cap(s: String): String = s.linesIterator
    .map(l => if (l.length > 300) l.take(300) + " ...<truncated>" else l)
    .mkString("\n")

  private def executedString(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/r17")
    val suffix = args.lift(2).getOrElse("_after")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = graft.core.Sessions.local("graft-explain-graph-r17",
      defaultCpus = "8")
    spark.sparkContext.setLogLevel("ERROR")

    def dumpQuery(name: String): Unit = {
      val stages = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      graft.api.PlanAudit.probe = Some(d => stages += d)
      val df =
        try graft.SparkEntry.queries(name)(spark, sfDir)
        finally graft.api.PlanAudit.probe = None
      df.queryExecution.toRdd.count()
      val sb = new StringBuilder
      sb.append(s"## $name (executed)\n\n```\n")
        .append(cap(executedString(df))).append("\n```\n")
      stages.zipWithIndex.foreach { case (d, i) =>
        val plan = executedString(d)
        val exchanges = "(?m)^\\s*[^R]*Exchange".r
          .findAllIn(plan).size
        sb.append(s"\n### $name inner stage ${i + 1}/${stages.length} " +
            s"(executed; Exchange nodes excl. Reused: $exchanges)\n\n```\n")
          .append(cap(plan)).append("\n```\n")
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name$suffix.txt"), sb.toString)
      System.err.println(s"[explain-graph-r17] wrote $name$suffix.txt " +
        s"(${stages.length} stages)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    dumpQuery("q181_trade_pagerank")
    dumpQuery("q187_label_propagation")
    spark.stop()
  }
}
