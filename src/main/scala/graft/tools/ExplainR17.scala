package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan artifacts for the r17 optimization round (`plans/r17/`):
  *  - q168 AFTER the step-1-survivors checkpoint (inner stages via the
  *    PlanAudit probe, like ExplainExecuted);
  *  - q215's BEFORE twin — the identical self-join over the
  *    UNBUCKETED `committedView`, showing the two Exchanges the
  *    bucket-aware read removes (q215 itself is new in r17, so its
  *    "before" is the read path every committed-table join used
  *    through r16).
  *
  * Usage: runMain graft.tools.ExplainR17 [sfDir] <outDir>
  */
object ExplainR17 {
  private def cap(s: String): String = s.linesIterator
    .map(l => if (l.length > 300) l.take(300) + " ...<truncated>" else l)
    .mkString("\n")

  private def executedString(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/r17")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = graft.core.Sessions.local("graft-explain-r17", defaultCpus = "8")
    spark.sparkContext.setLogLevel("ERROR")

    def dumpQuery(name: String, out: String): Unit = {
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
        sb.append(s"\n### $name inner stage ${i + 1}/${stages.length} (executed)\n\n```\n")
          .append(cap(executedString(d))).append("\n```\n")
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, out), sb.toString)
      System.err.println(s"[explain-r17] wrote $out (${stages.length} stages)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    dumpQuery("q168_streaming_semantic_suppress",
      "q168_streaming_semantic_suppress_after.txt")
    dumpQuery("q215_bucketed_commit_join", "q215_bucketed_commit_join_after.txt")

    // q215's before-twin: same fixture, same hints, but the UNBUCKETED
    // committedView read (the r16 read path)
    locally {
      val path = {
        // reuse the fixture q215 just built via its FixtureCache key
        val f = new java.io.File(System.getProperty("java.io.tmpdir"))
        f.listFiles().filter(_.getName.startsWith("graft-fix-bktcommit"))
          .map(_.getAbsolutePath).headOption.getOrElse {
            // build it by running q215 (fixture side effect)
            graft.SparkEntry.queries("q215_bucketed_commit_join")(spark, sfDir)
              .queryExecution.toRdd.count()
            f.listFiles().filter(_.getName.startsWith("graft-fix-bktcommit"))
              .map(_.getAbsolutePath).head
          }
      }
      val t = graft.core.Tables.committedView(spark, path)
      val a = t.select(col("user_id"))
      val b = t.select(col("user_id").as("uid2"))
      val df = a.hint("merge").join(b.hint("merge"), col("user_id") === col("uid2"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("user_id")).as("n_keys"))
        .crossJoin(t.agg(count(lit(1)).as("n_rows")))
        .select(col("n_rows"), col("n_keys"), col("n_pairs"))
      df.queryExecution.toRdd.count()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, "q215_bucketed_commit_join_before.txt"),
        s"## q215_bucketed_commit_join BEFORE-twin: identical self-join over the " +
          s"UNBUCKETED committedView (the r16 read path)\n\n```\n" +
          cap(executedString(df)) + "\n```\n")
      System.err.println("[explain-r17] wrote q215 before-twin")
    }
    spark.stop()
  }
}
