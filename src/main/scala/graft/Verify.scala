package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional third arg (local iteration only; the driver passes two):
    // comma-separated query names to restrict the dump to
    val (sfDir, outDir, only) = args match {
      case Array(sf, out)         => (sf, out, None)
      case Array(sf, out, filter) => (sf, out, Some(filter.split(',').toSet))
    }
    val spark = graft.core.Sessions.local("graft-verify")
    val code = run(spark, sfDir, outDir, only)
    spark.stop()
    // belt and braces for direct CLI use: the sentinel rows cover the
    // driver gate, the exit code covers humans and shell scripts
    if (code != 0) sys.exit(code)
  }

  /** The dump pass, session-in / exit-code-out so the failure contract
    * (sentinel row + verify_errors.json + nonzero code) is testable
    * without forking a JVM. */
  private[graft] def run(spark: org.apache.spark.sql.SparkSession,
                         sfDir: String, outDir: String,
                         only: Option[Set[String]]): Int = {
    new java.io.File(outDir).mkdirs()
    // Failure visibility (VERDICT r7 #2): a query that throws used to be
    // written NOWHERE — the driver's correctness gate then silently
    // omitted it, and 14 broken queries hid for two rounds. Now a failed
    // query still writes its output dir, containing a one-row sentinel
    // frame (column `_graft_verify_error`) that can never hash-match any
    // oracle — the gate records a loud red row instead of a gap — and
    // every failure also lands in `verify_errors.json` for direct
    // inspection.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
        System.err.println(s"[verify] FAILED $name — $msg")
        errors(name) = msg
        try {
          import spark.implicits._
          Seq(msg.take(2000)).toDF("_graft_verify_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
      // per-query cache scope: nothing a query cached/checkpointed may
      // stay pinned into the next query (VERDICT r2 #6)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
    if (errors.nonEmpty) 1 else 0
  }
}
