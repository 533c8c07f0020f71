package graft.core

import org.apache.spark.sql.SparkSession

/** The ONE local SparkSession builder every driver entry point shares
  * (Bench / Verify / Cli / Explain — TestSpark mirrors it in test
  * scope). Centralized because the settings are load-bearing and must
  * never drift per entry point:
  *  - `spark.sql.legacy.parquet.nanosAsLong` — without it every scan of
  *    the TIMESTAMP(NANOS) events fixture throws (Tables.events);
  *  - shuffle partitions = cores, not the 200 default;
  *  - UTC session timezone for oracle parity;
  *  - UI off (headless drivers).
  */
object Sessions {
  def local(appName: String, defaultCpus: String = "32"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new graft.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
