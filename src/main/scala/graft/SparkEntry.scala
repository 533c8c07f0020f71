package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from per-family modules; each module
  * exposes `queries` (Spark implementations) and `oracles` (equivalent
  * ANSI SQL for the driver's DuckDB correctness gate). Queries without
  * an oracle entry are non-SQL-expressible (hash-based sketches etc.)
  * and get the driver's weaker rows-only check.
  */
object SparkEntry {
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (Analytic.queries, Analytic.oracles),
      (Scalars.queries, Scalars.oracles),
      (Events.queries, Events.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (Generators.queries, Generators.oracles)
    )

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
