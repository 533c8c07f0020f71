package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Gen

/** Driver-gate correctness rows for the synthetic generator library
  * (reference `core/Column.java` semantics): the deterministic
  * contracts — dictionary round-robin, value domains, 1M pool cycling —
  * are checkable by the DuckDB oracle via `range()` and constants.
  * These queries ignore the sf directory (the generator is the
  * source). */
object Generators {
  type Q = (SparkSession, String) => DataFrame

  private def gen(s: SparkSession, rows: Long, parts: Int = 8): DataFrame =
    Gen.generate(
      s.range(0, rows, 1, parts).select(col("id").as("value")),
      Gen.defaultColumns ++ Gen.partitionColumns, seed = 123L)

  val queries: Map[String, Q] = Map(

    // Dictionary columns are deterministic round-robin over the dict
    // (`Column.java:117`: dictionary[row % len]) — exact per-value
    // counts are reproducible from the row index alone.
    "q58_generator_dicts" -> ((s, _) => {
      gen(s, 60000)
        .groupBy(col("ad_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("ad_type"), col("event_type"))
    }),

    // Domain contract: year ∈ [2000,2049] (50 values), month ∈ [0,11]
    // (12 values) (`Column.java:61-62`; SURVEY §1.2). 100k rows hit
    // every pooled value deterministically.
    "q59_generator_domains" -> ((s, _) => {
      gen(s, 100000)
        .agg(min(col("year")).as("min_year"), max(col("year")).as("max_year"),
          countDistinct(col("year")).as("n_years"),
          min(col("month")).as("min_month"), max(col("month")).as("max_month"),
          countDistinct(col("month")).as("n_months"))
    }),

    // Pool cycling: pooled generators repeat with period 1M
    // (`Column.java:103`: index = row % 1_000_000) — the same 10 row
    // indexes one period apart yield exactly 10 distinct users.
    "q60_generator_pool_cycle" -> ((s, _) => {
      val rows = s.range(0, 10, 1, 2)
        .union(s.range(Gen.PoolSize, Gen.PoolSize + 10, 1, 2))
        .select(col("id").as("value"))
      Gen.generate(rows, Gen.defaultColumns, seed = 123L)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_distinct_users"),
          countDistinct(col("ip_address")).as("n_distinct_ips"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q58_generator_dicts" ->
      """SELECT ['banner','modal','sponsored-search','mail','mobile'][CAST(range % 5 AS INT) + 1] AS ad_type,
        |       ['view','click','purchase'][CAST(range % 3 AS INT) + 1] AS event_type,
        |       count(*) AS n
        |FROM range(60000) GROUP BY 1, 2 ORDER BY ad_type, event_type""".stripMargin,
    "q59_generator_domains" ->
      """SELECT 2000 AS min_year, 2049 AS max_year, CAST(50 AS BIGINT) AS n_years,
        |       0 AS min_month, 11 AS max_month, CAST(12 AS BIGINT) AS n_months""".stripMargin,
    "q60_generator_pool_cycle" ->
      """SELECT CAST(20 AS BIGINT) AS n_rows,
        |       CAST(10 AS BIGINT) AS n_distinct_users,
        |       CAST(10 AS BIGINT) AS n_distinct_ips""".stripMargin
  )
}
