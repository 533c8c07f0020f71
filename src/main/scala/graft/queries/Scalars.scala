package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.Tables._

/** Scalar function surface: string, date/time, math, conditional, JSON
  * and array functions — all `org.apache.spark.sql.functions._` built-ins
  * (whole-stage-codegen'd; no UDFs anywhere in the hot path).
  *
  * Cross-engine numeric policy: only functions with exact IEEE semantics
  * (sqrt, abs, floor, ceil, round-on-decimal, integer mod) are compared
  * raw; transcendentals (ln/exp/pow) are avoided in oracles because Java
  * Math and C libm may differ in the final ulp.
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  val queries: Map[String, Q] = Map(
    "q29_string_funcs" -> ((s, d) => {
      customer(s, d)
        .filter(col("c_custkey") <= 100)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          lower(col("c_mktsegment")).as("lseg"),
          length(col("c_name")).as("name_len"),
          substring(col("c_name"), 1, 8).as("name_pfx"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
          col("c_name").like("%1%").as("has_one"),
          trim(lit("  pad  ")).as("trimmed"),
          lpad(col("c_custkey").cast("string"), 6, "0").as("padded"))
        .orderBy(col("c_custkey"))
    }),

    "q30_split_explode" -> ((s, d) => {
      // array construction + lateral explode of order priorities
      orders(s, d)
        .select(col("o_orderkey"), split(col("o_orderpriority"), "-").as("parts"))
        .select(col("o_orderkey"), explode(col("parts")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("token"))
    }),

    "q31_date_funcs" -> ((s, d) => {
      orders(s, d)
        .filter(col("o_orderkey") <= 200)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("q"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("epoch_days"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"))
        .orderBy(col("o_orderkey"))
    }),

    "q32_math_funcs" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_orderkey") <= 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(dec(col("l_extendedprice")) * lit(-1)).cast(DoubleType).as("abs_price"),
          floor(col("l_extendedprice")).as("floor_p"),
          ceil(col("l_extendedprice")).as("ceil_p"),
          sqrt(col("l_quantity")).as("sqrt_q"),
          (col("l_orderkey") % 7).as("mod7"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_discount"), col("l_tax")).as("min_rate"),
          round(dec(col("l_extendedprice")) / 1000, 1).cast(DoubleType).as("kprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q33_case_when" -> ((s, d) => {
      orders(s, d)
        .withColumn("price_band",
          when(col("o_totalprice") < 50000.0, "small")
            .when(col("o_totalprice") < 200000.0, "medium")
            .when(col("o_totalprice") < 350000.0, "large")
            .otherwise("jumbo"))
        .groupBy(col("price_band"))
        .agg(count(lit(1)).as("n"),
             min(col("o_totalprice")).as("min_p"),
             max(col("o_totalprice")).as("max_p"))
        .orderBy(col("price_band"))
    }),

    "q34_json_extract" -> ((s, d) => {
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"),
             max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    "q35_array_funcs" -> ((s, d) => {
      embeddings(s, d)
        .filter(col("vec_id") < 100)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast(DoubleType).as("first_val"),
          array_max(col("embedding")).cast(DoubleType).as("max_val"),
          array_min(col("embedding")).cast(DoubleType).as("min_val"))
        .orderBy(col("vec_id"))
    }),

    "q36_coalesce_nullif" -> ((s, d) => {
      // null handling: left join produces nulls → coalesce / nullif / nvl2
      customer(s, d)
        .join(orders(s, d).filter(col("o_totalprice") > 450000.0),
              col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"),
          coalesce(col("o_orderkey"), lit(-1L)).as("order_or_default"),
          when(col("o_orderkey").isNull, "none").otherwise("big").as("status"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"))
        .groupBy(col("status"), col("seg_nb"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("status"), col("seg_nb").asc_nulls_first)
    }),

    "q68_unpivot" -> ((s, d) => {
      // wide → long melt via Dataset.unpivot: per-returnflag measures
      // unpivoted into (measure, value) rows
      val wide = lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(sum(dec(col("l_quantity"))).cast(DoubleType).as("qty"),
          sum(dec(col("l_extendedprice"))).cast(DoubleType).as("price"),
          count(lit(1)).cast(DoubleType).as("rows"))
      wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("rows")),
          "measure", "val")
        .orderBy(col("l_returnflag"), col("measure"))
    }),

    "q69_keyed_sample" -> ((s, d) => {
      // deterministic keyed sampling: reproducible 1/8 corpus
      // downsample keyed on md5(doc_id) — same subset on every engine
      // and every run (unlike TABLESAMPLE), the standard trick for
      // train/eval splits of a 100 TB corpus (api.TextAnalysis.keyedSample)
      graft.api.TextAnalysis.keyedSample(documents(s, d), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy(col("lang"))
    }),

    "q65_bitwise_funcs" -> ((s, d) => {
      // bitwise ops over integral keys — exact in both engines
      orders(s, d)
        .filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          (col("o_orderkey").bitwiseAND(lit(255L))).as("lo8"),
          (col("o_orderkey").bitwiseOR(lit(4096L))).as("with_bit"),
          (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("xored"),
          shiftleft(col("o_orderkey"), 3).as("shl3"),
          shiftright(col("o_orderkey"), 2).as("shr2"))
        .orderBy(col("o_orderkey"))
    }),

    "q66_string_agg" -> ((s, d) => {
      // ordered string aggregation: nation names per region,
      // deterministically sorted before concatenation
      nation(s, d).join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws("|", sort_array(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"))
    }),

        // The sketch path for percentiles at 100 TB: q67's exact
    // percentile() buffers per-group value maps (memory ∝ group size);
    // percentile_approx is the fixed-memory mergeable sketch. Values are
    // implementation-specific, so — like q54's HLL and q70's recall —
    // the driver-checkable contract is a constant-row bound: the sketch
    // lands within 1% of the exact answer (the exact side is the
    // fixture-scale anchor only).
    "q76_approx_percentile_contract" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("ex"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("ap"))
        .agg((max(abs(col("ap") - col("ex")) / col("ex")) <= 0.01).as("approx_ok"))),

    "q67_median_percentiles" -> ((s, d) => {
      // EXACT median / percentiles (linear interpolation) — both
      // engines interpolate identically on DECIMAL-exact inputs
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(CAST(o_totalprice AS DECIMAL(12,2)), 0.5)").as("median"),
          expr("percentile(CAST(o_totalprice AS DECIMAL(12,2)), 0.9)").as("p90"))
        .select(col("o_orderpriority"), round(col("median"), 4).as("median"),
          round(col("p90"), 4).as("p90"))
        .orderBy(col("o_orderpriority"))
    }),

    "q64_map_funcs" -> ((s, d) => {
      // map construction + lookup: per priority, aggregate the status
      // distribution into a map (map_from_entries over collected
      // structs), then extract scalar lookups — map-typed data never
      // leaves the query, so the oracle compares plain columns
      val base = orders(s, d)
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
      base.groupBy(col("o_orderpriority"))
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("o_orderstatus"), col("cnt"))))).as("m"))
        .select(col("o_orderpriority"),
          coalesce(element_at(col("m"), "F"), lit(0L)).as("n_f"),
          coalesce(element_at(col("m"), "O"), lit(0L)).as("n_o"),
          coalesce(element_at(col("m"), "P"), lit(0L)).as("n_p"),
          size(col("m")).as("n_statuses"))
        .orderBy(col("o_orderpriority"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q29_string_funcs" ->
      """SELECT c_custkey,
        |  UPPER(c_name) AS uname, LOWER(c_mktsegment) AS lseg,
        |  LENGTH(c_name) AS name_len,
        |  SUBSTRING(c_name, 1, 8) AS name_pfx,
        |  CONCAT_WS('|', c_mktsegment, c_name) AS tagged,
        |  REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS masked,
        |  c_name LIKE '%1%' AS has_one,
        |  TRIM('  pad  ') AS trimmed,
        |  LPAD(CAST(c_custkey AS VARCHAR), 6, '0') AS padded
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin,

    "q30_split_explode" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT o_orderkey, UNNEST(STRING_SPLIT(o_orderpriority, '-')) AS token
        |  FROM orders) t
        |GROUP BY token ORDER BY token""".stripMargin,

    "q31_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q,
        |  DATE_TRUNC('month', o_orderdate) AS month_start,
        |  CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS epoch_days,
        |  STRFTIME(o_orderdate, '%Y-%m-%d') AS iso
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin,

    "q32_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ABS(CAST(l_extendedprice AS DECIMAL(12,2)) * -1) AS DOUBLE) AS abs_price,
        |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_p,
        |  CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_p,
        |  SQRT(l_quantity) AS sqrt_q,
        |  l_orderkey % 7 AS mod7,
        |  GREATEST(l_discount, l_tax) AS max_rate,
        |  LEAST(l_discount, l_tax) AS min_rate,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)) / 1000, 1) AS DOUBLE) AS kprice
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q33_case_when" ->
      """SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
        |            WHEN o_totalprice < 200000.0 THEN 'medium'
        |            WHEN o_totalprice < 350000.0 THEN 'large'
        |            ELSE 'jumbo' END AS price_band,
        |       COUNT(*) AS n, MIN(o_totalprice) AS min_p, MAX(o_totalprice) AS max_p
        |FROM orders GROUP BY 1 ORDER BY price_band""".stripMargin,

    "q34_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS min_k,
        |  MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q35_array_funcs" ->
      """SELECT vec_id,
        |  CAST(LEN(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  CAST(LIST_AGGREGATE(embedding, 'max') AS DOUBLE) AS max_val,
        |  CAST(LIST_AGGREGATE(embedding, 'min') AS DOUBLE) AS min_val
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin,

    "q36_coalesce_nullif" ->
      """SELECT status, seg_nb, COUNT(*) AS n FROM (
        |  SELECT c_custkey,
        |    COALESCE(o_orderkey, -1) AS order_or_default,
        |    CASE WHEN o_orderkey IS NULL THEN 'none' ELSE 'big' END AS status,
        |    NULLIF(c_mktsegment, 'BUILDING') AS seg_nb
        |  FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
        |    ON c_custkey = o_custkey) t
        |GROUP BY status, seg_nb ORDER BY status, seg_nb NULLS FIRST""".stripMargin,

    "q68_unpivot" ->
      """SELECT l_returnflag, measure, val FROM (
        |  SELECT l_returnflag, 'qty' AS measure,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS val
        |  FROM lineitem GROUP BY l_returnflag
        |  UNION ALL
        |  SELECT l_returnflag, 'price',
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |  FROM lineitem GROUP BY l_returnflag
        |  UNION ALL
        |  SELECT l_returnflag, 'rows', CAST(COUNT(*) AS DOUBLE)
        |  FROM lineitem GROUP BY l_returnflag) t
        |ORDER BY l_returnflag, measure""".stripMargin,

    "q69_keyed_sample" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q65_bitwise_funcs" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS lo8,
        |  o_orderkey | 4096 AS with_bit,
        |  xor(o_orderkey, o_custkey) AS xored,
        |  o_orderkey << 3 AS shl3,
        |  o_orderkey >> 2 AS shr2
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin,

    "q66_string_agg" ->
      """SELECT r_name,
        |  string_agg(n_name, '|' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q76_approx_percentile_contract" ->
      "SELECT TRUE AS approx_ok",
    "q67_median_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE), 0.5), 4) AS median,
        |  round(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE), 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q64_map_funcs" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (o_orderstatus = 'P') AS n_p,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS INT) AS n_statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
