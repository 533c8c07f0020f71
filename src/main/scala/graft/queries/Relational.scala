package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.Tables._

/** Relational core: scans, filters, projections, joins (inner / left /
  * semi / anti / multiway / broadcast), aggregations, distinct, set ops,
  * having, scalar subquery.
  *
  * Oracle-parity rules used throughout the query surface:
  *   - money doubles are exact 2-decimal values in the fixtures, so they
  *     are cast to DECIMAL(12,2) before arithmetic → exact decimal math,
  *     bit-identical across Spark and DuckDB; final aggregates are cast
  *     back to DOUBLE (one exact decimal→double conversion on each side).
  *   - every result carries a total ORDER BY over its key columns so row
  *     order is deterministic in both engines.
  *   - aliases match the oracle SQL exactly (driver hashes by column name).
  *
  * Scale notes (100 TB): all plans below are shuffle-minimal — only
  * FIXED-SIZE dimensions (nation 25 rows, region 5, scalar subquery
  * results) carry broadcast hints; SF-scaling sides (customer, part,
  * orders, lineitem) are un-hinted so AQE broadcasts while they fit and
  * shuffle-joins beyond, with filters pushed into the parquet scan, and
  * every aggregate is a partial (map-side) + final hash aggregate chosen
  * by Catalyst. Nothing collects to the driver.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Exact decimal view of a 2-decimal money column. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Exact decimal sum rendered as double (identical bits both engines). */
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  val queries: Map[String, Q] = Map(
    // --- scans / filters / projections -------------------------------
    "q01_pricing_summary" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
            * (lit(1) + dec(col("l_tax")))).cast(DoubleType).as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
          (sum(dec(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_filter_project" -> ((s, d) => {
      // predicate + projection pushed into the parquet scan
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
                col("l_discount") >= lit(0.09) && col("l_quantity") < lit(5.0))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("l_extendedprice"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        // deterministic bounded output (TakeOrdered) — the result would
        // otherwise scale with the fact table
        .limit(10000)
    }),

    "q03_top_orders" -> ((s, d) => {
      // global top-k: Spark plans TakeOrderedAndProject (no full sort)
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q04_orders_by_month" -> ((s, d) => {
      orders(s, d)
        .groupBy(year(col("o_orderdate")).as("o_year"),
                 month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("o_year"), col("o_month"))
    }),

    "q05_selective_sum" -> ((s, d) => {
      // TPC-H Q6 shape: tight scan-side filter, single global aggregate
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
                col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07) &&
                col("l_quantity") < lit(24.0))
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
               .cast(DoubleType).as("revenue"),
             count(lit(1)).as("n_rows"))
    }),

    // --- joins --------------------------------------------------------
    "q06_join_segment_revenue" -> ((s, d) => {
      // fact⨝fact-sized side: customer SCALES with SF, so no broadcast
      // hint — AQE broadcasts while it fits and shuffle-joins beyond
      // (a forced hint would OOM the build side at 100×)
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),

    "q07_left_join_counts" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
        .limit(10000) // bounded output — see q02 note
    }),

    "q08_semi_join" -> ((s, d) => {
      // EXISTS: customers with at least one urgent open order
      val urgent = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
      customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    "q09_anti_join" -> ((s, d) => {
      // NOT EXISTS: customers with no orders at all
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    "q10_multiway_join" -> ((s, d) => {
      // 5-way: lineitem⨝orders shuffles on orderkey; nation/region are
      // fixed-size dims (25/5 rows) → hinted broadcasts; customer scales
      // with SF → un-hinted, AQE picks the strategy per actual size.
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
               .cast(DoubleType).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "q11_broadcast_join_brand" -> ((s, d) => {
      lineitem(s, d)
        // part scales with SF — un-hinted (AQE broadcasts while small)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_extendedprice")).as("total_price"),
             count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    }),

    "q73_salted_skew_join" -> ((s, d) => {
      // Skew-resilient fact⨝fact: the join runs salted — big side salted
      // by physical row position, orders replicated ×8, equi-join on
      // (orderkey, salt) — so one hot orderkey would spread over 8
      // reducers instead of one. Result provably identical to the plain
      // equi-join (the oracle IS the plain join).
      val li = lineitem(s, d).select(col("l_orderkey").as("okey"),
        col("l_extendedprice"), col("l_discount"))
      val ord = orders(s, d).select(col("o_orderkey").as("okey"),
        col("o_orderpriority"))
      graft.api.Joins.saltedEquiJoin(li, ord, "okey", salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // Skew profiling: the diagnostic pass that picks between the plain
    // join, the hot-key-scoped salted join (feed it these keys) and the
    // fully salted join. event_type is a 5-value key — each value owns
    // ~1/5 of the corpus, so at 32 shuffle partitions each is a
    // ~7-partition hot key; the oracle replicates the closed-form math.
    "q84_skew_profile" -> ((s, d) =>
      graft.api.Joins.skewProfile(
        events(s, d).select(col("event_type")), "event_type",
        topN = 5, partitions = 32)),

    // Bloom-prefiltered join: the dim side (one brand's parts) builds a
    // Bloom filter over its join keys that prunes lineitem BEFORE the
    // shuffle — the manual form of the runtime filter Spark injects
    // when catalog statistics allow, for freshly-derived dims where
    // they don't. No false negatives + the join re-checks survivors ⇒
    // the result is EXACTLY the plain join, which is the oracle.
    "q90_bloom_prefilter_join" -> ((s, d) => {
      val dim = part(s, d).filter(col("p_brand") === "Brand#19")
        .select(col("p_partkey"), col("p_brand"))
      graft.api.Joins.bloomPrefilteredJoin(
          lineitem(s, d).select(col("l_partkey"), col("l_quantity")),
          dim, "l_partkey", "p_partkey", expectedItems = 10000L)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("total_qty"))
        .orderBy(col("p_brand"))
    }),

    // --- aggregation variants -----------------------------------------
    "q12_distinct_counts" -> ((s, d) => {
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("o_custkey")).as("n_active_customers"),
             countDistinct(col("o_orderpriority")).as("n_priorities"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    "q13_having" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .filter(col("n") >= 45)
        .orderBy(col("l_partkey"))
    }),

    "q14_scalar_subquery" -> ((s, d) => {
      // orders above the global average price; avg computed identically
      // on both sides (exact decimal sum / count → double)
      val o = orders(s, d)
      val avgPrice = o.agg(
        (sum(dec(col("o_totalprice"))).cast(DoubleType) / count(lit(1))).as("ap"))
      o.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("ap"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_above_avg"))
        .orderBy(col("o_orderpriority"))
    }),

    // --- set operations -------------------------------------------------
    "q15_union_all" -> ((s, d) => {
      val hi = orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey").as("k"), lit("high").as("bucket"))
      val lo = orders(s, d).filter(col("o_totalprice") < 30000.0)
        .select(col("o_orderkey").as("k"), lit("low").as("bucket"))
      hi.unionAll(lo).groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    "q16_intersect" -> ((s, d) => {
      val building = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_nationkey").as("k"))
      val machinery = customer(s, d).filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_nationkey").as("k"))
      building.intersect(machinery).orderBy(col("k"))
    }),

    "q17_except" -> ((s, d) => {
      val all = customer(s, d).select(col("c_custkey").as("k"))
      val active = orders(s, d).select(col("o_custkey").as("k"))
      all.except(active).orderBy(col("k"))
    }),

    "q56_banded_range_join" -> ((s, d) => {
      // Range join against a small band dimension: the scale-safe plan
      // for non-equi banded joins is broadcast-nested-loop with the TINY
      // side broadcast — each fact row scans a handful of in-memory
      // bands, no shuffle of the fact table at all. (For two LARGE
      // range sides you'd bucket the range key and equi-join on the
      // bucket — that pattern is q55's time-ordered cousin.)
      val bands = s.createDataFrame(Seq(
        ("A_small", 0.0, 50000.0),
        ("B_mid", 50000.0, 150000.0),
        ("C_large", 150000.0, 300000.0),
        ("D_jumbo", 300000.0, 1e9)
      )).toDF("band", "lo", "hi")
      graft.api.Joins.bandedRange(orders(s, d), bands, "o_totalprice")
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType).as("total"))
        .orderBy(col("band"))
    }),

    // Interval-OVERLAP join of two LARGE interval sets — the two-big-
    // sides range pattern q56's broadcast shape cannot take: activity
    // minutes vs campaign windows derived from the event stream, both
    // sides bucketed to 128 s and paired on a bucket EQUI-join with
    // the duplicate-free first-overlap-bucket rule. The oracle runs
    // the same pairing as a plain inequality join — a shape DuckDB
    // can afford at sf0.01 and the engine must NOT use at scale — so
    // equality proves the bucketed plan loses and invents nothing.
    "q146_interval_join" -> ((s, d) => {
      val base = events(s, d)
        .select(col("event_id"), floor(col("ts").cast("double")).cast("long").as("t"))
      val acts = base.filter(col("event_id") % 11 === 0)
        .select(col("event_id").as("act_id"), col("t").as("act_start"),
          (col("t") + 60).as("act_end"))
      val camps = base.filter(col("event_id") % 13 === 1)
        .select(col("event_id").as("camp_id"), (col("t") - 120).as("camp_start"),
          (col("t") + 300).as("camp_end"))
      graft.api.Joins.intervalOverlapJoin(acts, camps,
          "act_start", "act_end", "camp_start", "camp_end", bucketWidth = 128)
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("act_id")).as("n_acts"),
          countDistinct(col("camp_id")).as("n_camps"),
          sum(col("act_id")).as("sum_act"),
          sum(col("camp_id")).as("sum_camp"))
    }),

    // Generic one-scan column profile (the first query against an
    // unfamiliar table): nulls planted on every 7th custkey exercise
    // the null counters; long and string columns stack through the
    // string-rendered min/max. Exact distincts here so the oracle
    // replays bit-for-bit; the API's approxDistinct flag is the
    // corpus-scale path (HLL, q54-style contract).
    "q147_column_profile" -> ((s, d) => {
      val o = orders(s, d).select(col("o_orderkey"),
        when(col("o_custkey") % 7 === 0, lit(null))
          .otherwise(col("o_custkey")).as("o_custkey"),
        col("o_orderstatus"), col("o_orderpriority"))
      graft.api.Profiling.columnProfile(o,
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("column")
    }),

    // Declarative expectation suite (the Deequ shape): eight checks —
    // null rate, composite-key uniqueness, two set memberships, two
    // range bounds, row-count sanity, referential integrity — compile
    // into ONE scan-wide aggregation plus one keys-only anti join.
    // The suite deliberately mixes passes and failures: this data's
    // (l_orderkey, l_linenumber) is NOT unique, discounts exceed 5%,
    // and returnflag 'R' violates the allowed set — the report rows
    // carry the observed counts the oracle replays exactly.
    "q153_quality_checks" -> ((s, d) => {
      import graft.api.Profiling.Check._
      graft.api.Profiling.runChecks(lineitem(s, d), Seq(
        NotNull("l_returnflag"),
        Unique(Seq("l_orderkey", "l_linenumber")),
        InSet("l_linestatus", Seq("O", "F")),
        InSet("l_returnflag", Seq("A", "N")),
        InRange("l_quantity", 1.0, 50.0),
        InRange("l_discount", 0.0, 0.05),
        RowCountBetween(1000L, 10000000000L),
        ReferencedIn("l_orderkey", orders(s, d), "o_orderkey")))
    }),

    // --- file formats beyond parquet/ORC -----------------------------
    // Round-trips pin the source/sink pair end to end: writer quoting/
    // serialization, reader schema application, and type fidelity
    // (doubles survive text round-trips via shortest-round-trip
    // rendering on write). The oracle aggregates the original parquet —
    // equality proves the round-trip was lossless. Temp output is
    // per-sf-dir and overwritten each run (deterministic, re-entrant).

    "q78_csv_roundtrip" -> ((s, d) => {
      val out = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft-csv-" + d.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath
      val sup = supplier(s, d)
      // header on, explicit schema on read (CSV carries no types);
      // s_comment contains commas — exercises quoting
      sup.write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema(sup.schema).option("header", "true").csv(out)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("total_bal"))
        .orderBy(col("s_nationkey"))
    }),

    "q79_json_roundtrip" -> ((s, d) => {
      val out = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft-json-" + d.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath
      val p = part(s, d)
      p.write.mode("overwrite").json(out)
      s.read.schema(p.schema).json(out)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("total_price"))
        .orderBy(col("p_brand"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        | CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND l_discount >= 0.09 AND l_quantity < 5.0
        |ORDER BY l_orderkey, l_linenumber LIMIT 10000""".stripMargin,

    "q03_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q04_orders_by_month" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin,

    "q05_selective_sum" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin,

    "q06_join_segment_revenue" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q07_left_join_counts" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey LIMIT 10000""".stripMargin,

    "q08_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q09_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q10_multiway_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q11_broadcast_join_brand" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // the salted join is semantically the plain equi-join — that's the
    // contract this oracle pins
    "q73_salted_skew_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q84_skew_profile" ->
      """WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM c)
        |SELECT event_type, n, round(n / total, 6) AS share,
        |  greatest(1, CAST(ceil(n * 32 / total) AS INT)) AS salt_hint
        |FROM c, t ORDER BY n DESC, event_type LIMIT 5""".stripMargin,

    // the bloom prefilter never drops a matching row — the contract is
    // exact equality with the plain join
    "q90_bloom_prefilter_join" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#19'
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q12_distinct_counts" ->
      """SELECT c_mktsegment,
        |  COUNT(DISTINCT o_custkey) AS n_active_customers,
        |  COUNT(DISTINCT o_orderpriority) AS n_priorities,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q13_having" ->
      """SELECT l_partkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 45
        |ORDER BY l_partkey""".stripMargin,

    "q14_scalar_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n_above_avg
        |FROM orders
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q15_union_all" ->
      """SELECT bucket, COUNT(*) AS n FROM (
        |  SELECT o_orderkey AS k, 'high' AS bucket FROM orders WHERE o_totalprice > 400000.0
        |  UNION ALL
        |  SELECT o_orderkey AS k, 'low'  AS bucket FROM orders WHERE o_totalprice < 30000.0
        |) t GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q16_intersect" ->
      """SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'
        |ORDER BY k""".stripMargin,

    "q17_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin,

    "q147_column_profile" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_custkey % 7 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
        |    o_orderstatus, o_orderpriority
        |  FROM orders
        |)
        |SELECT * FROM (
        |  SELECT 'o_custkey' AS "column", count(*) AS n_rows,
        |    CAST(count(*) - count(o_custkey) AS BIGINT) AS n_nulls,
        |    count(DISTINCT o_custkey) AS n_distinct,
        |    CAST(min(o_custkey) AS VARCHAR) AS min_value,
        |    CAST(max(o_custkey) AS VARCHAR) AS max_value FROM o
        |  UNION ALL
        |  SELECT 'o_orderkey', count(*), CAST(count(*) - count(o_orderkey) AS BIGINT),
        |    count(DISTINCT o_orderkey),
        |    CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR) FROM o
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*), CAST(count(*) - count(o_orderpriority) AS BIGINT),
        |    count(DISTINCT o_orderpriority),
        |    CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM o
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*), CAST(count(*) - count(o_orderstatus) AS BIGINT),
        |    count(DISTINCT o_orderstatus),
        |    CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM o
        |) ORDER BY "column"""".stripMargin,

    "q153_quality_checks" ->
      """SELECT * FROM (
        |  SELECT 'not_null' AS "check", 'l_returnflag' AS target,
        |    round(CAST(count(l_returnflag) AS DOUBLE) / count(*), 6) AS observed,
        |    CAST(count(l_returnflag) AS DOUBLE) / count(*) >= 1.0 AS passed
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'unique', 'l_orderkey,l_linenumber',
        |    round(CAST(count(*) - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS DOUBLE), 6),
        |    count(*) - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) = 0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_set', 'l_linestatus',
        |    round(CAST(sum(CASE WHEN l_linestatus NOT IN ('O','F') THEN 1 ELSE 0 END) AS DOUBLE), 6),
        |    sum(CASE WHEN l_linestatus NOT IN ('O','F') THEN 1 ELSE 0 END) = 0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_set', 'l_returnflag',
        |    round(CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N') THEN 1 ELSE 0 END) AS DOUBLE), 6),
        |    sum(CASE WHEN l_returnflag NOT IN ('A','N') THEN 1 ELSE 0 END) = 0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range', 'l_quantity',
        |    round(CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS DOUBLE), 6),
        |    sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) = 0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range', 'l_discount',
        |    round(CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.05 THEN 1 ELSE 0 END) AS DOUBLE), 6),
        |    sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.05 THEN 1 ELSE 0 END) = 0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'row_count', '*', round(CAST(count(*) AS DOUBLE), 6),
        |    count(*) >= 1000.0 AND count(*) <= 10000000000.0
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'referenced_in', 'l_orderkey',
        |    round(CAST((SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) c
        |                WHERE NOT EXISTS (SELECT 1 FROM orders p WHERE p.o_orderkey = c.l_orderkey)) AS DOUBLE), 6),
        |    (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) c
        |     WHERE NOT EXISTS (SELECT 1 FROM orders p WHERE p.o_orderkey = c.l_orderkey)) = 0
        |) ORDER BY "check", target""".stripMargin,

    // q146: DuckDB affords the plain inequality join at sf0.01; the
    // engine's bucketed equi-join must produce the identical pair set
    "q146_interval_join" ->
      """WITH base AS (
        |  SELECT event_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t
        |  FROM events
        |), acts AS (
        |  SELECT event_id AS act_id, t AS act_start, t + 60 AS act_end
        |  FROM base WHERE event_id % 11 = 0
        |), camps AS (
        |  SELECT event_id AS camp_id, t - 120 AS camp_start, t + 300 AS camp_end
        |  FROM base WHERE event_id % 13 = 1
        |)
        |SELECT count(*) AS n_pairs,
        |  count(DISTINCT act_id) AS n_acts,
        |  count(DISTINCT camp_id) AS n_camps,
        |  CAST(sum(act_id) AS BIGINT) AS sum_act,
        |  CAST(sum(camp_id) AS BIGINT) AS sum_camp
        |FROM acts JOIN camps
        |  ON act_start <= camp_end AND camp_start <= act_end""".stripMargin,

    "q56_banded_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('A_small', 0.0, 50000.0),
        |  ('B_mid', 50000.0, 150000.0),
        |  ('C_large', 150000.0, 300000.0),
        |  ('D_jumbo', 300000.0, 1e9))
        |SELECT band, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    // the round-trip queries aggregate data that passed through a
    // CSV/JSON write+read; the oracle aggregates the ORIGINAL parquet —
    // equality proves the text round-trip lost nothing
    "q78_csv_roundtrip" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q79_json_roundtrip" ->
      """SELECT p_brand, COUNT(*) AS n,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin
  )
}
