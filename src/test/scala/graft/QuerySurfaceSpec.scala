package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Every SparkEntry query must execute on sf0.001 and (except anti-join
  * shapes that legitimately return 0 rows there) produce rows. Value
  * correctness is enforced by the DuckDB-oracle gate (tools/
  * check_oracle.py mirrors it); these specs are the fast regression
  * net for schema/execution errors.
  */
class QuerySurfaceSpec extends AnyFunSuite {
  import TestSpark._

  // queries whose correct sf0.001 result can be empty
  private val mayBeEmpty = Set("q09_anti_join", "q17_except")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("q01 pricing summary values") {
    val row = SparkEntry.queries("q01_pricing_summary")(spark, sf)
      .filter("l_returnflag = 'A' AND l_linestatus = 'F'")
      .collect().head
    // cross-checked against DuckDB on the same fixture
    assert(row.getAs[Long]("count_order") > 0)
    assert(row.getAs[Double]("sum_qty") > 0.0)
    assert(math.abs(row.getAs[Double]("avg_disc")) < 1.0)
  }

  test("q03 top orders is sorted desc") {
    val prices = SparkEntry.queries("q03_top_orders")(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
    assert(prices.length == 10)
  }

  test("q24 rollup includes grand total") {
    val all = SparkEntry.queries("q24_rollup")(spark, sf)
      .filter("rf = '(all)' AND ls = '(all)'").collect()
    assert(all.length == 1)
  }
}
