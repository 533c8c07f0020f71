package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketed tables — the 100 TB recipe for a
  * repeated fact⨝fact join: pay the shuffle ONCE at write time
  * (`bucketBy` on the join key), then every subsequent join on that key
  * reads bucket-aligned partitions and plans with ZERO exchanges. This
  * spec pins the property Spark gives us for it: a sort-merge join over
  * two 8-bucket tables with broadcast disabled has no Exchange operator
  * anywhere in its executed plan.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import TestSpark.spark

  test("join of two tables bucketed on the join key plans without a shuffle") {
    val dir = Files.createTempDirectory("graft-bucketed").toString
    val li = graft.core.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = graft.core.Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val bcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      li.write.mode("overwrite").option("path", s"$dir/li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bkt")
      ord.write.mode("overwrite").option("path", s"$dir/ord")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bkt")
      // force the shuffle-based join path: at fixture scale the dimension
      // side would otherwise broadcast and trivially show no exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("ord_bkt"), col("l_orderkey") === col("o_orderkey"))
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed co-located join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      // and the scan really is the bucketed read, not a plain file scan
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcastBefore)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
