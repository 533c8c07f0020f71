package graft.ingest

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests per SURVEY.md §5: value domains, pool cycling at 1M,
  * dictionary round-robin, determinism. */
class GenSpec extends AnyFunSuite {
  import TestSpark.spark

  private val seed = 123L

  private def gen(rows: Long, parts: Int = 4) =
    Gen.generate(
      spark.range(0, rows, 1, parts).select(col("id").as("value")),
      Gen.defaultColumns ++ Gen.partitionColumns, seed)

  test("default schema matches the reference event schema") {
    val df = gen(10)
    assert(df.columns.toSeq == Seq("user_id", "page_id", "ad_id", "ad_type",
      "event_type", "event_time", "ip_address", "year", "month"))
  }

  test("dictionary columns round-robin deterministically (not random)") {
    // reference Column.java:117: dictionary[row % dictionary.length]
    val rows = gen(10).orderBy(col("user_id")).collect() // order irrelevant for distinct check
    val df = Gen.generate(
      spark.range(0, 6, 1, 1).select(col("id").as("value")),
      Gen.defaultColumns, seed)
    val evts = df.select("event_type").collect().map(_.getString(0))
    assert(evts.toSeq == Seq("view", "click", "purchase", "view", "click", "purchase"))
    val ads = df.select("ad_type").collect().map(_.getString(0))
    assert(ads.toSeq == Seq("banner", "modal", "sponsored-search", "mail", "mobile", "banner"))
  }

  test("pooled generators cycle with period 1M") {
    // reference Column.java:103: index = row % 1_000_000
    val idx = spark.createDataFrame(Seq(
      (5L, "a"), (Gen.PoolSize + 5L, "b"), (2 * Gen.PoolSize + 5L, "c")
    )).toDF("value", "tag")
    val out = Gen.generate(idx, Gen.defaultColumns ++ Gen.partitionColumns, seed)
    val pooled = Seq("user_id", "page_id", "ad_id", "event_time", "ip_address", "year", "month")
    pooled.foreach { c =>
      assert(out.select(c).distinct().count() == 1, s"$c should cycle at 1M")
    }
  }

  test("year in [2000,2049], month in [0,11]") {
    val mm = gen(5000).agg(
      min("year"), max("year"), min("month"), max("month")).collect().head
    assert(mm.getInt(0) >= 2000 && mm.getInt(1) <= 2049)
    assert(mm.getInt(2) >= 0 && mm.getInt(3) <= 11)
    // both domains actually exercised over 5k rows
    assert(gen(5000).select("month").distinct().count() == 12)
  }

  test("uuid / ip / timestamp value shapes") {
    val df = gen(100).cache()
    assert(df.filter(not(col("user_id").rlike(
      "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"))).count() == 0)
    assert(df.filter(not(col("ip_address").rlike(
      "^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$"))).count() == 0)
    // ISO-8601 instant string, parseable back to a timestamp
    assert(df.filter(to_timestamp(col("event_time"),
      "yyyy-MM-dd'T'HH:mm:ss'Z'").isNull).count() == 0)
    df.unpersist()
  }

  test("generation is deterministic per (seed, rowIndex)") {
    val a = gen(1000).collect()
    val b = gen(1000, parts = 7).collect() // partitioning must not matter
    assert(a.sortBy(_.getString(0)).sameElements(b.sortBy(_.getString(0))))
    val other = Gen.generate(
      spark.range(0, 1000, 1, 4).select(col("id").as("value")),
      Gen.defaultColumns, seed = 999L)
    // different seed -> different pooled values
    assert(other.select("user_id").except(
      gen(1000).select("user_id")).count() > 0)
  }

  test("scalar generators cover their domains") {
    val specs = Seq(
      Gen.ColSpec("b", Gen.ColType.BooleanT),
      Gen.ColSpec("l", Gen.ColType.LongT),
      Gen.ColSpec("d", Gen.ColType.DoubleT),
      Gen.ColSpec("s", Gen.ColType.StringName))
    val df = Gen.generate(
      spark.range(0, 2000, 1, 4).select(col("id").as("value")), specs, seed).cache()
    assert(df.select("b").distinct().count() == 2)
    assert(df.agg(min("d"), max("d")).collect().head.toSeq
      .forall { v => val x = v.asInstanceOf[Double]; x >= 0.0 && x < 1.0 })
    assert(df.select("l").distinct().count() > 1990) // 64-bit hash, ~no collisions
    assert(df.filter(not(col("s").rlike("^[A-Za-z]+ [A-Za-z]+$"))).count() == 0)
    df.unpersist()
  }

  test("csv line has trailing comma (reference Stream.java:186)") {
    val df = Gen.generate(
      spark.range(0, 3, 1, 1).select(col("id").as("value")),
      Gen.defaultColumns, seed)
    val lines = df.select(Gen.csvLine(df.columns.toSeq)).collect().map(_.getString(0))
    assert(lines.forall(_.endsWith(",")))
    assert(lines.forall(_.split(",", -1).length == 8)) // 7 cols + trailing empty
  }
}
