package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the LOADED dtypes of every driver fixture column the query
  * surface depends on (VERDICT r7 #5). The driver regenerates
  * /root/testdata between rounds; when a physical type changes (r6:
  * events.ts TIMESTAMP(NANOS) → timestamp[us]) the failure used to
  * surface as 22 scattered analysis errors two rounds later — this
  * spec makes it ONE named failure, immediately.
  *
  * Dtypes asserted are post-load under the session conf every entry
  * point shares (UTC, nanosAsLong=true): parquet
  * timestamp[us, isAdjustedToUTC=false] loads as TIMESTAMp_NTZ in
  * Spark 4 (inferTimestampNTZ default on).
  */
class FixtureSchemaSpec extends AnyFunSuite {
  import TestSpark._

  private def dtypes(table: String): Map[String, DataType] =
    spark.read.parquet(s"$sf/$table.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap

  private def check(table: String, expected: (String, DataType)*): Unit =
    test(s"fixture $table has the dtypes the query surface assumes") {
      val actual = dtypes(table)
      expected.foreach { case (colName, dt) =>
        assert(actual.get(colName).contains(dt),
          s"$table.$colName: expected $dt, loaded ${actual.get(colName)} — " +
            "the driver regenerated the fixture; adapt the loader (core/Tables.scala)")
      }
    }

  check("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
  check("nation", "n_nationkey" -> IntegerType, "n_name" -> StringType,
    "n_regionkey" -> IntegerType)
  check("customer", "c_custkey" -> LongType, "c_name" -> StringType,
    "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
    "c_mktsegment" -> StringType)
  check("supplier", "s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
    "s_acctbal" -> DoubleType)
  check("part", "p_partkey" -> LongType, "p_brand" -> StringType,
    "p_type" -> StringType, "p_size" -> IntegerType,
    "p_retailprice" -> DoubleType)
  check("orders", "o_orderkey" -> LongType, "o_custkey" -> LongType,
    "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
    "o_orderpriority" -> StringType)
  check("lineitem", "l_orderkey" -> LongType, "l_partkey" -> LongType,
    "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
    "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
    "l_discount" -> DoubleType, "l_tax" -> DoubleType,
    "l_shipdate" -> TimestampNTZType)
  check("documents", "doc_id" -> LongType, "text" -> StringType,
    "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
  check("embeddings", "vec_id" -> LongType,
    "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  // events raw: fixed columns pin exactly; ts pins to the SET the
  // loader adapts to (the driver has already switched encodings once —
  // any member is fine, an unsupported encoding is the real drift).
  check("events", "event_id" -> LongType, "user_id" -> LongType,
    "event_type" -> StringType, "value" -> DoubleType,
    "props" -> StringType)

  test("fixture events.ts has a loader-supported timestamp encoding") {
    val ts = dtypes("events")("ts")
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType)(ts),
      s"events.ts loaded as $ts — extend Tables.normalizeEventTs")
  }

  test("events loader normalizes ts to TimestampType (current fixture)") {
    val df = graft.core.Tables.events(spark, sf)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
    // values are real instants in a sane range, not garbage from a
    // mis-scaled conversion
    val (lo, hi) = df.agg(min(year(col("ts"))), max(year(col("ts"))))
      .collect().head match { case r => (r.getInt(0), r.getInt(1)) }
    assert(lo >= 1990 && hi <= 2100, s"events.ts years [$lo,$hi] out of range")
  }

  test("events loader still handles the legacy long-nanos encoding") {
    import spark.implicits._
    // 2021-01-01T00:00:00Z in nanoseconds
    val nanos = 1609459200L * 1000000000L
    val legacy = Seq((1L, nanos)).toDF("event_id", "ts")
    val out = graft.core.Tables.normalizeEventTs(legacy)
    assert(out.schema("ts").dataType === TimestampType)
    val t = out.select(unix_timestamp(col("ts"))).as[Long].collect().head
    assert(t === 1609459200L)
  }

  test("streaming events source agrees with the batch loader on ts") {
    // schema-level parity: the stream's projected schema must match the
    // batch loader's (full runtime parity is StreamingParitySpec)
    val batch = graft.core.Tables.events(spark, sf).schema
    val stream = graft.streaming.EventStreams.eventsStream(spark, sf).schema
    assert(stream === batch)
  }
}
