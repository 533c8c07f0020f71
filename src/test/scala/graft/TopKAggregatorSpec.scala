package graft

import graft.functions.TopKByScore
import org.scalatest.funsuite.AnyFunSuite

/** The grouped top-k Aggregator must match the window row_number
  * formulation exactly, including the (score desc, id asc) tie order. */
class TopKAggregatorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("top-3 per group matches window semantics including ties") {
    val rows = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.8), (1L, 13L, 0.7), (1L, 9L, 0.8),
      (2L, 20L, 0.1),
      (3L, 30L, 0.5), (3L, 31L, 0.6), (3L, 32L, 0.4), (3L, 33L, 0.3))
    val ds = rows.toDS()
    val got = ds.groupByKey(_._1)
      .mapValues { case (_, id, score) => (id, score) }
      .agg(new TopKByScore(3).toColumn)
      .collect().toMap
    assert(got(1L) == Seq((10L, 0.9), (9L, 0.8), (11L, 0.8))) // ties: id asc
    assert(got(2L) == Seq((20L, 0.1)))
    assert(got(3L) == Seq((31L, 0.6), (30L, 0.5), (32L, 0.4)))
  }

  test("merge across partitions is order-insensitive") {
    val big = (0 until 5000).map(i => (i % 7L, i.toLong, (i * 2654435761L % 1000) / 1000.0))
    val a = big.toDS().repartition(13).groupByKey(_._1)
      .mapValues { case (_, id, s) => (id, s) }
      .agg(new TopKByScore(5).toColumn).collect().toMap
    val b = big.toDS().repartition(1).groupByKey(_._1)
      .mapValues { case (_, id, s) => (id, s) }
      .agg(new TopKByScore(5).toColumn).collect().toMap
    assert(a == b)
  }
}
