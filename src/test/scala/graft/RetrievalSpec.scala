package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Retrieval

/** Hybrid retrieval: RRF fusion semantics on hand-computed fixtures,
  * dense ranking order, and the corpus-independence of the fusion
  * cost (bounded inputs in, bounded output out). */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("rrfFuse sums reciprocal ranks, keeps one-sided docs, ties break on doc_id") {
    val sparse = Seq((1, 1, 100L), (1, 2, 200L), (1, 3, 300L))
      .toDF("query_id", "rank", "doc_id")
    val dense = Seq((1, 1, 200L), (1, 2, 400L))
      .toDF("query_id", "rank", "doc_id")
    val out = Retrieval.rrfFuse(sparse, dense, k = 10, k0 = 60)
      .orderBy("rank").collect()
    // doc 200: 1/62 + 1/61 = 0.016129 + 0.016393 = 0.032522 — rank 1
    assert(out(0).getAs[Long]("doc_id") == 200L)
    assert(math.abs(out(0).getAs[Double]("rrf_score") - 0.032522) < 1e-9)
    assert(out(0).getAs[Int]("sparse_rank") == 2 && out(0).getAs[Int]("dense_rank") == 1)
    // docs 100 (sparse r1) and 400 (dense r2... no: dense rank 2 → 1/62)
    // doc 100: 1/61 = 0.016393; doc 400: 1/62 = 0.016129; doc 300: 1/63
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(200L, 100L, 400L, 300L))
    // one-sided rows carry a null for the absent ranker
    assert(out(1).isNullAt(out(1).fieldIndex("dense_rank")))
    assert(out(2).isNullAt(out(2).fieldIndex("sparse_rank")))
  }

  test("rrfFuse equal-score tie breaks on doc_id ascending") {
    // both docs appear only in sparse at the same rank for different
    // queries — within one query, craft two docs with identical scores
    val sparse = Seq((1, 1, 500L), (1, 1, 400L))
      .toDF("query_id", "rank", "doc_id")
    val dense = Seq.empty[(Int, Int, Long)].toDF("query_id", "rank", "doc_id")
    val out = Retrieval.rrfFuse(sparse, dense, k = 10).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(400L, 500L))
  }

  test("denseTopKForQueries ranks by cosine desc with doc_id tie-break") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vid", "vec")
    val qs = Seq((7, Array(1.0f, 0.0f))).toDF("qid", "qv")
    val out = Retrieval.denseTopKForQueries(emb, qs, idCol = "vid",
      vecCol = "vec", queryIdCol = "qid", queryVecCol = "qv", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L, 2L))
    assert(out(0).getAs[Double]("cos") == 1.0)
    assert(math.abs(out(1).getAs[Double]("cos") - math.sqrt(0.5)) < 1e-6)
  }

  test("hybridSearchRrf end-to-end: both modalities contribute") {
    val docs = Seq(
      (1L, "spark sql joins and windows"),
      (2L, "hash partitioned merge"),
      (3L, "unrelated prose about cooking")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val qs = Seq((1, "spark joins", Array(1.0f, 0.0f)))
      .toDF("query_id", "query", "qvec")
    val out = Retrieval.hybridSearchRrf(docs, emb, qs, k = 3, kEach = 3)
      .orderBy("rank").collect()
    // doc 1 wins both rankers: sparse r1 + dense r1
    assert(out(0).getAs[Long]("doc_id") == 1L)
    assert(out(0).getAs[Int]("sparse_rank") == 1)
    assert(out(0).getAs[Int]("dense_rank") == 1)
    assert(out.length == 3)
  }

  test("fusion output is bounded by k per query regardless of input sizes") {
    val sparse = (1 to 50).map(r => (1, r, 1000L + r)).toDF("query_id", "rank", "doc_id")
    val dense = (1 to 50).map(r => (1, r, 2000L + r)).toDF("query_id", "rank", "doc_id")
    val out = Retrieval.rrfFuse(sparse, dense, k = 5)
    assert(out.count() == 5)
  }

  test("rankingMetrics: hand-computed recall/precision/MRR/nDCG at k=3") {
    import spark.implicits._
    val ranked = Seq(
      (1, 10L, 1), (1, 20L, 2), (1, 30L, 3), (1, 20L, 9), // rank>k ignored
      (2, 5L, 1), (2, 6L, 2),
      (3, 7L, 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1, 20L), (1, 99L), (2, 5L), (3, 8L), (4, 1L))
      .toDF("query_id", "doc_id")
    val out = Retrieval.rankingMetrics(ranked, qrels, k = 3).collect()
      .map(r => r.getInt(0) -> r).toMap
    // q1: 1 of 2 relevant found at rank 2
    val q1 = out(1)
    assert(q1.getAs[Long]("hits") == 1L)
    assert(q1.getAs[Double]("recall_k") == 0.5)
    assert(q1.getAs[Double]("precision_k") == 0.333333)
    assert(q1.getAs[Double]("mrr") == 0.5)
    assert(q1.getAs[Double]("ndcg_k") == 0.386853) // (1/lg3)/(1+1/lg3)
    // q2: the single relevant doc at rank 1 — perfect
    val q2 = out(2)
    assert(q2.getAs[Double]("recall_k") == 1.0 &&
      q2.getAs[Double]("mrr") == 1.0 && q2.getAs[Double]("ndcg_k") == 1.0)
    // q3: ranked but nothing relevant found — all-zero path
    val q3 = out(3)
    assert(q3.getAs[Long]("hits") == 0L && q3.getAs[Double]("mrr") == 0.0 &&
      q3.getAs[Double]("ndcg_k") == 0.0)
    // q4 has qrels but NO ranking rows: zero metrics, still reported
    assert(out(4).getAs[Long]("hits") == 0L)
    // a query with rankings but no qrels is dropped (recall undefined)
    assert(!out.contains(5) && out.size == 4)
  }
}
