package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Hybrid retrieval: sparse (BM25) and dense (embedding-cosine)
  * rankings fused by Reciprocal Rank Fusion (Cormack et al., SIGIR'09
  * — `RRF(d) = Σ_lists 1/(k0 + rank_list(d))`), the standard
  * score-free fusion for RAG-style retrieval over a training corpus.
  *
  * Scale shape: the two candidate lists arrive ALREADY bounded (≤
  * kEach rows per query from each ranker), so fusion — a full-outer
  * equi-join on (query_id, doc_id) plus a per-query window over ≤
  * 2·kEach candidates — costs O(queries · k), independent of corpus
  * size. The corpus-sized work lives in the rankers, each of which has
  * an indexed scale path: [[TextAnalysis.searchBm25All]] is the
  * postings equi-join (cost ∝ matched postings), and the dense side
  * accepts any `(query_id, rank, doc_id)` frame, so at 100 TB callers
  * fuse [[Similarity.ivfSearchIndex]] probes instead of the
  * brute-force scan used by the oracle-checked default.
  *
  * Determinism: each rank contributes `round(1/(k0+rank), 6)` summed
  * as DECIMAL(18,6) (the package's decimal-sum rule), so partial-agg
  * order cannot move a fused score; ties break on doc_id.
  */
object Retrieval {

  /** Dense candidate lists for a query TABLE: exact cosine of every
    * (query, doc) pair, top-k per query. The query side is a
    * fixed-size benchmark/probe table (dozens–thousands of rows), so
    * it is explicitly broadcast — one corpus scan serves every query,
    * the same shape [[Similarity.semanticContaminationProfile]] pins.
    * Output: (query_id, rank, doc_id, cos). */
  def denseTopKForQueries(emb: DataFrame, queryVecs: DataFrame,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          queryIdCol: String = "query_id", queryVecCol: String = "qvec",
                          k: Int = 10): DataFrame = {
    require(k > 0, "k must be positive")
    val docs = emb.select(col(idCol).as("doc_id"), col(vecCol).as("dvec"),
      norm(col(vecCol)).as("dn"))
    val qs = queryVecs.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("qv"), norm(col(queryVecCol)).as("qn"))
    val scored = docs.join(broadcast(qs))
      .withColumn("cos", cosinePrenormed(dot(col("dvec"), col("qv")), col("dn"), col("qn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), round(col("cos"), 6).as("cos"))
  }

  /** Fuse two bounded per-query rankings by RRF. Inputs need columns
    * (query_id, rank, doc_id); every other column is ignored. A doc
    * absent from one list simply contributes nothing from it (the
    * full-outer join keeps it). Output: (query_id, rank, doc_id,
    * rrf_score, sparse_rank, dense_rank) — the source ranks ride along
    * so a fused result is auditable without re-running the rankers. */
  def rrfFuse(sparse: DataFrame, dense: DataFrame,
              k: Int = 10, k0: Int = 60): DataFrame = {
    require(k > 0, "k must be positive")
    require(k0 > 0, "k0 must be positive (RRF dampening constant)")
    def side(df: DataFrame, rankName: String): DataFrame =
      df.select(col("query_id"), col("doc_id"),
        col("rank").cast("int").as(rankName))
    val s = side(sparse, "sparse_rank")
    val d = side(dense, "dense_rank")
    val fused = s.join(d, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        (coalesce(round(lit(1.0) / (lit(k0) + col("sparse_rank")), 6)
            .cast("decimal(18,6)"), lit(java.math.BigDecimal.ZERO)) +
          coalesce(round(lit(1.0) / (lit(k0) + col("dense_rank")), 6)
            .cast("decimal(18,6)"), lit(java.math.BigDecimal.ZERO)))
          .cast("double"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_score"), col("sparse_rank"), col("dense_rank"))
  }

  /** End-to-end hybrid search for a query table carrying BOTH a text
    * and a vector per query: BM25 over `docs` + exact cosine over
    * `emb` (ids shared across the two tables), RRF-fused. The exact
    * dense ranker makes this the oracle-checkable reference form; swap
    * the dense list for IVF probes via [[rrfFuse]] at scale. */
  def hybridSearchRrf(docs: DataFrame, emb: DataFrame, queries: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text",
                      embIdCol: String = "vec_id", vecCol: String = "embedding",
                      queryIdCol: String = "query_id", queryTextCol: String = "query",
                      queryVecCol: String = "qvec",
                      k: Int = 10, kEach: Int = 20, k0: Int = 60): DataFrame = {
    val sparse = TextAnalysis.searchBm25All(docs, queries, idCol, textCol,
      queryIdCol, queryTextCol, k = kEach)
    val dense = denseTopKForQueries(emb, queries, embIdCol, vecCol,
      queryIdCol, queryVecCol, k = kEach)
    rrfFuse(sparse, dense, k, k0)
  }

  /** Binary-relevance ranking metrics at cutoff k — the eval harness
    * every retrieval change ships behind: per query, `n_rel`, `hits`
    * (relevant results at rank ≤ k), `recall_k`, `precision_k`, `mrr`
    * (1/rank of the first relevant hit, 0 when none ranked), and
    * `ndcg_k` (binary DCG with 1/log₂(rank+1) gains against the ideal
    * prefix). Queries with no qrels are DROPPED (their recall is
    * undefined — an eval set bug, not a zero). Determinism: DCG/IDCG
    * terms round to 12 decimals and sum as DECIMAL(28,12) (the
    * package rule — aggregation order can never move a score);
    * outputs round to 6.
    *
    * Scale shape: one rank-filtered equi-join of the ranking against
    * the qrels on (query, doc), one keyed aggregation, an
    * ideal-prefix spine of ≤ k rows per query — rankings and qrels
    * are the eval-sized frames, the corpus never enters. */
  def rankingMetrics(ranked: DataFrame, qrels: DataFrame, k: Int = 10,
                     queryIdCol: String = "query_id",
                     docIdCol: String = "doc_id",
                     rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val rel = qrels.select(col(queryIdCol).as("query_id"),
      col(docIdCol).as("doc_id")).distinct()
    val nrel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    def gainAt(r: Column): Column =
      round(lit(1.0) / (log(r.cast("double") + 1.0) / log(lit(2.0))), 12)
        .cast("decimal(28,12)")
    val hits = ranked
      .select(col(queryIdCol).as("query_id"), col(docIdCol).as("doc_id"),
        col(rankCol).as("rank"))
      .filter(col("rank") <= k)
      .join(rel, Seq("query_id", "doc_id"))
    val perQ = hits.groupBy("query_id").agg(
      count(lit(1)).as("hits"),
      min(col("rank")).as("first_rel"),
      sum(gainAt(col("rank"))).as("dcg"))
    val ideal = nrel.select(col("query_id"),
        explode(sequence(lit(1), least(col("n_rel"), lit(k)))).as("i"))
      .groupBy("query_id").agg(sum(gainAt(col("i"))).as("idcg"))
    nrel.join(ideal, "query_id").join(perQ, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)) / col("n_rel"), 6)
          .as("recall_k"),
        round(coalesce(col("hits"), lit(0L)) / lit(k.toDouble), 6)
          .as("precision_k"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("mrr"),
        round(when(col("idcg") > 0,
            coalesce(col("dcg"), lit(0).cast("decimal(28,12)"))
              .cast("double") / col("idcg").cast("double"))
          .otherwise(0.0), 6).as("ndcg_k"))
  }
}
