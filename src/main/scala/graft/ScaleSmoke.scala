package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-smoke probe (VERDICT r11 #5): sf0.1 is 17 MB, so the 100 TB
  * story otherwise rests on plan shapes alone. This materializes a
  * multi-GB synthetic corpus with the engine's own expression pipeline
  * (deterministic — no RNG, no wall-clock in the data) and drives the
  * heavy LLM-pipeline operators through ONE commit-sized batch each,
  * against indexes built over a corpus-scale slice:
  *   - near-dup suppressor  (MinHash index build + suppress-and-append)
  *   - hamming suppressor   (simhash chunk index + suppress-and-append)
  *   - semantic suppressor  (IVF index + suppress-and-append)
  *   - containment filter   (posting index + filter-against)
  *   - semanticDedup        (embedding slice)
  * Wall-times land in BENCH as `scale_smoke`; the pass/fail property is
  * blunt by design — no OOM, no hang, every stage completes at
  * local[32] / 128 GiB — and the recorded seconds make cross-round
  * regressions visible.
  *
  * Planted structure, tuned to REALISTIC duplicate density (the first
  * cut planted every vector near one of 64 shared centers, which made
  * every same-cell candidate a genuine ≥-threshold pair — ~10⁹ verify
  * hits per batch, a shape no curated corpus shows and one that turned
  * the probe into an hours-long outlier hunt): every 10th doc/vector
  * near-duplicates its predecessor (same word sequence + one token /
  * same direction + ≤2% jitter), every 7th doc is a shingle-subset
  * (containment seed), the batch replays a corpus slice under fresh
  * ids — so the suppressors exercise their flag paths against ~10%
  * true-positive density while the non-dup bulk stays far below every
  * threshold (independent 16-dim directions: |cos| concentrates near
  * 0.25; distinct word sequences share no shingles). Quantizer cell
  * counts scale as ~√corpus (the IVF sizing rule), so per-cell
  * candidate volume stays bounded as `rows` grows. */
object ScaleSmoke {

  /** Deterministic pseudo-word `k` of document `gid`: "w" + a
    * 50k-vocabulary token. Shared by corpus and batch generators so
    * planted duplicates reproduce the same text. */
  private def word(gid: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
    concat(lit("w"), pmod(xxhash64(gid * 31 + k, lit(1337)), lit(50000)))

  /** Content id of row `id`: which row's CONTENT this row carries —
    * id−1 for every 10th row (a planted near-dup), a corpus-slice
    * replay for every `replayEvery`-th (cross-frame duplicates under
    * fresh ids), the row's own id otherwise. */
  private def contentId(rows: Long, offset: Long, replayEvery: Long) = {
    val nearDup = (col("id") % 10) === 0 && col("id") > 0
    val base = when(nearDup, col("id") - 1).otherwise(col("id"))
    if (replayEvery > 0)
      when(col("id") % replayEvery === 0, pmod(col("id") * 7919, lit(rows)))
        .otherwise(base + offset)
    else base
  }

  /** (doc_id, text): ~12-word docs; id%10==0 copies its predecessor's
    * words + one marker token (a near-dup), id%7==0 keeps only the
    * first 6 words of its sequence (a containment seed for longer
    * copies). `offset` shifts ids (fresh batches); `replayEvery`
    * plants cross-frame duplicates.
    *
    * The FULL word count is keyed on gid — the content id — not the
    * row's own id (ADVICE r12): a near-dup/replay row must reproduce
    * its source's full word sequence, or the planted pair is a mere
    * prefix (Jaccard ≈ 0.62, below the suppressors' 0.8) and the
    * claimed ~10% true-positive density is not realized. Only the
    * containment TRUNCATION stays keyed on the row's own id — that is
    * what plants proper-subset pairs (a 6-word row vs a full copy of
    * the same sequence elsewhere). */
  private def docs(spark: SparkSession, rows: Long, offset: Long = 0L,
                   replayEvery: Long = 0L): DataFrame = {
    val id = col("id") + offset
    val nearDup = (col("id") % 10) === 0 && col("id") > 0
    val gid = contentId(rows, offset, replayEvery)
    val nWords = when(col("id") % 7 === 0, lit(6))
      .otherwise(lit(10) + pmod(gid, lit(5)))
    spark.range(rows).select(
      id.as("doc_id"),
      concat_ws(" ",
        concat(transform(sequence(lit(0), nWords - 1), k => word(gid, k)),
          when(nearDup, array(lit("xdup"))).otherwise(array().cast("array<string>")))
      ).as("text"))
  }

  /** (vec_id, embedding float[16]): each content id gets its own
    * uniform-[-1,1) direction (independent directions in 16-d — pair
    * cosines concentrate well below any dedup threshold), plus a ≤2%
    * per-ROW jitter so planted duplicates (id%10==0 copies its
    * predecessor's direction; `replayEvery` replays corpus directions)
    * score ~0.998, never bit-equal. */
  private def embeddings(spark: SparkSession, rows: Long, offset: Long = 0L,
                         replayEvery: Long = 0L): DataFrame = {
    val id = col("id") + offset
    val gid = contentId(rows, offset, replayEvery)
    spark.range(rows).select(
      id.as("vec_id"),
      transform(sequence(lit(0), lit(15)), k =>
        ((pmod(xxhash64(gid, k, lit(7)), lit(2000)) / lit(1000.0) - lit(1.0)) +
          pmod(xxhash64(col("id") + offset, k, lit(13)), lit(100)) / lit(5000.0)
        ).cast("float")).as("embedding"))
  }

  /** √n clamped to [lo, hi] — the standard IVF cell-count sizing. */
  private def cellsFor(n: Long, lo: Int, hi: Int): Int =
    math.max(lo, math.min(hi, math.sqrt(n.toDouble).toInt))

  private def timed[A](buf: scala.collection.mutable.ArrayBuffer[(String, Double)],
                       name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    val sec = (System.nanoTime() - t0) / 1e9
    buf += name -> sec
    // progress line per stage (stderr, not the bench JSON): a failed
    // run shows WHERE it died, not just that it died
    System.err.println(f"[smoke] $name%-24s $sec%8.1f s")
    r
  }

  /** Run the smoke; returns (stage, seconds) in run order. `rows` is
    * the corpus size; the index slice scales with it, the batch is
    * commit-sized but capped (a micro-batch does not grow with the
    * corpus — that is the point of incremental suppressors). */
  def run(spark: SparkSession, rows: Long): Seq[(String, Double)] = {
    val times = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val root = java.nio.file.Files.createTempDirectory("graft-scale-smoke")
    def p(n: String) = s"$root/$n"
    val indexRows = math.max(rows / 5, 1L)   // corpus-scale index slice
    val batchRows = math.min(math.max(rows / 50, 1L), 250000L)
    val ivfCells = cellsFor(indexRows, 64, 2048)
    try {
      // 1. materialize the corpus + embeddings (the multi-GB artifacts)
      timed(times, "gen_corpus") {
        docs(spark, rows).write.mode("overwrite").parquet(p("corpus"))
      }
      timed(times, "gen_embeddings") {
        embeddings(spark, rows).write.mode("overwrite").parquet(p("emb"))
      }
      val corpus = spark.read.parquet(p("corpus"))
      val emb = spark.read.parquet(p("emb"))
      // fresh batches replay corpus content under fresh ids (flag-path
      // work, not empty joins)
      val batch = docs(spark, batchRows, offset = rows, replayEvery = 3L)
        .localCheckpoint()
      val embBatch = embeddings(spark, batchRows, offset = rows,
          replayEvery = 3L)
        .localCheckpoint()
      try {
        // 2. near-dup suppressor
        timed(times, "neardup_index") {
          graft.api.Dedup.buildNearDupIndex(
            corpus.filter(col("doc_id") < indexRows), p("nd"))
        }
        val k1 = timed(times, "neardup_suppress") {
          val k = graft.api.Dedup.nearDupSuppressAndIndex(batch, p("nd"))
          k.queryExecution.toRdd.count()
          k
        }
        graft.api.Dedup.releaseMaterialized(k1)
        // 3. hamming suppressor over simhash signatures
        timed(times, "hamming_index") {
          graft.api.Dedup.buildHammingIndex(
            corpus.filter(col("doc_id") < indexRows)
              .select(col("doc_id"),
                graft.functions.TextFunctions.simHash64(lower(col("text")))
                  .as("sig")),
            p("ham"))
        }
        val k2 = timed(times, "hamming_suppress") {
          val k = graft.api.Dedup.hammingSuppressAndIndex(
            batch.select(col("doc_id"),
              graft.functions.TextFunctions.simHash64(lower(col("text")))
                .as("sig")),
            p("ham"))
          k.queryExecution.toRdd.count()
          k
        }
        graft.api.Dedup.releaseMaterialized(k2)
        // 4. semantic suppressor — cells sized ~√slice so per-cell
        // candidate volume stays bounded at any corpus size
        timed(times, "ivf_index") {
          graft.api.Similarity.buildIvfIndex(
            emb.filter(col("vec_id") < indexRows), p("ivf"),
            cells = ivfCells)
        }
        val k3 = timed(times, "semantic_suppress") {
          val k = graft.api.Similarity.semanticSuppressAndIndex(
            embBatch, p("ivf"))
          k.queryExecution.toRdd.count()
          k
        }
        graft.api.Dedup.releaseMaterialized(k3)
        // 5. containment posting index + ingestion filter
        timed(times, "containment_index") {
          graft.api.Dedup.buildContainmentIndex(
            corpus.filter(col("doc_id") < indexRows), p("ct"))
        }
        val k4 = timed(times, "containment_filter") {
          val k = graft.api.Dedup.containmentFilterAgainstIndex(batch, p("ct"))
          k.queryExecution.toRdd.count()
          k
        }
        graft.api.Dedup.releaseMaterialized(k4)
        // 6. semantic dedup over an embedding slice (cells ~√slice —
        // the function's own 100 TB sizing note)
        timed(times, "semantic_dedup") {
          val slice = math.min(batchRows * 2, rows)
          graft.api.Similarity.semanticDedup(
              emb.filter(col("vec_id") < slice), threshold = 0.9,
              cells = cellsFor(slice, 16, 1024))
            .queryExecution.toRdd.count()
        }
      } finally {
        graft.api.Dedup.releaseMaterialized(batch)
        graft.api.Dedup.releaseMaterialized(embBatch)
      }
      times.toSeq
    } finally {
      IngestProbes.rmrfQuiet(root.toFile)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }

  /** Standalone entry for local iteration:
    * runMain graft.ScaleSmoke [rows] */
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val spark = graft.core.Sessions.local("graft-scale-smoke")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val times = run(spark, rows)
    println(f"[smoke] TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s (rows=$rows)")
    spark.stop()
  }
}
