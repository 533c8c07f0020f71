package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` fixtures: exact + near dedup (shingle-verified and
  * MinHash-LSH), SimHash, cosine top-k similarity (brute force and
  * hyperplane-bucketed ANN), text quality, language ID, token stats.
  *
  * Scale notes (100 TB framing):
  *  - every candidate-generation step is a keyed equi-join (fingerprint,
  *    shingle, band-bucket, signature-chunk) — never an unkeyed all-pairs
  *    product except the explicitly-labelled brute-force baseline;
  *  - per-document features are codegen'd scalar/higher-order
  *    expressions — no UDFs, no collects;
  *  - float aggregates that cross the DuckDB oracle are carried as
  *    DECIMAL(18,6) sums (exact, order-independent) and divided once in
  *    double, so partial-aggregation order can't break bit-equality.
  */
object Pipeline {

  private val Shingle = 3
  private val MinHashes = 64
  private val Bands = 16 // 4 rows per band
  private val JaccardThreshold = 0.8

  /** doc_id + distinct lowercase word 3-shingles (+ set size). */
  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), distinctShingles(lower(col("text")), Shingle).as("sh"))
      .withColumn("n", size(col("sh")))

  /** Exact Jaccard for a candidate pair set carrying both shingle arrays. */
  private def verified(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 6))
      .filter(col("jaccard") >= JaccardThreshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")

  // ---------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: group on the normalized-text MD5 fingerprint; keep the
    // lowest doc_id as the canonical survivor. One keyed shuffle on the
    // fingerprint — the 100 TB-safe exact-dedup shape.
    "q43_exact_dedup" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), md5Fingerprint(col("text")).as("fingerprint"))
        .groupBy("fingerprint")
        .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("dup_count"))
        .orderBy("keep_doc_id")
    }),

    // Ground-truth near-dup pairs via the exact prefix-filtered
    // similarity join (PPJoin family):
    //  1. order each doc's shingle hashes globally (the 64-bit hash IS
    //     the total order) and index only the PREFIX — the ⌊(1-t)·n⌋+1
    //     smallest — because any pair with J ≥ t must collide inside
    //     both prefixes (symmetric prefix filter, provably no false
    //     negatives); candidate volume drops ~25× vs indexing every
    //     shingle;
    //  2. length filter in the join (J ≤ min(n)/max(n) ⇒ sizes within
    //     1.25× of each other at t = 0.8);
    //  3. verify candidates with the exact Jaccard on full shingle sets.
    // Every step is a keyed equi-join or aggregation — the 100 TB shape.
    // The prefix index is corpus-sized (~1 row per doc per prefix token),
    // so the self-join carries NO broadcast hint: AQE broadcasts it when
    // it actually fits and shuffles on tok otherwise (PlanShapeSpec pins
    // the equi-join either way).
    "q44_near_dup_pairs" -> ((s, d) => {
      val docs = shingled(s, d).cache()
      val prefixLen = (floor(col("n") * (1 - JaccardThreshold)) + 1).cast("int")
      val prefix = docs.select(col("doc_id"), col("n"),
          slice(array_sort(transform(col("sh"), t => xxhash64(t))), lit(1), prefixLen).as("pre"))
        .select(col("doc_id"), col("n"), posexplode(col("pre")).as(Seq("pos", "tok")))
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
            col("b.n") * JaccardThreshold <= col("a.n") &&
            col("a.n") * JaccardThreshold <= col("b.n") &&
            // PPJoin position filter: common shingles are a subset of
            // each side's suffix from the FIRST common prefix token, so
            // overlap ≤ min(n_a - pos_a, n_b - pos_b) (pos is 0-based,
            // the min counts the matched token itself), while J ≥ t
            // needs overlap ≥ t/(1+t)·(n_a+n_b). No false negatives:
            // when J ≥ t the first common token's row always satisfies
            // both this and the prefix bound (PipelineSpec pins
            // LSH == exact, which would catch any lost pair).
            least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
              (col("a.n") + col("b.n")) * lit(JaccardThreshold / (1 + JaccardThreshold)))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val pairs = cand
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b")), "doc_b")
      verified(pairs)
    }),

    // MinHash-LSH near-dup: 64 min-hashes per doc, banded 16×4; docs
    // colliding in any band become candidates; candidates are verified
    // with exact Jaccard. This is the scale path: candidate generation
    // is an equi-join on (band, band-hash) — cost is proportional to
    // collisions, not to n². P(miss | J=0.97) ≈ 1e-15, so the oracle is
    // the exact ground truth (same SQL as q44).
    "q45_minhash_lsh" -> ((s, d) => {
      val docs = shingled(s, d).cache()
      val mh = Tables.documents(s, d).select(col("doc_id"),
        minHashes(lower(col("text")), Shingle, MinHashes).as("mh"))
      val bands = mh.select(col("doc_id"),
          explode(transform(sequence(lit(0), lit(Bands - 1)),
            b => struct(b.as("band"),
              xxhash64(b, slice(col("mh"), b * lit(MinHashes / Bands) + 1,
                lit(MinHashes / Bands))).as("bkey")))).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val pairs = cand
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b")), "doc_b")
      verified(pairs)
    }),

    // SimHash near-dup: 64-bit signature = sign of per-bit sums of ±1
    // token-hash contributions; candidates must share one of four 16-bit
    // signature chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal);
    // report pairs at hamming distance ≤ 3. Candidate join is keyed on
    // (chunk index, chunk value). No DuckDB oracle (xxhash64-based) —
    // rows-only check; correctness is covered by PipelineSpec.
    "q46_simhash_pairs" -> ((s, d) => {
      val sig = Tables.documents(s, d)
        .select(col("doc_id"), simHash64(lower(col("text"))).as("sig")).cache()
      val chunks = sig.select(col("doc_id"), col("sig"),
          explode(array((0 until 4).map(c => struct(lit(c).as("chunk"),
            shiftrightunsigned(col("sig"), c * 16).bitwiseAND(lit(0xffffL)).as("cval"))): _*)).as("cc"))
        .select(col("doc_id"), col("sig"), col("cc.chunk").as("chunk"), col("cc.cval").as("cval"))
      chunks.as("a").join(chunks.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.cval") === col("b.cval") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    }),

    // Brute-force cosine top-3 neighbors per vector — the exactness
    // baseline. All-pairs by construction (O(n²)): right side broadcast,
    // norms hoisted before the join so each is computed n times, not n².
    // The scale path is q48; this one is the oracle-checked ground truth.
    "q47_cosine_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      val a = e.select(col("vec_id").as("vec_id"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"), col("nrm").as("nb"))
      val pairs = a.join(broadcast(b), col("vec_id") =!= col("neighbor_id"))
        .withColumn("cos", cosinePrenormed(dot(col("ea"), col("eb")), col("na"), col("nb")))
      val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id"))
      pairs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("vec_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy("vec_id", "rank")
    }),

    // Multi-table hyperplane-LSH ANN: 16 independent salted tables of
    // 6-plane signatures; a pair is a candidate if it collides in ANY
    // table; candidates get exact cosines; top-3 per query vector.
    // Candidate generation is an equi-join on (table, signature) — the
    // shape that survives 100 TB (cost ∝ collisions, not n²). Recall vs
    // the exact q47 is measured in PipelineSpec. Rows-only check.
    "q48_ann_hyperplane" -> ((s, d) => {
      val tables = 16
      val planes = 6
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        .cache()
      // dimension probe: one metadata-sized lookup so the plane weights
      // can be precomputed as literals (hyperplaneSignatureFast)
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val sigs = e.select(col("vec_id"),
          explode(array((0 until tables).map(t => struct(lit(t).as("tbl"),
            hyperplaneSignatureFast(col("embedding"), planes, t, dim).as("sig"))): _*)).as("ts"))
        .select(col("vec_id"), col("ts.tbl").as("tbl"), col("ts.sig").as("sig"))
      val cand = sigs.as("a").join(sigs.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"))
        .distinct()
      // verify joins are keyed on vec_id with NO broadcast hint — the
      // embeddings side is corpus-sized, so at scale these must be
      // shuffle hash joins; AQE picks broadcast only when it truly fits
      val pairs = cand
        .join(e.select(col("vec_id"), col("embedding").as("ea"), col("nrm").as("na")), "vec_id")
        .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"), col("nrm").as("nb")), "neighbor_id")
        .withColumn("cos", cosinePrenormed(dot(col("ea"), col("eb")), col("na"), col("nb")))
      // grouped top-k via the typed TopKByScore Aggregator: bounded
      // k-entry buffers with map-side partial aggregation, instead of
      // sorting every candidate pair under a window (same (cos desc,
      // id asc) order contract — TopKAggregatorSpec)
      import s.implicits._
      pairs.select(col("vec_id"), col("neighbor_id"), col("cos"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues { case (_, nid, c) => (nid, c) }
        .agg(new graft.functions.TopKByScore(3).toColumn.name("topk"))
        .toDF("vec_id", "topk")
        .select(col("vec_id"), posexplode(col("topk")))
        .select(col("vec_id"), (col("pos") + 1).as("rank"),
          col("col._1").as("neighbor_id"), round(col("col._2"), 6).as("cos"))
        .orderBy("vec_id", "rank")
    }),

    // Per-language text-quality profile. Integer sums (token counts) are
    // exact; double metrics go through DECIMAL(18,6) sums so aggregation
    // order is irrelevant, then one double division.
    "q49_text_quality" -> ((s, d) => {
      val en = langMarkers("en")
      val docs = Tables.documents(s, d).select(col("lang"),
        tokenCount(col("text")).as("ws_toks"),
        bpeishTokenCount(col("text")).as("bpe_toks"),
        round(punctRatio(col("text")), 6).cast("decimal(18,6)").as("punct"),
        qualityScore(col("text"), en).cast("decimal(18,6)").as("quality"))
      docs.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          avg(col("ws_toks")).as("avg_ws_tokens"),
          avg(col("bpe_toks")).as("avg_bpe_tokens"),
          round(sum(col("punct")).cast("double") / count(lit(1)), 6).as("avg_punct"),
          round(sum(col("quality")).cast("double") / count(lit(1)), 6).as("avg_quality"))
        .orderBy("lang")
    }),

    // Language ID via marker-word argmax (ties → language code asc,
    // no hits → 'und'), confusion-matrix style output against the
    // labelled lang column.
    "q50_lang_id" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), langId(lower(col("text"))).as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),

    // Token accounting per source: whitespace tokens and the BPE-ish
    // pre-tokenizer count (word pieces / numbers / punctuation runs).
    "q51_token_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"), col("text"),
          tokenCount(col("text")).as("ws"), bpeishTokenCount(col("text")).as("bpe"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("ws").as("ws_tokens"), sum("bpe").as("bpe_tokens"),
          max("ws").as("max_ws"), sum(length(col("text"))).as("chars"))
        .orderBy("source")
    }),

    // Embedding-cosine near-dup: all pairs at-or-above a cosine
    // threshold — brute-force exact baseline (labelled; the LSH/IVF
    // variants above are the scale path for candidate generation).
    "q62_embedding_neardup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb"))
      a.join(broadcast(b), col("vec_a") < col("vec_b"))
        .withColumn("cos", cosinePrenormed(dot(col("ea"), col("eb")), col("na"), col("nb")))
        .filter(col("cos") >= 0.45)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
        .orderBy("vec_a", "vec_b")
    }),

    // The keep-one dedup that closes the near-dup pipeline: connected
    // components over the verified pair graph (iterative min-label
    // propagation — the standard large-graph CC: each round one keyed
    // join + aggregation, converges in O(graph diameter) rounds), then
    // canonical = component minimum. Output: every doc in a near-dup
    // component with its canonical survivor.
    "q63_near_dup_keep_one" -> ((s, d) => {
      // candidate pairs come from the MinHash-LSH path (q45) — the
      // scale-path generator, proven equal to the exact shingle join
      // (PipelineSpec) and ~2× cheaper than recomputing it
      val pairs = Pipeline.queries("q45_minhash_lsh")(s, d)
        .select(col("doc_a"), col("doc_b"))
      // materialized ONCE and lineage-truncated — every iteration rereads
      // the checkpointed blocks instead of replaying the LSH join
      val edges = pairs
        .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .localCheckpoint()
      val sc = s.sparkContext
      def persistedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
      var prevIds = Set.empty[Int]
      var labels = edges.select(col("doc_a").as("node")).distinct()
        .withColumn("label", col("node"))
      var converged = false
      var iter = 0
      val maxIter = 50
      while (!converged && iter < maxIter) {
        val viaNeighbors = edges
          .join(labels, edges("doc_b") === labels("node"))
          .select(col("doc_a").as("node"), col("label"))
        val propagated = labels.select(col("node"), col("label"))
          .union(viaNeighbors)
          .groupBy("node").agg(min("label").as("label"))
        // carry the old label through the SAME materialization, so the
        // convergence test below is a scan of checkpointed blocks — one
        // propagation job per iteration, bounded lineage
        val before = persistedIds
        val next = propagated
          .join(labels.withColumnRenamed("label", "old"), "node")
          .localCheckpoint()
        val nextIds = persistedIds -- before
        converged = next.filter(col("label") =!= col("old")).isEmpty
        // release the superseded iteration's checkpoint blocks
        prevIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
        prevIds = nextIds
        labels = next.select("node", "label")
        iter += 1
      }
      // a silent cap would diverge from the oracle's full transitive
      // closure — fail loudly instead (diameter > 50 on a near-dup graph
      // means the threshold, not the algorithm, is wrong)
      require(converged,
        s"q63 connected-components did not converge within $maxIter iterations")
      labels.select(col("node").as("doc_id"), col("label").as("canonical_id"))
        .orderBy("doc_id")
    }),

    // TF-IDF-lite (SURVEY §7.1 M5): top-3 terms per document by
    // tf·idf. Document frequencies come from one keyed aggregation over
    // (term, doc) pairs; idf joins back by term (broadcastable — vocab
    // ≪ corpus). ln() is IEEE-identical across engines for these
    // inputs; scores round to 6 for the oracle.
    "q61_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), explode(wsTokens(lower(col("text")))).as("term"))
      val n = Tables.documents(s, d).count()
      val tf = docs.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(df), "term")
        .withColumn("tfidf",
          round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3 && col("doc_id") < 100)
        .select(col("doc_id"), col("rnk"), col("term"), col("tfidf"))
        .orderBy("doc_id", "rnk")
    }),

    // Rolling-hash document sketch: min shingle-hash fingerprint (k-min
    // sketch, k=1) — the cheap near-dup pre-filter key. xxhash64-based,
    // no DuckDB analogue → rows-only; determinism checked in PipelineSpec.
    "q52_min_shingle_fp" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), minShingleHash(lower(col("text")), Shingle).as("fp"))
        .orderBy("doc_id")
    }),

    // IVF-style ANN: a coarse k-means quantizer (MLlib, fixed seed)
    // assigns every vector to a Voronoi cell; search runs within the
    // cell (nprobe=1). The 100 TB shape: centroids are a tiny broadcast
    // model, assignment is a narrow map, candidate generation is an
    // equi-join on cell id. Approximate → rows-only; recall vs the
    // exact q47 is measured in PipelineSpec alongside the LSH variant.
    "q57_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
        .cache()
      val feats = e.select(col("vec_id"),
        org.apache.spark.ml.functions.array_to_vector(col("embedding")).as("features"))
      val km = new org.apache.spark.ml.clustering.KMeans()
        .setK(16).setSeed(42).setMaxIter(5).fit(feats)
      val cells = km.transform(feats).select(col("vec_id"), col("prediction").as("cell"))
      val withCell = e.join(cells, "vec_id")
      val a = withCell.select(col("cell"), col("vec_id"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val b = withCell.select(col("cell"), col("vec_id").as("neighbor_id"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      // cell equi-join, un-hinted: b is the full corpus, so broadcast is
      // left to AQE (shuffle-on-cell is the correct 100 TB shape)
      val pairs = a.join(b, Seq("cell")).filter(col("vec_id") =!= col("neighbor_id"))
        .withColumn("cos", cosinePrenormed(dot(col("ea"), col("eb")), col("na"), col("nb")))
      val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id"))
      pairs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("vec_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cos"))
        .orderBy("vec_id", "rank")
    }),

    // Approximate distinct (HyperLogLog++): the sketch path for
    // count-distinct at 100 TB (mergeable, fixed memory). Sketch values
    // differ per implementation, so the oracle checks the CONTRACT:
    // exact count plus a boolean that the approximation landed within
    // 3× the configured relative standard deviation.
    "q54_approx_distinct" -> ((s, d) => {
      val rsd = 0.05
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), rsd).as("n_approx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double") /
            col("n_exact") <= 3 * rsd).as("approx_ok"))
        .orderBy("event_type")
    }),

    // As-of join: for every 'view' event, the user's most recent
    // 'purchase' at-or-before it. Built scale-safely as union + keyed
    // window (last non-null carried forward) — one shuffle on user_id,
    // NO range-explode or per-row backward scan. DuckDB's native
    // ASOF JOIN is the oracle.
    "q55_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), lit(null).cast("long").as("p_id"))
      // dedupe purchases per (user, ts) — ASOF tie-pick would otherwise
      // be engine-dependent
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("p_id"))
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"), col("p_id"))
      // purchases sort before views at the same ts (sides: 0 < 1) so an
      // exact-tie purchase is visible to the view — ASOF >= semantics
      val tagged = views.withColumn("side", lit(1))
        .unionByName(purchases.withColumn("side", lit(0)))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_purchase", last(col("p_id"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("user_id"), col("event_id"), col("last_purchase"))
        .orderBy("user_id", "event_id")
    }),

    // Multimodal columns: binary payloads + typed metadata through the
    // decode → feature-extract mapPartitions pipeline (stub codec, real
    // plumbing — see graft.multimodal). Aggregated per modality; the
    // deterministic stub decode lets DuckDB replicate the numbers.
    "q53_multimodal_features" -> ((s, d) => {
      val feats = graft.multimodal.Multimodal.features(
        graft.multimodal.Multimodal.decode(
          graft.multimodal.Multimodal.mediaFromDocuments(s, d)))
      feats.groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          avg(col("width")).as("avg_width"),
          avg(col("height")).as("avg_height"))
        .orderBy("kind")
    }),

    // ------------------------------------------------ contract queries
    // The approximate operators (q46/q48/q52/q57) are hash/seed-based
    // and have no SQL analogue, so the driver's gate only counts their
    // rows. These queries turn each one's QUALITY contract into a
    // constant-row oracle the driver CAN check — same pattern as q54's
    // HLL contract.

    // ANN quality: recall of the exact top-3 neighbor set (q47) by the
    // hyperplane-LSH tables (q48) and by IVF nprobe=1 (q57). The
    // thresholds mirror PipelineSpec's; recall is computed fully
    // distributed (left join + aggregate — no collects).
    "q70_ann_recall" -> ((s, d) => {
      val exact = Pipeline.queries("q47_cosine_topk")(s, d)
        .select(col("vec_id"), col("neighbor_id"))
      def recallOf(ann: DataFrame, method: String, thr: Double): DataFrame =
        exact.join(ann.select(col("vec_id"), col("neighbor_id"))
            .withColumn("hit", lit(1)), Seq("vec_id", "neighbor_id"), "left")
          .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1))).as("recall"))
          .select(lit(method).as("method"), (col("recall") >= thr).as("recall_ok"))
      recallOf(Pipeline.queries("q48_ann_hyperplane")(s, d), "hyperplane", 0.3)
        .unionByName(recallOf(Pipeline.queries("q57_ann_ivf")(s, d), "ivf", 0.1))
        .orderBy("method")
    }),

    // SimHash contract: the hamming<=3 pair set is nonempty and overlaps
    // the exact Jaccard>=0.8 ground truth (token-level simhash and
    // shingle Jaccard are different similarity spaces, so overlap — not
    // equality — is the honest contract).
    "q71_simhash_contract" -> ((s, d) => {
      val sim = Pipeline.queries("q46_simhash_pairs")(s, d).select("doc_a", "doc_b")
      // q45's LSH pair set is proven equal to the exact shingle-join
      // ground truth (PipelineSpec) at ~40% of the cost — use it as the
      // truth side here
      val truth = Pipeline.queries("q45_minhash_lsh")(s, d).select("doc_a", "doc_b")
      val nSim = sim.agg(count(lit(1)).as("n_sim"))
      val nInter = sim.join(truth, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_inter"))
      nSim.crossJoin(nInter)
        .select((col("n_sim") > 0).as("nonempty"),
          (col("n_inter") > 0).as("overlaps_truth"))
    }),

    // Fingerprint contract: identical documents (same exact-dedup md5
    // fingerprint) MUST collide on the min-shingle sketch — sketch
    // equality is implied by text equality, so a split group is a sketch
    // bug (vacuously true on a dup-free fixture); and the sketch covers
    // the corpus: exactly one non-null fp per document.
    "q72_fingerprint_contract" -> ((s, d) => {
      val fp = Pipeline.queries("q52_min_shingle_fp")(s, d)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), md5Fingerprint(col("text")).as("f"))
      val joined = docs.join(fp, "doc_id")
      val consistent = joined.groupBy("f")
        .agg(countDistinct(col("fp")).as("nfp"))
        .agg(coalesce(max(col("nfp")) === 1, lit(true)).as("fp_consistent"))
      val coverage = joined
        .agg(count(col("fp")).as("n_fp"))
        .crossJoin(Tables.documents(s, d).agg(count(lit(1)).as("n_docs")))
        .select((col("n_fp") === col("n_docs")).as("fp_covers_corpus"))
      consistent.crossJoin(coverage)
    })
  )

  // ---------------------------------------------------------------- oracles

  private val shingleCte =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') t FROM documents
       |), sh AS (
       |  SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ')
       |    FOR i IN range(1, greatest(len(t)-2,0)+1)]) shingles FROM toks
       |), ex AS (
       |  SELECT doc_id, unnest(shingles) s, len(shingles) n FROM sh
       |), pairs AS (
       |  SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter,
       |         any_value(a.n) na, any_value(b.n) nb
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1,2
       |)
       |SELECT doc_a, doc_b, round(inter*1.0/(na+nb-inter), 6) AS jaccard
       |FROM pairs WHERE inter*1.0/(na+nb-inter) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  val oracles: Map[String, String] = Map(
    "q43_exact_dedup" ->
      """SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint,
        |       min(doc_id) AS keep_doc_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin,
    "q44_near_dup_pairs" -> shingleCte,
    "q45_minhash_lsh" -> shingleCte,
    "q47_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |p AS (
        |  SELECT a.vec_id vec_id, b.vec_id neighbor_id,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) dot,
        |    sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) na,
        |    sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) nb
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |r AS (
        |  SELECT vec_id, neighbor_id,
        |    CASE WHEN na*nb = 0 THEN 0.0 ELSE dot/(na*nb) END AS c,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY (CASE WHEN na*nb = 0 THEN 0.0 ELSE dot/(na*nb) END) DESC,
        |               neighbor_id) AS "rank"
        |  FROM p)
        |SELECT vec_id, "rank", neighbor_id, round(c, 6) AS cos
        |FROM r WHERE "rank" <= 3 ORDER BY vec_id, "rank"""".stripMargin,
    "q49_text_quality" ->
      """WITH m AS (
        |  SELECT lang,
        |    len(string_split_regex(text, '\s+')) ws_toks,
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) bpe_toks,
        |    CAST(round(CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |      (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))*1.0
        |        / length(text) END, 6) AS DECIMAL(18,6)) punct,
        |    CAST(round(
        |      least(len(string_split_regex(text, '\s+')) / 20.0, 1.0) * 0.4
        |      + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |          (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))*1.0
        |            / length(text) END) * 4.0, 1.0)) * 0.3
        |      + (1.0 - (CASE WHEN len(string_split_regex(text, '\s+')) = 0 THEN 0.0 ELSE
        |          len(list_filter(string_split_regex(text, '\s+'),
        |            x -> x IN ('the','a','of','and','to','in','is','that')))*1.0
        |            / len(string_split_regex(text, '\s+')) END)) * 0.3, 6) AS DECIMAL(18,6)) quality
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  avg(ws_toks) AS avg_ws_tokens, avg(bpe_toks) AS avg_bpe_tokens,
        |  round(CAST(sum(punct) AS DOUBLE) / count(*), 6) AS avg_punct,
        |  round(CAST(sum(quality) AS DOUBLE) / count(*), 6) AS avg_quality
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,
    "q50_lang_id" ->
      """WITH toks AS (
        |  SELECT lang, string_split_regex(lower(text), '\s+') t FROM documents),
        |sc AS (
        |  SELECT lang,
        |    len(list_filter(t, x -> x IN ('der','die','das','und','ist','ein','zu','den'))) s_de,
        |    len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','that'))) s_en,
        |    len(list_filter(t, x -> x IN ('el','la','de','que','y','en','un','es'))) s_es,
        |    len(list_filter(t, x -> x IN ('le','la','de','et','un','est','que','des'))) s_fr,
        |    len(list_filter(t, x -> x IN ('的','是','了','在','我','有','和','不'))) s_zh
        |  FROM toks),
        |pred AS (
        |  SELECT lang, CASE WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) <= 0 THEN 'und'
        |    ELSE substr(least(
        |      printf('%04d|de', 9999-s_de), printf('%04d|en', 9999-s_en),
        |      printf('%04d|es', 9999-s_es), printf('%04d|fr', 9999-s_fr),
        |      printf('%04d|zh', 9999-s_zh)), 6) END predicted
        |  FROM sc)
        |SELECT lang, predicted, count(*) AS n
        |FROM pred GROUP BY 1,2 ORDER BY lang, predicted""".stripMargin,
    "q62_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |p AS (
        |  SELECT a.vec_id vec_a, b.vec_id vec_b,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) dot,
        |    sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) na,
        |    sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) nb
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b,
        |  round(CASE WHEN na*nb = 0 THEN 0.0 ELSE dot/(na*nb) END, 6) AS cos
        |FROM p WHERE (CASE WHEN na*nb = 0 THEN 0.0 ELSE dot/(na*nb) END) >= 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,
    "q63_near_dup_keep_one" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') t FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ')
        |    FOR i IN range(1, greatest(len(t)-2,0)+1)]) shingles FROM toks
        |), ex AS (
        |  SELECT doc_id, unnest(shingles) s, len(shingles) n FROM sh
        |), prs AS (
        |  SELECT a.doc_id doc_a, b.doc_id doc_b
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |  HAVING count(*)*1.0/(any_value(a.n)+any_value(b.n)-count(*)) >= 0.8
        |), edges AS (
        |  SELECT doc_a a, doc_b b FROM prs UNION SELECT doc_b, doc_a FROM prs
        |), reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |)
        |SELECT a AS doc_id, least(a, min(b)) AS canonical_id
        |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,
    "q61_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) n FROM documents),
        |scored AS (
        |  SELECT doc_id, tf.term,
        |    round(tf * ln(n.n * 1.0 / df), 6) AS tfidf
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) rnk
        |  FROM scored)
        |SELECT doc_id, rnk, term, tfidf FROM r
        |WHERE rnk <= 3 AND doc_id < 100 ORDER BY doc_id, rnk""".stripMargin,
    "q54_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q55_asof_join" ->
      """WITH v AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_id FROM events
        |  WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) ts, max(event_id) p_id FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT v.user_id, v.event_id, p.p_id AS last_purchase
        |FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts >= p.ts
        |ORDER BY v.user_id, v.event_id""".stripMargin,
    "q53_multimodal_features" ->
      """SELECT kind, count(*) AS n, CAST(sum(nb) AS BIGINT) AS total_bytes,
        |  avg(w) AS avg_width, avg(h) AS avg_height FROM (
        |  SELECT CASE CAST(doc_id % 3 AS INT)
        |           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    strlen(text) AS nb,
        |    16 + (strlen(text) * 31) % 497 AS w,
        |    16 + (strlen(text) * 73) % 353 AS h
        |  FROM documents) t
        |GROUP BY kind ORDER BY kind""".stripMargin,
    "q51_token_stats" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_tokens,
        |  max(len(string_split_regex(text, '\s+'))) AS max_ws,
        |  CAST(sum(length(text)) AS BIGINT) AS chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q70_ann_recall" ->
      """SELECT 'hyperplane' AS method, TRUE AS recall_ok
        |UNION ALL SELECT 'ivf', TRUE ORDER BY method""".stripMargin,
    "q71_simhash_contract" ->
      "SELECT TRUE AS nonempty, TRUE AS overlaps_truth",
    "q72_fingerprint_contract" ->
      "SELECT TRUE AS fp_consistent, TRUE AS fp_covers_corpus"
  )
}
