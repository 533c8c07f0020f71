package graft


/** Plan-audit dump: `explain("formatted")` for the headline queries,
  * written to stdout (redirect to PLANS.md). The properties worth
  * eyeballing per plan — and pinned by PlanShapeSpec — are: filters and
  * projections reaching the parquet scan (PushedFilters / ReadSchema),
  * broadcast joins on dimension sides only, keyed equi-joins (never
  * CartesianProduct/BNLJ) on candidate generation, partial (map-side)
  * hash aggregation, wide WholeStageCodegen spans, and no
  * single-partition exchanges.
  */
object Explain {
  private val headline = Seq(
    "q01_pricing_summary",   // scan + partial/final hash agg
    "q02_filter_project",    // pushdown + pruning
    "q10_multiway_join",     // one fact shuffle + broadcast dims
    "q18_topk_per_group",    // window rank
    "q23_ntile_percent",     // global quantiles without SinglePartition
    "q44_near_dup_pairs",    // PPJoin candidate equi-join + verify
    "q45_minhash_lsh",       // banded LSH equi-join
    "q48_ann_hyperplane",    // signature equi-join + typed top-k agg
    "q37_tumbling_window",   // event-time window agg (restored r8)
    "q41_hourly_rate",       // watermark/late-data batch form (restored r8)
    "q55_asof_join",         // union + keyed window, no range product
    "q57_ann_ivf",           // cell equi-join
    "q77_view_attribution",  // keyed interval join (stream-stream's batch form)
    "q73_salted_skew_join",  // (key, salt) equi-join
    "q74_multimodal_frames", // narrow mapPartitions pipeline
    "q81_ivfpq_contract",    // IVF+PQ: pruned codes scan + ADC equi-join
    "q83_sequence_packing",  // id+count-only exchange below the packer
    "q87_decontaminate",     // shingle-hash equi-join, unhinted bench side
    "q90_bloom_prefilter_join", // might_contain filter under the scan side
    "q93_cap_per_source",    // bounded typed aggregator, no window sort
    "q96_release_pipeline",  // the composed curation pass, one plan
    "q61_tfidf",             // unhinted df join + corpus count in-plan (r7)
    "q100_lm_quality",       // model-in-plan scoring, narrow (r7)
    "q98_sql_parity",        // SQL-registered native exprs == Column API (r7)
    "q103_bm25_search",      // one scan + one-row stats + TakeOrdered (r7)
    "q104_paragraph_dedup",  // keyed winner election + keyed reassembly (r7)
    "q109_normalize_text",   // fused native-expr chain, no shuffle (r7)
    "q110_corpus_profile",   // ONE rollup agg over one scan (r7)
    "q112_integrity_profile", // key-profile outer join, no row join (r7)
    "q114_incremental_dedup", // fingerprint anti-join (r7)
    "q115_deterministic_shuffle", // range exchange + two-pass rank (r7)
    "q116_subword_contract", // vocab-in-plan tokenize, one agg (r7)
    "q122_span_removal",     // keyed gram joins + doc-keyed interval merge (r7)
    "q123_dsir_weights",     // keyed count-table joins, 1-row totals (r7)
    "q124_cluster_sample",   // codegen'd assignment + cell-keyed windows (r7)
    "q128_neardup_index",    // banded index equi-join + anti-join exit (r8)
    "q130_top_fraction",     // grid-quantile threshold, corpus crosses once (r8)
    "q139_domain_cap",       // domain-keyed cap window, staged regex codegen (r9)
    "q142_boilerplate_lines", // (group, line)-keyed counts + anti join (r9)
    "q143_dup_ngram_coverage", // (doc, gram)-keyed count + doc-keyed merge (r9)
    "q144_fractional_decontaminate", // shingle equi-join + keyed denominator (r9)
    "q151_leakage_split",    // CC labels + md5 split projection (r9)
    "q153_quality_checks",   // one scan-wide agg + keys-only anti join (r9)
    "q154_event_funnel",     // co-keyed shrinking step joins (r9)
    "q155_similarity_triangles", // ordered two-hop triangle join (r9)
    "q150_hll_sketch_lifecycle", // sketch-table union, no corpus re-scan (r9)
    "q158_quantile_sketch_contract", // KLL merge + in-plan rank gate (r9)
    "q159_seen_filter",      // might_contain literal, codegen'd flag (r9)
    "q160_sharded_seen_filter", // CASE shard dispatch over 8 bloom literals (r10)
    "q162_semantic_decontaminate", // broadcast bench dim + keyed argmax (r10)
    "q163_semantic_decontaminate_indexed", // cell-pruned index probe, threshold argmax (r10)
    "q164_streaming_neardup_suppress", // banded index flag + PPJoin within-batch, anti-join exits (r10)
    "q165_merge_neardup_indexes", // cross-index band equi-join, signature-only federation (r10)
    "q168_streaming_semantic_suppress", // cell-pruned flag + exact pairwise within batch (r10)
    "q169_sentence_chunking", // doc-keyed prefix-sum windows + keyed reassembly (r10)
    "q170_suppress_explain", // dry-run decision table, keyed argmax evidence (r10)
    "q171_semantic_suppress_explain", // cell-pruned cosine explain, same tie rule (r10)
    "q172_hamming_suppress", // pigeonhole chunk flag + within-batch, anti-join exits (r10)
    "q173_hamming_suppress_explain", // chunk-keyed min-distance argmin evidence (r10)
    "q174_index_integrity",  // one keyed agg per store, no pair joins (r10)
    "q175_sql_suppress_explain", // the explain table via the SQL TVF surface (r11)
    "q176_merge_ivf_indexes", // cell-keyed cross-index cosine federation (r11)
    "q178_hybrid_rrf",       // bounded rankers + RRF full-outer fuse (r11)
    "q179_tar_shard_manifest", // one shard exchange; manifest agg over re-read (r11)
    "q180_weighted_interleave", // stratum-keyed WFQ window, no global rank (r11)
    "q181_trade_pagerank",   // keyed power iteration, bounded lineage (r11)
    "q182_freq_sketch_lifecycle", // sketch-table union, exact-gate join (r11)
    "q183_containment_pairs", // prefix-filtered containment join, posting-keyed (r11)
    "q184_corpus_diff",      // fingerprints-only full-outer diff, text never shuffles (r11)
    "q185_feature_drift",    // two keyed bin-count aggs, bins-sized spine (r11)
    "q187_label_propagation", // integer LPA: keyed vote agg + argmax window per iter (r11)
    "q188_link_extraction",  // staged-regex projection + explode, no shuffle (r11)
    "q189_frozen_drift",     // frozen edges/counts as literals, one batch scan (r11)
    "q190_write_expectations", // one codegen'd tagging projection, no shuffle (r11)
    "q191_ingest_expectations", // quarantine-before-marker commit split (r11)
    "q192_domain_communities", // extract→edges→LPA+degree chain, all keyed (r11)
    "q193_ranking_metrics",  // rank-filtered qrels join + keyed metric agg (r11)
    "q194_containment_filter", // fresh-prefix x corpus-posting join, anti-join exit (r11)
    "q195_containment_index", // persisted-posting filter, zero corpus re-read (r12)
    "q196_sql_graph_console", // degree+pagerank TVFs in one SELECT, all keyed (r12)
    "q197_sql_label_propagation", // LPA via TVF + size join, keyed per iter (r13)
    "q198_sql_connected_components", // pointer-doubled CC via TVF + size window (r12)
    "q199_sql_containment_filter", // index-only filter via TVF, zero corpus re-read (r13)
    "q200_sql_near_dup_pairs", // PPJoin pair join via TVF, posting-keyed (r13)
    "q202_sql_column_profile", // ONE-scan k-column profile via TVF (r14)
    "q203_sql_run_checks",     // ONE-scan suite + keys-only ref join via TVF (r14)
    "q204_sql_commit_log",     // marker-source history via TVF, metadata-sized (r14)
    "q207_sql_feature_drift",  // two melt-aggs + bin-spine joins via TVF (r15)
    "q208_sql_funnel",         // co-keyed shrinking step joins via TVF (r15)
    "q209_ingest_pii_redaction", // pre-stage scrub + _pii ledger commit path (r15)
    "q210_sql_snapshot",       // time travel via TVF, manifest-backed (r15)
    "q211_sql_pii_ledger",     // redaction ledger via TVF, metadata-sized (r15)
    "q212_sql_snapshot_at",    // AS-OF-timestamp resolution → same manifest read (r16)
    "q213_ingest_neardup_suppress", // fp keep-first + pinned Bloom consult at commit (r16)
    "q214_sql_snapshot_delta_at", // time-window delta → same O(delta) manifest read (r16)
    "q215_bucketed_commit_join") // bucket-aware committed read: zero Exchange on the cluster key (r17)

  /** Queries whose interesting plans are INSIDE the operator — every
    * stage localCheckpoints, so the outer frame dumps as `Scan
    * ExistingRDD` (VERDICT r10 #4). For these, the PlanAudit probe
    * captures each stage's REAL pre-checkpoint plan and the dump
    * appends them, so PLANS.md shows the candidate joins the scale
    * story rests on. Since r12 the batch pair operators share the
    * suppressors' checkpoint-and-release discipline, so their queries
    * are in this family too. */
  private val suppressorFamily = Set(
    "q164_streaming_neardup_suppress", "q168_streaming_semantic_suppress",
    "q170_suppress_explain", "q171_semantic_suppress_explain",
    "q172_hamming_suppress", "q173_hamming_suppress_explain",
    "q175_sql_suppress_explain",
    // batch pair operators (checkpointed since r12)
    "q44_near_dup_pairs", "q45_minhash_lsh", "q48_ann_hyperplane",
    "q57_ann_ivf", "q183_containment_pairs", "q194_containment_filter",
    "q195_containment_index", "q187_label_propagation",
    // TVF console queries: resolution executes the operator, so the
    // outer frame is Scan ExistingRDD — the probed stages are the plan
    "q197_sql_label_propagation", "q199_sql_containment_filter",
    "q200_sql_near_dup_pairs")

  private def cap(s: String): String = s.linesIterator
    .map(l => if (l.length > 300) l.take(300) + " ...<truncated>" else l)
    .mkString("\n")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // optional: further args name the only headline queries to dump
    // (fast before/after plan captures for a targeted optimization)
    val only = args.drop(1).toSet
    val headline = if (only.isEmpty) this.headline
      else this.headline.filter(only.contains) ++
        only.filterNot(this.headline.contains).toSeq.sorted
    val spark = graft.core.Sessions.local("graft-explain", defaultCpus = "8")
    spark.sparkContext.setLogLevel("ERROR")
    // ASCII only: the forked JVM's default stdout encoding mangles
    // multibyte characters on this platform
    println("# Physical plans (generated by `graft.Explain` - do not edit)")
    println(s"\nScale factor dir: `$sfDir`. See scaladoc of graft.Explain for")
    println("what to look for; PlanShapeSpec asserts the load-bearing shapes.")
    headline.foreach { name =>
      val stages = scala.collection.mutable.ArrayBuffer.empty[String]
      if (suppressorFamily(name))
        graft.api.PlanAudit.probe = Some(d => stages +=
          d.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      // queryExecution.explainString over df.explain: returns instead of
      // printing, so the output interleaves deterministically
      val df =
        try SparkEntry.queries(name)(spark, sfDir)
        finally graft.api.PlanAudit.probe = None
      println(s"\n## $name\n")
      println("```")
      // cap line width: embedded sketch literals (q90's serialized bloom
      // filter) would otherwise put a 17 KB line in PLANS.md
      println(cap(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)))
      println("```")
      // later batches replay the same stage shapes over different data
      // — the first batch's stages carry all the plan information
      stages.take(6).zipWithIndex.foreach { case (p, i) =>
        println(s"\n### $name inner stage ${i + 1}/${stages.length} (pre-checkpoint)\n")
        println("```")
        println(cap(p))
        println("```")
      }
      if (stages.length > 6)
        println(s"\n(${stages.length - 6} later-batch stages omitted - " +
          "identical shapes to the first batch's)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
