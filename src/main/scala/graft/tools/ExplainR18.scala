package graft.tools

import org.apache.spark.sql.DataFrame

/** Plan artifacts for the r18 optimization round (`plans/r18/`): the
  * executed FormattedMode plan of every touched declared query, plus
  * each suppressor-internal stage captured through the PlanAudit probe
  * (the suppressors materialize eagerly, so the outer plan alone shows
  * only Scan ExistingRDD). The SAME tool runs in a worktree at the
  * r17 HEAD to produce the `_before` twins and at this round's HEAD for
  * `_after` — identical capture path, so the diffs are code diffs.
  *
  * Usage: runMain graft.tools.ExplainR18 <outDir> <suffix> [sfDir]
  *   e.g. runMain graft.tools.ExplainR18 plans/r18 after
  */
object ExplainR18 {
  private def cap(s: String): String = s.linesIterator
    .map(l => if (l.length > 300) l.take(300) + " ...<truncated>" else l)
    .mkString("\n")

  private def executedString(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r18")
    val suffix = args.lift(1).getOrElse("after")
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.01")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = graft.core.Sessions.local("graft-explain-r18", defaultCpus = "8")
    spark.sparkContext.setLogLevel("ERROR")

    def dumpQuery(name: String): Unit = {
      val stages = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      graft.api.PlanAudit.probe = Some(d => stages += d)
      val df =
        try graft.SparkEntry.queries(name)(spark, sfDir)
        finally graft.api.PlanAudit.probe = None
      df.queryExecution.toRdd.count()
      val sb = new StringBuilder
      sb.append(s"## $name (executed, $suffix)\n\n```\n")
        .append(cap(executedString(df))).append("\n```\n")
      stages.zipWithIndex.foreach { case (d, i) =>
        sb.append(s"\n### $name inner stage ${i + 1}/${stages.length} (executed)\n\n```\n")
          .append(cap(executedString(d))).append("\n```\n")
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), sb.toString)
      System.err.println(s"[explain-r18] wrote ${name}_$suffix.txt (${stages.length} stages)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    Seq(
      "q195_containment_index",
      "q194_containment_filter",
      "q199_sql_containment_filter",
      "q164_streaming_neardup_suppress",
      "q168_streaming_semantic_suppress",
      "q172_hamming_suppress",
      "q63_near_dup_keep_one",
      "q57_ann_ivf",
      "q81_ivfpq_contract",
      // + the sorted_intersect_count verify-kernel change (late r18):
      // the PPJoin pair surface and the LPA consumer of those pairs
      "q44_near_dup_pairs",
      "q187_label_propagation",
      // + the one-pass quality/lang-id kernels (late r18)
      "q85_curation_pipeline",
      "q50_lang_id",
      // + the punct/stopword/meanlen/bpeish stat kernels (late r18)
      "q49_text_quality",
      "q105_quality_classifier",
      // + the one-shot containment ranking on the build's two-hash-agg
      // shape (late r18)
      "q183_containment_pairs"
    ).foreach { q =>
      try dumpQuery(q)
      catch { case t: Throwable =>
        System.err.println(s"[explain-r18] $q FAILED: ${t.getMessage}") }
    }

    // The containment BUILD's postings plan (a write job — PlanAudit
    // cannot capture it): both shapes reconstructed over the same
    // sketches input, so the r17→r18 claim (dfc checkpoint + token join
    // + row_number window → two hash aggregations, no join, no
    // partition sort) is checkable as a plan diff in one file. Only
    // emitted from the r18 tree (suffix "after").
    if (suffix == "after") try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val root = java.nio.file.Files.createTempDirectory("graft-explain-ct")
      val docs = graft.core.Tables.documents(spark, sfDir)
      graft.api.Dedup.shingleSets(docs, "doc_id", "text", 3)
        .write.mode("overwrite").parquet(s"$root/sketches")
      val sets = spark.read.parquet(s"$root/sketches")
      val toks = sets.select(col("doc_id"), col("n"), explode(col("sh")).as("tok"))
      val dfc = toks.groupBy("tok").agg(count(lit(1)).as("dfc")).localCheckpoint()
      val beforePostings = toks.join(dfc, "tok")
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("dfc"), col("tok"))) - 1)
        .select(col("doc_id"), col("n"), col("tok"), col("pos"))
      val afterPostings = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfc"),
          collect_list(struct(col("doc_id"), col("n"))).as("ds"))
        .select(col("tok"), col("dfc"), explode(col("ds")).as("d"))
        .groupBy(col("d.doc_id").as("doc_id"), col("d.n").as("n"))
        .agg(sort_array(collect_list(struct(col("dfc"), col("tok")))).as("arr"))
        .select(col("doc_id"), col("n"), posexplode(col("arr")))
        .select(col("doc_id"), col("n"), col("col.tok").as("tok"),
          col("pos").cast("int").as("pos"))
      beforePostings.queryExecution.toRdd.count()
      afterPostings.queryExecution.toRdd.count()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, "containment_build_postings_shapes.txt"),
        "## containment build: postings plan, r17 shape (dfc localCheckpoint + " +
          "token join + row_number window)\n\n```\n" +
          cap(executedString(beforePostings)) + "\n```\n\n" +
          "## containment build: postings plan, r18 shape (two hash " +
          "aggregations, array sort per doc)\n\n```\n" +
          cap(executedString(afterPostings)) + "\n```\n")
      dfc.unpersist(false)
      graft.IngestProbes.rmrfQuiet(root.toFile)
      System.err.println("[explain-r18] wrote containment_build_postings_shapes.txt")
    } catch { case t: Throwable =>
      System.err.println(s"[explain-r18] build-shapes FAILED: ${t.getMessage}") }
    spark.stop()
  }
}
