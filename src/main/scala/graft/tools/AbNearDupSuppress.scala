package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{AppendLedger, Dedup, PlanAudit}
import graft.functions.TextFunctions._

/** A/B harness for the r17 one-pass combined-sketch rewrite of
  * `nearDupSuppressAndIndex` (q164's per-commit body): the r16 body
  * materialized TWO signature checkpoints per commit — shingle sets
  * via `distinctShingleHashes`, banded signatures via `minHashes` —
  * each its own job that re-tokenized and re-FNV-hashed every shingle
  * of the batch. The r17 library body materializes ONE combined
  * `shingleSketch` checkpoint and derives both forms from it. Legs
  * ALTERNATE legacy/one-pass against fresh copies of one pristine
  * index (suppression mutates its index), so box drift cancels;
  * survivor counts must be EQUAL across all legs.
  *
  * The LEGACY body lives here verbatim (two checkpoints, two shingle
  * passes), not in the library — the AbIndexBuild discipline.
  *
  * Usage: runMain graft.tools.AbNearDupSuppress [rows] [reps] [out.json]
  */
object AbNearDupSuppress {

  // --- local twins of Dedup's private helpers, expression-identical ---
  private val candEps = 1e-6

  private def verify(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jx",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jx") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jx"), 6).as("jaccard"))

  private def joinBack(cand: DataFrame, docs: DataFrame): DataFrame =
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("n_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("n_b")), "doc_b")

  private def pairsFromSets(sets: DataFrame, threshold: Double): DataFrame = {
    val prefixLen = (floor(col("n") * (1 - threshold) + candEps) + 1).cast("int")
    val prefix = sets.select(col("doc_id"), col("n"),
        slice(col("sh"), lit(1), prefixLen).as("pre"))
      .select(col("doc_id"), col("n"), posexplode(col("pre")).as(Seq("pos", "tok")))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") * threshold <= col("a.n") + candEps &&
          col("a.n") * threshold <= col("b.n") + candEps &&
          least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
            (col("a.n") + col("b.n")) * lit(threshold / (1 + threshold)) - candEps)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verify(joinBack(cand, sets), threshold)
  }

  private def bandedSignatures(docs: DataFrame, shingle: Int,
                               hashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = hashes / bands
    docs.select(col("doc_id"),
        minHashes(lower(col("text")), shingle, hashes).as("mh"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(b, slice(col("mh"), b * lit(rowsPerBand) + 1,
              lit(rowsPerBand))).as("bkey")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  private def releaseCheckpoint(df: DataFrame): Unit =
    Dedup.releaseMaterialized(df)

  /** r16 nearDupSuppressAndIndex, verbatim: batch + TWO signature
    * checkpoints (each a full shingling pass over the batch). */
  private def legacySuppress(batch: DataFrame, path: String,
                             threshold: Double): DataFrame = {
    val spark = batch.sparkSession
    val root = s"$path" // fresh legacy-layout index, no version pointer
    val (shingle, hashes, bands) = {
      val r = spark.read.parquet(s"$root/params")
        .select("shingle", "hashes", "bands").collect()(0)
      (r.getInt(0), r.getInt(1), r.getInt(2))
    }
    val idCol = "doc_id"
    val b = PlanAudit.checkpoint(batch)
    val freshSets = PlanAudit.checkpoint(
      Dedup.shingleSets(b, idCol, "text", shingle))
    val freshBands = PlanAudit.checkpoint(
      bandedSignatures(b, shingle, hashes, bands))
    try {
      val bIds = b.select(col(idCol).as("__bid")).distinct()
      val idxBands = spark.read.parquet(s"$root/bands")
        .join(bIds, col("doc_id") === col("__bid"), "left_anti")
      val cand = freshBands.as("a").join(idxBands.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val idxSets = spark.read.parquet(s"$root/sketches")
        .join(bIds, col("doc_id") === col("__bid"), "left_anti")
      val flagged = verify(cand
          .join(freshSets.select(col("doc_id").as("doc_a"),
            col("sh").as("sh_a"), col("n").as("n_a")), "doc_a")
          .join(idxSets.select(col("doc_id").as("doc_b"),
            col("sh").as("sh_b"), col("n").as("n_b")), "doc_b"), threshold)
        .select(col("doc_a").as("__dup_id")).distinct()
      val afterIndex =
        b.join(flagged, b(idCol) === col("__dup_id"), "left_anti")
      val aSets = freshSets.join(
        afterIndex.select(col(idCol).as("doc_id")), "doc_id")
      val dropped = pairsFromSets(aSets, threshold)
        .select(col("doc_b").as("__drop_id")).distinct()
      val keep = PlanAudit.checkpoint(afterIndex
        .join(dropped, afterIndex(idCol) === col("__drop_id"), "left_anti"))
      try {
        val keepIds = keep.select(col(idCol).as("doc_id"))
        AppendLedger.appendOnce(spark, path,
            AppendLedger.token(b, idCol)) { repair =>
          val sk = freshSets.join(keepIds, "doc_id")
          (if (!repair) sk
           else {
             val haveSk = spark.read.parquet(s"$root/sketches")
               .select(col("doc_id").as("__have")).distinct()
             sk.join(haveSk, col("doc_id") === col("__have"), "left_anti")
           }).write.mode("append").parquet(s"$root/sketches")
          val bd = freshBands.join(keepIds, "doc_id")
          (if (!repair) bd
           else {
             val haveBd = spark.read.parquet(s"$root/bands")
               .select(col("doc_id").as("__have_id"),
                 col("band").as("__have_band"))
             bd.join(haveBd, col("doc_id") === col("__have_id") &&
               col("band") === col("__have_band"), "left_anti")
           }).select(col("doc_id"), col("bkey"), col("band"))
            .write.mode("append").partitionBy("band").parquet(s"$root/bands")
        }
      } catch { case t: Throwable => releaseCheckpoint(keep); throw t }
      keep
    } finally Seq(b, freshSets, freshBands).foreach(releaseCheckpoint)
  }

  private def rmrf(f: java.io.File): Unit = graft.IngestProbes.rmrfQuiet(f)
  private def cp(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import java.nio.file._
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def main(args: Array[String]): Unit = {
    def argAt(i: Int, default: String): String =
      if (args.length > i) args(i) else default
    val rows = argAt(0, "20000000").toLong
    val reps = argAt(1, "2").toInt
    val outJson = argAt(2, "bench_ab_r17_neardupsuppress.json")
    val spark = graft.core.Sessions.local("graft-ab-ndsuppress")
    graft.AmbientLoad.start()
    val root = java.nio.file.Files.createTempDirectory("graft-ab-ndsup")
    val indexRows = math.max(rows / 5, 1L)
    // commit-sized batch with heavy replay (near-dups against the
    // index AND within the batch), the q164/smoke shape
    val batchRows = math.min(math.max(rows / 50, 1L), 250000L)
    try {
      graft.ScaleSmoke.docs(spark, rows)
        .write.mode("overwrite").parquet(s"$root/corpus")
      val slice = spark.read.parquet(s"$root/corpus")
        .filter(col("doc_id") < indexRows)
      graft.api.Dedup.buildNearDupIndex(slice, s"$root/idx0")
      val batch = graft.ScaleSmoke.docs(spark, batchRows, offset = rows,
        replayEvery = 3L).localCheckpoint()
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      val survivors = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      def leg(variant: String, rep: Int): Unit = {
        // fresh copy of the pristine index — suppression mutates it
        val target = s"$root/idx-$variant-$rep"
        cp(java.nio.file.Paths.get(s"$root/idx0"),
          java.nio.file.Paths.get(target))
        val amb0 = graft.AmbientLoad.ambientNow()
        val io0 = graft.IoLoad.snap()
        val t0 = System.nanoTime()
        val keep =
          if (variant == "legacy") legacySuppress(batch, target, 0.8)
          else graft.api.Dedup.nearDupSuppressAndIndex(batch, target, 0.8)
        val surv = keep.count()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.api.Dedup.releaseMaterialized(keep)
        val io = graft.IoLoad.stageFields("b", io0, graft.IoLoad.snap()).toMap
        val amb1 = graft.AmbientLoad.ambientNow()
        survivors += s"$variant#$rep" -> surv
        rmrf(new java.io.File(target))
        val f = (v: Double) => "%.1f".formatLocal(java.util.Locale.ROOT, v)
        entries += s"""{"variant":"$variant","rep":$rep,"suppress_sec":${f(sec)},""" +
          s""""amb_before":${f(amb0)},"amb_after":${f(amb1)},""" +
          s""""io_stall":${f(io("b_io_stall"))},"io_rmb":${f(io("b_io_rmb"))},""" +
          s""""io_wmb":${f(io("b_io_wmb"))},"survivors":$surv}"""
        System.err.println(f"[ab] $variant rep$rep: $sec%.1f s, " +
          f"survivors $surv (amb $amb0%.1f -> $amb1%.1f, " +
          f"stall ${io("b_io_stall")}%.1f%%)")
      }
      // warm both code paths once at small scale so neither variant's
      // first rep pays JIT
      val warmBatch = graft.ScaleSmoke.docs(spark, 5000, offset = 2 * rows)
        .localCheckpoint()
      cp(java.nio.file.Paths.get(s"$root/idx0"),
        java.nio.file.Paths.get(s"$root/warm"))
      graft.api.Dedup.releaseMaterialized(
        legacySuppress(warmBatch, s"$root/warm", 0.8))
      rmrf(new java.io.File(s"$root/warm"))
      cp(java.nio.file.Paths.get(s"$root/idx0"),
        java.nio.file.Paths.get(s"$root/warm2"))
      graft.api.Dedup.releaseMaterialized(
        graft.api.Dedup.nearDupSuppressAndIndex(warmBatch, s"$root/warm2", 0.8))
      rmrf(new java.io.File(s"$root/warm2"))
      warmBatch.unpersist(blocking = true)
      (1 to reps).foreach { r => leg("legacy", r); leg("onepass", r) }
      val identical = survivors.map(_._2).distinct.size == 1
      require(identical, s"SURVIVOR DRIFT across variants: $survivors")
      val json = s"""{"tool":"AbNearDupSuppress","rows":$rows,"index_rows":$indexRows,""" +
        s""""batch_rows":$batchRows,"survivors_identical":$identical,""" +
        s""""runs":[${entries.mkString(",")}]}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
      println(json)
    } finally {
      spark.stop()
      rmrf(root.toFile)
    }
  }
}
