package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot, cosinePrenormed, nearestCell, nearestCells, norm}
import graft.api.{AppendLedger, Dedup, PlanAudit}

/** A/B harness for the r17 `semanticSuppressAndIndex` step-1-survivors
  * checkpoint (guide §5 — don't recompute the expensive subtree): the
  * r16 body left `afterIndex` un-materialized, so the flag join — the
  * probed-cell index scan (≈ the whole corpus slice at commit-sized
  * batches), its exchange, and the per-pair cosine filter — re-ran in
  * BOTH the aAssigned checkpoint job and the keep job. Legs ALTERNATE
  * legacy/checkpointed against fresh copies of one pristine index
  * (suppression mutates its index), so box drift cancels; survivor
  * counts must be EQUAL across all legs.
  *
  * The LEGACY body lives here verbatim (minus the new checkpoint), not
  * in the library — the AbIndexBuild discipline.
  *
  * Usage: runMain graft.tools.AbSemanticSuppress [rows] [reps] [out.json]
  */
object AbSemanticSuppress {

  // --- local twins of Similarity's private helpers, expression-identical ---
  private def withNorm(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
      norm(col(vecCol)).as("nrm"))

  private def roundedAtLeast(cos: org.apache.spark.sql.Column,
                             threshold: Double): org.apache.spark.sql.Column =
    cos >= lit(threshold - 2e-6) && round(cos, 6) >= threshold

  private def readCentroids(spark: SparkSession, path: String): Array[Array[Float]] =
    spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
      .map(_._2)

  /** r16 semanticSuppressAndIndex, verbatim — afterIndex NOT
    * checkpointed, so its flag subtree re-executes per consumer. */
  private def legacySuppress(batch: DataFrame, path: String,
                             threshold: Double, nprobe: Int): DataFrame = {
    val spark = batch.sparkSession
    val root = graft.api.Similarity.resolveIndexRoot(spark, path)
    val centroids = readCentroids(spark, root)
    val idCol = "vec_id"; val vecCol = "embedding"
    val b = PlanAudit.checkpoint(batch)
    val q = PlanAudit.checkpoint(
      withNorm(b.filter(col(vecCol).isNotNull), idCol, vecCol)
        .select(col("vec_id"), col("embedding").as("ea"), col("nrm").as("na"),
          explode(nearestCells(col("embedding"), centroids, nprobe)).as("cell")))
    try {
      val bIds = b.select(col(idCol).as("__bid")).distinct()
      val probed = q.select("cell").distinct().collect().map(_.getInt(0)).toSeq
      val index = spark.read.parquet(s"$root/vectors")
        .filter(if (probed.isEmpty) lit(false) else col("cell").isin(probed: _*))
        .join(bIds, col("vec_id") === col("__bid"), "left_anti")
        .select(col("cell"), col("embedding").as("eb"), col("nrm").as("nb"))
      val flagged = q.join(index, Seq("cell"))
        .filter(roundedAtLeast(cosinePrenormed(dot(col("ea"), col("eb")),
          col("na"), col("nb")), threshold))
        .select(col("vec_id").as("__dup_id")).distinct()
      val afterIndex =
        b.join(flagged, b(idCol) === col("__dup_id"), "left_anti")
      val aAssigned = PlanAudit.checkpoint(
        withNorm(afterIndex.filter(col(vecCol).isNotNull), idCol, vecCol)
          .withColumn("cell", nearestCell(col("embedding"), centroids)))
      val keep =
        try {
          val xProbe = q.join(
            afterIndex.select(col(idCol).as("vec_id")), Seq("vec_id"))
          val dropped = xProbe.as("x").join(aAssigned.as("y"),
              col("x.cell") === col("y.cell") &&
                col("y.vec_id") < col("x.vec_id") &&
                roundedAtLeast(cosinePrenormed(
                  dot(col("x.ea"), col("y.embedding")),
                  col("x.na"), col("y.nrm")), threshold))
            .select(col("x.vec_id").as("__drop_id")).distinct()
          PlanAudit.checkpoint(afterIndex
            .join(dropped, afterIndex(idCol) === col("__drop_id"), "left_anti"))
        } catch {
          case t: Throwable => Dedup.releaseCheckpoint(aAssigned); throw t
        }
      try {
        val toIndex = aAssigned.join(
          keep.select(col(idCol).as("vec_id")), Seq("vec_id"))
        AppendLedger.appendOnce(spark, path,
            AppendLedger.token(b, idCol)) { repair =>
          val rows =
            if (!repair) toIndex
            else {
              val assigned = toIndex.select("cell").distinct()
                .collect().map(_.getInt(0)).toSeq
              val have = spark.read.parquet(s"$root/vectors")
                .filter(if (assigned.isEmpty) lit(false)
                        else col("cell").isin(assigned: _*))
                .select(col("vec_id").as("__have")).distinct()
              toIndex.join(have, col("vec_id") === col("__have"), "left_anti")
            }
          rows.select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
            .repartition(col("cell"))
            .write.mode("append").partitionBy("cell").parquet(s"$root/vectors")
        }
      } catch { case t: Throwable => Dedup.releaseCheckpoint(keep); throw t }
      finally Dedup.releaseCheckpoint(aAssigned)
      keep
    } finally Seq(b, q).foreach(Dedup.releaseCheckpoint)
  }

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, FileVisitResult, SimpleFileVisitor, Path}
    import java.nio.file.attribute.BasicFileAttributes
    Files.walkFileTree(src, new SimpleFileVisitor[Path] {
      override def preVisitDirectory(d: Path, a: BasicFileAttributes): FileVisitResult = {
        Files.createDirectories(dst.resolve(src.relativize(d)))
        FileVisitResult.CONTINUE
      }
      override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
        Files.copy(f, dst.resolve(src.relativize(f)))
        FileVisitResult.CONTINUE
      }
    })
    ()
  }

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val outJson = args.lift(2).getOrElse("bench_ab_r17_semsuppress.json")
    val spark = graft.core.Sessions.local("graft-ab-semsuppress")
    spark.sparkContext.setLogLevel("WARN")
    graft.AmbientLoad.start()
    val indexRows = math.max(rows / 5, 1L)
    val batchRows = math.min(math.max(rows / 50, 1L), 250000L)
    val cells = graft.ScaleSmoke.cellsFor(indexRows, 64, 2048)
    val root = java.nio.file.Files.createTempDirectory("graft-ab-semsup")
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val survivors = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def f(v: Double): String = "%.1f".format(v)
    try {
      val embPath = s"$root/emb"
      graft.ScaleSmoke.embeddings(spark, rows)
        .write.mode("overwrite").parquet(embPath)
      val batch = graft.ScaleSmoke
        .embeddings(spark, batchRows, offset = rows, replayEvery = 3L)
        .localCheckpoint()
      val pristine = s"$root/ivf-pristine"
      graft.api.Similarity.buildIvfIndex(
        spark.read.parquet(embPath).filter(col("vec_id") < indexRows),
        pristine, cells = cells)
      System.err.println(s"[ab] pristine index built ($indexRows rows, $cells cells)")

      def leg(variant: String, rep: Int): Unit = {
        val target = s"$root/ivf-$variant-$rep"
        copyTree(java.nio.file.Paths.get(pristine),
          java.nio.file.Paths.get(target))
        val ambBefore = graft.AmbientLoad.ambientNow()
        val io0 = graft.IoLoad.snap()
        val t0 = System.nanoTime()
        val kept =
          if (variant == "legacy") legacySuppress(batch, target, 0.97, 2)
          else graft.api.Similarity.semanticSuppressAndIndex(
            batch, target, threshold = 0.97)
        val n = kept.count()
        val sec = (System.nanoTime() - t0) / 1e9
        Dedup.releaseMaterialized(kept)
        val io = graft.IoLoad.stageFields("x", io0, graft.IoLoad.snap()).toMap
        survivors += s"$variant#$rep" -> n
        entries +=
          s"""{"variant":"$variant","rep":$rep,"suppress_sec":${f(sec)},""" +
          s""""amb_before":${f(ambBefore)},"amb_after":${f(graft.AmbientLoad.ambientNow())},""" +
          s""""io_stall":${f(io("x_io_stall"))},"io_rmb":${f(io("x_io_rmb"))},""" +
          s""""io_wmb":${f(io("x_io_wmb"))},"survivors":$n}"""
        System.err.println(f"[ab] $variant rep$rep: $sec%.1f s, $n survivors")
        // NO blanket getPersistentRDDs unpersist here: the shared
        // `batch` localCheckpoint's blocks are unrecoverable (truncated
        // lineage) and a later leg still needs them; the operator
        // releases its own internals, releaseMaterialized covers `kept`
        spark.catalog.clearCache()
        IngestProbesBridge.rmrfQuiet(new java.io.File(target))
      }
      // warmup rep per variant first (JIT parity), then timed alternation
      (1 to reps).foreach { r => leg("legacy", r); leg("checkpointed", r) }
      val allEqual = survivors.map(_._2).distinct.size == 1
      require(allEqual, s"SURVIVOR DRIFT across variants: $survivors")
      val json = s"""{"tool":"AbSemanticSuppress","rows":$rows,"index_rows":$indexRows,""" +
        s""""batch_rows":$batchRows,"cells":$cells,"survivors_identical":$allEqual,""" +
        s""""runs":[${entries.mkString(",")}]}""" + "\n"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
      print(json)
    } finally {
      IngestProbesBridge.rmrfQuiet(root.toFile)
      spark.stop()
    }
  }
}

/** Bridge to the package-private cleanup helper. */
private[tools] object IngestProbesBridge {
  def rmrfQuiet(f: java.io.File): Unit = graft.IngestProbes.rmrfQuiet(f)
}
