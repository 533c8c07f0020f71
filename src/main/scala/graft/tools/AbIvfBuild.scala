package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** A/B harness for the IVF build's IO rewrite (VERDICT r16 #5 — the
  * sketch-first discipline the containment build got in r16, applied
  * to `buildIvfIndex` / `buildIvfPqIndex`):
  *
  *  - legacy plain-IVF build: the r16 shape — norm computed BEFORE the
  *    cell exchange, so 8 derived bytes/row ride the corpus shuffle;
  *  - legacy IVF+PQ build: vectors pass + a SECOND full source scan,
  *    a second cells×dim assignment, a second corpus exchange for the
  *    encode, and a third (code-row) exchange before the codes write;
  *  - library builds (r17): one corpus exchange total for plain IVF
  *    (norm post-shuffle); the PQ encode reads the just-written
  *    cell-partitioned vectors back — no second assignment, no second
  *    or third exchange.
  *
  * Variants alternate so neither systematically gets the colder page
  * cache; each leg records wall + [[graft.IoLoad]] deltas. Equality
  * gates: the plain-IVF legs must flag the SAME batch rows as
  * ≥-threshold against their index (ivfSearchIndex top-1), and the PQ
  * legs' codes stores must agree on an order-insensitive
  * (vec_id, codes, rnorm, cell) checksum — the rewrite must not move
  * a single assignment, code, or survivor.
  *
  *   runMain graft.tools.AbIvfBuild [rows] [reps] [outJson]
  *
  * Defaults: rows 50000000 (index slice rows/5, like the bench
  * smoke), reps 2 per variant, outJson bench_ab_r17_ivf.json. The
  * legacy variants live HERE, not in the library: they exist only to
  * be measured against. */
object AbIvfBuild {

  /** r16 buildIvfIndex, verbatim shape (Similarity.scala @ r16). */
  private def legacyIvfBuild(emb: DataFrame, path: String, cells: Int): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val centroids = graft.api.Similarity.fitCentroids(e, cells, 42L, 5)
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    e.withColumn("cell", nearestCell(col("embedding"), centroids))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
  }

  /** r16 buildIvfPqIndex, verbatim shape: second source scan + second
    * assignment + second corpus exchange + post-encode code exchange. */
  private def legacyIvfPqBuild(emb: DataFrame, path: String, cells: Int,
                               m: Int, ksub: Int): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val sample = graft.api.Similarity.sampleVectors(e, math.max(cells, ksub), 42L, 4096)
    val centroids = graft.api.Similarity.lloyds(sample, cells, 42L, 5)
    val codebooks = graft.api.Similarity.fitResidualCodebooks(
      sample, centroids, m, ksub, 42L, 5)
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    e.withColumn("cell", nearestCell(col("embedding"), centroids))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
    codebooks.zipWithIndex.flatMap { case (cb, i) =>
      cb.zipWithIndex.map { case (w, c) => (i, c, w.toSeq) }
    }.toSeq.toDF("subspace", "codeword", "weights").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebooks")
    // the legacy encode: re-scan the source, re-assign, exchange, and
    // exchange the code rows again before the write
    val mm = m; val kk = ksub
    val dim = centroids.head.length
    val ss = dim / mm
    val inRows = e
      .withColumn("cell", nearestCell(col("embedding"), centroids))
      .select(col("vec_id"), col("embedding"), col("cell"))
      .repartition(col("cell"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("neighbor_id",
        inRows.schema("vec_id").dataType),
      org.apache.spark.sql.types.StructField("codes",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType, containsNull = false)),
      org.apache.spark.sql.types.StructField("rnorm",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType)))
    val (cents, cbs) = (centroids, codebooks)
    inRows.mapPartitions { rows =>
      rows.map { r =>
        val emb2 = r.getSeq[Float](1)
        val cell = r.getInt(2)
        val cent = cents(cell)
        val codes = new Array[Int](mm)
        val recon = new Array[Double](dim)
        var i = 0
        while (i < mm) {
          var best = 0; var bd = Double.MaxValue; var c = 0
          while (c < kk) {
            val w = cbs(i)(c)
            var s = 0.0; var j = 0
            while (j < ss) {
              val d = (emb2(i * ss + j) - cent(i * ss + j)).toDouble - w(j)
              s += d * d; j += 1
            }
            if (s < bd) { bd = s; best = c }
            c += 1
          }
          codes(i) = best
          var j = 0
          while (j < ss) {
            recon(i * ss + j) = cent(i * ss + j).toDouble + cbs(i)(best)(j)
            j += 1
          }
          i += 1
        }
        var rn = 0.0; var j = 0
        while (j < dim) { rn += recon(j) * recon(j); j += 1 }
        org.apache.spark.sql.Row(r.get(0), codes.toSeq, math.sqrt(rn), cell)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
  }

  private def rmrf(f: java.io.File): Unit = graft.IngestProbes.rmrfQuiet(f)

  def main(args: Array[String]): Unit = {
    def argAt(i: Int, default: String): String =
      if (args.length > i) args(i) else default
    val rows = argAt(0, "50000000").toLong
    val reps = argAt(1, "2").toInt
    val outJson = argAt(2, "bench_ab_r18_ivf.json")
    // r18: kind filter (ivf|pq|both) so the plain-IVF contradiction can
    // re-run at ≥3 reps without paying the (already-proven) PQ legs
    val kindFilter = argAt(3, "both")
    val spark = graft.core.Sessions.local("graft-ab-ivf")
    graft.AmbientLoad.start()
    val root = java.nio.file.Files.createTempDirectory("graft-ab-ivf")
    val indexRows = math.max(rows / 5, 1L)
    val batchRows = math.min(math.max(rows / 50, 1L), 250000L)
    val cells = graft.ScaleSmoke.cellsFor(indexRows, 64, 2048)
    try {
      graft.ScaleSmoke.embeddings(spark, rows)
        .write.mode("overwrite").parquet(s"$root/emb")
      val slice = spark.read.parquet(s"$root/emb")
        .filter(col("vec_id") < indexRows)
      val batch = graft.ScaleSmoke.embeddings(spark, batchRows, offset = rows,
        replayEvery = 3L).localCheckpoint()
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      val gateValues = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      // order-insensitive and overflow-free: XOR of per-row hashes
      // (ANSI mode makes a sum() of hashes throw on long overflow)
      def checksum(df: DataFrame, cols: Seq[String]): Long =
        df.agg(expr(s"bit_xor(xxhash64(${cols.mkString(", ")}))"))
          .head().getLong(0)
      def leg(kind: String, variant: String, rep: Int): Unit = {
        val target = s"$root/idx-$kind-$variant-$rep"
        val amb0 = graft.AmbientLoad.ambientNow()
        val io0 = graft.IoLoad.snap()
        val t0 = System.nanoTime()
        (kind, variant) match {
          case ("ivf", "legacy") => legacyIvfBuild(slice, target, cells)
          case ("ivf", "sketchfirst") =>
            graft.api.Similarity.buildIvfIndex(slice, target, cells = cells)
          case ("pq", "legacy") =>
            legacyIvfPqBuild(slice, target, cells, m = 16, ksub = 16)
          case ("pq", "sketchfirst") =>
            graft.api.Similarity.buildIvfPqIndex(slice, target,
              cells = cells, m = 16, ksub = 16)
          case other => sys.error(s"unknown leg $other")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val io = graft.IoLoad.stageFields("b", io0, graft.IoLoad.snap()).toMap
        val amb1 = graft.AmbientLoad.ambientNow()
        // equality gate input: flagged batch rows (plain ivf) or the
        // order-insensitive codes checksum (pq) — must match across
        // variants of the same kind exactly
        val gate = kind match {
          case "ivf" =>
            graft.api.Similarity.ivfSearchIndex(spark, target, batch,
              k = 1, nprobe = 2)
              .filter(col("rank") === 1 && col("cos") >= 0.97).count()
          case _ =>
            checksum(spark.read.parquet(s"$target/codes"),
              Seq("neighbor_id", "codes", "rnorm", "cell"))
        }
        gateValues += s"$kind#$variant#$rep" -> gate
        rmrf(new java.io.File(target))
        val f = (v: Double) => "%.1f".formatLocal(java.util.Locale.ROOT, v)
        entries += s"""{"kind":"$kind","variant":"$variant","rep":$rep,""" +
          s""""build_sec":${f(sec)},"amb_before":${f(amb0)},"amb_after":${f(amb1)},""" +
          s""""io_stall":${f(io("b_io_stall"))},"io_full":${f(io("b_io_full"))},""" +
          s""""io_rmb":${f(io("b_io_rmb"))},"io_wmb":${f(io("b_io_wmb"))},""" +
          s""""fs_wmb":${f(io("b_fs_wmb"))},"gate":$gate}"""
        System.err.println(f"[ab-ivf] $kind/$variant rep$rep: $sec%.1f s, " +
          f"io_wmb ${io("b_io_wmb")}%.0f, fs_wmb ${io("b_fs_wmb")}%.0f, " +
          f"stall ${io("b_io_stall")}%.1f%%, gate $gate (amb $amb0%.1f -> $amb1%.1f)")
      }
      // warm codegen/JIT at 1/50 scale so neither variant's first rep
      // pays it
      graft.api.Similarity.buildIvfIndex(
        slice.filter(col("vec_id") < indexRows / 50), s"$root/warm",
        cells = math.min(cells, 64))
      rmrf(new java.io.File(s"$root/warm"))
      val kinds = kindFilter match {
        case "ivf" => Seq("ivf"); case "pq" => Seq("pq")
        case _ => Seq("ivf", "pq")
      }
      // leg ORDER alternates per rep (r18): the r17 run always put
      // legacy first, so the library leg systematically ran with the
      // dirtier heap/page cache — the exact bias class the fresh-JVM
      // smoke fork exists for
      (1 to reps).foreach { r =>
        val order = if (r % 2 == 1) Seq("legacy", "sketchfirst")
          else Seq("sketchfirst", "legacy")
        kinds.foreach(k => order.foreach(v => leg(k, v, r)))
      }
      def allEqual(kind: String): Boolean =
        gateValues.collect { case (k, v) if k.startsWith(s"$kind#") => v }
          .distinct.size == 1
      kinds.foreach(k => require(allEqual(k), s"$k gate drift: $gateValues"))
      val json = s"""{"tool":"AbIvfBuild","rows":$rows,"index_rows":$indexRows,""" +
        s""""batch_rows":$batchRows,"cells":$cells,"gates_identical":true,""" +
        s""""runs":[${entries.mkString(",")}]}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
      println(json)
    } finally {
      spark.stop()
      rmrf(root.toFile)
    }
  }
}
