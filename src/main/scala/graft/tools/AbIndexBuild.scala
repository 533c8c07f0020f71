package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B harness for the containment-index build (VERDICT r15 #2, r17
  * #3): the "legacy" variant here is the r16/r17 SHIPPED shape —
  * sketch-first write, then a vocabulary-sized dfc `localCheckpoint`
  * sort-merge-joined back onto the token frame and ranked with a
  * row_number window (a full sort of every token row). The r18 library
  * build replaces the checkpoint+join+window with two hash
  * aggregations (groupBy(tok) carrying the doc list, then a doc-keyed
  * regroup with an array sort) and derives dfreq from the written
  * postings. This main measures BOTH variants in one process —
  * alternating so neither systematically gets the colder cache — with
  * wall time plus the [[graft.IoLoad]] deltas, then runs the SAME
  * ingestion filter against each built index and requires identical
  * survivor counts AND identical order-insensitive postings/dfreq
  * content checksums (the rewrite must not move a single row).
  *
  *   runMain graft.tools.AbIndexBuild [rows] [reps] [outJson]
  *
  * Defaults: rows 50000000 (the bench smoke's corpus size — the index
  * slice is rows/5 like the smoke), reps 2 (per variant), outJson
  * bench_ab_r18_containment.json. The legacy variant lives HERE, not
  * in the library: it exists only to be measured against.
  */
object AbIndexBuild {

  /** The r16/r17 build plan, verbatim shape (Dedup.scala @ r17,
    * buildContainmentIndex): sketches first, dfc localCheckpoint,
    * token⋈dfc join, row_number window. */
  private def legacyBuild(docs: DataFrame, target: String, shingle: Int = 3): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(Tuple1(shingle)).toDF("shingle")
      .coalesce(1).write.mode("overwrite").parquet(s"$target/params")
    graft.api.Dedup.shingleSets(docs, "doc_id", "text", shingle)
      .write.mode("overwrite").parquet(s"$target/sketches")
    val sets = spark.read.parquet(s"$target/sketches")
    val toks = sets.select(col("doc_id"), col("n"), explode(col("sh")).as("tok"))
    val dfc = toks.groupBy("tok").agg(count(lit(1)).as("dfc"))
      .localCheckpoint()
    try {
      dfc.write.mode("overwrite").parquet(s"$target/dfreq")
      toks.join(dfc, "tok")
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("dfc"), col("tok"))) - 1)
        .select(col("doc_id"), col("n"), col("tok"), col("pos"))
        .write.mode("overwrite").parquet(s"$target/postings")
    } finally dfc.unpersist(blocking = true)
  }

  /** Order-insensitive content checksum of an index component —
    * bit_xor of per-row hashes (ANSI mode makes a sum() of longs throw
    * on overflow, the AbIvfBuild lesson). */
  private def checksum(spark: SparkSession, path: String,
                       cols: Seq[String]): Long =
    spark.read.parquet(path)
      .agg(expr(s"bit_xor(xxhash64(${cols.mkString(", ")}))"))
      .head().getLong(0)

  private def rmrf(f: java.io.File): Unit = graft.IngestProbes.rmrfQuiet(f)

  def main(args: Array[String]): Unit = {
    def argAt(i: Int, default: String): String =
      if (args.length > i) args(i) else default
    val rows = argAt(0, "50000000").toLong
    val reps = argAt(1, "2").toInt
    val outJson = argAt(2, "bench_ab_r18_containment.json")
    val spark = graft.core.Sessions.local("graft-ab-index")
    graft.AmbientLoad.start()
    val root = java.nio.file.Files.createTempDirectory("graft-ab-index")
    val indexRows = math.max(rows / 5, 1L)
    val batchRows = math.min(math.max(rows / 50, 1L), 250000L)
    try {
      graft.ScaleSmoke.docs(spark, rows)
        .write.mode("overwrite").parquet(s"$root/corpus")
      val slice = spark.read.parquet(s"$root/corpus")
        .filter(col("doc_id") < indexRows)
      val batch = graft.ScaleSmoke.docs(spark, batchRows, offset = rows,
        replayEvery = 3L).localCheckpoint()
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      val survivors = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val postSums = scala.collection.mutable.ArrayBuffer.empty[Long]
      val dfreqSums = scala.collection.mutable.ArrayBuffer.empty[Long]
      def leg(variant: String, rep: Int): Unit = {
        val target = s"$root/idx-$variant-$rep"
        val amb0 = graft.AmbientLoad.ambientNow()
        val io0 = graft.IoLoad.snap()
        val t0 = System.nanoTime()
        if (variant == "legacy") legacyBuild(slice, target)
        else graft.api.Dedup.buildContainmentIndex(slice, target)
        val sec = (System.nanoTime() - t0) / 1e9
        val io = graft.IoLoad.stageFields("b", io0, graft.IoLoad.snap()).toMap
        val amb1 = graft.AmbientLoad.ambientNow()
        val surv = {
          val k = graft.api.Dedup.containmentFilterAgainstIndex(batch, target)
          val n = k.count(); graft.api.Dedup.releaseMaterialized(k); n
        }
        survivors += s"$variant#$rep" -> surv
        postSums += checksum(spark, s"$target/postings",
          Seq("doc_id", "n", "tok", "pos"))
        dfreqSums += checksum(spark, s"$target/dfreq", Seq("tok", "dfc"))
        rmrf(new java.io.File(target))
        val f = (v: Double) => "%.1f".formatLocal(java.util.Locale.ROOT, v)
        entries += s"""{"variant":"$variant","rep":$rep,"build_sec":${f(sec)},""" +
          s""""amb_before":${f(amb0)},"amb_after":${f(amb1)},""" +
          s""""io_stall":${f(io("b_io_stall"))},"io_full":${f(io("b_io_full"))},""" +
          s""""io_rmb":${f(io("b_io_rmb"))},"io_wmb":${f(io("b_io_wmb"))},""" +
          s""""fs_wmb":${f(io("b_fs_wmb"))},"filter_survivors":$surv}"""
        System.err.println(f"[ab] $variant rep$rep: $sec%.1f s, " +
          f"io_wmb ${io("b_io_wmb")}%.0f, fsw ${io("b_fs_wmb")}%.0f, " +
          f"stall ${io("b_io_stall")}%.1f%%, survivors $surv (amb $amb0%.1f -> $amb1%.1f)")
      }
      // warm the shingling/codegen path once at 1/50 scale so neither
      // variant's first rep pays JIT
      graft.api.Dedup.buildContainmentIndex(
        slice.filter(col("doc_id") < indexRows / 50), s"$root/warm")
      rmrf(new java.io.File(s"$root/warm"))
      // leg ORDER alternates per rep (r18): a fixed order hands the
      // second leg the first's dirty page cache every rep
      (1 to reps).foreach { r =>
        if (r % 2 == 1) { leg("legacy", r); leg("grouped", r) }
        else { leg("grouped", r); leg("legacy", r) }
      }
      val allEqual = survivors.map(_._2).distinct.size == 1 &&
        postSums.distinct.size == 1 && dfreqSums.distinct.size == 1
      require(allEqual, s"CONTENT DRIFT across variants: $survivors " +
        s"postings=$postSums dfreq=$dfreqSums")
      val json = s"""{"tool":"AbIndexBuild","rows":$rows,"index_rows":$indexRows,""" +
        s""""batch_rows":$batchRows,"survivors_identical":$allEqual,""" +
        s""""contents_identical":$allEqual,""" +
        s""""runs":[${entries.mkString(",")}]}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
      println(json)
    } finally {
      spark.stop()
      rmrf(root.toFile)
    }
  }
}
