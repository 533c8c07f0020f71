package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the near-dup index build's one-pass rewrite (r17):
  * the legacy build ran TWO independent write jobs over the corpus —
  * bands via a `minHashes` projection, sketches via a
  * `distinctShingleHashes` projection — so every document was read,
  * tokenized and FNV-hashed twice. The r17 library build materializes
  * ONE combined `shingleSketch` pass and derives both tables from it.
  * This main measures BOTH variants in one process — alternating legs
  * so neither systematically gets the colder cache (the AbIndexBuild
  * discipline) — with wall time plus [[graft.IoLoad]] deltas, then
  * requires (a) bit-identical table contents (row counts + xxhash64
  * content checksums over both signature tables) and (b) identical
  * filter-survivor counts against each built index.
  *
  *   runMain graft.tools.AbNearDupBuild [rows] [reps] [outJson]
  *
  * Defaults: rows 50000000 (the bench smoke's corpus size — the index
  * slice is rows/5 like the smoke), reps 2 (per variant), outJson
  * bench_ab_r17_neardup.json. The legacy variant lives HERE, not in
  * the library: it exists only to be measured against.
  */
object AbNearDupBuild {

  /** The pre-r17 build, verbatim shape: two corpus passes, each its own
    * shingling projection (Dedup.scala @ r16, buildNearDupIndex). */
  private def legacyBuild(docs: DataFrame, target: String, shingle: Int = 3,
                          hashes: Int = 64, bands: Int = 16): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.TextFunctions._
    val rowsPerBand = hashes / bands
    Seq((shingle, hashes, bands)).toDF("shingle", "hashes", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$target/params")
    docs.select(col("doc_id"),
        minHashes(lower(col("text")), shingle, hashes).as("mh"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(b, slice(col("mh"), b * lit(rowsPerBand) + 1,
              lit(rowsPerBand))).as("bkey")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      .write.mode("overwrite").partitionBy("band").parquet(s"$target/bands")
    graft.api.Dedup.shingleSets(docs, "doc_id", "text", shingle)
      .write.mode("overwrite").parquet(s"$target/sketches")
  }

  /** Order-independent content checksum of a built index: row count +
    * bit_xor of per-row xxhash64 over each signature table (xor, not
    * sum — a long sum over millions of hashes overflows under ANSI). */
  private def checksum(spark: SparkSession, target: String): (Long, Long, Long, Long) = {
    val b = spark.read.parquet(s"$target/bands")
      .select(xxhash64(col("doc_id"), col("band"), col("bkey")).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)"))
      .collect().head
    val s = spark.read.parquet(s"$target/sketches")
      .select(xxhash64(col("doc_id"), col("sh"), col("n")).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)"))
      .collect().head
    (b.getLong(0), b.getLong(1), s.getLong(0), s.getLong(1))
  }

  private def rmrf(f: java.io.File): Unit = graft.IngestProbes.rmrfQuiet(f)

  def main(args: Array[String]): Unit = {
    def argAt(i: Int, default: String): String =
      if (args.length > i) args(i) else default
    val rows = argAt(0, "50000000").toLong
    val reps = argAt(1, "2").toInt
    val outJson = argAt(2, "bench_ab_r17_neardup.json")
    val spark = graft.core.Sessions.local("graft-ab-neardup")
    graft.AmbientLoad.start()
    val root = java.nio.file.Files.createTempDirectory("graft-ab-neardup")
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
      val sums = scala.collection.mutable.ArrayBuffer.empty[(String, (Long, Long, Long, Long))]
      val survivors = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      def leg(variant: String, rep: Int): Unit = {
        val target = s"$root/idx-$variant-$rep"
        val amb0 = graft.AmbientLoad.ambientNow()
        val io0 = graft.IoLoad.snap()
        val t0 = System.nanoTime()
        if (variant == "legacy") legacyBuild(slice, target)
        else graft.api.Dedup.buildNearDupIndex(slice, target)
        val sec = (System.nanoTime() - t0) / 1e9
        val io = graft.IoLoad.stageFields("b", io0, graft.IoLoad.snap()).toMap
        val amb1 = graft.AmbientLoad.ambientNow()
        val cks = checksum(spark, target)
        sums += s"$variant#$rep" -> cks
        val surv = graft.api.Dedup.nearDupAgainstIndex(batch, target).count()
        survivors += s"$variant#$rep" -> surv
        rmrf(new java.io.File(target))
        val f = (v: Double) => "%.1f".formatLocal(java.util.Locale.ROOT, v)
        entries += s"""{"variant":"$variant","rep":$rep,"build_sec":${f(sec)},""" +
          s""""amb_before":${f(amb0)},"amb_after":${f(amb1)},""" +
          s""""io_stall":${f(io("b_io_stall"))},"io_full":${f(io("b_io_full"))},""" +
          s""""io_rmb":${f(io("b_io_rmb"))},"io_wmb":${f(io("b_io_wmb"))},""" +
          s""""fs_wmb":${f(io("b_fs_wmb"))},"bands_rows":${cks._1},""" +
          s""""bands_xxh":${cks._2},"sketch_rows":${cks._3},""" +
          s""""sketch_xxh":${cks._4},"filter_survivors":$surv}"""
        System.err.println(f"[ab] $variant rep$rep: $sec%.1f s, " +
          f"io_wmb ${io("b_io_wmb")}%.0f, fs_wmb ${io("b_fs_wmb")}%.0f, " +
          f"stall ${io("b_io_stall")}%.1f%%, survivors $surv (amb $amb0%.1f -> $amb1%.1f)")
      }
      // warm the shingling/codegen path once at 1/50 scale so neither
      // variant's first rep pays JIT
      graft.api.Dedup.buildNearDupIndex(
        slice.filter(col("doc_id") < indexRows / 50), s"$root/warm")
      rmrf(new java.io.File(s"$root/warm"))
      // leg ORDER alternates per rep (r18): a fixed order hands the
      // second leg the first's dirty page cache every rep
      (1 to reps).foreach { r =>
        if (r % 2 == 1) { leg("legacy", r); leg("onepass", r) }
        else { leg("onepass", r); leg("legacy", r) }
      }
      val identical = sums.map(_._2).distinct.size == 1 &&
        survivors.map(_._2).distinct.size == 1
      require(identical,
        s"CONTENT DRIFT across variants: sums=$sums survivors=$survivors")
      val json = s"""{"tool":"AbNearDupBuild","rows":$rows,"index_rows":$indexRows,""" +
        s""""batch_rows":$batchRows,"contents_identical":$identical,""" +
        s""""runs":[${entries.mkString(",")}]}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
      println(json)
    } finally {
      spark.stop()
      rmrf(root.toFile)
    }
  }
}
