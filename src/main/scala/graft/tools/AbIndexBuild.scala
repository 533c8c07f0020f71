package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B harness for the containment-index build's IO rewrite (VERDICT
  * r15 #2): the r15 build pinned a corpus-sized `localCheckpoint` of
  * the shingle-set frame and wrote postings before sketches; the r16
  * library build writes `sketches` first straight from the shingling
  * plan and re-reads the compressed parquet for the token passes.
  * This main measures BOTH variants in one process — alternating
  * legacy/sketch-first so neither variant systematically gets the
  * colder cache — with wall time plus the [[graft.IoLoad]] deltas
  * (PSI stall, physical read/write MB, logical FS write MB), then
  * runs the SAME ingestion filter against each built index and
  * requires identical survivor counts (the rewrite must not move a
  * single survivor).
  *
  *   runMain graft.tools.AbIndexBuild [rows] [reps] [outJson]
  *
  * Defaults: rows 50000000 (the bench smoke's corpus size — the index
  * slice is rows/5 like the smoke), reps 2 (per variant), outJson
  * bench_ab_r16_containment.json. The legacy variant lives HERE, not
  * in the library: it exists only to be measured against.
  */
object AbIndexBuild {

  /** The r15 build plan, verbatim shape: corpus-sized localCheckpoint
    * feeding dfreq/postings/sketches, postings written before
    * sketches. (Dedup.scala @ r15, buildContainmentIndex.) */
  private def legacyBuild(docs: DataFrame, target: String, shingle: Int = 3): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sets = graft.api.Dedup.shingleSets(docs, "doc_id", "text", shingle)
      .localCheckpoint()
    try {
      Seq(Tuple1(shingle)).toDF("shingle")
        .coalesce(1).write.mode("overwrite").parquet(s"$target/params")
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
        sets.write.mode("overwrite").parquet(s"$target/sketches")
      } finally dfc.unpersist(blocking = true)
    } finally sets.unpersist(blocking = true)
  }

  private def rmrf(f: java.io.File): Unit = graft.IngestProbes.rmrfQuiet(f)

  def main(args: Array[String]): Unit = {
    def argAt(i: Int, default: String): String =
      if (args.length > i) args(i) else default
    val rows = argAt(0, "50000000").toLong
    val reps = argAt(1, "2").toInt
    val outJson = argAt(2, "bench_ab_r16_containment.json")
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
        rmrf(new java.io.File(target))
        val f = (v: Double) => "%.1f".formatLocal(java.util.Locale.ROOT, v)
        entries += s"""{"variant":"$variant","rep":$rep,"build_sec":${f(sec)},""" +
          s""""amb_before":${f(amb0)},"amb_after":${f(amb1)},""" +
          s""""io_stall":${f(io("b_io_stall"))},"io_full":${f(io("b_io_full"))},""" +
          s""""io_rmb":${f(io("b_io_rmb"))},"io_wmb":${f(io("b_io_wmb"))},""" +
          s""""fs_wmb":${f(io("b_fs_wmb"))},"filter_survivors":$surv}"""
        System.err.println(f"[ab] $variant rep$rep: $sec%.1f s, " +
          f"io_wmb ${io("b_io_wmb")}%.0f, fs_wmb ${io("b_fs_wmb")}%.0f, " +
          f"stall ${io("b_io_stall")}%.1f%%, survivors $surv (amb $amb0%.1f -> $amb1%.1f)")
      }
      // warm the shingling/codegen path once at 1/50 scale so neither
      // variant's first rep pays JIT
      graft.api.Dedup.buildContainmentIndex(
        slice.filter(col("doc_id") < indexRows / 50), s"$root/warm")
      rmrf(new java.io.File(s"$root/warm"))
      (1 to reps).foreach { r => leg("legacy", r); leg("sketchfirst", r) }
      val allEqual = survivors.map(_._2).distinct.size == 1
      require(allEqual, s"SURVIVOR DRIFT across variants: $survivors")
      val json = s"""{"tool":"AbIndexBuild","rows":$rows,"index_rows":$indexRows,""" +
        s""""batch_rows":$batchRows,"survivors_identical":$allEqual,""" +
        s""""runs":[${entries.mkString(",")}]}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
      println(json)
    } finally {
      spark.stop()
      rmrf(root.toFile)
    }
  }
}
