package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Dedup

/** Persisted containment posting index: lifecycle parity with the
  * direct operator, the no-corpus-read scale property (the whole point
  * of persisting the posting table), frozen-order consistency across
  * appends, boundary exactness, delete/compact/integrity. */
class ContainmentIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def docsDF = graft.core.Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))

  private def fresh(prefix: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-$prefix").toString
    new java.io.File(dir).delete()
    dir
  }

  private def survivors(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("build+append+filter matches the direct containmentAgainstCorpus") {
    val dir = fresh("ctidx")
    val docs = docsDF
    val m3 = col("doc_id") % 3
    Dedup.buildContainmentIndex(docs.filter(m3 === 0), dir)
    Dedup.appendToContainmentIndex(docs.filter(m3 === 1), dir)
    val batch = docs.filter(m3 === 2)
    val viaIndex = Dedup.containmentFilterAgainstIndex(batch, dir)
    val got = try survivors(viaIndex)
      finally Dedup.releaseMaterialized(viaIndex)
    val want = survivors(
      Dedup.containmentAgainstCorpus(docs.filter(m3 =!= 2), batch))
    assert(got == want)
    assert(got.nonEmpty && got.size < batch.count(),
      "fixture must exercise both kept and dropped docs")
  }

  test("filter pass reads ONLY index files — never corpus text") {
    val dir = fresh("ctidx-files")
    Dedup.buildContainmentIndex(docsDF.filter(col("doc_id") < 300), dir)
    val s = spark
    import s.implicits._
    // in-memory batch: every file in every probed stage must then be
    // an index file
    val batch = Seq((9000001L, "completely novel text about nothing"),
      (9000002L, "another unrelated fresh document"))
      .toDF("doc_id", "text")
    val seen = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    graft.api.PlanAudit.probe = Some(df => seen += df.inputFiles)
    val kept =
      try Dedup.containmentFilterAgainstIndex(batch, dir)
      finally graft.api.PlanAudit.probe = None
    Dedup.releaseMaterialized(kept)
    val offenders = seen.flatten.filterNot(_.contains(
      new java.io.File(dir).getName))
    assert(offenders.isEmpty,
      s"filter plan read non-index files: ${offenders.take(3).mkString(", ")}")
    assert(seen.flatten.exists(_.contains("postings")),
      "the final stage must actually read the persisted posting table")
  }

  test("released filter result leaves no pinned storage") {
    val dir = fresh("ctidx-release")
    Dedup.buildContainmentIndex(docsDF.filter(col("doc_id") < 200), dir)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val kept = Dedup.containmentFilterAgainstIndex(
      docsDF.filter(col("doc_id") >= 200 && col("doc_id") < 260), dir)
    kept.count()
    Dedup.releaseMaterialized(kept)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "consume + releaseMaterialized must leave zero persistent RDDs")
  }

  test("frozen order stays consistent when appends/batches carry unseen shingles") {
    val s = spark
    import s.implicits._
    val dir = fresh("ctidx-frozen")
    // build vocabulary, then append a doc whose shingles are ALL unseen
    // at build time, then flag a fresh doc contained in the APPENDED doc
    Dedup.buildContainmentIndex(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text"),
      dir)
    Dedup.appendToContainmentIndex(
      Seq((2L, "zz1 zz2 zz3 zz4 zz5 zz6")).toDF("doc_id", "text"), dir)
    val batch = Seq(
      (10L, "zz1 zz2 zz3 zz4 zz5 zz6 tail"), // 4/5 shared with doc 2 = 0.8
      (11L, "totally different words here entirely now"))
      .toDF("doc_id", "text")
    val kept = Dedup.containmentFilterAgainstIndex(batch, dir, threshold = 0.8)
    val got = try survivors(kept) finally Dedup.releaseMaterialized(kept)
    assert(got == Set(11L),
      s"doc 10 is exactly 0.8-contained in the appended doc; got $got")
  }

  test("delete, compact, integrity") {
    val s = spark
    import s.implicits._
    val dir = fresh("ctidx-life")
    val corpus = Seq(
      (1L, "one two three four five six"),
      (2L, "red green blue cyan magenta yellow")).toDF("doc_id", "text")
    Dedup.buildContainmentIndex(corpus, dir)
    val batch = Seq((10L, "one two three four five six seven")) // ⊇ doc 1
      .toDF("doc_id", "text")
    def keptNow(): Set[Long] = {
      val k = Dedup.containmentFilterAgainstIndex(batch, dir)
      try survivors(k) finally Dedup.releaseMaterialized(k)
    }
    assert(keptNow() == Set.empty, "doc 10 must flag against doc 1")
    val healthy = Dedup.containmentIndexIntegrity(spark, dir).collect()(0)
    assert(healthy.getAs[Long]("n_docs") == 2L)
    assert(healthy.getAs[Boolean]("structure_ok"))
    assert(healthy.getAs[Boolean]("consistency_ok"))

    assert(Dedup.deleteFromContainmentIndex(spark, dir,
      Seq(Tuple1(1L)).toDF("doc_id")) == 1L)
    assert(keptNow() == Set(10L), "after deleting doc 1 nothing flags doc 10")
    assert(Dedup.deleteFromContainmentIndex(spark, dir,
      Seq(Tuple1(999L)).toDF("doc_id")) == 0L)

    Dedup.compactContainmentIndex(spark, dir, files = 1)
    assert(keptNow() == Set(10L), "compaction must not change results")
    val after = Dedup.containmentIndexIntegrity(spark, dir).collect()(0)
    assert(after.getAs[Long]("n_docs") == 1L)
    assert(after.getAs[Boolean]("structure_ok"))

    // torn append: a sketch row without postings is candidate-invisible
    // — integrity must surface it
    val root = graft.api.VersionedIndex.resolveRoot(spark, dir)
    Seq((77L, Seq(123456789L), 1)).toDF("doc_id", "sh", "n")
      .withColumn("sh", col("sh").cast("array<long>"))
      .write.mode("append").parquet(s"$root/sketches")
    val torn = Dedup.containmentIndexIntegrity(spark, dir).collect()(0)
    assert(!torn.getAs[Boolean]("consistency_ok"))
  }
}
