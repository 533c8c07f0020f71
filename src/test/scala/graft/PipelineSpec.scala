package graft

import graft.queries.Pipeline
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the pipeline operators whose sketches have no SQL
  * oracle (hash-based), plus cross-checks between the approximate and
  * exact variants. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = Pipeline.queries(name)(spark, sf)

  test("minhash-LSH near-dup equals exact shingle-join ground truth") {
    val exact = q("q44_near_dup_pairs").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lsh = q("q45_minhash_lsh").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.nonEmpty, "fixture should contain planted near-dup pairs")
    assert(lsh.toSet == exact.toSet,
      s"LSH candidates+verify must recover the exact pair set (${lsh.length} vs ${exact.length})")
  }

  test("simhash pairs overlap the high-jaccard ground truth") {
    val truth = q("q44_near_dup_pairs").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = q("q46_simhash_pairs").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty)
    assert((sim intersect truth).nonEmpty,
      "hamming<=3 simhash pairs should include some true near-dups")
  }

  test("hyperplane ANN reports correct cosines and nontrivial recall of true top-3") {
    val truthRows = q("q47_cosine_topk").collect()
    val truth = truthRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val truthCos = truthRows.map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val annRows = q("q48_ann_hyperplane").collect()
    val ann = annRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    // cosines for pairs the ANN shares with the exact top-3 must agree
    annRows.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      truthCos.get(key).foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-9))
    }
    val recall = (ann intersect truth).size.toDouble / truth.size
    assert(recall > 0.3, f"multi-table LSH recall $recall%.3f unexpectedly low")
  }

  test("IVF ANN reports correct cosines with nontrivial recall") {
    val truthRows = q("q47_cosine_topk").collect()
    val truth = truthRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val truthCos = truthRows.map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val ivfRows = q("q57_ann_ivf").collect()
    ivfRows.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      truthCos.get(key).foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-9))
    }
    val recall = (ivfRows.map(r => (r.getLong(0), r.getLong(2))).toSet intersect truth).size.toDouble / truth.size
    assert(recall > 0.1, f"IVF nprobe=1 recall $recall%.3f unexpectedly low")
  }

  test("exact dedup keeps one doc per fingerprint") {
    val rows = q("q43_exact_dedup").collect()
    val total = rows.map(_.getAs[Long]("dup_count")).sum
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(total == docs, "dup counts must partition the corpus")
    assert(rows.map(_.getAs[String]("fingerprint")).distinct.length == rows.length)
  }

  test("min-shingle fingerprint is deterministic") {
    val a = q("q52_min_shingle_fp").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = q("q52_min_shingle_fp").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }
}
