package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregators around Apache DataSketches' KLL quantile sketch
  * (`datasketches-java` ships with Spark — the engine behind Spark's
  * own HLL functions; there is no built-in SQL surface for KLL, so the
  * typed-Aggregator route is the sanctioned extension point — no
  * black-box row UDFs).
  *
  * KLL is the mergeable-quantiles analogue of HLL for distinct counts:
  * a ~KB sketch per partition answers any rank/quantile query over any
  * UNION of partitions within a proven normalized rank error (~1.65%
  * at the k=200 default, two-sided), without re-scanning the data.
  * Merge is associative and commutative, so partial aggregation
  * (map-side combine) applies and partition sketches compose across
  * days/backfills exactly like the HLL table. */
object KllAggregators {

  /** Rows → one serialized KLL sketch per group. The buffer is the
    * live heap sketch (kryo-encoded between partial-aggregation
    * stages — it crosses the wire once per partition per group, not
    * per row); the output is the compact byte image, a plain BINARY
    * column any engine with DataSketches can read. */
  final class SketchAgg(k: Int)
      extends Aggregator[Double, KllDoublesSketch, Array[Byte]] {
    require(k >= 8 && k <= 65535, s"KLL k out of range: $k")
    override def zero: KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)
    override def reduce(b: KllDoublesSketch, a: Double): KllDoublesSketch = {
      b.update(a); b
    }
    override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }
    override def finish(b: KllDoublesSketch): Array[Byte] = b.toByteArray
    override def bufferEncoder: Encoder[KllDoublesSketch] =
      Encoders.kryo[KllDoublesSketch]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Serialized sketches → one merged serialized sketch per group —
    * the union step over a PERSISTED sketch table (parquet binary
    * column round-trip): heapify each compact image, merge, emit the
    * merged image. Input volume is sketches (metadata-sized), never
    * rows. */
  final class MergeAgg(k: Int)
      extends Aggregator[Array[Byte], KllDoublesSketch, Array[Byte]] {
    override def zero: KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)
    override def reduce(b: KllDoublesSketch, bytes: Array[Byte]): KllDoublesSketch = {
      b.merge(KllDoublesSketch.heapify(Memory.wrap(bytes))); b
    }
    override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }
    override def finish(b: KllDoublesSketch): Array[Byte] = b.toByteArray
    override def bufferEncoder: Encoder[KllDoublesSketch] =
      Encoders.kryo[KllDoublesSketch]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Quantile estimates off a serialized sketch (INCLUSIVE rank
    * semantics — the DataSketches default). Empty sketch → NaNs. */
  def quantilesOf(bytes: Array[Byte], qs: Seq[Double]): Seq[Double] = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) qs.map(_ => Double.NaN)
    else qs.map(q => sk.getQuantile(q))
  }

  /** The sketch's proven two-sided normalized rank error (fraction of
    * n) — the tolerance a contract query should gate against. */
  def rankError(bytes: Array[Byte]): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
      .getNormalizedRankError(false)
}
