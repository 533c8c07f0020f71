package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregators around Apache DataSketches' Frequent-Items
  * sketch (Misra-Gries / reverse-purge map; `datasketches-java` ships
  * with Spark) — the mergeable HEAVY-HITTERS analogue of the HLL
  * (distinct) and KLL (quantile) tables: a bounded-size sketch per
  * partition answers "which items exceed frequency f?" over any UNION
  * of partitions with one-sided guarantees — NO_FALSE_NEGATIVES
  * returns every item whose true count exceeds the sketch's maximum
  * error, and every reported item carries (lower, upper) bounds that
  * ALWAYS bracket the true count. Exact heavy-hitters needs a
  * corpus-wide keyed aggregation per query; the sketch table answers
  * from kilobytes.
  *
  * Reported ESTIMATES depend on insertion order (purge timing), so
  * contract queries gate on the sketch's order-independent guarantees
  * (bounds bracket exact; over-error items always reported), never on
  * raw estimate values. */
object FreqAggregators {
  private def serde = new ArrayOfStringsSerDe()

  /** Rows → one serialized frequent-items sketch per group.
    * `maxMapSize` (power of 2) bounds memory and sets the error bound:
    * max error ≤ 3.5·n/maxMapSize (datasketches' purge guarantee). */
  final class FreqSketchAgg(maxMapSize: Int)
      extends Aggregator[String, ItemsSketch[String], Array[Byte]] {
    require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
      s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")
    override def zero: ItemsSketch[String] = new ItemsSketch[String](maxMapSize)
    override def reduce(b: ItemsSketch[String], a: String): ItemsSketch[String] = {
      if (a != null) b.update(a); b
    }
    override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] = {
      a.merge(b); a
    }
    override def finish(b: ItemsSketch[String]): Array[Byte] = b.toByteArray(serde)
    override def bufferEncoder: Encoder[ItemsSketch[String]] =
      Encoders.kryo[ItemsSketch[String]]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Serialized sketches → one merged serialized sketch per group —
    * the union step over a PERSISTED sketch table. Input volume is
    * sketches, never rows. */
  final class FreqMergeAgg(maxMapSize: Int)
      extends Aggregator[Array[Byte], ItemsSketch[String], Array[Byte]] {
    override def zero: ItemsSketch[String] = new ItemsSketch[String](maxMapSize)
    override def reduce(b: ItemsSketch[String], bytes: Array[Byte]): ItemsSketch[String] = {
      b.merge(ItemsSketch.getInstance(Memory.wrap(bytes), serde)); b
    }
    override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] = {
      a.merge(b); a
    }
    override def finish(b: ItemsSketch[String]): Array[Byte] = b.toByteArray(serde)
    override def bufferEncoder: Encoder[ItemsSketch[String]] =
      Encoders.kryo[ItemsSketch[String]]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Heavy hitters off a serialized sketch:
    * (item, estimate, lower_bound, upper_bound). NO_FALSE_NEGATIVES:
    * every item with true count > [[maxError]] is present (possibly
    * with over-threshold false positives); NO_FALSE_POSITIVES: every
    * reported item's true count is genuinely above threshold. */
  def heavyHittersOf(bytes: Array[Byte],
                     noFalseNegatives: Boolean = true): Seq[(String, Long, Long, Long)] = {
    val sk = ItemsSketch.getInstance(Memory.wrap(bytes), serde)
    val et = if (noFalseNegatives) ErrorType.NO_FALSE_NEGATIVES
      else ErrorType.NO_FALSE_POSITIVES
    sk.getFrequentItems(et).toSeq.map(r =>
      (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
  }

  /** The sketch's a-priori maximum estimation error — the threshold
    * NO_FALSE_NEGATIVES reporting guarantees coverage above. */
  def maxError(bytes: Array[Byte]): Long =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde).getMaximumError

  /** Total stream weight the sketch has absorbed. */
  def streamLength(bytes: Array[Byte]): Long =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde).getStreamLength
}
