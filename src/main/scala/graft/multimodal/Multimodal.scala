package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as typed
  * `mapPartitions` stages — the Scala-native analogue of Python's
  * `mapInPandas` (one iterator of rows per partition, so per-batch
  * library state — a real codec — would be initialized once per
  * partition, not once per row).
  *
  * The actual codecs are STUBBED (this container has no image/audio
  * libraries): `FakeCodec` derives deterministic dimensions and frames
  * from the byte payload itself. Everything around the stub — schema,
  * binary transport, partition-preserving batch shape, metadata structs
  * — is real and tested; swapping `FakeCodec` for JavaCV/libvips is a
  * one-object change.
  *
  * Scale notes: payloads never leave executors (no collect), every
  * stage is a narrow mapPartitions (no shuffle), and feature columns
  * are small fixed-size vectors so downstream joins/aggs shuffle
  * features, not payloads.
  */
object Multimodal {

  /** A media row: opaque payload + the typed metadata every real media
    * pipeline carries alongside the bytes. */
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  final case class Decoded(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, content: Array[Byte])

  final case class Features(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, n_bytes: Int, mean_byte: Double)

  /** The codec injection point: a real implementation (JavaCV, libvips,
    * ffmpeg bindings) implements this one trait; `newPartitionInstance`
    * runs once per partition inside mapPartitions, which is where a
    * real codec allocates its native contexts. Must be Serializable —
    * the instance is shipped to executors in the task closure. */
  trait MediaCodec extends Serializable {
    /** (width, height, n_frames) of a payload of the given kind. */
    def decode(kind: String, content: Array[Byte]): (Int, Int, Int)
    /** Per-partition setup hook (native contexts, thread-local state). */
    def newPartitionInstance(): MediaCodec = this
  }

  /** Deterministic stand-in for a real decoder: "parses" dimensions and
    * frame count from payload length (this container has no media
    * libraries). The q53 oracle replicates exactly these formulas. */
  object FakeCodec extends MediaCodec {
    def width(content: Array[Byte]): Int = 16 + (content.length * 31) % 497
    def height(content: Array[Byte]): Int = 16 + (content.length * 73) % 353
    def frames(content: Array[Byte]): Int = content.length % 24 + 1
    override def decode(kind: String, content: Array[Byte]): (Int, Int, Int) =
      (width(content), height(content), frames(content))
  }

  /** Build a media table from the documents fixture: text bytes as the
    * payload, kind round-robined over the three modalities. Purely a
    * fixture adapter — real deployments read binary parquet/files. */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.core.Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"))
      .as[MediaRow]
  }

  /** Decode stage: one codec instance per partition, streamed over the
    * row iterator (the mapInPandas batch shape). */
  def decode(media: Dataset[MediaRow],
             codec: MediaCodec = FakeCodec): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val c = codec.newPartitionInstance()
      rows.map { m =>
        val (w, h, f) = c.decode(m.kind, m.content)
        Decoded(m.media_id, m.kind, w, h, f, m.content)
      }
    }
  }

  /** Feature extraction: payload statistics (stub for an embedding /
    * spectrogram / perceptual-hash step). */
  def features(decoded: Dataset[Decoded]): Dataset[Features] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { rows =>
      rows.map { d =>
        val n = d.content.length
        val mean = if (n == 0) 0.0
          else d.content.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
        Features(d.media_id, d.kind, d.width, d.height, d.n_frames, n, mean)
      }
    }
  }

  /** Resize stub: keep every k-th byte — stands in for a real
    * downsample, preserving the binary-in/binary-out contract. */
  def resize(decoded: Dataset[Decoded], factor: Int): Dataset[Decoded] = {
    import decoded.sparkSession.implicits._
    require(factor > 0)
    decoded.mapPartitions { rows =>
      rows.map { d =>
        val out = d.content.grouped(factor).map(_.head).toArray
        Decoded(d.media_id, d.kind,
          FakeCodec.width(out), FakeCodec.height(out), d.n_frames, out)
      }
    }
  }

  /** Frame sampling stub for video payloads: split the payload into
    * n_frames chunks and keep every `stride`-th chunk. */
  def sampleFrames(decoded: Dataset[Decoded], stride: Int): DataFrame = {
    import decoded.sparkSession.implicits._
    require(stride > 0)
    decoded.flatMap { d =>
      val chunk = math.max(1, d.content.length / d.n_frames)
      d.content.grouped(chunk).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (bytes, i) => (d.media_id, i, bytes) }
    }.toDF("media_id", "frame_idx", "frame")
  }
}
