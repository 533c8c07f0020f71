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
  * Codecs: `HeaderCodec` REALLY parses formats whose structure needs
  * no native library (BMP dimension headers, WAV RIFF chunk walks);
  * compressed bitstreams (JPEG, H.264, ...) would need JavaCV/libvips —
  * absent from this container — so payloads matching no known magic
  * fall back to `FakeCodec`, which derives deterministic dimensions
  * from the byte payload itself (the fixture queries use it for
  * closed-form DuckDB oracles). Everything around the codec — schema,
  * binary transport, partition-preserving batch shape, metadata structs
  * — is real and tested; a native-lib codec is a one-object change.
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

  /** REAL pure-JVM decoder for container formats whose structure is
    * parseable without native libraries: BMP (DIB-header dimensions)
    * and WAV (RIFF `fmt `/`data` chunk walk → sample rate, channels,
    * sample-frame count, mapped onto the (width, height, n_frames)
    * triple). Kinds with compressed bitstreams (JPEG, H.264, ...) still
    * need a native codec; payloads matching no known magic fall back to
    * the deterministic stub so a mixed corpus decodes end-to-end
    * instead of dying on the first exotic file. */
  object HeaderCodec extends MediaCodec {
    private def leInt(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def leShort(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    def isBmp(c: Array[Byte]): Boolean =
      c.length >= 26 && c(0) == 'B'.toByte && c(1) == 'M'.toByte
    def isWav(c: Array[Byte]): Boolean =
      c.length >= 36 &&
        c(0) == 'R'.toByte && c(1) == 'I'.toByte && c(2) == 'F'.toByte &&
        c(3) == 'F'.toByte && c(8) == 'W'.toByte && c(9) == 'A'.toByte &&
        c(10) == 'V'.toByte && c(11) == 'E'.toByte

    override def decode(kind: String, content: Array[Byte]): (Int, Int, Int) =
      if (isBmp(content)) {
        // BITMAPINFOHEADER: int32 width at 18, int32 height at 22
        // (height may be negative for top-down rows — magnitude is the
        // pixel height); single still frame
        (leInt(content, 18), math.abs(leInt(content, 22)), 1)
      } else if (isWav(content)) {
        // chunk walk after the 12-byte RIFF header; chunks are
        // word-aligned (odd lengths padded by one)
        var off = 12; var channels = 1; var blockAlign = 0
        var rate = 0; var dataLen = 0
        var ok = true
        while (ok && off + 8 <= content.length) {
          val id = new String(content, off, 4, "US-ASCII")
          val len = leInt(content, off + 4)
          // a corrupt negative chunk length would walk backwards (or
          // stall) — stop parsing, keep whatever was already read
          if (len < 0) ok = false
          else {
            if (id == "fmt " && off + 22 <= content.length) {
              channels = leShort(content, off + 10)
              rate = leInt(content, off + 12)
              blockAlign = leShort(content, off + 20)
            } else if (id == "data") dataLen = len
            off += 8 + len + (len & 1)
          }
        }
        (rate, channels, if (blockAlign <= 0) 0 else dataLen / blockAlign)
      } else FakeCodec.decode(kind, content)
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
