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
    * parseable without native libraries: BMP (DIB-header dimensions),
    * WAV (RIFF `fmt `/`data` chunk walk → sample rate, channels,
    * sample-frame count, mapped onto the (width, height, n_frames)
    * triple), PNG (IHDR chunk), JPEG (SOF marker walk — dimensions sit
    * in an uncompressed segment header, no bitstream decode needed) and
    * GIF (logical screen descriptor). Pixel/sample DECODE of the
    * compressed bitstreams would still need a native codec; payloads
    * matching no known magic fall back to the deterministic stub so a
    * mixed corpus decodes end-to-end instead of dying on the first
    * exotic file. */
  object HeaderCodec extends MediaCodec {
    private[multimodal] def leInt(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private[multimodal] def leShort(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def beInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    private def beShort(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

    def isBmp(c: Array[Byte]): Boolean =
      c.length >= 26 && c(0) == 'B'.toByte && c(1) == 'M'.toByte
    def isWav(c: Array[Byte]): Boolean =
      c.length >= 36 &&
        c(0) == 'R'.toByte && c(1) == 'I'.toByte && c(2) == 'F'.toByte &&
        c(3) == 'F'.toByte && c(8) == 'W'.toByte && c(9) == 'A'.toByte &&
        c(10) == 'V'.toByte && c(11) == 'E'.toByte
    // 8-byte PNG signature; the IHDR chunk is REQUIRED to come first
    // (PNG spec §5.6), so width/height sit at fixed offsets 16/20
    def isPng(c: Array[Byte]): Boolean =
      c.length >= 24 && c(0) == 0x89.toByte && c(1) == 'P'.toByte &&
        c(2) == 'N'.toByte && c(3) == 'G'.toByte && c(4) == 0x0d.toByte &&
        c(5) == 0x0a.toByte && c(6) == 0x1a.toByte && c(7) == 0x0a.toByte &&
        c(12) == 'I'.toByte && c(13) == 'H'.toByte && c(14) == 'D'.toByte &&
        c(15) == 'R'.toByte
    def isJpeg(c: Array[Byte]): Boolean =
      c.length >= 4 && c(0) == 0xff.toByte && c(1) == 0xd8.toByte
    def isGif(c: Array[Byte]): Boolean =
      c.length >= 10 && c(0) == 'G'.toByte && c(1) == 'I'.toByte &&
        c(2) == 'F'.toByte && c(3) == '8'.toByte &&
        (c(4) == '7'.toByte || c(4) == '9'.toByte) && c(5) == 'a'.toByte
    def isAvi(c: Array[Byte]): Boolean =
      c.length >= 12 &&
        c(0) == 'R'.toByte && c(1) == 'I'.toByte && c(2) == 'F'.toByte &&
        c(3) == 'F'.toByte && c(8) == 'A'.toByte && c(9) == 'V'.toByte &&
        c(10) == 'I'.toByte && c(11) == ' '.toByte

    /** The stored frame payloads of an MJPEG-in-AVI container, in
      * storage order: RIFF chunk walk (AVI is RIFF, like WAV) into the
      * `movi` LIST — every `##dc`/`##db` sub-chunk is one complete
      * compressed frame (for the MJPG fourcc, a standalone JPEG).
      * Nested `rec ` LISTs recurse. Same hostile-length discipline as
      * the WAV walks: offsets as Long, a chunk that overruns its
      * enclosure ends that level's scan instead of wrapping. None when
      * the payload isn't AVI or carries no movi list. */
    private[multimodal] def aviFrames(c: Array[Byte]): Option[Vector[Array[Byte]]] = {
      if (!isAvi(c)) return None
      val frames = Vector.newBuilder[Array[Byte]]
      var sawMovi = false
      // depth bound: real AVIs nest 2-3 LISTs (hdrl/strl, movi/rec );
      // a hostile payload of thousands of nested LIST headers would
      // otherwise drive the recursion to StackOverflowError — an Error
      // that escapes the Option fail-soft contract and kills the task
      def walk(start: Long, end: Long, inMovi: Boolean, depth: Int): Unit = {
        if (depth > 16) return
        var off = start
        var ok = true
        while (ok && off + 8 <= end) {
          val o = off.toInt
          val id = new String(c, o, 4, "US-ASCII")
          val len = leInt(c, o + 4)
          if (len < 0 || off + 8 + len > end) ok = false // corrupt/truncated
          else {
            if (id == "LIST" && len >= 4) {
              val listType = new String(c, o + 8, 4, "US-ASCII")
              if (listType == "movi") sawMovi = true
              walk(off + 12, off + 8 + len, inMovi || listType == "movi",
                depth + 1)
            } else if (inMovi && len > 0 &&
              (id.endsWith("dc") || id.endsWith("db"))) {
              frames += java.util.Arrays.copyOfRange(c, o + 8, o + 8 + len)
            }
            off += 8L + len + (len & 1)
          }
        }
      }
      walk(12L, c.length.toLong, inMovi = false, depth = 0)
      if (sawMovi) Some(frames.result()) else None
    }

    /** JPEG segment walk to the first SOFn marker (C0-CF minus C4 DHT,
      * C8 JPG-extension, CC DAC): height/width are big-endian shorts at
      * +5/+7 of the SOF segment. Every non-SOF segment is skipped by its
      * own declared length; a corrupt length (< 2) or a truncated
      * segment ends the walk with no dimensions (→ (0, 0, 1)) rather
      * than scanning garbage. */
    private def jpegDims(c: Array[Byte]): (Int, Int) = {
      var off = 2
      while (off + 4 <= c.length) {
        if (c(off) != 0xff.toByte) return (0, 0) // desynced — not a marker
        // fill bytes: consecutive 0xFF padding before a marker is legal
        var mOff = off
        while (mOff + 1 < c.length && c(mOff + 1) == 0xff.toByte) mOff += 1
        val marker = c(mOff + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          return if (mOff + 9 <= c.length)
            (beShort(c, mOff + 7), beShort(c, mOff + 5)) // (width, height)
          else (0, 0)
        }
        if (marker == 0xd9 || marker == 0xda) return (0, 0) // EOI / SOS: no SOF seen
        if (marker >= 0xd0 && marker <= 0xd7 || marker == 0x01) off = mOff + 2 // RSTn/TEM: no length field
        else {
          if (mOff + 4 > c.length) return (0, 0)
          val len = beShort(c, mOff + 2)
          if (len < 2) return (0, 0) // corrupt length would loop forever
          off = mOff + 2 + len
        }
      }
      (0, 0)
    }

    override def decode(kind: String, content: Array[Byte]): (Int, Int, Int) =
      if (isBmp(content)) {
        // BITMAPINFOHEADER: int32 width at 18, int32 height at 22
        // (height may be negative for top-down rows — magnitude is the
        // pixel height); single still frame
        (leInt(content, 18), math.abs(leInt(content, 22)), 1)
      } else if (isPng(content)) {
        // IHDR: uint32 width at 16, uint32 height at 20; a still image
        // (APNG frame counts live in acTL — out of header-parse scope)
        (beInt(content, 16), beInt(content, 20), 1)
      } else if (isGif(content)) {
        // logical screen descriptor: uint16le width at 6, height at 8.
        // Animated-GIF frame counts need the full data-block walk
        // (sub-block chains of arbitrary length) — out of header scope,
        // reported as a single frame like the other stills.
        (leShort(content, 6), leShort(content, 8), 1)
      } else if (isJpeg(content)) {
        val (w, h) = jpegDims(content)
        (w, h, 1)
      } else if (isWav(content)) {
        // chunk walk after the 12-byte RIFF header; chunks are
        // word-aligned (odd lengths padded by one). Offset as Long: a
        // hostile chunk len near Int.MaxValue would wrap an Int offset
        // NEGATIVE yet keep passing the bound check (the parsePcm
        // hardening, mirrored here)
        var off = 12L; var channels = 1; var blockAlign = 0
        var rate = 0; var dataLen = 0
        var ok = true
        while (ok && off + 8 <= content.length) {
          val o = off.toInt
          val id = new String(content, o, 4, "US-ASCII")
          val len = leInt(content, o + 4)
          // a corrupt negative chunk length would walk backwards (or
          // stall) — stop parsing, keep whatever was already read
          if (len < 0) ok = false
          else {
            if (id == "fmt " && off + 22 <= content.length) {
              channels = leShort(content, o + 10)
              rate = leInt(content, o + 12)
              blockAlign = leShort(content, o + 20)
            } else if (id == "data") dataLen = len
            off += 8L + len + (len & 1)
          }
        }
        (rate, channels, if (blockAlign <= 0) 0 else dataLen / blockAlign)
      } else FakeCodec.decode(kind, content)
  }

  /** REAL pixel decode via the JDK's own image codecs (`javax.imageio`
    * — PNG, JPEG, GIF, BMP, WBMP, TIFF readers ship in `java.desktop`,
    * pure JVM, no native libraries): dimensions come from the DECODED
    * image, and [[imagePixelStats]] / [[resizeImages]] below operate on
    * actual pixels. Non-image kinds and payloads ImageIO cannot parse
    * fall back to the header walk (WAV stays real) and then the stub,
    * so a mixed corpus still decodes end-to-end.
    *
    * Executor hygiene: headless mode is forced before any AWT class
    * loads, and ImageIO's disk cache is off (decode stays in-memory —
    * an executor must not scratch temp files per row). Codec instances
    * are created per partition (newPartitionInstance), the mapInPandas
    * batch shape. */
  object ImageIoCodec extends MediaCodec {
    private def ensureHeadless(): Unit =
      if (System.getProperty("java.awt.headless") == null)
        System.setProperty("java.awt.headless", "true")

    /** Decoded pixels, or None if no JDK reader claims the payload. */
    def decodeImage(content: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      ensureHeadless()
      javax.imageio.ImageIO.setUseCache(false)
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content)))
      catch { case _: Exception => None }
    }

    override def decode(kind: String, content: Array[Byte]): (Int, Int, Int) =
      decodeImage(content) match {
        case Some(img) => (img.getWidth, img.getHeight, 1)
        case None => HeaderCodec.decode(kind, content)
      }

    /** The stored frames of a multi-frame container, every `stride`-th
      * decoded — real compressed multi-frame decode for the formats the
      * JDK readers handle (animated GIF: all frames; PNG/JPEG/BMP/TIFF:
      * one). Returns (total frame count, decoded (index, image) pairs);
      * skipped frames are never pixel-decoded, only counted. Frames are
      * the STORED rasters in storage order — no disposal-method
      * compositing, which is the honest pure-JVM contract (a frame
      * raster may be smaller than the logical screen when the encoder
      * wrote a partial update). None when no reader claims the payload
      * or any selected frame fails to decode. */
    def decodeFrames(content: Array[Byte], stride: Int = 1)
        : Option[(Int, Vector[(Int, java.awt.image.BufferedImage)])] = {
      ensureHeadless()
      javax.imageio.ImageIO.setUseCache(false)
      val iis = try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
      if (iis == null) return None
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try {
            val n = r.getNumImages(true)
            Some((n, (0 until n by stride).map(i => i -> r.read(i)).toVector))
          } catch { case _: Exception => None }
          finally r.dispose()
        }
      } finally iis.close()
    }

    /** Every `stride`-th stored frame of an MJPEG-in-AVI payload,
      * pixel-decoded: the container walk yields standalone JPEG frame
      * payloads ([[HeaderCodec.aviFrames]]) and each selected frame
      * goes through the JDK JPEG reader — REAL compressed-video frame
      * decode, pure JVM. Same contract as [[decodeFrames]]: (total
      * stored frames, decoded (index, image) pairs); skipped frames
      * are never pixel-decoded; None when the payload isn't AVI or a
      * selected frame fails to decode. */
    def decodeAviFrames(content: Array[Byte], stride: Int = 1)
        : Option[(Int, Vector[(Int, java.awt.image.BufferedImage)])] =
      HeaderCodec.aviFrames(content).flatMap { fs =>
        val n = fs.length
        val sel = (0 until n by stride).map(i => decodeImage(fs(i)).map(i -> _))
        if (sel.exists(_.isEmpty)) None
        else Some((n, sel.flatten.toVector))
      }

    override def newPartitionInstance(): MediaCodec = { ensureHeadless(); this }
  }

  /** Per-channel pixel statistics over REAL decoded pixels — the
    * feature-extraction stage on actual image content (mean R/G/B is
    * the stand-in for an embedding/perceptual-hash model; the decode
    * and traversal shape is what matters). Rows whose payload no JDK
    * codec claims are passed through with null stats rather than
    * dropped — a mixed corpus keeps its accounting. Narrow
    * mapPartitions; payloads never shuffle. */
  def imagePixelStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = ImageIoCodec.newPartitionInstance()
        .asInstanceOf[ImageIoCodec.type]
      rows.map { m =>
        codec.decodeImage(m.content) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            (m.media_id, w, h,
              Some(sr.toDouble / n), Some(sg.toDouble / n), Some(sb.toDouble / n))
          case None => (m.media_id, 0, 0, None, None, None)
        }
      }
    }.toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
  }

  /** Perceptual image fingerprint (dHash) over REAL decoded pixels —
    * the image half of near-dup dedup: resize to 9×8 luma (a 9×8
    * input is used as-is, so crafted fixtures stay bit-exact; larger
    * images go through the same AWT bilinear scale as [[resizeImages]]),
    * then bit k = y·8+x is SET when luma(x,y) < luma(x+1,y) — the
    * horizontal-gradient sign pattern, robust to uniform brightness
    * and scale changes. Luma is integer (299r + 587g + 114b)/1000, so
    * gray pixels hash from their exact value. Identical images hash
    * identically; near-identical images land within a small hamming
    * distance — feed the output to [[graft.api.Dedup.hammingPairs]]
    * for the pigeonhole candidate join (never all-pairs). Payloads no
    * codec decodes yield (decoded = false, null hash) — the
    * mixed-corpus contract. Narrow mapPartitions shape. */
  def imageDHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = ImageIoCodec.newPartitionInstance()
        .asInstanceOf[ImageIoCodec.type]
      rows.map { m =>
        codec.decodeImage(m.content) match {
          case Some(img) =>
            val s =
              if (img.getWidth == 9 && img.getHeight == 8) img
              else {
                val out = new java.awt.image.BufferedImage(9, 8,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = out.createGraphics()
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, 9, 8, null)
                g.dispose()
                out
              }
            def luma(x: Int, y: Int): Int = {
              val p = s.getRGB(x, y)
              (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
                (p & 0xff) * 114) / 1000
            }
            var hash = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                if (luma(x, y) < luma(x + 1, y)) hash |= 1L << (y * 8 + x)
                x += 1
              }
              y += 1
            }
            (m.media_id, true, Some(hash))
          case None => (m.media_id, false, None: Option[Long])
        }
      }
    }.toDF("media_id", "decoded", "dhash")
  }

  /** REAL audio decode for PCM WAV — the one audio container fully
    * decodable with zero native libraries (the compressed formats'
    * bitstreams still need a native codec; their header paths stay in
    * [[HeaderCodec]]). Parses the RIFF `fmt `/`data` chunks, decodes
    * the 16-bit signed LE (or 8-bit unsigned) PCM samples, and
    * computes the waveform features an audio-curation pass filters on:
    *   sample_rate, channels, n_frames, duration_s,
    *   rms   — root-mean-square level over all interleaved samples,
    *           full scale = 1.0 (silence detection),
    *   peak  — max |sample| (level normalization),
    *   clip_ratio — fraction of samples at digital full scale
    *           (recording-defect detection).
    * Non-WAV / non-PCM / truncated payloads yield one row with null
    * features (`decoded = false`) — the mixed-corpus contract of the
    * image path. Shape at 100 TB: narrow mapPartitions, payload bytes
    * never leave the executor, output is a fixed-width feature row. */
  /** Parsed PCM WAV: rate, channels, and samples normalized to
    * [-1, 1) doubles (16-bit: raw/32768; 8-bit: (raw-128)/128),
    * interleaved in container order, plus the per-sample clip flag
    * source (raw full-scale count). None for non-WAV / non-PCM /
    * unparseable payloads. */
  /** [[parsePcmUnsafe]] behind an exception fence: ANY parse failure on
    * a malformed/hostile payload is `None` (decoded = false), never a
    * job-killing throw — one corrupt file must not take down a
    * 100 TB audio pass. */
  private def parsePcm(c: Array[Byte]): Option[(Int, Int, Array[Double], Long)] =
    try parsePcmUnsafe(c) catch { case scala.util.control.NonFatal(_) => None }

  private def parsePcmUnsafe(c: Array[Byte]): Option[(Int, Int, Array[Double], Long)] = {
    var rate = 0; var channels = 0; var bits = 0; var fmt = -1
    var dataOff = -1; var dataLen = 0
    if (HeaderCodec.isWav(c)) {
      // offset as Long: a hostile chunk len near Int.MaxValue would
      // wrap an Int offset NEGATIVE yet keep passing the bound check —
      // the walk must END on oversized lengths, not throw
      var off = 12L
      var ok = true
      while (ok && off + 8 <= c.length) {
        val o = off.toInt
        val id = new String(c, o, 4, "US-ASCII")
        val len = HeaderCodec.leInt(c, o + 4)
        if (len < 0) ok = false
        else {
          if (id == "fmt " && off + 24 <= c.length) {
            fmt = HeaderCodec.leShort(c, o + 8)
            channels = HeaderCodec.leShort(c, o + 10)
            rate = HeaderCodec.leInt(c, o + 12)
            bits = HeaderCodec.leShort(c, o + 22)
          } else if (id == "data") { dataOff = o + 8; dataLen = len }
          off += 8L + len + (len & 1)
        }
      }
    }
    val pcm16 = fmt == 1 && bits == 16
    val pcm8 = fmt == 1 && bits == 8
    if ((pcm16 || pcm8) && rate > 0 && channels > 0 && dataOff >= 0) {
      val bytesPerSample = if (pcm16) 2 else 1
      val n = math.min(math.max(dataLen, 0), c.length - dataOff) / bytesPerSample
      val xs = new Array[Double](n)
      var clipped = 0L
      var i = 0
      while (i < n) {
        xs(i) =
          if (pcm16) {
            val raw = (HeaderCodec.leShort(c, dataOff + 2 * i) << 16) >> 16
            if (raw == Short.MaxValue || raw == Short.MinValue) clipped += 1
            raw / 32768.0
          } else {
            val raw = c(dataOff + i) & 0xff
            if (raw == 0 || raw == 255) clipped += 1
            (raw - 128) / 128.0
          }
        i += 1
      }
      Some((rate, channels, xs, clipped))
    } else None
  }

  def audioPcmStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { m =>
      parsePcm(m.content) match {
        case Some((rate, channels, xs, clipped)) =>
          val n = xs.length
          var i = 0; var sumSq = 0.0; var peak = 0.0
          while (i < n) {
            sumSq += xs(i) * xs(i)
            val ax = math.abs(xs(i))
            if (ax > peak) peak = ax
            i += 1
          }
          val frames = n.toLong / channels
          (m.media_id, true, Some(rate), Some(channels), Some(frames),
            Some(frames.toDouble / rate),
            Some(if (n == 0) 0.0 else math.sqrt(sumSq / n)), Some(peak),
            Some(if (n == 0) 0.0 else clipped.toDouble / n))
        case None =>
          (m.media_id, false, None: Option[Int], None: Option[Int],
            None: Option[Long], None: Option[Double], None: Option[Double],
            None: Option[Double], None: Option[Double])
      }
    }.toDF("media_id", "decoded", "sample_rate", "channels", "n_frames",
      "duration_s", "rms", "peak", "clip_ratio")
  }

  /** REAL audio resample — the audio analogue of [[resizeImages]]:
    * decode PCM, per-channel LINEAR interpolation to `targetRate`,
    * re-encode as 16-bit PCM WAV (the lossless-within-quantization
    * interchange format, like the image path's PNG re-encode). Output
    * frame count = ⌊frames·target/src⌋; source positions past the last
    * frame clamp to it. A payload already at `targetRate` passes
    * through byte-identical (no decode-reencode drift), and non-PCM /
    * non-WAV payloads pass through unchanged — the mixed-corpus
    * contract. Narrow mapPartitions shape; sample arrays live only
    * inside the executor task. */
  def resamplePcm(media: Dataset[MediaRow], targetRate: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(targetRate > 0, s"targetRate must be positive, got $targetRate")
    media.map { m =>
      parsePcm(m.content) match {
        case Some((rate, channels, xs, _)) if rate != targetRate && channels > 0 &&
            // bound the output allocation BEFORE sizing it: a hostile
            // header declaring rate=1 would make outFrames enormous and
            // the byte-size overflow Int (negative-size alloc) or OOM
            // the executor — such payloads pass through unchanged, the
            // mixed-corpus contract
            44L + (xs.length / channels).toLong * targetRate / rate *
              channels * 2L <= Int.MaxValue =>
          val inFrames = xs.length / channels
          val outFrames = (inFrames.toLong * targetRate / rate).toInt
          val out = new Array[Byte](44 + outFrames * channels * 2)
          def le32(v: Int, off: Int): Unit = {
            out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
            out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
          }
          def le16(v: Int, off: Int): Unit = {
            out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
          }
          def ascii(s: String, off: Int): Unit =
            s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => out(off + i) = b }
          val blockAlign = channels * 2
          val dataLen = outFrames * blockAlign
          ascii("RIFF", 0); le32(36 + dataLen, 4); ascii("WAVE", 8)
          ascii("fmt ", 12); le32(16, 16); le16(1, 20); le16(channels, 22)
          le32(targetRate, 24); le32(targetRate * blockAlign, 28)
          le16(blockAlign, 32); le16(16, 34)
          ascii("data", 36); le32(dataLen, 40)
          var f = 0
          while (f < outFrames) {
            // source position of output frame f; clamp the upper
            // neighbor to the final frame at the tail
            val p = f.toDouble * rate / targetRate
            val lo = math.min(p.toInt, inFrames - 1)
            val hi = math.min(lo + 1, inFrames - 1)
            val w = p - lo
            var ch = 0
            while (ch < channels) {
              val x = xs(lo * channels + ch) * (1.0 - w) + xs(hi * channels + ch) * w
              val raw = math.max(-32768, math.min(32767, math.round(x * 32768.0).toInt))
              le16(raw, 44 + (f * channels + ch) * 2)
              ch += 1
            }
            f += 1
          }
          MediaRow(m.media_id, m.kind, out)
        case _ => m
      }
    }
  }

  /** Perceptual AUDIO fingerprint from real PCM samples — the audio
    * member of the near-dup signature family (text simhash, image
    * dHash): channels mix to mono, the waveform splits into 65 equal
    * windows, and bit k is SET when energy(window k) < energy(window
    * k+1) — the energy-envelope sign pattern, robust to uniform gain
    * changes (energy comparisons are scale-invariant). Identical audio
    * hashes identically; a locally-edited clip lands within a small
    * hamming distance — feed [[graft.api.Dedup.hammingPairs]] for the
    * pigeonhole candidate join. Payloads that are not PCM WAV or carry
    * fewer than 65 mono frames yield (decoded = false, null hash). */
  def audioPcmHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { m =>
      parsePcm(m.content) match {
        case Some((_, channels, xs, _)) if channels > 0 && xs.length / channels >= 65 =>
          val frames = xs.length / channels
          val mono = new Array[Double](frames)
          var f = 0
          while (f < frames) {
            var s = 0.0; var ch = 0
            while (ch < channels) { s += xs(f * channels + ch); ch += 1 }
            mono(f) = s / channels
            f += 1
          }
          val win = frames / 65
          val energy = new Array[Double](65)
          var k = 0
          while (k < 65) {
            var e = 0.0; var i = k * win
            val end = i + win
            while (i < end) { e += mono(i) * mono(i); i += 1 }
            energy(k) = e
            k += 1
          }
          var hash = 0L
          k = 0
          while (k < 64) {
            if (energy(k) < energy(k + 1)) hash |= 1L << k
            k += 1
          }
          (m.media_id, true, Some(hash))
        case _ => (m.media_id, false, None: Option[Long])
      }
    }.toDF("media_id", "decoded", "ahash")
  }

  /** REAL image resize: decode, scale so the longer edge fits
    * `maxEdge` (never upscale), re-encode as PNG (lossless, always
    * writable by the JDK). Payloads no codec claims pass through
    * unchanged — same mixed-corpus contract as [[imagePixelStats]].
    * The workhorse preprocessing step of a vision-training pipeline,
    * shaped for scale: narrow mapPartitions, per-partition codec
    * state, payload bytes never leave the executor. */
  def resizeImages(media: Dataset[MediaRow], maxEdge: Int): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    require(maxEdge > 0)
    media.mapPartitions { rows =>
      val codec = ImageIoCodec.newPartitionInstance()
        .asInstanceOf[ImageIoCodec.type]
      rows.map { m =>
        codec.decodeImage(m.content) match {
          case Some(img) =>
            val scale = maxEdge.toDouble / math.max(img.getWidth, img.getHeight)
            if (scale >= 1.0) Decoded(m.media_id, m.kind,
              img.getWidth, img.getHeight, 1, m.content)
            else {
              val (w, h) = (math.max(1, (img.getWidth * scale).round.toInt),
                math.max(1, (img.getHeight * scale).round.toInt))
              val out = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Decoded(m.media_id, m.kind, w, h, 1, bos.toByteArray)
            }
          case None =>
            val (w, h, f) = HeaderCodec.decode(m.kind, m.content)
            Decoded(m.media_id, m.kind, w, h, f, m.content)
        }
      }
    }
  }

  /** Read a directory of raw media files through Spark's built-in
    * `binaryFile` source — the ingest path for loose image/audio
    * corpora (one row per file). The read is fully distributed: file
    * listing and splitting happen in the source, `pathGlobFilter` is
    * pushed into listing (non-matching files are never opened), and
    * payload bytes go straight to executor tasks — the driver sees only
    * file statuses. `kind` is inferred from the extension; `media_id`
    * is xxhash64 of the full path, so re-reads key the same file
    * consistently. Columns: (name, media_id, kind, content). */
  def readBinaryDir(s: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    val raw = s.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
    val name = element_at(split(col("path"), "/"), -1)
    raw.select(
      name.as("name"),
      xxhash64(col("path")).as("media_id"),
      when(lower(name).rlike("\\.(bmp|png|gif|jpe?g|tiff?|webp)$"), "image")
        .when(lower(name).rlike("\\.(wav|mp3|flac|ogg)$"), "audio")
        .when(lower(name).rlike("\\.(mp4|avi|mkv|webm|mov)$"), "video")
        .otherwise("binary").as("kind"),
      col("content"))
  }

  /** The binaryFile directory as a decodable media Dataset — plugs the
    * raw-file ingest path straight into decode/features/resize. */
  def mediaFromBinaryDir(s: SparkSession, dir: String,
                         glob: String = "*"): Dataset[MediaRow] = {
    import s.implicits._
    readBinaryDir(s, dir, glob)
      .select(col("media_id"), col("kind"), col("content")).as[MediaRow]
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

  /** REAL frame sampling from compressed multi-frame payloads — the
    * frame-pipeline stage [[sampleFrames]] stubs, made real for the one
    * container the JDK decodes without native libraries (animated GIF;
    * stills decode as a single frame 0). Emits every `stride`-th STORED
    * frame with its decoded dimensions and exact mean pixel value
    * (R+G+B summed over the raster, one double division — a constant-
    * color frame reports its value exactly, the q127 oracle pattern);
    * payloads no JDK reader claims yield one decoded=false row, so a
    * mixed corpus keeps its accounting. Narrow mapPartitions over the
    * binary column — frame rasters live only inside the executor task;
    * only the fixed-width per-frame feature row comes out. A real
    * video container (H.264 etc.) needs native codecs and would slot
    * in at the same [[MediaCodec]] injection point. */
  def sampleGifFrames(media: Dataset[MediaRow], stride: Int = 1): DataFrame =
    frameFeatures(media, stride, avi = false)

  /** REAL compressed-VIDEO frame decode for the MJPEG-in-AVI container
    * (the zero-native-deps video format: AVI is a RIFF chunk stream and
    * each MJPG frame is a standalone JPEG the JDK reader decodes).
    * Same output contract as [[sampleGifFrames]] — every `stride`-th
    * STORED frame with decoded dimensions and exact mean pixel value;
    * payloads that aren't AVI or whose frames fail JPEG decode yield
    * one decoded=false row. Inter-frame-predicted codecs (H.264 etc.)
    * need native decoders and would slot in at the same [[MediaCodec]]
    * injection point; MJPEG's every-frame-is-a-keyframe structure is
    * what makes it decodable here. */
  def sampleAviFrames(media: Dataset[MediaRow], stride: Int = 1): DataFrame =
    frameFeatures(media, stride, avi = true)

  private def frameFeatures(media: Dataset[MediaRow], stride: Int,
                            avi: Boolean): DataFrame = {
    import media.sparkSession.implicits._
    require(stride > 0)
    media.mapPartitions { rows =>
      ImageIoCodec.newPartitionInstance()
      rows.flatMap { m =>
        (if (avi) ImageIoCodec.decodeAviFrames(m.content, stride)
         else ImageIoCodec.decodeFrames(m.content, stride)) match {
          case Some((n, frames)) if frames.nonEmpty =>
            frames.map { case (i, img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                  x += 1
                }
                y += 1
              }
              (m.media_id, true, i, n, Some(w), Some(h),
                Some(sum / (3.0 * w * h)))
            }
          case _ =>
            Seq((m.media_id, false, 0, 0, None: Option[Int],
              None: Option[Int], None: Option[Double]))
        }
      }
    }.toDF("media_id", "decoded", "frame_idx", "n_frames",
      "width", "height", "mean_pixel")
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
