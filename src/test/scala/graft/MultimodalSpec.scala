package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Plumbing checks for the multimodal binary-column pipeline: schema,
  * partition preservation (narrow stages), stub-decode determinism,
  * resize / frame-sample contracts. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private def media() = Multimodal.mediaFromDocuments(spark, sf)

  test("media table carries binary payloads with modality metadata") {
    val df = media().toDF()
    assert(df.schema("content").dataType.typeName == "binary")
    val kinds = df.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decode and features are narrow (partition-preserving) stages") {
    val m = media().repartition(7)
    assert(Multimodal.decode(m).rdd.getNumPartitions == 7)
    assert(Multimodal.features(Multimodal.decode(m)).rdd.getNumPartitions == 7)
  }

  test("a custom MediaCodec is injectable through the decode stage") {
    // the production path: swap FakeCodec for a real (JavaCV/libvips)
    // implementation of the one-method trait — verify the injection
    // point actually routes every row through the supplied codec
    object ConstCodec extends Multimodal.MediaCodec {
      override def decode(kind: String, content: Array[Byte]): (Int, Int, Int) =
        (640, 480, 42)
    }
    val out = Multimodal.decode(media(), ConstCodec).collect()
    assert(out.nonEmpty)
    assert(out.forall(d => d.width == 640 && d.height == 480 && d.n_frames == 42))
  }

  test("stub decode is deterministic and within domain") {
    val a = Multimodal.features(Multimodal.decode(media())).collect()
      .map(f => (f.media_id, f.width, f.height, f.n_frames, f.n_bytes, f.mean_byte))
      .sortBy(_._1)
    val b = Multimodal.features(Multimodal.decode(media())).collect()
      .map(f => (f.media_id, f.width, f.height, f.n_frames, f.n_bytes, f.mean_byte))
      .sortBy(_._1)
    assert(a.sameElements(b))
    a.foreach { case (_, w, h, fr, nb, mb) =>
      assert(w >= 16 && w < 16 + 497 && h >= 16 && h < 16 + 353)
      assert(fr >= 1 && fr <= 24)
      assert(nb > 0 && mb > 0.0 && mb < 256.0)
    }
  }

  test("resize shrinks payloads by the stride factor") {
    val d = Multimodal.decode(media())
    val before = d.collect().map(x => x.media_id -> x.content.length).toMap
    Multimodal.resize(d, 4).collect().foreach { r =>
      val n = before(r.media_id)
      assert(r.content.length == (n + 3) / 4)
    }
  }

  test("HeaderCodec parses real BMP and WAV structure, stub-falls-back otherwise") {
    import graft.multimodal.Multimodal.{HeaderCodec, MediaRow}
    // canonical little-endian writers
    def le32(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    def le16(v: Int): Array[Byte] = Array(v, v >> 8).map(_.toByte)
    // minimal valid BMP: 14-byte file header + 40-byte BITMAPINFOHEADER
    def bmp(w: Int, h: Int): Array[Byte] =
      "BM".getBytes ++ le32(54) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        Array.fill(24)(0.toByte)
    // canonical 44-byte PCM WAV header + data
    def wav(rate: Int, channels: Int, samples: Int, bytesPerSample: Int): Array[Byte] = {
      val blockAlign = channels * bytesPerSample
      val dataLen = samples * blockAlign
      "RIFF".getBytes ++ le32(36 + dataLen) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
        le32(rate) ++ le32(rate * blockAlign) ++ le16(blockAlign) ++
        le16(8 * bytesPerSample) ++
        "data".getBytes ++ le32(dataLen) ++ Array.fill(dataLen)(7.toByte)
    }
    // direct parses
    assert(HeaderCodec.decode("image", bmp(640, 480)) == ((640, 480, 1)))
    assert(HeaderCodec.decode("image", bmp(33, -17)) == ((33, 17, 1)),
      "negative height = top-down BMP, magnitude is the pixel height")
    assert(HeaderCodec.decode("audio", wav(44100, 2, 1000, 2)) == ((44100, 2, 1000)))
    // corrupt negative chunk length must not hang the chunk walk
    val evil = wav(8000, 1, 4, 2)
    System.arraycopy(le32(-8), 0, evil, 16, 4) // fmt chunk len := -8
    val (_, _, evilFrames) = HeaderCodec.decode("audio", evil)
    assert(evilFrames == 0, "parse stops at the corrupt chunk")
    // unknown magic → deterministic stub fallback, not a crash
    val junk = Array.tabulate(100)(_.toByte)
    assert(HeaderCodec.decode("video", junk) ==
      Multimodal.FakeCodec.decode("video", junk))
    // and through the distributed decode stage
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "image", bmp(320, 200)),
      MediaRow(2L, "audio", wav(16000, 1, 160, 2)),
      MediaRow(3L, "video", junk)).toDS()
    val out = Multimodal.decode(rows, HeaderCodec).collect()
      .map(d => d.media_id -> ((d.width, d.height, d.n_frames))).toMap
    assert(out(1L) == ((320, 200, 1)))
    assert(out(2L) == ((16000, 1, 160)))
    assert(out(3L) == Multimodal.FakeCodec.decode("video", junk))
  }

  test("HeaderCodec parses PNG, JPEG and GIF headers (r5 verdict #2)") {
    import graft.multimodal.Multimodal.HeaderCodec
    def be32(v: Int): Array[Byte] =
      Array(v >> 24, v >> 16, v >> 8, v).map(_.toByte)
    def be16(v: Int): Array[Byte] = Array(v >> 8, v).map(_.toByte)
    def le16(v: Int): Array[Byte] = Array(v, v >> 8).map(_.toByte)
    // PNG: 8-byte signature + IHDR chunk (len=13, type, w, h, 5 flag
    // bytes, crc) — exactly what `file`/ImageIO read for dimensions
    def png(w: Int, h: Int): Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 6, 0, 0, 0) ++ be32(0)
    // GIF: header + logical screen descriptor (w/h little-endian)
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)
    // JPEG: SOI, APP0 (JFIF), a comment segment, DQT stub, then SOF0 —
    // the walk must skip the variable-length segments to find SOF
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
        "JFIF".getBytes ++ Array.fill(10)(0.toByte)
      val com = Array(0xff, 0xfe).map(_.toByte) ++ be16(9) ++ "comment".getBytes
      val dqt = Array(0xff, 0xdb).map(_.toByte) ++ be16(67) ++ Array.fill(65)(1.toByte)
      // len 11 = len(2) + precision(1) + h(2) + w(2) + ncomp(1) + comp(3)
      val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(11) ++
        Array(8.toByte) ++ be16(h) ++ be16(w) ++ Array[Byte](1, 1, 0x11, 0)
      Array(0xff, 0xd8).map(_.toByte) ++ app0 ++ com ++ dqt ++ sof0
    }
    assert(HeaderCodec.decode("image", png(800, 600)) == ((800, 600, 1)))
    assert(HeaderCodec.decode("image", gif(101, 57)) == ((101, 57, 1)))
    assert(HeaderCodec.decode("image", jpeg(1920, 1080)) == ((1920, 1080, 1)))
    // progressive JPEG (SOF2) parses identically
    val prog = jpeg(640, 360)
    prog(prog.length - 12) = 0xc2.toByte // the C0 byte of the FF C0 marker (13-byte SOF segment)
    assert(HeaderCodec.decode("image", prog) == ((640, 360, 1)))
    // truncated JPEG (SOS before any SOF) and a corrupt segment length
    // end the walk with zero dims instead of hanging
    val noSof = Array(0xff, 0xd8, 0xff, 0xda, 0, 4, 0, 0).map(_.toByte)
    assert(HeaderCodec.decode("image", noSof) == ((0, 0, 1)))
    val badLen = Array(0xff, 0xd8, 0xff, 0xe0, 0, 1).map(_.toByte)
    assert(HeaderCodec.decode("image", badLen) == ((0, 0, 1)))
    // a payload with none of the five magics still stub-falls-back
    val junk = "GIF9 not actually a gif".getBytes
    assert(HeaderCodec.decode("image", junk) ==
      Multimodal.FakeCodec.decode("image", junk))
  }

  test("audioPcmStats: PCM arithmetic, truncation, odd-chunk padding, non-PCM fallback") {
    import spark.implicits._
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def wav(rate: Int, ch: Int, bits: Int, fmtCode: Int, data: Array[Byte],
            extraChunk: Option[Array[Byte]] = None): Array[Byte] = {
      val ba = ch * bits / 8
      val extra = extraChunk.getOrElse(Array.emptyByteArray)
      "RIFF".getBytes ++ le32(36 + extra.length + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(fmtCode) ++ le16(ch) ++ le32(rate) ++
        le32(rate * ba) ++ le16(ba) ++ le16(bits) ++ extra ++
        "data".getBytes ++ le32(data.length) ++ data
    }
    def s16(xs: Seq[Int]) = xs.flatMap(le16).toArray
    // an odd-length LIST chunk before data: the walk must pad to the
    // word boundary or it misreads everything after
    val oddChunk = "LIST".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav(8000, 1, 16, 1, s16(Seq(16384, -16384)))),
      Multimodal.MediaRow(2L, "audio", wav(8000, 1, 16, 1, s16(Seq(8192)),
        extraChunk = Some(oddChunk))),
      // data chunk CLAIMS 100 samples but payload is truncated to 2
      Multimodal.MediaRow(3L, "audio",
        wav(8000, 1, 16, 1, s16(Seq(16384, 16384))).patch(40, le32(200), 4)),
      // IEEE-float WAV (fmt 3): structurally valid, not PCM -> undecoded
      Multimodal.MediaRow(4L, "audio", wav(8000, 1, 32, 3, new Array[Byte](8))),
      Multimodal.MediaRow(5L, "binary", Array[Byte](9, 9, 9)))
    val out = Multimodal.audioPcmStats(rows.toDS()).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(1) && math.abs(out(1L).getDouble(6) - 0.5) < 1e-12)
    assert(out(2L).getBoolean(1) && out(2L).getLong(4) == 1L,
      "odd chunk must be skipped with word-alignment padding")
    assert(out(3L).getBoolean(1) && out(3L).getLong(4) == 2L,
      "a lying data-chunk length must be bounded by the real payload")
    assert(!out(4L).getBoolean(1), "IEEE-float WAV is not PCM-decodable")
    assert(!out(5L).getBoolean(1))
  }

  test("imageDHash + hammingPairs find exact and near-identical images, not distant ones") {
    import spark.implicits._
    def png(px: (Int, Int) => Int): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) {
        val v = px(x, y); b.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png((x, _) => 10 + 10 * x)),
      Multimodal.MediaRow(2L, "image", png((x, _) => 10 + 10 * x)), // identical
      Multimodal.MediaRow(3L, "image", png((_, _) => 128)),         // distant
      Multimodal.MediaRow(4L, "image", png((x, y) =>                // 1 bit off
        if (x == 0 && y == 0) 25 else 10 + 10 * x)),
      Multimodal.MediaRow(5L, "binary", Array[Byte](1, 2, 3)))      // undecodable
    val hashes = Multimodal.imageDHash(rows.toDS())
    assert(hashes.filter(!org.apache.spark.sql.functions.col("decoded")).count() == 1)
    val pairs = graft.api.Dedup.hammingPairs(
        hashes.filter(org.apache.spark.sql.functions.col("decoded")),
        idCol = "media_id", sigCol = "dhash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 4L, 1), (2L, 4L, 1)),
      s"expected exact pair at 0 and near pairs at 1, got $pairs")
  }

  test("audioPcmHash + hammingPairs pair identical and near-identical clips") {
    import spark.implicits._
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def wav(data: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16) ++ "data".getBytes ++ le32(data.length) ++ data
    def ramp(w0: Int) = wav((0 until 65).flatMap(k =>
      Seq.fill(10)(if (k == 0) w0 else (k + 1) * 100)).flatMap(le16).toArray)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", ramp(100)),
      Multimodal.MediaRow(2L, "audio", ramp(100)),   // identical
      Multimodal.MediaRow(3L, "audio", ramp(250)),   // one window edited
      Multimodal.MediaRow(4L, "audio", wav((0 until 650).flatMap(_ => le16(1000)).toArray)),
      Multimodal.MediaRow(5L, "audio", wav(le16(5) ++ le16(6))))  // < 65 frames
    val hashes = Multimodal.audioPcmHash(rows.toDS())
    assert(hashes.filter(!org.apache.spark.sql.functions.col("decoded")).count() == 1,
      "a clip shorter than the window count must be undecoded, not mis-hashed")
    val pairs = graft.api.Dedup.hammingPairs(
        hashes.filter(org.apache.spark.sql.functions.col("decoded")),
        idCol = "media_id", sigCol = "ahash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)),
      s"expected exact pair at 0 and near pairs at 1, got $pairs")
  }

  test("resamplePcm: linear interpolation, same-rate passthrough, 8->16-bit promotion") {
    import spark.implicits._
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def wav(rate: Int, ch: Int, bits: Int, data: Array[Byte]): Array[Byte] = {
      val ba = ch * bits / 8
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
        le32(rate * ba) ++ le16(ba) ++ le16(bits) ++
        "data".getBytes ++ le32(data.length) ++ data
    }
    val original = wav(8000, 1, 16, Seq(1000, 2000, 3000).flatMap(le16).toArray)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", original),
      // 8-bit ramp upsampled 2x: interpolated midpoints are exact
      Multimodal.MediaRow(2L, "audio", wav(4000, 1, 8,
        Array[Byte](192.toByte, 64, 128.toByte, 128.toByte))),
      Multimodal.MediaRow(3L, "binary", Array[Byte](7, 7, 7)))
    val out = Multimodal.resamplePcm(rows.toDS(), targetRate = 8000).collect()
      .map(r => r.media_id -> r).toMap
    // same rate -> byte-identical passthrough, no decode-reencode drift
    assert(java.util.Arrays.equals(out(1L).content, original))
    // non-PCM passthrough
    assert(java.util.Arrays.equals(out(3L).content, Array[Byte](7, 7, 7)))
    // 4 frames @4000 -> 8 frames @8000; [0.5,-0.5,0,0] interpolates to
    // [0.5, 0, -0.5, -0.25, 0, 0, 0, 0] as exact 16-bit values
    val c2 = out(2L).content
    def s16At(off: Int) = (((c2(off) & 0xff) | ((c2(off + 1) & 0xff) << 8)) << 16) >> 16
    val samples = (0 until 8).map(i => s16At(44 + 2 * i))
    assert(samples == Seq(16384, 0, -16384, -8192, 0, 0, 0, 0), s"got $samples")
  }

  test("hostile WAV payloads degrade to decoded=false / passthrough, never throw") {
    import spark.implicits._
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def wav(rate: Int, data: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(rate) ++
        le32(rate * 2) ++ le16(2) ++ le16(16) ++
        "data".getBytes ++ le32(data.length) ++ data
    // chunk len near Int.MaxValue: an Int offset would wrap NEGATIVE
    // and re-enter the walk out of bounds
    val overflowChunk = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0x7FFFFFF0) ++ Array.fill[Byte](32)(3)
    // valid PCM data but a declared rate of 1 Hz: resampling 200k
    // frames to 8 kHz would need a >Int.MaxValue output buffer — must
    // pass through, not throw NegativeArraySizeException / OOM
    val rateOne = wav(1, (0 until 200000).flatMap(_ => le16(1000)).toArray)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", overflowChunk),
      Multimodal.MediaRow(2L, "audio", rateOne),
      Multimodal.MediaRow(3L, "audio", wav(8000, le16(100) ++ le16(200))))
    val stats = Multimodal.audioPcmStats(rows.toDS()).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!stats(1L), "overflowing chunk walk must end the scan, not throw")
    assert(stats(2L) && stats(3L))
    val res = Multimodal.resamplePcm(rows.toDS(), targetRate = 8000).collect()
      .map(r => r.media_id -> r).toMap
    assert(java.util.Arrays.equals(res(1L).content, overflowChunk))
    assert(java.util.Arrays.equals(res(2L).content, rateOne),
      "an absurd declared rate must pass through unchanged, not allocate 8000x")
    assert(Multimodal.audioPcmHash(rows.toDS()).count() == 3L)
  }

  test("sampleGifFrames decodes real animated-GIF frames; stride never loses the count") {
    import spark.implicits._
    def flat(w: Int, h: Int, v: Int) = {
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) b.setRGB(x, y, (v << 16) | (v << 8) | v)
      b
    }
    def gif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(
        new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence(); ios.close(); writer.dispose()
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", gif(Seq(flat(6, 5, 10), flat(6, 5, 20),
        flat(6, 5, 30), flat(6, 5, 40), flat(6, 5, 50)))),
      Multimodal.MediaRow(2L, "binary", Array[Byte](1, 2, 3)))
    // stride 1: every stored frame, exact constant means
    val all = Multimodal.sampleGifFrames(rows.toDS(), stride = 1).collect()
      .filter(_.getBoolean(1)).map(r => (r.getInt(2), r.getDouble(6)))
    assert(all.toSeq.sorted == Seq((0, 10.0), (1, 20.0), (2, 30.0), (3, 40.0), (4, 50.0)))
    // stride 3 keeps frames 0 and 3 but still reports the TOTAL count
    val strided = Multimodal.sampleGifFrames(rows.toDS(), stride = 3).collect()
    val kept = strided.filter(_.getBoolean(1))
      .map(r => (r.getInt(2), r.getInt(3))).sorted
    assert(kept.toSeq == Seq((0, 5), (3, 5)), s"got ${kept.toSeq}")
    // the junk payload is one decoded=false row, never dropped
    val junk = strided.filter(!_.getBoolean(1))
    assert(junk.length == 1 && junk.head.getLong(0) == 2L && junk.head.isNullAt(4))
  }

  test("sampleAviFrames decodes real MJPEG-in-AVI frames; hostile chunks fail soft") {
    import spark.implicits._
    def flat(w: Int, h: Int, v: Int) = {
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) b.setRGB(x, y, (v << 16) | (v << 8) | v)
      b
    }
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ payload)
    def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def avi(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val payload = "AVI ".getBytes("US-ASCII") ++
        list("movi", frames.map(f => chunk("00dc", jpeg(f))).reduce(_ ++ _))
      "RIFF".getBytes("US-ASCII") ++ le32(payload.length) ++ payload
    }
    val clip = avi(Seq(flat(10, 8, 30), flat(10, 8, 120), flat(10, 8, 210),
      flat(10, 8, 60)))
    // hostile: declared movi chunk length near Int.MaxValue — the Long
    // walk must end the scan, not wrap negative and throw
    val hostile = "RIFF".getBytes("US-ASCII") ++ le32(64) ++
      "AVI ".getBytes("US-ASCII") ++ "LIST".getBytes("US-ASCII") ++
      le32(Int.MaxValue - 3) ++ "movi".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++ le32(Int.MaxValue - 16) ++ Array[Byte](1, 2)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", clip),
      Multimodal.MediaRow(2L, "video", hostile),
      Multimodal.MediaRow(3L, "binary", Array[Byte](9, 9, 9))).toDS()
    val all = Multimodal.sampleAviFrames(rows, stride = 1).collect()
    val ok = all.filter(r => r.getLong(0) == 1L && r.getBoolean(1))
      .map(r => (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
        math.round(r.getDouble(6)))).sorted
    assert(ok.toSeq == Seq((0, 4, 10, 8, 30L), (1, 4, 10, 8, 120L),
      (2, 4, 10, 8, 210L), (3, 4, 10, 8, 60L)), s"got ${ok.toSeq}")
    // stride 3: frames 0 and 3 decode, total count stays 4
    val strided = Multimodal.sampleAviFrames(rows, stride = 3).collect()
      .filter(r => r.getLong(0) == 1L).map(r => (r.getInt(2), r.getInt(3))).sorted
    assert(strided.toSeq == Seq((0, 4), (3, 4)))
    // hostile + non-AVI payloads: one decoded=false row each, no throw
    Seq(2L, 3L).foreach { id =>
      val r = all.filter(_.getLong(0) == id)
      assert(r.length == 1 && !r.head.getBoolean(1) && r.head.isNullAt(4),
        s"payload $id must fail soft")
    }
    // deep LIST nesting: thousands of nested headers must hit the
    // depth bound and fail soft, never StackOverflowError
    val depth = 20000
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(12 * depth + 4))
    bos.write("AVI ".getBytes("US-ASCII"))
    (0 until depth).foreach { i =>
      bos.write("LIST".getBytes("US-ASCII"))
      bos.write(le32(12 * (depth - i) - 8))
      bos.write("movi".getBytes("US-ASCII"))
    }
    val nested = Multimodal.sampleAviFrames(
      Seq(Multimodal.MediaRow(9L, "video", bos.toByteArray)).toDS(), 1).collect()
    assert(nested.length == 1 && !nested.head.getBoolean(1),
      "deep nesting must degrade to decoded=false")
  }

  test("binaryFile directory ingest: glob pushdown, kind inference, stable ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft-binspec").toFile
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(new java.io.File(dir, name).toPath, bytes)
    put("x.bmp", "BM".getBytes ++ Array.fill[Byte](24)(1))
    put("y.WAV", "RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](24)(0))
    put("z.mp4", Array.fill[Byte](8)(7))
    put("notes.txt", "hello".getBytes)

    val all = Multimodal.readBinaryDir(spark, dir.getAbsolutePath)
    assert(all.schema("content").dataType.typeName == "binary")
    val kinds = all.collect().map(r => r.getAs[String]("name") -> r.getAs[String]("kind")).toMap
    assert(kinds == Map("x.bmp" -> "image", "y.WAV" -> "audio",
      "z.mp4" -> "video", "notes.txt" -> "binary"))

    // pathGlobFilter prunes at listing time — non-matching files are
    // never opened, so the frame only ever sees the one name
    val only = Multimodal.readBinaryDir(spark, dir.getAbsolutePath, "*.bmp")
    assert(only.select("name").collect().map(_.getString(0)).toSeq == Seq("x.bmp"))

    // ids are a pure function of the path: re-reads key consistently
    val a = all.select("name", "media_id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Multimodal.readBinaryDir(spark, dir.getAbsolutePath)
      .select("name", "media_id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b && a.values.toSet.size == 4)

    // and the Dataset adapter feeds decode directly
    val dec = Multimodal.decode(
      Multimodal.mediaFromBinaryDir(spark, dir.getAbsolutePath, "*.bmp"),
      Multimodal.HeaderCodec).collect()
    assert(dec.length == 1 && dec.head.kind == "image")
  }

  test("frame sampling emits every stride-th chunk per video") {
    val d = Multimodal.decode(media()).filter(_.kind == "video")
    val frames = Multimodal.sampleFrames(d, 2)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = d.collect().map { x =>
      val chunk = math.max(1, x.content.length / x.n_frames)
      val total = (x.content.length + chunk - 1) / chunk
      x.media_id -> ((total + 1) / 2).toLong
    }.toMap
    assert(counts == expected)
  }

  // ---- ImageIoCodec: REAL pixel decode via the JDK's own codecs ----

  private def solidImage(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics(); g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h); g.dispose(); img
  }
  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }
  private def mediaOf(rows: Seq[(Long, String, Array[Byte])]) = {
    import org.apache.spark.sql.functions.col
    val s = spark; import s.implicits._
    rows.toDF("media_id", "kind", "content")
      .as[Multimodal.MediaRow]
  }

  test("ImageIoCodec decodes real PNG/JPEG/GIF/BMP pixels for dimensions") {
    val rows = mediaOf(Seq(
      (1L, "image", encode(solidImage(8, 6, 0x0a141e), "png")),
      (2L, "image", encode(solidImage(16, 12, 0x808080), "jpg")),
      (3L, "image", encode(solidImage(4, 4, 0xff0080), "gif")),
      (4L, "image", encode(solidImage(5, 7, 0xc86432), "bmp"))))
    val dims = Multimodal.decode(rows, Multimodal.ImageIoCodec)
      .collect().map(d => d.media_id -> ((d.width, d.height, d.n_frames))).toMap
    assert(dims(1L) == ((8, 6, 1)) && dims(2L) == ((16, 12, 1)))
    assert(dims(3L) == ((4, 4, 1)) && dims(4L) == ((5, 7, 1)))
  }

  test("ImageIoCodec falls back to the header walk (WAV) and stub (garbage)") {
    def ascii(t: String) = t.getBytes("US-ASCII")
    def le16(v: Int) = Array(v, v >> 8).map(_.toByte)
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    val wav = ascii("RIFF") ++ le32(36 + 400) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 4) ++ le16(4) ++ le16(16) ++ ascii("data") ++ le32(400) ++
      Array.fill[Byte](400)(0)
    val junk = Array.tabulate[Byte](100)(_.toByte)
    assert(Multimodal.ImageIoCodec.decode("audio", wav) == ((44100, 2, 100)))
    assert(Multimodal.ImageIoCodec.decode("image", junk) ==
      Multimodal.FakeCodec.decode("image", junk))
  }

  test("imagePixelStats reads exact means off lossless payloads, nulls off junk") {
    val rows = mediaOf(Seq(
      (1L, "image", encode(solidImage(8, 6, 0x0a141e), "png")),   // (10,20,30)
      (2L, "image", encode(solidImage(4, 4, 0xff0080), "gif")),   // (255,0,128)
      (3L, "image", encode(solidImage(5, 7, 0xc86432), "bmp")),   // (200,100,50)
      (4L, "image", Array.tabulate[Byte](64)(_.toByte))))
    val got = Multimodal.imagePixelStats(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    def rgb(id: Long) = (got(id).getDouble(3), got(id).getDouble(4), got(id).getDouble(5))
    assert(rgb(1L) == ((10.0, 20.0, 30.0)))
    assert(rgb(2L) == ((255.0, 0.0, 128.0)))
    assert(rgb(3L) == ((200.0, 100.0, 50.0)))
    assert(got(4L).isNullAt(3) && got(4L).isNullAt(5), "junk rows keep null stats")
  }

  test("resizeImages scales the longer edge down, never up, and re-encodes decodably") {
    val rows = mediaOf(Seq(
      (1L, "image", encode(solidImage(64, 32, 0x336699), "png")),
      (2L, "image", encode(solidImage(8, 6, 0x336699), "png"))))
    val out = Multimodal.resizeImages(rows, maxEdge = 16)
      .collect().map(d => d.media_id -> d).toMap
    assert((out(1L).width, out(1L).height) == ((16, 8)))
    // the re-encoded payload is a real PNG of the new size
    val back = Multimodal.ImageIoCodec.decodeImage(out(1L).content).get
    assert((back.getWidth, back.getHeight) == ((16, 8)))
    assert((back.getRGB(3, 3) & 0xffffff) == 0x336699, "bilinear of a solid stays solid")
    // smaller than maxEdge: payload passes through untouched
    assert((out(2L).width, out(2L).height) == ((8, 6)))
    assert(out(2L).content.sameElements(encode(solidImage(8, 6, 0x336699), "png")))
  }
}
