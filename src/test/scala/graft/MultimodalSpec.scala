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
}
