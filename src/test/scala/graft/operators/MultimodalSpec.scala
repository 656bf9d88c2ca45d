package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "png payload content here"),
    (1L, "wav payload content here"),
    (2L, "mp4 payload content here"),
    (3L, "another png image bytes")
  ).toDF("doc_id", "text")

  private lazy val corpus = Multimodal.syntheticCorpus(docs)

  test("syntheticCorpus: binary payloads with per-modality magic headers") {
    val rows = corpus.collect()
    assert(rows.length == 4)
    val byId = rows.map(r => r.getLong(0) ->
      ((r.getString(1), r.getAs[Array[Byte]](2)))).toMap
    assert(byId(0L)._1 == "image" && byId(1L)._1 == "audio" &&
      byId(2L)._1 == "video")
    assert(byId(0L)._2.take(4).map(_ & 0xFF).toSeq == Seq(0x89, 0x50, 0x4E, 0x47))
    assert(corpus.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }

  test("withMeta sniffs content type and sizes without decoding") {
    val meta = Multimodal.withMeta(corpus).select("id", "meta.*").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(meta(0L)._2 == "image/png")
    assert(meta(1L)._2 == "audio/wav")
    assert(meta.values.forall(_._1 > 8)) // header + text bytes
  }

  test("decodeStub: typed mapPartitions pipeline with per-modality features") {
    import Multimodal._
    val ds = corpus.as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    val decoded = decodeStub(ds).collect().map(d => d.id -> d).toMap
    assert(decoded.size == 4)
    val img = decoded(0L)
    assert(img.width >= 16 && img.height >= 16 && img.channels == 3)
    val aud = decoded(1L)
    assert(aud.channels >= 1 && aud.durationMs > 0 && aud.width == 0)
    // deterministic: same input → same features
    val again = decodeStub(ds).collect().map(d => d.id -> d).toMap
    assert(again == decoded)
  }

  test("resizeStub fits within the box preserving aspect ratio") {
    import Multimodal._
    val ds = corpus.as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    val resized = resizeStub(decodeStub(ds), maxW = 64, maxH = 64).collect()
    resized.filter(_.modality == "image").foreach { r =>
      assert(r.width <= 64 && r.height <= 64)
      assert(r.width % 2 == 0 && r.height % 2 == 0)
    }
    // audio rows (width 0) pass through untouched
    assert(resized.filter(_.modality == "audio").forall(_.width == 0))
  }

  test("sampleFrames: n evenly spaced fixed-width chunks per payload") {
    val frames = Multimodal.sampleFrames(corpus, nFrames = 4, frameBytes = 8)
      .collect()
    assert(frames.length == 16)
    val perId = frames.groupBy(_.getLong(0))
    assert(perId.values.forall(_.length == 4))
    perId.values.foreach { fs =>
      assert(fs.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2, 3))
      assert(fs.forall(_.getAs[Array[Byte]](2).length <= 8))
    }
    // first frame starts at the magic header
    val f0 = frames.filter(r => r.getLong(0) == 0L && r.getInt(1) == 0).head
    assert(f0.getAs[Array[Byte]](2).take(4).map(_ & 0xFF).toSeq ==
      Seq(0x89, 0x50, 0x4E, 0x47))
  }
}
