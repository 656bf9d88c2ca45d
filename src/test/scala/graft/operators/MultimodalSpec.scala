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

  test("decode parses the synthesized headers to their construction values") {
    import Multimodal._
    val ds = corpus.as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    val decoded = decode(ds).collect().map(d => d.id -> d).toMap
    assert(decoded.size == 4)
    // image id=0: width 16·(1+0%64)=16, height 16·(1+0%37)=16, RGB (even id)
    assert(decoded(0L) == DecodedRow(0L, "image", 33 + 24, 16, 16, 3, 0L))
    // image id=3: width 16·4=64, height 16·4=64, RGBA (odd id)
    assert(decoded(3L) == DecodedRow(3L, "image", 33 + 23, 64, 64, 4, 0L))
    // audio id=1: 2 channels, byteRate 64000, 24 data bytes → 0 ms (floor)
    assert(decoded(1L) == DecodedRow(1L, "audio", 44 + 24, 0, 0, 2, 0L))
    // video id=2: mvhd timescale 1000, duration 24·40
    assert(decoded(2L) == DecodedRow(2L, "video", 52 + 24, 0, 0, 0, 960L))
  }

  test("parseHeader: known-answer fixtures incl. real 1x1 PNG bytes") {
    import Multimodal._
    // the canonical smallest PNG: 1x1 grayscale, as produced by libpng —
    // signature + IHDR(1,1,depth 8,color 0) + IDAT + IEND (CRCs real)
    val realPng = ("89504E470D0A1A0A" + "0000000D49484452" +
      "00000001" + "00000001" + "0800000000" + "3A7E9B55" +
      "0000000A4944415478DA63640000000600023081D02F" +
      "0000000049454E44AE426082")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val png = parseHeader(7L, "image", realPng)
    assert(png == DecodedRow(7L, "image", realPng.length, 1, 1, 1, 0L))

    // hand-built 44-byte WAV header: mono, 8 kHz, 16-bit → byteRate 16000,
    // 4000 data bytes → 250 ms
    def le32h(v: Long) = f"${(v & 0xFF)}%02X${(v >> 8) & 0xFF}%02X" +
      f"${(v >> 16) & 0xFF}%02X${(v >> 24) & 0xFF}%02X"
    val wavHex = "52494646" + le32h(36 + 4000) + "57415645" +
      "666D742010000000" + "0100" + "0100" + le32h(8000) + le32h(16000) +
      "0200" + "1000" + "64617461" + le32h(4000)
    val wav = parseHeader(8L, "audio",
      wavHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    assert(wav.channels == 1 && wav.durationMs == 250L)

    // mp4: ftyp + moov/mvhd, timescale 600, duration 1200 units → 2000 ms
    val mp4Hex = "000000106674797069736F6D00000000" +
      "000000246D6F6F76" + "0000001C6D766864" + "000000000000000000000000" +
      "00000258" + "000004B0"
    val mp4 = parseHeader(9L, "video",
      mp4Hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    assert(mp4.durationMs == 2000L)

    // garbage, truncation, and empties degrade to size-only rows
    assert(parseHeader(1L, "image", Array[Byte](1, 2, 3)) ==
      DecodedRow(1L, "image", 3, 0, 0, 0, 0L))
    assert(parseHeader(2L, "audio", Array.empty[Byte]) ==
      DecodedRow(2L, "audio", 0, 0, 0, 0, 0L))
    val truncatedPng = realPng.take(20) // dies mid-IHDR
    assert(parseHeader(3L, "image", truncatedPng).width == 0)
  }

  test("resize fits within the box preserving aspect ratio") {
    import Multimodal._
    val ds = corpus.as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    val resized = resize(decode(ds), maxW = 32, maxH = 32).collect()
    resized.filter(_.modality == "image").foreach { r =>
      assert(r.width <= 32 && r.height <= 32)
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

  test("parseHeader terminates on malformed chunk/box sizes (no hang)") {
    // WAV whose only chunk declares size 0xFFFFFFF8: truncating that to
    // Int once produced a non-positive advance and an infinite loop
    val wav = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "junk".getBytes("US-ASCII") ++
      Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++
      Array.fill[Byte](32)(7)
    val r1 = Multimodal.parseHeader(1L, "audio", wav)
    assert(r1.channels == 0 && r1.durationMs == 0L) // degraded, not hung
    // MP4 whose top-level box size field truncates to a negative Int
    val mp4 = Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
        0xF0.toByte) ++ "ftyp".getBytes("US-ASCII") ++
      Array.fill[Byte](40)(3)
    val r2 = Multimodal.parseHeader(2L, "video", mp4)
    assert(r2.durationMs == 0L)
    // moov whose child box size truncates negative: inner loop must clamp
    val inner = Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
      0xF0.toByte) ++ "xxxx".getBytes("US-ASCII")
    val moovBody = inner ++ Array.fill[Byte](16)(0)
    val moov = be(8L + 8L + moovBody.length) ++ "moov".getBytes("US-ASCII")
    val mp4b = be(mp4Len(moovBody)) ++ "ftyp".getBytes("US-ASCII") ++
      moov ++ moovBody
    val r3 = Multimodal.parseHeader(3L, "video", mp4b)
    assert(r3.durationMs == 0L)
  }

  test("pixelCorpus round-trips REAL pixels through the ImageIO codec") {
    import Multimodal._
    val ids = Seq((0L, "a"), (5L, "b"), (17L, "c")).toDF("doc_id", "text")
    val decoded = decodeImage(pixelCorpus(ids)).collect()
      .map(p => p.id -> p).toMap
    assert(decoded.size == 3)
    decoded.values.foreach { p =>
      val w = 8 * (1 + (p.id % 16)).toInt
      val h = 8 * (1 + (p.id % 9)).toInt
      assert(p.width == w && p.height == h && p.channels == 3)
      // exact closed-form pixel sum: decode really read the IDAT raster
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        expect += pixelValue(p.id, x, y, c)
      assert(p.pixSum == expect, s"id=${p.id}")
    }
    // the payloads are honest PNGs: a fresh ImageIO read agrees on a pixel
    val payload = pixelCorpus(ids).filter(_.id == 5L).collect().head.payload
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    assert(((img.getRGB(3, 2) >> 16) & 0xFF) == pixelValue(5L, 3, 2, 0))
  }

  test("resizeImage: nearest-neighbor resample of the decoded raster") {
    import Multimodal._
    val ids = Seq((15L, "x")).toDF("doc_id", "text") // 128x56 source
    val corpus15 = pixelCorpus(ids)
    val r = resizeImage(corpus15, maxW = 32, maxH = 32).collect().head
    // fit-within-box, even dims: scale = min(32/128, 32/56) = 0.25 → 32x14
    assert(r.width == 32 && r.height == 14 && r.channels == 3)
    // known answer: nearest-neighbor source pixel (x·128/32, y·56/14)
    var expect = 0L
    for (y <- 0 until 14; x <- 0 until 32; c <- 0 until 3)
      expect += pixelValue(15L, x * 128 / 32, y * 56 / 14, c)
    assert(r.pixSum == expect)
    // never upscales: a box larger than the image leaves dims unchanged
    val same = resizeImage(corpus15, maxW = 512, maxH = 512).collect().head
    assert(same.width == 128 && same.height == 56)
  }

  test("decodeAudio reads REAL PCM samples from the WAV data chunk") {
    import Multimodal._
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    // hand-built mono WAV with 3 known 16-bit LE samples:
    // 1000, -2000, 32767 → sumSq = 1000² + 2000² + 32767² = 1078676289
    def le16(v: Int) = Array(((v & 0xFF)).toByte, (((v >> 8) & 0xFF)).toByte)
    def le32b(v: Long) = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val data = le16(1000) ++ le16(-2000 & 0xFFFF) ++ le16(32767)
    val wav = "RIFF".getBytes("US-ASCII") ++ le32b(36 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32b(16) ++
      le16(1) ++ le16(1) ++ le32b(8000) ++ le32b(16000) ++
      le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32b(data.length) ++ data
    val out = decodeAudio(Seq(MediaRow(1L, "audio", wav)).toDS())
      .collect().head
    assert(out == AudioRow(1L, 1, 3, 1000L * 1000 + 2000L * 2000 +
      32767L * 32767, 32767))
    // the synthetic corpus's audio rows decode their text bytes as PCM
    val audio = corpus.filter(col("modality") === "audio")
      .as[MediaRow]
    val synth = decodeAudio(audio).collect().head
    val textBytes = "wav payload content here".getBytes("UTF-8")
    var expSumSq = 0L; var expPeak = 0
    textBytes.grouped(2).filter(_.length == 2).foreach { pair =>
      var s = (pair(0) & 0xFF) | ((pair(1) & 0xFF) << 8)
      if (s >= 32768) s -= 65536
      expSumSq += s.toLong * s
      expPeak = math.max(expPeak, math.abs(s))
    }
    assert(synth == AudioRow(1L, 2, textBytes.length / 2, expSumSq, expPeak))
    // non-WAV payloads degrade to a zero row
    assert(decodeAudio(Seq(MediaRow(2L, "audio",
      Array[Byte](1, 2, 3))).toDS()).collect().head ==
      AudioRow(2L, 0, 0, 0, 0))
  }

  test("decodeImage degrades undecodable payloads to zero rows") {
    import Multimodal._
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    val junk = Seq(MediaRow(1L, "image", Array[Byte](1, 2, 3)),
      MediaRow(2L, "image", Array.empty[Byte])).toDS()
    assert(decodeImage(junk).collect().toSet ==
      Set(PixelRow(1L, 0, 0, 0, 0L), PixelRow(2L, 0, 0, 0, 0L)))
  }

  test("sampleVideoFrames decodes exactly the sampled frames, for real") {
    import Multimodal._
    val docs = Seq(3L, 10L).toDF("doc_id")
    val vids = videoCorpus(docs, nFrames = 6)
    // stride 1 = every frame; stride 2 = frames 0,2,4 only
    val all = sampleVideoFrames(vids, 1).collect()
    assert(all.map(_.frame_idx).toSet == (0 until 6).toSet)
    val sampled = sampleVideoFrames(vids, 2).collect()
    assert(sampled.map(_.frame_idx).toSet == Set(0, 2, 4))
    // every sampled frame's channel sum equals the closed form — i.e. the
    // codec really decoded the frame written for THAT (id, frame) seed
    sampled.foreach { fr =>
      val id = fr.id
      val (w, h) = (8 * (1 + (id % 8)).toInt, 8 * (1 + (id % 5)).toInt)
      assert(fr.width == w && fr.height == h)
      val seed = id + 1000003L * fr.frame_idx
      var s = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        s += pixelValue(seed, x, y, c)
      assert(fr.channel_sum == s, s"id=$id frame=${fr.frame_idx}")
    }
    // a truncated container stops cleanly at the broken length prefix
    val vid = vids.collect().head
    val cut = MediaRow(vid.id, "video", vid.payload.take(vid.payload.length / 2))
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    val part = sampleVideoFrames(Seq(cut).toDS(), 1).collect()
    assert(part.nonEmpty && part.length < 6)
  }

  private def be(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def mp4Len(body: Array[Byte]): Long = 8L
}
