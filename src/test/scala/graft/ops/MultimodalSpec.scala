package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text")

  test("media wrapping: utf-8 payload with typed metadata columns") {
    val m = Multimodal.documentsAsMedia(docs)
    assert(m.schema("media").dataType.typeName == "binary")
    val out = Multimodal.mediaMeta(m)
      .as[(Long, Int, String, String, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 11)
    assert(out(1L)._3 == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(out(1L)._4 == "68656C6C6F20776F".toUpperCase) // "hello wo" hex
    assert(out(2L)._2 == 1)
  }

  test("fake features are deterministic and normalized to [0,1]") {
    val f1 = Multimodal.fakeFeatures(Multimodal.documentsAsMedia(docs))
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    val f2 = Multimodal.fakeFeatures(Multimodal.documentsAsMedia(docs))
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(f1.toSeq == f2.toSeq)
    f1.foreach { r =>
      Seq(r._2, r._3, r._4, r._5).foreach(v => assert(v >= 0.0 && v <= 1.0))
    }
  }

  test("decode stub: partition-wise batch path with declared schema") {
    val out = Multimodal.decodeFeatures(spark,
      Multimodal.documentsAsMedia(docs)).collect()
    assert(out.length == 2)
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getInt(1) >= 1) // n_frames
    val feat = r1.getSeq[Float](2)
    assert(feat.length == 4 && feat.forall(f => f >= 0f && f <= 1f))
    // deterministic: same payload -> same features
    val again = Multimodal.decodeFeatures(spark,
      Multimodal.documentsAsMedia(docs)).collect()
      .find(_.getLong(0) == 1L).get.getSeq[Float](2)
    assert(again == feat)
  }

  test("decoder handles null/empty payloads without failing the batch") {
    val d = new MediaDecoder
    assert(d.decode(null) == ((0, Seq(0f, 0f, 0f, 0f))))
    assert(d.decode(Array.emptyByteArray)._1 == 0)
  }

  // ---- real image-header parsing ------------------------------------

  private def bytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("png header: big-endian dims out of the IHDR chunk") {
    // 640 x 480: 00000280 x 000001E0
    val png = bytes("89504E470D0A1A0A0000000D49484452" +
      "0000028000000" + "1E0" + "0806000000")
    assert(ImageHeaders.parse(png) == (("png", Some(640), Some(480))))
  }

  test("gif header: little-endian uint16 dims") {
    // 320 x 200: 4001 C800 (LE)
    val gif = bytes("474946383961" + "4001" + "C800" + "00")
    assert(ImageHeaders.parse(gif) == (("gif", Some(320), Some(200))))
  }

  test("bmp header: little-endian int32 dims; top-down (negative) height") {
    val pad = "00" * 16
    val bmp = bytes("424D" + pad + "80020000" + "E0010000")
    assert(ImageHeaders.parse(bmp) == (("bmp", Some(640), Some(480))))
    // top-down DIBs store height negative; parser reports magnitude
    val topDown = bytes("424D" + pad + "80020000" + "20FEFFFF") // -480
    assert(ImageHeaders.parse(topDown) == (("bmp", Some(640), Some(480))))
  }

  test("jpeg: SOF0 found behind APP0 and DQT segments") {
    val app0 = "FFE000104A46494600010100000100010000"
    val dqt = "FFDB0005" + "000102" // 5-byte segment, arbitrary payload
    val sof0 = "FFC0001108" + "01E0" + "0280" + "03011100021101031101"
    val jpg = bytes("FFD8" + app0 + dqt + sof0 + "FFD9")
    assert(ImageHeaders.parse(jpg) == (("jpeg", Some(640), Some(480))))
  }

  test("jpeg progressive (SOF2) parses; C4/C8/CC are not frame headers") {
    val sof2 = "FFC2001108" + "0100" + "0200" + "03011100021101031101"
    val huff = "FFC40005" + "000000" // DHT must be skipped, not parsed
    assert(ImageHeaders.parse(bytes("FFD8" + huff + sof2)) ==
      (("jpeg", Some(512), Some(256))))
  }

  test("garbage, truncated and null payloads parse as unknown") {
    assert(ImageHeaders.parse(null) == (("unknown", None, None)))
    assert(ImageHeaders.parse(bytes("89504E47")) == (("unknown", None, None)))
    assert(ImageHeaders.parse("not an image at all".getBytes) ==
      (("unknown", None, None)))
    // JPEG magic but no SOF before EOI: format known, dims unknown
    assert(ImageHeaders.parse(bytes("FFD8FFD9")) == (("jpeg", None, None)))
  }

  test("imageMeta: mapPartitions decode over a mixed-format relation") {
    val rows = Seq(
      (1L, bytes("89504E470D0A1A0A0000000D49484452" +
        "00000280000001E0" + "0806000000")),
      (2L, bytes("474946383961" + "4001" + "C800" + "00")),
      (3L, "plain text".getBytes))
      .toDF("media_id", "media")
    val out = Multimodal.imageMeta(rows).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) == (("png", Some(640), Some(480))))
    assert(out(2L) == (("gif", Some(320), Some(200))))
    assert(out(3L) == (("unknown", None, None)))
  }

  // ---- audio/video container header parsing -------------------------

  import MediaHeaders.Header

  // full WAV: 2ch 16-bit 8 kHz, data chunk declares 32000 bytes (1 s)
  // but the payload tail is truncated — the crawl-file case
  private val wavHex = "52494646" + "247D0000" + "57415645" +
    "666D7420" + "10000000" + "0100" + "0200" + "401F0000" +
    "007D0000" + "0400" + "1000" + "64617461" + "007D0000"

  test("wav: fmt chunk audio parameters + data-size duration") {
    assert(MediaHeaders.parse(bytes(wavHex)) ==
      Header("wav", channels = Some(2), sampleRate = Some(8000),
        durationMs = Some(1000L)))
  }

  test("wav: an unknown chunk before fmt is skipped by declared size") {
    // LIST chunk (6 bytes, odd -> padded to 8 with the word-align byte)
    val withList = "52494646" + "247D0000" + "57415645" +
      "4C495354" + "05000000" + "0102030405" + "00" +
      wavHex.substring(24)
    assert(MediaHeaders.parse(bytes(withList)) ==
      Header("wav", channels = Some(2), sampleRate = Some(8000),
        durationMs = Some(1000L)))
  }

  test("wav: fmt without data gives parameters but no duration") {
    val noData = wavHex.substring(0, wavHex.length - 16)
    assert(MediaHeaders.parse(bytes(noData)) ==
      Header("wav", channels = Some(2), sampleRate = Some(8000)))
  }

  // 9 x BE32 fixed-point: 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
  // 0x40000000 (the spec's unity transform)
  private val unityMatrix = "00010000" + "00000000" + "00000000" +
    "00000000" + "00010000" + "00000000" + "00000000" + "00000000" +
    "40000000"
  private def mvhdHex(timescale: String, dur: String) =
    "0000006C6D766864" + "00000000" + "00000000" + "00000000" +
      timescale + dur + "00010000" + "0100" + "00" * 10 + unityMatrix +
      "00" * 24 + "00000002"
  private def tkhdHex(w: Int, h: Int) =
    "0000005C746B6864" + "00000007" + "00000000" + "00000000" +
      "00000001" + "00000000" + "00000BB8" + "00" * 8 +
      "0000" * 4 + unityMatrix +
      f"$w%04X" + "0000" + f"$h%04X" + "0000"

  test("mp4: mvhd timescale duration + first tkhd 16.16 dimensions") {
    // timescale 1000, duration 3000 units -> 3000 ms; 640 x 480
    val mp4 = "0000001466747970" + "69736F6D" + "00000200" + "69736F6D" +
      "000000D86D6F6F76" + mvhdHex("000003E8", "00000BB8") +
      "000000647472616B" + tkhdHex(640, 480)
    assert(MediaHeaders.parse(bytes(mp4)) ==
      Header("mp4", width = Some(640), height = Some(480),
        durationMs = Some(3000L)))
  }

  test("mp4 audio-only: moov with mvhd only — duration, null dims") {
    // classic timescale 600, 1800 units -> 3000 ms
    val m4a = "0000001466747970" + "4D344120" + "00000200" + "4D344120" +
      "000000746D6F6F76" + mvhdHex("00000258", "00000708")
    assert(MediaHeaders.parse(bytes(m4a)) ==
      Header("mp4", durationMs = Some(3000L)))
  }

  test("mp4: 64-bit box size (size field = 1) stops the walk, no crash") {
    val weird = "0000001466747970" + "69736F6D" + "00000200" + "69736F6D" +
      "000000016D6F6F76" + "0000000000000020" // size=1 + largesize
    assert(MediaHeaders.parse(bytes(weird)) == Header("mp4"))
  }

  test("corrupt near-2^32 chunk/box sizes terminate the walks (no overflow loop)") {
    // WAV whose fmt chunk declares size 0xFFFFFFF8: a 32-bit walk adds
    // a wrapped negative and loops forever; the Long walk must stop
    val evilWav = "52494646" + "24000000" + "57415645" +
      "666D7420" + "F8FFFFFF" + "0100" + "0200"
    assert(MediaHeaders.parse(bytes(evilWav)).format == "wav")
    // MP4 whose moov declares a ~4 GB size
    val evilMp4 = "0000001466747970" + "69736F6D" + "00000200" + "69736F6D" +
      "FFFFFFF86D6F6F76"
    assert(MediaHeaders.parse(bytes(evilMp4)) == Header("mp4"))
  }

  test("mediaHeaders dispatch: images delegate, junk stays unknown") {
    assert(MediaHeaders.parse(bytes("474946383961" + "4001" + "C800" + "00"))
      == Header("gif", width = Some(320), height = Some(200)))
    assert(MediaHeaders.parse("zz not a container".getBytes)
      == Header("unknown"))
    assert(MediaHeaders.parse(null) == Header("unknown"))
  }

  test("mediaHeaders: mapPartitions batch over a mixed relation") {
    val rows = Seq(
      (1L, bytes(wavHex)),
      (2L, bytes("89504E470D0A1A0A0000000D49484452" +
        "00000280000001E0" + "0806000000")),
      (3L, "plain text".getBytes))
      .toDF("media_id", "media")
    val out = Multimodal.mediaHeaders(rows).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "wav", 2L -> "png", 3L -> "unknown"))
  }

  test("nearDupPairs: label-blocked cosine pairs carry both media digests") {
    val media = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("media_id", "text")
      .select($"media_id", org.apache.spark.sql.functions.encode($"text", "UTF-8").as("media"))
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), "a"), (2L, Seq(1.0f, 0.05f), "a"),
      (3L, Seq(-1.0f, 0.0f), "b")) // other label: never paired
      .toDF("vec_id", "embedding", "label")
    val out = Multimodal.nearDupPairs(media, emb, threshold = 0.9)
      .as[(Long, Long, Double, String, String)].collect()
    assert(out.length == 1)
    val p = out.head
    assert((p._1, p._2) == ((1L, 2L)) && p._3 > 0.99)
    assert(p._4 == "2c1743a391305fbf367df8e4f069f9f9") // md5("alpha")
    assert(p._5 == "987bcab01b929eb2c07877b224215c92") // md5("beta")
  }

  test("nearDupPairs: a degenerate label bucket is capped, not quadratic") {
    // 6 identical vectors under one flooded label + a cool pair under
    // another; cap=4 drops the flooded bucket loudly and keeps the pair
    val media = (1L to 8L).map(i => (i, s"doc$i")).toDF("media_id", "text")
      .select($"media_id",
        org.apache.spark.sql.functions.encode($"text", "UTF-8").as("media"))
    val emb = ((1L to 6L).map(i => (i, Seq(1.0f, 0.0f), "flood")) ++
      Seq((7L, Seq(0.0f, 1.0f), "cool"), (8L, Seq(0.0f, 1.0f), "cool")))
      .toDF("vec_id", "embedding", "label")
    val out = Multimodal.nearDupPairs(media, emb, threshold = 0.9,
      maxBucketSize = 4)
      .as[(Long, Long, Double, String, String)].collect()
    assert(out.map(p => (p._1, p._2)).toSet == Set((7L, 8L)))
  }

  test("interleavedPack: combined token+patch budget, text-only docs pack too") {
    import org.apache.spark.sql.functions.{col, encode, lit}
    val docs = Seq(
      (1L, "a b c d"),          // 4 tokens, media: 600 bytes -> 3 patches
      (2L, "e f"),              // 2 tokens, no media -> text-only
      (3L, "g h i"))            // 3 tokens, media: 100 bytes -> 1 patch
      .toDF("doc_id", "text")
    val media = Seq((1L, "x" * 600), (3L, "y" * 100))
      .toDF("media_id", "t")
      .select(col("media_id"), encode(col("t"), "UTF-8").as("media"))
    // one shard so the running total is a single deterministic sequence
    val out = Multimodal.interleavedPack(docs, media, nShards = 1,
        capacity = 8, patchBytes = 256)
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_patches"),
        col("cost"), col("cum_before"), col("bin"))
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 3L, 7L, 0L, "0:0"),   // cum 0  -> bin 0
      (2L, 2L, 0L, 2L, 7L, "0:0"),   // cum 7  -> bin 0 (crosses the line)
      (3L, 3L, 1L, 4L, 9L, "0:1")))  // cum 9  -> bin 1
    // media bytes reduce map-side: the packed relation carries no
    // binary column anywhere in its schema
    val packed = Multimodal.interleavedPack(docs, media, 1, 8)
    assert(!packed.schema.exists(_.dataType ==
      org.apache.spark.sql.types.BinaryType))
  }
}
