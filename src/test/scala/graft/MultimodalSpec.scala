package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRow
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromText(
    Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text", "image")

  test("binary payload schema round-trips through the typed Dataset") {
    val m = media
    assert(m.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val r = m.orderBy("media_id").head()
    assert(r.payload.nonEmpty && r.width == r.payload.length)
  }

  test("feature extraction: fixed-width L1-normalized vectors, deterministic") {
    val f1 = Multimodal.extractFeatures(media, 16).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media, 16).orderBy("media_id").collect()
    assert(f1.forall(_.feature.length == 16))
    f1.foreach(r => assert(math.abs(r.feature.sum - 1.0f) < 1e-3))
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
  }

  test("features feed the ANN family (cosine over extracted vectors)") {
    val f = Multimodal.extractFeatures(media, 16)
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val out = graft.ops.Embeddings.bruteForceTopK(
      f, f.filter(col("vec_id") < 2), "vec_id", "embedding", 3).collect()
    assert(out.length == 6) // 2 probes × top-3
    assert(out.forall(r => r.getAs[Double]("cosine") >= -1.0 &&
      r.getAs[Double]("cosine") <= 1.0 + 1e-9))
  }

  test("resize bounds payload and preserves determinism") {
    val r = Multimodal.resizeAll(media, 32).collect()
    assert(r.forall(_.payload.length <= 32))
  }

  test("frame sampling explodes to frames with stride, executor-side") {
    val frames = Multimodal.sampleFrames(media, stride = 2)
    val n = frames.count()
    assert(n > 0)
    val byDoc = frames.groupBy("media_id").count().collect()
    byDoc.foreach(r => assert(r.getAs[Long]("count") >= 1L))
    // stride-2 keeps every other frame index
    val idx = frames.select("frame_idx").distinct().as[Int].collect()
    assert(idx.forall(_ % 2 == 0))
  }

  // hand-assembled minimal JPEG: SOI, APP0/JFIF, a fill byte before the
  // SOF marker (spec-legal 0xFF padding), SOF0 with height=7 width=5
  // and 3 components, EOI — a REAL bitstream header, no image library
  private def tinyJpeg(sof: Int = 0xc0, h: Int = 7, w: Int = 5): Array[Byte] = {
    val app0 = Array(0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00,
      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00)
    val sofSeg = Array(0xff, 0xff, sof, 0x00, 0x11, 0x08, // fill + marker
      (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff, 0x03,
      0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    (Array(0xff, 0xd8) ++ app0 ++ sofSeg ++ Array(0xff, 0xd9))
      .map(_.toByte)
  }

  test("JpegCodec parses real SOF headers; malformed payloads return None") {
    import Multimodal.JpegCodec
    assert(JpegCodec.dimensions(tinyJpeg()) == Some((5, 7, 3)))
    // progressive (SOF2) and large dimensions
    assert(JpegCodec.dimensions(tinyJpeg(sof = 0xc2, h = 1080, w = 1920))
      == Some((1920, 1080, 3)))
    // not a JPEG / truncated mid-segment / empty: total, never throws
    assert(JpegCodec.dimensions("plain text".getBytes("UTF-8")).isEmpty)
    assert(JpegCodec.dimensions(tinyJpeg().take(8)).isEmpty)
    assert(JpegCodec.dimensions(Array.empty[Byte]).isEmpty)
    // EOI before any SOF (no frame header present)
    assert(JpegCodec.dimensions(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
  }

  /** Hand-assembled minimal PNG: signature + IHDR(w, h, colorType). */
  private def tinyPng(w: Int = 11, h: Int = 13,
                      colorType: Int = 6): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    def be32(v: Int) =
      Array(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
    (sig ++ be32(13) ++ "IHDR".getBytes("US-ASCII").map(_.toInt) ++
      be32(w) ++ be32(h) ++ Array(8, colorType, 0, 0, 0) ++
      be32(0) /* crc, unchecked */).map(_.toByte)
  }

  test("PngCodec.dimensions: signature + IHDR parse, channel mapping, " +
    "total on malformed input") {
    assert(Multimodal.PngCodec.dimensions(tinyPng()) == Some((11, 13, 4)))
    assert(Multimodal.PngCodec.dimensions(tinyPng(colorType = 2))
      == Some((11, 13, 3)))
    assert(Multimodal.PngCodec.dimensions(tinyPng(colorType = 0))
      == Some((11, 13, 1)))
    assert(Multimodal.PngCodec.dimensions(tinyPng().take(20)).isEmpty)
    assert(Multimodal.PngCodec
      .dimensions("not a png at all padding".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.PngCodec.dimensions(Array.empty[Byte]).isEmpty)
    // a JPEG is not a PNG and vice versa
    assert(Multimodal.PngCodec.dimensions(tinyJpeg()).isEmpty)
    assert(Multimodal.JpegCodec.dimensions(tinyPng()).isEmpty)
  }

  test("probeImageMeta: real JPEG/PNG payloads get parsed dimensions, " +
    "others keep carried metadata") {
    val rows = Seq(
      MediaRow(1L, "image", tinyJpeg(), width = 999, height = 999,
        sample_rate = 0, n_frames = 1),
      MediaRow(2L, "image", "not an image".getBytes("UTF-8"),
        width = 12, height = 1, sample_rate = 0, n_frames = 1),
      MediaRow(3L, "video", tinyJpeg(), width = 30, height = 40,
        sample_rate = 0, n_frames = 9),
      MediaRow(4L, "image", tinyPng(), width = 999, height = 999,
        sample_rate = 0, n_frames = 1)).toDS()
    val out = Multimodal.probeImageMeta(rows).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), Option(r.getString(5)))))
      .toMap
    assert(out(1L) == ((5, 7, Some("jpeg")))) // parsed from the bitstream
    assert(out(2L) == ((12, 1, None)))        // carried metadata kept
    assert(out(3L) == ((30, 40, None)))       // non-image untouched
    assert(out(4L) == ((11, 13, Some("png"))))
  }

  test("WavCodec: wrap/info round trip, word-aligned extra chunks, " +
    "total on malformed and truncated input") {
    val data = Array.tabulate(200)(_.toByte)
    val wav = Multimodal.WavCodec.wrap(data, sampleRate = 44100,
      channels = 2, bits = 16)
    assert(Multimodal.WavCodec.info(wav) == Some((44100, 2, 16, 50L)))
    // mono 8-bit: one sample per byte
    assert(Multimodal.WavCodec.info(
      Multimodal.WavCodec.wrap(data, 8000, 1, 8)) == Some((8000, 1, 8, 200L)))
    // an extra ODD-length chunk before fmt must be word-aligned over
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3)
    val padded = wav.take(12) ++ extra ++ Array[Byte](0) ++ wav.drop(12)
    assert(Multimodal.WavCodec.info(padded) == Some((44100, 2, 16, 50L)))
    assert(Multimodal.WavCodec.info(wav.take(30)).isEmpty) // truncated
    assert(Multimodal.WavCodec.info("RIFFnot a wave".getBytes).isEmpty)
    assert(Multimodal.WavCodec.info(Array.empty[Byte]).isEmpty)
    // crafted chunk size near Int.MaxValue: an Int cursor would
    // overflow negative (loop guard stays true, u8 throws); the Long
    // cursor must walk past the end and return None, never throw
    val evil = wav.take(12) ++ "LIST".getBytes("US-ASCII") ++
      Array[Byte](-9, -1, -1, 0x7f) ++ // le32 = 0x7FFFFFF7
      wav.drop(12)
    assert(Multimodal.WavCodec.info(evil).isEmpty)
    // same, with the declared size exactly Int.MaxValue (odd → +1 pad)
    val evil2 = wav.take(12) ++ "LIST".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, 0x7f) ++ wav.drop(12)
    assert(Multimodal.WavCodec.info(evil2).isEmpty)
  }

  /** Hand-built fLaC magic + STREAMINFO: 22050 Hz, 2 ch, 16 bps,
    * 123456 samples (the packed 8-byte tail, big-endian). */
  private def tinyFlac(): Array[Byte] = {
    val head = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 34) // block header: type 0, length 34
    val si = new Array[Byte](34)
    // min/max blocksize + min/max framesize: 10 bytes, don't care
    // sample rate 22050 = 0x05622 in 20 bits; ch-1 = 1; bps-1 = 15
    si(10) = ((22050 >> 12) & 0xff).toByte          // rate[19:12]
    si(11) = ((22050 >> 4) & 0xff).toByte           // rate[11:4]
    si(12) = (((22050 & 0xf) << 4) | (1 << 1) | (15 >> 4)).toByte
    si(13) = (((15 & 0xf) << 4) | ((123456L >> 32) & 0xf)).toByte
    si(14) = ((123456L >> 24) & 0xff).toByte
    si(15) = ((123456L >> 16) & 0xff).toByte
    si(16) = ((123456L >> 8) & 0xff).toByte
    si(17) = (123456L & 0xff).toByte
    head ++ si
  }

  test("FlacCodec: STREAMINFO field unpacking; total on malformed " +
    "input; WAV and FLAC don't cross-parse") {
    assert(Multimodal.FlacCodec.info(tinyFlac())
      == Some((22050, 2, 16, 123456L)))
    assert(Multimodal.FlacCodec.info(tinyFlac().take(20)).isEmpty)
    assert(Multimodal.FlacCodec.info("fLaCxxxx".getBytes).isEmpty)
    assert(Multimodal.FlacCodec.info(Array.empty[Byte]).isEmpty)
    val wav = Multimodal.WavCodec.wrap(Array[Byte](1, 2, 3, 4), 8000, 1, 8)
    assert(Multimodal.FlacCodec.info(wav).isEmpty)
    assert(Multimodal.WavCodec.info(tinyFlac()).isEmpty)
  }

  test("probeAudioMeta: WAV and FLAC payloads get parsed stream " +
    "params, others keep carried metadata, non-audio untouched") {
    val rows = Seq(
      MediaRow(1L, "audio",
        Multimodal.WavCodec.wrap(new Array[Byte](400), 16000, 2, 16),
        width = 0, height = 0, sample_rate = 999, n_frames = 0),
      MediaRow(2L, "audio", tinyFlac(),
        width = 0, height = 0, sample_rate = 999, n_frames = 0),
      MediaRow(3L, "audio", "just bytes".getBytes("UTF-8"),
        width = 0, height = 0, sample_rate = 999, n_frames = 0),
      MediaRow(4L, "image",
        Multimodal.WavCodec.wrap(new Array[Byte](4), 8000, 1, 8),
        width = 5, height = 5, sample_rate = 0, n_frames = 1)).toDS()
    val out = Multimodal.probeAudioMeta(rows).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getInt(4),
        r.getLong(5), Option(r.getString(6)))))
      .toMap
    assert(out(1L) == ((16000, 2, 16, 100L, Some("wav"))))
    assert(out(2L) == ((22050, 2, 16, 123456L, Some("flac"))))
    assert(out(3L) == ((999, 0, 0, 0L, None))) // carried rate kept
    assert(out(4L) == ((0, 0, 0, 0L, None)))   // non-audio untouched
  }
}
