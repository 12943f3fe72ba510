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
}
