package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image /
  * audio / video payloads as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * stages. The Spark-side machinery (schema, partitioning, batched
  * per-partition processing, stable output shape) is real and tested;
  * the codec itself is STUBBED with a deterministic fake (this
  * environment ships no image/audio libraries — swap `StubCodec` for a
  * real decoder without touching the plumbing).
  *
  * Scale notes:
  *  - payloads travel as `BinaryType`, never as driver objects;
  *  - per-partition batch processing via `mapPartitions` amortizes codec
  *    setup (a real decoder initializes once per partition, exactly
  *    where a JNI/model handle would live);
  *  - feature vectors come back as fixed-width `Array[Float]`, ready for
  *    the Embeddings ANN family;
  *  - repartition by id range (or bucket) before heavy decode so work
  *    spreads evenly even when payload sizes skew.
  */
object Multimodal {

  /** Typed media row: payload + metadata. */
  case class MediaRow(
      media_id: Long,
      modality: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int, height: Int, // image/video metadata (0 when n/a)
      sample_rate: Int, // audio metadata (0 when n/a)
      n_frames: Int)

  /** Extracted feature row (fixed-width vector + provenance). */
  case class MediaFeature(
      media_id: Long,
      modality: String,
      feature: Array[Float],
      n_bytes: Long)

  val mediaSchema: StructType = Encoders.product[MediaRow].schema

  /** STUB codec — deterministic fakes standing in for a real decoder.
    * A real implementation replaces these bodies; signatures are the
    * contract. */
  object StubCodec {
    /** "Decode" = byte histogram folded to `dim` buckets, L1-normalized.
      * Deterministic, shape-identical to a real embedding extractor. */
    def extractFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      val hist = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) % dim) += 1f
        i += 1
      }
      val total = math.max(payload.length, 1).toFloat
      hist.map(_ / total)
    }

    /** "Resize" = deterministic byte subsample to targetBytes (stride
      * sampling — stands in for pixel resampling). */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] =
      if (payload.length <= targetBytes) payload
      else {
        val out = new Array[Byte](targetBytes)
        val stride = payload.length.toDouble / targetBytes
        var i = 0
        while (i < targetBytes) {
          out(i) = payload((i * stride).toInt)
          i += 1
        }
        out
      }

    /** "Frame sample" = split payload into n_frames equal chunks, keep
      * every `stride`-th chunk (stands in for video frame extraction). */
    def sampleFrames(payload: Array[Byte], nFrames: Int,
                     stride: Int): Seq[(Int, Array[Byte])] = {
      if (nFrames <= 0) return Seq.empty
      val frameLen = math.max(payload.length / nFrames, 1)
      (0 until nFrames by math.max(stride, 1)).map { f =>
        val from = f * frameLen
        val until = math.min(from + frameLen, payload.length)
        (f, payload.slice(from, math.max(from, until)))
      }
    }
  }

  /** REAL codec for the one format that needs no external library:
    * JPEG structural metadata parsed straight from payload bytes —
    * proof that the [[StubCodec]] seam takes a genuine decoder without
    * touching the plumbing. Walks the marker stream (SOI, then
    * length-prefixed segments, skipping 0xFF fill bytes and the
    * standalone RST/TEM markers) to the first start-of-frame (SOF0–15
    * minus DHT/JPG/DAC) and reads the frame header's height, width,
    * and component count. Pure byte arithmetic: no ImageIO, no JNI —
    * and total (malformed/truncated payloads return None, never
    * throw), which is the contract a 100 TB ingest needs from any
    * per-row decoder. */
  object JpegCodec {
    /** (width, height, nComponents) of the first frame, or None if the
      * payload is not a parseable JPEG. */
    def dimensions(payload: Array[Byte]): Option[(Int, Int, Int)] = {
      def u8(i: Int): Int = payload(i) & 0xff
      def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      if (payload.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
      var i = 2
      while (i + 3 < payload.length) {
        // marker alignment: skip fill bytes (spec allows 0xFF padding)
        if (u8(i) != 0xff) return None
        var m = u8(i + 1)
        while (m == 0xff && i + 2 < payload.length) { i += 1; m = u8(i + 1) }
        m match {
          case 0xd8 | 0x01 => i += 2 // SOI / TEM: standalone
          case x if x >= 0xd0 && x <= 0xd7 => i += 2 // RSTn: standalone
          case 0xd9 => return None // EOI before any SOF
          case sof if sof >= 0xc0 && sof <= 0xcf &&
              sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
            // SOFn: [len16, precision8, height16, width16, nComp8]
            if (i + 9 >= payload.length || u16(i + 2) < 8) return None
            val h = u16(i + 5); val w = u16(i + 7)
            return if (w > 0 && h > 0) Some((w, h, u8(i + 9))) else None
          case _ =>
            val len = u16(i + 2)
            if (len < 2) return None
            i += 2 + len
        }
      }
      None
    }
  }

  /** PNG frame-header parse — the second real decoder behind the seam
    * (same contract as [[JpegCodec]]: pure bytes in, Option out, total
    * on malformed input). The 8-byte signature must be followed by a
    * 13-byte IHDR chunk; channels derive from the color type. */
  object PngCodec {
    private val Sig = Array(0x89, 0x50, 0x4e, 0x47,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** (width, height, nChannels), or None if not a parseable PNG. */
    def dimensions(payload: Array[Byte]): Option[(Int, Int, Int)] = {
      def u8(i: Int): Int = payload(i) & 0xff
      def u32(i: Int): Long =
        (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      if (payload.length < 33) return None
      if (!payload.take(8).sameElements(Sig)) return None
      // IHDR must be the first chunk: length 13, type "IHDR"
      if (u32(8) != 13L) return None
      if (!(u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' &&
        u8(15) == 'R')) return None
      val w = u32(16); val h = u32(20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
        return None
      val channels = u8(25) match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return None
      }
      Some((w.toInt, h.toInt, channels))
    }
  }

  /** Image-metadata probe — the REAL decode stage behind the seam: for
    * image rows whose payload parses as JPEG or PNG, the width /
    * height come from the actual frame header (`codec` = "jpeg" /
    * "png"); anything else keeps its carried metadata (`codec` null).
    * Same per-partition execution shape as [[extractFeatures]] — a
    * pure projection, no shuffle, payloads never leave the
    * executors. */
  def probeImageMeta(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val parsed: Option[(String, (Int, Int, Int))] =
          if (r.modality != "image") None
          else JpegCodec.dimensions(r.payload).map("jpeg" -> _)
            .orElse(PngCodec.dimensions(r.payload).map("png" -> _))
        val dims = parsed.map(_._2)
        (r.media_id, r.modality,
          dims.map(_._1).getOrElse(r.width),
          dims.map(_._2).getOrElse(r.height),
          dims.map(_._3).getOrElse(0),
          parsed.map(_._1), r.payload.length.toLong)
      }
    }.toDF("media_id", "modality", "width", "height", "n_components",
      "codec", "n_bytes")
  }

  /** Decode + feature-extract over partitions: codec state initializes
    * once per partition (the expensive part with a real codec), rows
    * stream through in batches. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: initialize decoder/model handle HERE, once
      rows.map { r =>
        MediaFeature(r.media_id, r.modality,
          StubCodec.extractFeatures(r.payload, dim),
          r.payload.length.toLong)
      }
    }
  }

  /** Resize stage — binary in, binary out, metadata updated. */
  def resizeAll(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      r.copy(payload = StubCodec.resize(r.payload, targetBytes),
        width = math.min(r.width, targetBytes), height = r.height)
    }
  }

  /** Frame sampling — one row per kept frame (flatMap: row explosion
    * happens on executors, payload chunks never hit the driver). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      StubCodec.sampleFrames(r.payload, math.max(r.n_frames, 1), stride)
        .map { case (f, chunk) => (r.media_id, r.modality, f, chunk, chunk.length) }
    }.toDF("media_id", "modality", "frame_idx", "frame_payload", "frame_bytes")
  }

  /** Build a media table from any (id, string) source — used to fabricate
    * deterministic binary payloads from the documents table in tests and
    * queries (payload = utf-8 bytes standing in for encoded media). */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               modality: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).map { r =>
      val bytes = r.getString(1).getBytes("UTF-8")
      MediaRow(r.getLong(0), modality, bytes,
        width = bytes.length, height = 1, sample_rate = 0,
        n_frames = math.max(bytes.length / 16, 1))
    }
  }
}
