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

  /** WAV (RIFF) header parse — the first AUDIO decoder behind the seam
    * (same contract as [[JpegCodec]]/[[PngCodec]]: pure bytes in,
    * Option out, total on malformed/truncated input). Walks the RIFF
    * chunk list to `fmt ` for the stream parameters and to `data` for
    * the payload size; sample count = data bytes / block align. */
  object WavCodec {
    private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xff
    private def le16(p: Array[Byte], i: Int): Int =
      u8(p, i) | (u8(p, i + 1) << 8)
    private def le32(p: Array[Byte], i: Int): Long =
      u8(p, i).toLong | (u8(p, i + 1).toLong << 8) |
        (u8(p, i + 2).toLong << 16) | (u8(p, i + 3).toLong << 24)
    private def tag(p: Array[Byte], i: Int, t: String): Boolean =
      p.length >= i + 4 && (0 until 4).forall(j => u8(p, i + j) == t(j))

    /** (sampleRate, nChannels, bitsPerSample, nSamples), or None if
      * the payload is not a parseable WAV. */
    def info(payload: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (payload.length < 44) return None
      if (!tag(payload, 0, "RIFF") || !tag(payload, 8, "WAVE")) return None
      // Cursor is a Long: a crafted chunk `size` near Int.MaxValue
      // would overflow an Int cursor to negative, keep the loop guard
      // true, and crash u8 on a negative index — the total-function
      // contract demands None on such payloads, never a throw.
      var i = 12L
      var fmt: Option[(Int, Int, Int, Int)] = None // rate, ch, bits, align
      var dataBytes = -1L
      while (i + 8 <= payload.length && (fmt.isEmpty || dataBytes < 0)) {
        val c = i.toInt // safe: i + 8 <= payload.length <= Int.MaxValue
        val size = le32(payload, c + 4)
        if (size < 0 || size > Int.MaxValue) return None
        if (tag(payload, c, "fmt ")) {
          if (size < 16 || c + 8 + 16 > payload.length) return None
          val ch = le16(payload, c + 10)
          val rate = le32(payload, c + 12)
          val align = le16(payload, c + 20)
          val bits = le16(payload, c + 22)
          if (ch < 1 || rate < 1 || rate > Int.MaxValue || bits < 1 ||
            align < 1) return None
          fmt = Some((rate.toInt, ch, bits, align))
        } else if (tag(payload, c, "data")) {
          dataBytes = math.min(size, (payload.length - c - 8).toLong)
        }
        i += 8L + size + (size & 1L) // chunks are word-aligned
      }
      fmt.map { case (rate, ch, bits, align) =>
        (rate, ch, bits, if (dataBytes < 0) 0L else dataBytes / align)
      }
    }

    /** Encode `data` as a canonical PCM WAV (RIFF + fmt + data) — the
      * writer half of the round trip the audio oracle checks: the
      * parser must read back exactly what this encodes. */
    def wrap(data: Array[Byte], sampleRate: Int, channels: Int,
             bits: Int): Array[Byte] = {
      require(sampleRate > 0 && channels > 0 && bits > 0 && bits % 8 == 0)
      val align = channels * bits / 8
      val out = java.nio.ByteBuffer
        .allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort) // PCM
        .putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * align).putShort(align.toShort)
        .putShort(bits.toShort)
        .put("data".getBytes("US-ASCII")).putInt(data.length)
        .put(data)
      out.array()
    }
  }

  /** FLAC STREAMINFO parse — the second audio decoder (lossless
    * sibling of [[WavCodec]], same total-function contract): after the
    * `fLaC` magic the first metadata block must be STREAMINFO (type 0,
    * 34 bytes), whose tail packs sample rate (20 bits), channels−1
    * (3 bits), bits-per-sample−1 (5 bits) and total samples (36 bits)
    * big-endian. */
  object FlacCodec {
    /** (sampleRate, nChannels, bitsPerSample, nSamples), or None. */
    def info(payload: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      def u8(i: Int): Int = payload(i) & 0xff
      if (payload.length < 42) return None
      if (!(u8(0) == 'f' && u8(1) == 'L' && u8(2) == 'a' && u8(3) == 'C'))
        return None
      if ((u8(4) & 0x7f) != 0) return None // first block must be STREAMINFO
      val len = (u8(5) << 16) | (u8(6) << 8) | u8(7)
      if (len != 34) return None
      val rate = (u8(18) << 12) | (u8(19) << 4) | (u8(20) >> 4)
      val ch = ((u8(20) >> 1) & 0x7) + 1
      val bits = (((u8(20) & 1) << 4) | (u8(21) >> 4)) + 1
      val total = ((u8(21) & 0x0f).toLong << 32) | (u8(22).toLong << 24) |
        (u8(23).toLong << 16) | (u8(24).toLong << 8) | u8(25).toLong
      if (rate < 1) None else Some((rate, ch, bits, total))
    }
  }

  /** Audio-metadata probe — [[probeImageMeta]]'s sibling for the audio
    * modality: rows whose payload parses as WAV or FLAC report the
    * stream parameters from the ACTUAL header (`codec` = "wav" /
    * "flac"); anything else keeps its carried metadata (`codec` null).
    * Pure projection, payloads never leave the executors. */
  def probeAudioMeta(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val parsed: Option[(String, (Int, Int, Int, Long))] =
          if (r.modality != "audio") None
          else WavCodec.info(r.payload).map("wav" -> _)
            .orElse(FlacCodec.info(r.payload).map("flac" -> _))
        val p = parsed.map(_._2)
        (r.media_id, r.modality,
          p.map(_._1).getOrElse(r.sample_rate),
          p.map(_._2).getOrElse(0),
          p.map(_._3).getOrElse(0),
          p.map(_._4).getOrElse(0L),
          parsed.map(_._1), r.payload.length.toLong)
      }
    }.toDF("media_id", "modality", "sample_rate", "n_channels",
      "bits_per_sample", "n_samples", "codec", "n_bytes")
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
