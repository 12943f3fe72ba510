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
