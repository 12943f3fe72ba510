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
}
