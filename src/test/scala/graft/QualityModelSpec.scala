package graft

import graft.ml.QualityModel
import graft.ops.TextStats
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.functions._

/** Quality-classifier training (ml.QualityModel): bag-of-words
  * featurization over a fixed vocab, LR fit, micro-unit weight export,
  * and the train → exact-serve loop through TextStats.linearScore. */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // 40 labeled docs: positives speak "excellent wonderful", negatives
  // "terrible awful"; shared filler words carry no signal
  private def labeled = (0 until 40).map { i =>
    if (i % 2 == 0)
      (i.toLong, s"this text is excellent wonderful filler$i common words", 1.0)
    else
      (i.toLong, s"this text is terrible awful filler$i common words", 0.0)
  }.toDF("doc_id", "text", "label")

  test("featurize counts tokens against the fixed vocab, no fitting") {
    val vocab = Array("alpha", "beta")
    val d = Seq((1L, "alpha beta alpha gamma")).toDF("doc_id", "text")
    val v = QualityModel.featurize(d, "doc_id", "text", vocab)
      .select("features").head.getAs[SparseVector](0)
    assert(v.size == 2)
    assert(v(0) == 2.0 && v(1) == 1.0) // gamma is OOV -> not counted
  }

  test("fit + export: signal terms get signed weights, export drops zeros") {
    val vocab = QualityModel.vocabulary(labeled, "text", 20)
    assert(vocab.contains("excellent") && vocab.contains("terrible"))
    val model = QualityModel.fit(labeled, "doc_id", "text", "label", vocab)
    val w = QualityModel.exportWeights(spark, model, vocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w("excellent") > 0L && w("wonderful") > 0L)
    assert(w("terrible") < 0L && w("awful") < 0L)
    // exported micro weights are integers by construction; no NaNs/zeros
    assert(w.values.forall(_ != 0L))
  }

  test("trainAndScore serves through exact linearScore and separates classes") {
    val corpus = Seq(
      (100L, "an excellent wonderful read"),
      (101L, "a terrible awful read")).toDF("doc_id", "text")
    val scored = QualityModel.trainAndScore(labeled, corpus,
        "doc_id", "text", "label", vocabSize = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(100L) > scored(101L))

    // serving parity: trainAndScore == manual export + linearScore
    val vocab = QualityModel.vocabulary(labeled, "text", 20)
    val model = QualityModel.fit(labeled, "doc_id", "text", "label", vocab)
    val manual = TextStats.linearScore(corpus, "doc_id", "text",
        QualityModel.exportWeights(spark, model, vocab),
        QualityModel.biasMicro(model))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(manual == scored)
  }

  test("served scores are layout-invariant even though training floats") {
    val vocab = QualityModel.vocabulary(labeled, "text", 20)
    val model = QualityModel.fit(labeled, "doc_id", "text", "label", vocab)
    val w = QualityModel.exportWeights(spark, model, vocab)
    val corpus = labeled.select("doc_id", "text")
    val a = TextStats.linearScore(corpus, "doc_id", "text", w)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = TextStats.linearScore(corpus.repartition(7), "doc_id", "text", w)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b) // exact long arithmetic: same weights -> same scores
  }
}
