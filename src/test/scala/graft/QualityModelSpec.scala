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

  test("trained weights drive pretrainRecipe end-to-end: train -> export " +
    "-> recipe consumes them unchanged") {
    import graft.ops.{Pipelines, TextDedup}
    // unlabeled corpus with a source column; the trained classifier must
    // gate it inside the recipe exactly as standalone serving does
    val corpus = (0 until 30).map { i =>
      val text =
        if (i % 2 == 0)
          s"this is excellent wonderful prose item$i with several plain words"
        else
          s"this is terrible awful prose item$i with several plain words"
      (1000L + i, text, if (i % 3 == 0) "web" else "books")
    }.toDF("doc_id", "text", "dom")
    val vocab = QualityModel.vocabulary(labeled, "text", 20)
    val model = QualityModel.fit(labeled, "doc_id", "text", "label", vocab)
    val w = QualityModel.exportWeights(spark, model, vocab)
    // the recipe's model stage is linearScore(weights) with NO bias —
    // mirror it standalone on the same docs (texts are single unique
    // lines, so the recipe's line-dedup stage is an identity here)
    val standalone = TextStats.linearScore(
        corpus.select("doc_id", "text"), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val good = (0 until 30).filter(_ % 2 == 0).map(1000L + _).toSet
    val minGood = good.map(standalone).min
    val maxBad = (standalone.keySet -- good).map(standalone).max
    assert(minGood > maxBad, "fixture: classes must separate")
    val threshold = (minGood + maxBad) / 2
    // neutralize every stage after the model gate: pass-all language +
    // quality, minJ high enough that distinct texts never near-dup,
    // temperature at alpha=1/budget=1 (keep-all waterfill)
    val langs = TextStats.withLangId(corpus, "text", "lang_pred")
      .select("lang_pred").distinct().as[String].collect().toSeq
    val out = Pipelines.pretrainRecipe(corpus, "doc_id", "text", "dom",
        keepLangs = langs, minQuality = 0.0,
        weights = w, minScoreMicro = threshold,
        n = 3, k = 16, bands = 4, minJ = 0.99,
        alpha = 1.0, budgetFrac = 1.0, nShards = 2, seed = "qm")
      .select("doc_id", "score_micro").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the model stage selected exactly the trained-positive class...
    assert(out.keySet == good,
      s"recipe survivors ${out.keySet.toSeq.sorted} != trained-good class")
    // ...and the recipe's served score IS the exported-weight score,
    // bit for bit (weights consumed unchanged through the composition)
    out.foreach { case (id, s) => assert(s == standalone(id), s"doc $id") }
    // guard the fixture premise the identity-line-dedup claim rests on
    assert(TextDedup.dedupLines(corpus.select("doc_id", "text"),
      "doc_id", "text").select("text").as[String].collect().toSet ==
      corpus.select("text").as[String].collect().toSet)
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
