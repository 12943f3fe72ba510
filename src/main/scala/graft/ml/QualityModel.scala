package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.CountVectorizerModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{TextDedup, TextStats}

/** Quality-classifier TRAINING for the text pipeline — the fastText /
  * CCNet pattern: fit a logistic regression over bag-of-words counts of
  * the top-`vocabSize` corpus terms (labels e.g. "looks like curated
  * reference text" vs "looks like raw crawl"), then EXPORT the fitted
  * coefficients as the `(term, w_micro)` weights table that
  * [[graft.ops.TextStats.linearScore]] serves with exact integer
  * arithmetic.
  *
  * Split of responsibilities, deliberately: training is the one stage
  * allowed to be float-order-sensitive (LBFGS reductions), so it is NOT
  * oracled; the exported micro-unit weights freeze its outcome, and
  * serving — the part that runs over 100 TB — is the exact,
  * engine-reproducible `linearScore` path (`t_linear_score` is the
  * oracled query). Retraining produces a new weights version; scoring
  * determinism is never hostage to MLlib internals.
  *
  * Scale shape: the corpus collapses to a vocab-scale frequency table
  * once ([[graft.ops.TextStats.vocabTopK]], bounded k-row collect);
  * featurization is a per-row projection (`CountVectorizerModel` over
  * the fixed vocab — no fitting pass, no shuffle); LBFGS iterates over
  * per-partition gradient sums (treeAggregate) — the standard
  * distributed-LR shape. Export is k rows.
  */
object QualityModel {

  /** Deterministic top-k vocabulary in [[TextStats.vocabTopK]] order
    * (count desc, term asc). Bounded driver collect (k rows). */
  def vocabulary(df: DataFrame, textCol: String, k: Int): Array[String] =
    TextStats.vocabTopK(df, textCol, k).collect().map(_.getString(0))

  /** Bag-of-words featurization over a FIXED vocabulary: tokenize with
    * the family-wide tokenizer and count against the vocab — a pure
    * projection (CountVectorizerModel does no fitting). Pre-existing
    * `_toks`/`features` columns are dropped first (they are this
    * stage's working/output names; carrying an input column by either
    * name would make `transform` throw a duplicate-column error), and
    * an empty vocabulary is rejected up front with a clear message
    * (CountVectorizerModel's own failure on it is unhelpful). */
  def featurize(df: DataFrame, idCol: String, textCol: String,
                vocab: Array[String]): DataFrame = {
    require(vocab.nonEmpty,
      "featurize needs a non-empty vocabulary — the labeled set was " +
        "too small/empty for vocabulary(); check the training input")
    val toks = df.drop("_toks", "features")
      .withColumn("_toks", TextDedup.tokens(col(textCol)))
    new CountVectorizerModel(vocab)
      .setInputCol("_toks").setOutputCol("features")
      .transform(toks)
      .drop("_toks")
  }

  /** Fit the classifier on labeled docs (`labelCol` ∈ {0.0, 1.0}).
    * L2-regularized, fixed iteration budget — deterministic for a fixed
    * partition layout; cross-layout float drift is absorbed by the
    * weight export (see scaladoc above). */
  def fit(labeled: DataFrame, idCol: String, textCol: String,
          labelCol: String, vocab: Array[String],
          regParam: Double = 1e-3, maxIter: Int = 50)
    : LogisticRegressionModel = {
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setRegParam(regParam).setMaxIter(maxIter)
      .setStandardization(false).setFamily("binomial")
    lr.fit(featurize(labeled, idCol, textCol, vocab)
      .withColumn(labelCol, col(labelCol).cast("double")))
  }

  /** Export fitted coefficients as the serving weights table:
    * `(term, w_micro)` with weights quantized to integer micro-units —
    * the exact contract [[TextStats.linearScore]] consumes. Zero
    * (regularized-away) coefficients are dropped: absent terms score 0
    * via linearScore's left join, so the table stays minimal. */
  def exportWeights(s: SparkSession, model: LogisticRegressionModel,
                    vocab: Array[String]): DataFrame = {
    import s.implicits._
    val co = model.coefficients
    vocab.indices.map(i => (vocab(i), math.round(co(i) * 1e6)))
      .filter(_._2 != 0L)
      .toDF("term", "w_micro")
  }

  /** The model's intercept in the same micro-units (linearScore's
    * `biasMicro`). */
  def biasMicro(model: LogisticRegressionModel): Long =
    math.round(model.intercept * 1e6)

  /** Train on labeled docs and score an unlabeled corpus in one call:
    * vocabulary → LR fit → weight export → exact linear serving. */
  def trainAndScore(labeled: DataFrame, corpus: DataFrame,
                    idCol: String, textCol: String, labelCol: String,
                    vocabSize: Int = 10000, regParam: Double = 1e-3)
    : DataFrame = {
    val vocab = vocabulary(labeled, textCol, vocabSize)
    val model = fit(labeled, idCol, textCol, labelCol, vocab, regParam)
    val w = exportWeights(labeled.sparkSession, model, vocab)
    TextStats.linearScore(corpus, idCol, textCol, w, biasMicro(model))
  }
}
