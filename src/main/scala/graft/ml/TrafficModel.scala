package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{OneHotEncoder, VectorAssembler}
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib generalization of the reference's prediction (BASELINE north
  * star): the reference "model" is a historical group-mean per
  * (camera, dow, hour) slot (app/database.py:109-145 — the correctness
  * contract, kept in ops/Predict). This module lifts the same features
  * into a standard MLlib `Pipeline` so the slot prediction can
  * generalize (regularization across sparse slots, smooth interpolation
  * to unseen slots) instead of memorizing per-slot means. The
  * ORACLE-GATED counterpart is [[SlotRegression]] (closed-form normal
  * equations in fixed-point integers — driver queries `ml_slot_lr` /
  * `ml_lr_coeffs`); SlotRegressionSpec pins this module's
  * LinearRegression within tolerance of that closed form.
  *
  * Features: one-hot(dow) ⊕ one-hot(hour) ⊕ one-hot-ish hashed camera ⊕
  * cyclic sin/cos encodings of hour (diurnal structure, cf. the
  * reference's Gaussian diurnal curve app/utils.py:125-126).
  * Label: per-(camera,dow,hour,date) hourly flux sum — the SAME
  * aggregate the group-mean uses, so the two models are directly
  * comparable on identical training rows.
  *
  * Scale: training rows are one per (camera, slot, date) — aggregation
  * reduces 100 TB of observations to ~cameras × 168 × days rows before
  * any ML work; the Pipeline itself is a narrow transform chain.
  */
object TrafficModel {

  /** Training frame: one row per (key, dow, hr, date) with hourly flux
    * label — the A4 inner aggregate. */
  def trainingFrame(history: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame =
    history.groupBy(
        col(keyCol),
        (dayofweek(col(tsCol)) - 1).as("dow"),
        hour(col(tsCol)).as("hr"),
        to_date(col(tsCol)).as("d"))
      .agg(graft.util.Exact.dsum2(col(valueCol)).as("hourly_total"))

  /** The feature pipeline + linear model. Deterministic: "normal" solver
    * (closed form), fixed feature layout, no sampling. */
  def pipeline(): Pipeline = {
    val lr = new LinearRegression()
      .setFeaturesCol("features").setLabelCol("hourly_total")
      .setSolver("normal").setRegParam(1e-6)
    new Pipeline().setStages(featureStages :+ lr)
  }

  /** Gradient-boosted-trees variant: captures (dow × hr × key)
    * interactions the additive linear model cannot (e.g. one camera's
    * rush hour differing from another's). Seeded and
    * subsampling-free → deterministic fits. Same feature columns, so
    * the two models are swappable in [[scoreAndClassify]]. */
  def pipelineGbt(maxIter: Int = 20, maxDepth: Int = 4): Pipeline = {
    val gbt = new GBTRegressor()
      .setFeaturesCol("features").setLabelCol("hourly_total")
      .setMaxIter(maxIter).setMaxDepth(maxDepth)
      .setSubsamplingRate(1.0).setSeed(42L)
    new Pipeline().setStages(featureStages :+ gbt)
  }

  private def featureStages: Array[org.apache.spark.ml.PipelineStage] = {
    val enc = new OneHotEncoder()
      .setInputCols(Array("dow", "hr", "key_idx"))
      .setOutputCols(Array("dow_vec", "hr_vec", "key_vec"))
      .setHandleInvalid("keep")
    val asm = new VectorAssembler()
      .setInputCols(Array("dow_vec", "hr_vec", "key_vec", "hr_sin", "hr_cos"))
      .setOutputCol("features")
    Array(enc, asm)
  }

  private def withEncodings(tf: DataFrame, keyCol: String,
                            keyCardinality: Int): DataFrame =
    tf.withColumn("key_idx",
        pmod(col(keyCol).cast("long"), lit(keyCardinality)).cast("double"))
      .withColumn("hr_sin", sin(col("hr") * (2.0 * math.Pi / 24.0)))
      .withColumn("hr_cos", cos(col("hr") * (2.0 * math.Pi / 24.0)))
      .withColumn("dow", col("dow").cast("double"))
      .withColumn("hr", col("hr").cast("double"))

  /** Fit on history; returns the fitted PipelineModel. */
  def fit(history: DataFrame, keyCol: String, tsCol: String,
          valueCol: String, keyCardinality: Int = 1024): PipelineModel = {
    val tf = withEncodings(
      trainingFrame(history, keyCol, tsCol, valueCol), keyCol, keyCardinality)
    pipeline().fit(tf)
  }

  /** Fit the GBT variant on history (same features/label). */
  def fitGbt(history: DataFrame, keyCol: String, tsCol: String,
             valueCol: String, keyCardinality: Int = 1024): PipelineModel = {
    val tf = withEncodings(
      trainingFrame(history, keyCol, tsCol, valueCol), keyCol, keyCardinality)
    pipelineGbt().fit(tf)
  }

  /** Predict hourly volume for every (key, dow, hr) slot of the given
    * keys — the MLlib analog of Predict.hourlyPattern. */
  def predictSlots(model: PipelineModel, keys: DataFrame, keyCol: String,
                   keyCardinality: Int = 1024): DataFrame = {
    val slots = keys.crossJoin(
        keys.sparkSession.range(7).select(col("id").cast("int").as("dow")))
      .crossJoin(
        keys.sparkSession.range(24).select(col("id").cast("int").as("hr")))
    val enc = withEncodings(slots, keyCol, keyCardinality)
    model.transform(enc)
      .select(col(keyCol), col("dow").cast("long").as("dow"),
        col("hr").cast("long").as("hr"),
        greatest(col("prediction"), lit(0.0)).as("predicted_volume"))
  }

  /** The full ML serving path: model-scored slots pushed through the
    * reference rules engine (thresholds left-join with defaults + the
    * CASE chain of app/routes.py:284-307) — the MLlib counterpart of
    * the relational predictSlot → withStatus flow, so a trained model
    * drops into the same prescriptive pipeline the group-mean uses. */
  def scoreAndClassify(model: PipelineModel, keys: DataFrame,
                       thresholds: DataFrame, keyCol: String,
                       keyCardinality: Int = 1024): DataFrame =
    graft.ops.Predict.withStatus(
      predictSlots(model, keys, keyCol, keyCardinality), thresholds, keyCol)

  /** Training-data RMSE — the fit-quality scalar used to sanity-check a
    * model against the constant-mean baseline (one agg, no collect of
    * predictions). */
  def rmse(model: PipelineModel, history: DataFrame, keyCol: String,
           tsCol: String, valueCol: String,
           keyCardinality: Int = 1024): Double = {
    val tf = withEncodings(
      trainingFrame(history, keyCol, tsCol, valueCol), keyCol, keyCardinality)
    model.transform(tf)
      .select(pow(col("prediction") - col("hourly_total"), 2).as("se"))
      .agg(sqrt(avg("se"))).head.getDouble(0)
  }
}
