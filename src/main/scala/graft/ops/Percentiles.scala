package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Exact

/** A6 — exact percentile threshold fitting ("training").
  *
  * Reference semantics: per camera, `np.percentile(hourly_volumes,
  * [50, 75, 90])` + max → congestion thresholds catalog
  * (scripts/analyze_thresholds.py:30-60). numpy uses linear
  * interpolation — Spark's exact `percentile` implements the same
  * estimator (SURVEY.md §7.4 hazard 3: `percentile_approx` does NOT and
  * must not be used for the correctness contract; at 100 TB a
  * sketch-based `approx_percentile` variant is offered separately where
  * the consumer tolerates error).
  *
  * Input is the *hourly volume* series: `GROUP BY strftime('%Y-%m-%d %H')`
  * sums (A5, scripts/analyze_thresholds.py:33-44) — two chained hash
  * aggregates, both map-side-partial, both scale linearly.
  */
object Percentiles {

  /** The (key, hour_bucket) hourly-volume partials — the A5 grain, as
    * exact long units so partials from different batches merge by long
    * addition (the streaming training MV, Ingest.startHourlySink). */
  def hourlyPartials(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String): DataFrame =
    df.groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour_bucket"))
      .agg(Exact.unitsSum2(col(valueCol)).as("hourly_units"))

  /** Merge hourly-partial frames (full outer on (key, bucket), long
    * addition) — fitting from merged partials is bit-identical to
    * fitting from the concatenated history. */
  def mergeHourlyPartials(keyCol: String)(
      state: DataFrame, batch: DataFrame): DataFrame = {
    val keys = Seq(keyCol, "hour_bucket")
    val s = state.select(keys.map(col) :+ col("hourly_units").as("s_u"): _*)
    val b = batch.select(keys.map(col) :+ col("hourly_units").as("b_u"): _*)
    s.join(b, keys, "full_outer")
      .select(keys.map(col) :+
        (coalesce(col("s_u"), lit(0L)) + coalesce(col("b_u"), lit(0L)))
          .as("hourly_units"): _*)
  }

  /** Fit p50/p75/p90/max from (merged) hourly partials. The percentile
    * runs over the AGGREGATE (keys × hours rows), not raw history —
    * which is why the training path scales: the 100 TB never reaches
    * the sort. */
  def thresholdsFromHourly(hourly: DataFrame, keyCol: String): DataFrame =
    hourly
      .withColumn("hourly_volume",
        Exact.unitsToDouble2(col("hourly_units")))
      .groupBy(col(keyCol))
      .agg(
        // one percentile buffer+sort per group, not three: the array
        // form shares the sorted values across all requested quantiles
        percentile(col("hourly_volume"),
          array(lit(0.5), lit(0.75), lit(0.9))).as("_p"),
        max(col("hourly_volume")).as("max_volume"))
      .select(col(keyCol),
        round(col("_p")(0), 6).as("p50"),
        round(col("_p")(1), 6).as("p75"),
        round(col("_p")(2), 6).as("p90"),
        col("max_volume"))
      .orderBy(keyCol)

  /** Per-key hourly sums → per-key p50/p75/p90/max of hourly volume. */
  def thresholds(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String): DataFrame =
    thresholdsFromHourly(hourlyPartials(df, keyCol, tsCol, valueCol), keyCol)

  /** Scale path: t-digest/approx variant for interactive 100 TB fitting
    * (NOT oracle-checked — different estimator by design). */
  def thresholdsApprox(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String): DataFrame =
    df.groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour_bucket"))
      .agg(sum(col(valueCol)).as("hourly_volume"))
      .groupBy(col(keyCol))
      .agg(
        percentile_approx(col("hourly_volume"), array(lit(0.5), lit(0.75), lit(0.9)),
          lit(10000)).as("p"),
        max(col("hourly_volume")).as("max_volume"))
      .select(col(keyCol), col("p")(0).as("p50"), col("p")(1).as("p75"),
        col("p")(2).as("p90"), col("max_volume"))
      .orderBy(keyCol)
}
