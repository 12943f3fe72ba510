package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Exact

/** A4 + J3 + J4 + rules — the flagship traffic-prediction pipeline.
  *
  * Reference semantics (app/database.py:109-145): for a (camera, dow,
  * hour) slot, predicted volume = AVG over dates of that date's hourly
  * SUM(new_count) — the `HourlySums` CTE. The reference runs it N+1:
  * one CTE query per camera per request (app/routes.py:272-273, X13).
  * Thresholds are looked up per camera with defaults {p50:100, p75:200,
  * p90:300} (app/routes.py:248-252,286), then a CASE chain assigns
  * status/recommendation (app/routes.py:288-307).
  *
  * Spark-first design — the signature rewrite of this app (SURVEY §3.2):
  * ONE job for ALL cameras and ALL (dow, hour) slots:
  *   groupBy(camera, dow, hour, date).sum → groupBy(camera, dow, hour).avg
  *   → left join broadcast(cameras) → left join broadcast(thresholds)
  *   → when-chain status.
  * Two chained shuffles on progressively smaller data; dimension joins
  * broadcast (36-row and catalog-sized dims stay broadcast-able even when
  * the fact side is 100 TB). Cameras with no history keep a 0 prediction
  * via the left join + coalesce (app/database.py:138 `avg_traffic or 0`).
  *
  * DOW convention: SQLite `%w` is 0=Sunday..6=Saturday
  * (app/database.py:112,127); Spark `dayofweek` is 1=Sunday..7 →
  * normalized as `dayofweek(ts) - 1` (SURVEY §7.4 hazard 2). Timezone is
  * pinned UTC (reference uses SQLite 'localtime', hazard 1).
  */
object Predict {

  /** SQLite-%w-compatible day-of-week: 0=Sunday..6=Saturday. */
  def dowCol(ts: Column): Column = (dayofweek(ts) - 1).as("dow")

  /** The (key, dow, hour, date) daily partials — the A4 CTE's inner
    * grain, and the ADDITIVE unit of the prediction: `hourly_units` is
    * an exact long fixed-point sum, so partials from different batches
    * merge by long addition (which is what lets the streaming sink
    * maintain the pattern incrementally — Ingest.startPatternSink). */
  def dailyPartials(history: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame =
    history
      .groupBy(
        col(keyCol),
        dowCol(col(tsCol)),
        hour(col(tsCol)).as("hr"),
        to_date(col(tsCol)).as("d"))
      // hourly totals as exact long fixed-point units (one key-hour of
      // 2-dp values is far inside the long bound); the decimal hop and
      // the one double division happen per SLOT, not per row
      .agg(Exact.unitsSum2(col(valueCol)).as("hourly_units"))

  /** Slot averages from (merged) daily partials: one row per present
    * date per slot, so AVG = sum/units over n_dates. */
  def patternFromDaily(daily: DataFrame, keyCol: String): DataFrame =
    daily.groupBy(col(keyCol), col("dow"), col("hr"))
      .agg((Exact.unitsToDouble2(sum(col("hourly_units"))) / count(lit(1)))
        .as("predicted_volume"))

  /** All-slot prediction: avg over dates of daily hourly sums, for every
    * (key, dow, hour) present in history. */
  def hourlyPattern(history: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame =
    patternFromDaily(dailyPartials(history, keyCol, tsCol, valueCol), keyCol)

  /** Merge daily-partial frames (full outer on the slot-date key, long
    * addition of the exact units) — `patternFromDaily(merge(a, b))`
    * equals `hourlyPattern(rows(a) ∪ rows(b))` bit-for-bit. */
  def mergeDailyPartials(keyCol: String)(
      state: DataFrame, batch: DataFrame): DataFrame = {
    val keys = Seq(keyCol, "dow", "hr", "d")
    val s = state.select(keys.map(col) :+
      col("hourly_units").as("s_u"): _*)
    val b = batch.select(keys.map(col) :+
      col("hourly_units").as("b_u"): _*)
    s.join(b, keys, "full_outer")
      .select(keys.map(col) :+
        (coalesce(col("s_u"), lit(0L)) + coalesce(col("b_u"), lit(0L)))
          .as("hourly_units"): _*)
  }

  /** One (dow, hour) slot for ALL keys — the shape of one
    * `/api/predict_traffic` request, N+1 collapsed to one job. `keys` is
    * the camera catalog (may contain keys with no history → predicted 0,
    * app/database.py:138). */
  def predictSlot(history: DataFrame, keys: DataFrame, keyCol: String,
                  tsCol: String, valueCol: String,
                  dow: Int, hr: Int): DataFrame = {
    val slot = hourlyPattern(
      history.filter(dowCol(col(tsCol)) === dow && hour(col(tsCol)) === hr),
      keyCol, tsCol, valueCol)
      .drop("dow", "hr")
    keys.join(slot, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("predicted_volume"), lit(0.0)).as("predicted_volume"))
  }

  /** Rules engine: thresholds left-join with the reference's defaults,
    * then the CASE chain of app/routes.py:288-307.
    * Status names are the reference's (Indonesian traffic terms). */
  def withStatus(predictions: DataFrame, thresholds: DataFrame,
                 keyCol: String): DataFrame = {
    val joined = predictions.join(broadcast(thresholds), Seq(keyCol), "left")
      .select(
        col(keyCol), col("predicted_volume"),
        coalesce(col("p50"), lit(100.0)).as("p50"),
        coalesce(col("p75"), lit(200.0)).as("p75"),
        coalesce(col("p90"), lit(300.0)).as("p90"))
    joined.withColumn("status",
        when(col("predicted_volume") > col("p90"), lit("MACET TOTAL"))
          .when(col("predicted_volume") > col("p75"), lit("MACET"))
          .when(col("predicted_volume") > col("p50"), lit("PADAT LANCAR"))
          .otherwise(lit("LANCAR")))
      .withColumn("recommendation",
        when(col("status") === "MACET TOTAL", lit("Cari rute alternatif"))
          .when(col("status") === "MACET", lit("Pertimbangkan rute lain"))
          .when(col("status") === "PADAT LANCAR", lit("Waspada perlambatan"))
          .otherwise(lit("Lalu lintas lancar")))
  }
}
