package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form (normal-equations) linear regression over the
  * reference's prediction features — the ORACLE-GATED model of the
  * MLlib north star (BASELINE "Spark MLlib pipelines";
  * ml/TrafficModel.scala holds the full MLlib Pipeline, spec-pinned
  * to this closed form): y(slot) ≈ a + b·dow + c·hr fitted per key by
  * Cramer's rule over integer sufficient statistics, entirely in
  * FIXED-POINT integer arithmetic — so a DuckDB oracle replays every
  * sum, determinant, truncating division and remainder bit-for-bit,
  * which no iterative/float solver permits (the same portability
  * contract as ops/Graph's micro-unit PageRank).
  *
  * Pipeline: events → daily partials (the A4 grain, exact long cents
  * via Exact.unitsSum2) → per-(key,dow,hr) slot label y = slot-total
  * div n_dates (cents) → per-key 3×3 normal system from 9 integer
  * sums → coefficients as u6 fixed point (cents × 10⁴ = 10⁻⁶
  * currency units) via OVERFLOW-PROOF split division
  * (q·10⁴ = (det div det0)·10⁴ + ((det mod det0)·10⁴) div det0 —
  * the remainder is < det0 ≤ ~9.1e8, a bound set by the DESIGN sums
  * alone since dow ≤ 6, hr ≤ 23, n ≤ 168) → per-slot prediction
  * pred_u6 = a + b·dow + c·hr.
  *
  * All divisions are sign-split (|·| div, negate after): Spark `div`
  * truncates toward zero while DuckDB `//` floors, so they agree only
  * on non-negative operands — the split IS the portable form.
  * Rank-deficient keys (det0 = 0 — fewer than 3 distinct slots, or a
  * degenerate design) fall back to the constant model
  * pred = slot-mean · 10⁴, keeping the operator total.
  *
  * Integer headroom (ANSI mode errors loudly, never wraps): the
  * largest product is sy·(sx11·sx22) ≤ 168·y·6.7e7 ≈ 1.1e10·y, safe
  * for slot means up to y ≈ 8e8 cents ($8M of hourly flux per slot —
  * physically absurd; slot MEANS do not grow with corpus size, more
  * history only adds dates to the denominator).
  *
  * Scale shape: one shuffle to the daily grain (map-side combinable),
  * one to slot grain, one key-grain aggregate (9 sums), and a
  * broadcast-able key-cardinality join back to slots. No iteration,
  * no collect, no matrix library.
  */
object SlotRegression {

  /** Truncate-toward-zero a/b for b > 0 — portable across Spark `div`
    * (truncates) and DuckDB `//` (floors) via the sign split. */
  private def tdiv(a: Column, b: Column): Column =
    when(a < 0, -call_function("div", -a, b))
      .otherwise(call_function("div", a, b))

  /** Slot training labels: one row per (key, dow, hr) with
    * y = (Σ daily cents) div n_dates — the integer analog of the A4
    * slot mean (dow is the SQLite-%w convention via
    * Predict.dailyPartials). */
  def slotLabels(history: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String): DataFrame =
    slotLabelsFromDaily(
      graft.ops.Predict.dailyPartials(history, keyCol, tsCol, valueCol),
      keyCol)

  /** The same labels from an ALREADY-MATERIALIZED daily-partials frame
    * (keyCol, dow, hr, d, hourly_units) — the streaming-MV entry
    * point: the pattern sink's merged state IS this frame, and since
    * the merge is long addition on the (key, dow, hr, d) grain, a
    * model refit from the state equals the batch fit over the
    * concatenated stream bit-for-bit. */
  def slotLabelsFromDaily(daily: DataFrame, keyCol: String): DataFrame =
    daily
      .groupBy(col(keyCol), col("dow"), col("hr"))
      .agg(sum(col("hourly_units")).as("_su"), count(lit(1)).as("_nd"))
      .select(col(keyCol), col("dow").cast("long").as("dow"),
        col("hr").cast("long").as("hr"),
        tdiv(col("_su"), col("_nd")).as("y"))

  /** Per-key model: the 9 sufficient statistics, the four Cramer
    * determinants, and the u6 coefficients. Columns: keyCol, n_slots,
    * sy, det0, a_u6, b_u6, c_u6 (coefficients 0 when det0 = 0 — the
    * caller's fallback marker). */
  def fitU6(slots: DataFrame, keyCol: String): DataFrame = {
    val x1 = col("dow"); val x2 = col("hr"); val y = col("y")
    val st = slots.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(x1).as("sx1"), sum(x2).as("sx2"),
      sum(x1 * x1).as("sx11"), sum(x2 * x2).as("sx22"),
      sum(x1 * x2).as("sx12"),
      sum(y).as("sy"), sum(x1 * y).as("sx1y"), sum(x2 * y).as("sx2y"))
    val n = col("n"); val sx1 = col("sx1"); val sx2 = col("sx2")
    val sx11 = col("sx11"); val sx22 = col("sx22"); val sx12 = col("sx12")
    val sy = col("sy"); val sx1y = col("sx1y"); val sx2y = col("sx2y")
    val det0 =
      n * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1 * sx22 - sx12 * sx2) +
        sx2 * (sx1 * sx12 - sx11 * sx2)
    val detA =
      sy * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1y * sx22 - sx12 * sx2y) +
        sx2 * (sx1y * sx12 - sx11 * sx2y)
    val detB =
      n * (sx1y * sx22 - sx12 * sx2y) -
        sy * (sx1 * sx22 - sx12 * sx2) +
        sx2 * (sx1 * sx2y - sx1y * sx2)
    val detC =
      n * (sx11 * sx2y - sx12 * sx1y) -
        sx1 * (sx1 * sx2y - sx1y * sx2) +
        sy * (sx1 * sx12 - sx11 * sx2)
    // u6 coefficient = sign(det) · ((|det| div det0)·10⁴ +
    // ((|det| mod det0)·10⁴) div det0) — split so neither factor
    // overflows; 0 when det0 = 0 (branch never divides: CASE is lazy
    // on both engines)
    def coef(det: Column, d0: Column): Column = {
      val ad = abs(det)
      val q = call_function("div", ad, d0) * 10000L +
        call_function("div", (ad % d0) * 10000L, d0)
      when(d0 === 0L, 0L).otherwise(when(det < 0, -q).otherwise(q))
    }
    st.select(col(keyCol), n.as("n_slots"), sy,
      det0.as("det0"), coef(detA, det0).as("a_u6"),
      coef(detB, det0).as("b_u6"), coef(detC, det0).as("c_u6"))
  }

  /** Train + predict: fit the per-key model and score every observed
    * slot. Output: (keyCol, dow, hr, pred_u6) — prediction in 10⁻⁶
    * currency units; rank-deficient keys serve the constant
    * slot-mean model. Ordered for the gate. */
  def predictU6(history: DataFrame, keyCol: String, tsCol: String,
                valueCol: String): DataFrame =
    predictFromSlots(slotLabels(history, keyCol, tsCol, valueCol), keyCol)

  /** Fit + score from a prepared slot-label frame — shared by the
    * batch path and the streaming-MV serving read. */
  def predictFromSlots(slots: DataFrame, keyCol: String): DataFrame = {
    val co = fitU6(slots, keyCol)
    slots.join(co, Seq(keyCol))
      .select(col(keyCol), col("dow"), col("hr"),
        when(col("det0") === 0L, tdiv(col("sy"), col("n_slots")) * 10000L)
          .otherwise(col("a_u6") + col("b_u6") * col("dow") +
            col("c_u6") * col("hr")).as("pred_u6"))
      .orderBy(keyCol, "dow", "hr")
  }

  /** The per-key model table for serving/inspection (coefficients in
    * u6, plus the rank marker). Ordered for the gate. */
  def modelTable(history: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String): DataFrame =
    fitU6(slotLabels(history, keyCol, tsCol, valueCol), keyCol)
      .select(col(keyCol), col("n_slots"), col("a_u6"), col("b_u6"),
        col("c_u6"))
      .orderBy(keyCol)

  /** Training-fit evaluation, exact-integer (the eval leg of the
    * train/predict/eval triple): per-key MAE and max absolute
    * residual in u6 units between the fitted plane and the slot
    * labels. L1 metrics, not SSE, deliberately: residuals are ≤ ~1e11
    * u6-units so their SUM stays far inside BIGINT while a SQUARED
    * residual would overflow both engines — and the oracle replays
    * the L1 arithmetic exactly. MAE's division is the same sign-split
    * truncating form as everything here (residual sums are
    * non-negative, but tdiv keeps the contract uniform). */
  def fitStatsU6(history: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String): DataFrame = {
    val slots = slotLabels(history, keyCol, tsCol, valueCol)
    val co = fitU6(slots, keyCol)
    slots.join(co, Seq(keyCol))
      .select(col(keyCol), col("n_slots"),
        abs(col("y") * 10000L -
          when(col("det0") === 0L,
            tdiv(col("sy"), col("n_slots")) * 10000L)
            .otherwise(col("a_u6") + col("b_u6") * col("dow") +
              col("c_u6") * col("hr"))).as("_ar"))
      .groupBy(col(keyCol))
      // min, not first: every row in the group carries the same
      // n_slots, but min is deterministic by construction (and the
      // oracle's exact spelling)
      .agg(min(col("n_slots")).as("n_slots"),
        sum(col("_ar")).as("_sar"), max(col("_ar")).as("max_abs_u6"))
      .select(col(keyCol), col("n_slots"),
        tdiv(col("_sar"), col("n_slots")).as("mae_u6"),
        col("max_abs_u6"))
      .orderBy(keyCol)
  }
}
