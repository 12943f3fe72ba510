package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Exact

/** A7 — multi-window rolling stats.
  *
  * Reference semantics: for each window in {10s, 30m, 1h, 5h, 24h},
  * filter `ts >= now - w` over the retained history and compute
  * `total_volume`, per-class sums, point count, and rounded average
  * density (app/utils.py:523-565). The reference re-scans the deque once
  * per window (5 passes).
  *
  * Spark-first design: ONE pass with conditional aggregation —
  * `sum(when(ts >= now - w, value))` per window — so 100 TB is scanned
  * once, not five times, and each conditional sum is a map-side partial.
  * "now" is the data max (deterministic) attached via broadcast join.
  */
object WindowStats {

  /** One row, 3 columns per window: total, n, avg (reference rounds avg,
    * app/utils.py:551). Window label → seconds. */
  def multiWindow(df: DataFrame, tsCol: String, valueCol: String,
                  windows: Seq[(String, Long)]): DataFrame = {
    val mx = df.agg(max(unix_timestamp(col(tsCol))).as("now_ts"))
    val withNow = df.join(broadcast(mx))
    val eps = unix_timestamp(col(tsCol))
    val aggs = windows.flatMap { case (label, secs) =>
      val in = eps >= col("now_ts") - secs
      // conditional exact sum: out-of-window rows become null and are
      // skipped by the split-word sums (identical agg expressions are
      // deduplicated inside HashAggregate, so total and avg share state)
      val winVal = when(in, col(valueCol))
      Seq(
        coalesce(Exact.dsum2(winVal), lit(0.0)).as(s"total_$label"),
        count(when(in, lit(1))).as(s"n_$label"),
        round(coalesce(Exact.dsum2(winVal), lit(0.0)) /
          greatest(count(when(in, lit(1))), lit(1L)), 2).as(s"avg_$label"))
    }
    withNow.agg(aggs.head, aggs.tail: _*)
  }

  /** Production variant: `now` as a LITERAL epoch. Beyond making the
    * per-window conditions plan-time, this lets the scan prune to the
    * LONGEST window (`ts >= now - max(w)` is implied by every
    * conditional, so it is safe to conjoin as a real filter that
    * reaches the parquet footers) — the data-max overload must scan
    * everything to find `now` first. Same single-pass conditional
    * aggregation on whatever survives the pushdown. */
  def multiWindowAt(df: DataFrame, tsCol: String, valueCol: String,
                    windows: Seq[(String, Long)], nowEpoch: Long): DataFrame = {
    val maxW = windows.map(_._2).max
    val pruned = df.filter(
      col(tsCol) >= timestamp_seconds(lit(nowEpoch - maxW)))
    val eps = unix_timestamp(col(tsCol))
    val aggs = windows.flatMap { case (label, secs) =>
      val in = eps >= nowEpoch - secs
      val winVal = when(in, col(valueCol))
      Seq(
        coalesce(Exact.dsum2(winVal), lit(0.0)).as(s"total_$label"),
        count(when(in, lit(1))).as(s"n_$label"),
        round(coalesce(Exact.dsum2(winVal), lit(0.0)) /
          greatest(count(when(in, lit(1))), lit(1L)), 2).as(s"avg_$label"))
    }
    pruned.agg(aggs.head, aggs.tail: _*)
  }

  /** Per-EVENT trailing time-RANGE window — the frame family A7's
    * snapshot form cannot express: for every event, the count and
    * exact volume of its key's events in the trailing `windowSec`
    * seconds INCLUDING itself (`RANGE BETWEEN windowSec−1 PRECEDING
    * AND CURRENT ROW` over epoch seconds — a time frame, so rows
    * sharing a timestamp are all in or all out together, unlike a
    * ROWS frame, and gaps in the series shrink the frame instead of
    * reaching further back). The rolling volume rides exact long
    * cents: engines disagree on windowed DOUBLE sums (different
    * accumulation trees — Spark re-adds the frame per row, DuckDB
    * uses segment trees), while long addition is order-free; the one
    * double division per row is IEEE-identical on identical inputs.
    *
    * Scale shape: one shuffle on the key, one per-key sort shared by
    * both window aggregates; the frame is bounded by wall-clock, so
    * state per row is the key's event rate × windowSec regardless of
    * corpus size. */
  def trailingRange(df: DataFrame, keyCol: String, idCol: String,
                    tsCol: String, valueCol: String,
                    windowSec: Long): DataFrame = {
    require(windowSec >= 1, s"windowSec must be >= 1: $windowSec")
    val base = df.select(col(keyCol), col(idCol),
      unix_timestamp(col(tsCol)).as("ts_epoch"),
      round(col(valueCol) * 100).cast("long").as("_u"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("ts_epoch"))
      .rangeBetween(-(windowSec - 1), 0)
    base.select(col(keyCol), col(idCol), col("ts_epoch"),
        count(lit(1)).over(w).as("n_trailing"),
        sum(col("_u")).over(w).as("_tu"))
      .select(col(keyCol), col(idCol), col("ts_epoch"),
        col("n_trailing"),
        Exact.unitsToDouble2(col("_tu")).as("trailing_volume"))
      .orderBy(idCol)
  }
}
