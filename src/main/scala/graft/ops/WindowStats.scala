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
}
