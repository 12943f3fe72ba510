package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Exact

/** §2.5 — analytic window functions. The reference's per-camera
  * sequential patterns (previous-frame state, last-value-per-camera,
  * running lifetime totals, top-1 severity) become SQL window functions
  * over `Window.partitionBy(camera).orderBy(ts)` (SURVEY §2.5).
  *
  * Scale note: window functions shuffle once on the partition key and
  * sort within partitions. At 100 TB the key (camera/user) has bounded
  * cardinality per partition; skewed keys are the hazard — mitigated by
  * AQE skew handling, and none of these frames require unbounded
  * buffering (lag/row_number/running-sum are streaming-friendly frames).
  * All orderings include a unique tiebreak column for determinism
  * (SURVEY §7.4 hazard 7).
  */
object Analytic {

  /** lag: previous observation per key (reference `prev_rects` pattern,
    * app/services/camera.py:35,247-256) + delta. */
  def withPrev(df: DataFrame, key: String, ts: String, id: String,
               value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(id))
    df.select(col(key), col(id), unix_timestamp(col(ts)).as("ts_epoch"),
        col(value),
        lag(col(value), 1).over(w).as("prev_value"))
      .withColumn("delta", col(value) - col("prev_value"))
      .orderBy(col(key), col("ts_epoch"), col(id))
  }

  /** last-value-per-key (reference `current_count` = last history item,
    * app/utils.py:194-196,292-297). row_number desc + filter — at scale
    * this is one shuffle and discards everything but the newest row per
    * key at the exchange. */
  def lastPerKey(df: DataFrame, key: String, ts: String, id: String,
                 value: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col(id).desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(key), unix_timestamp(col(ts)).as("last_ts_epoch"),
        col(value).as("last_value"))
      .orderBy(key)
  }

  /** A11 — running lifetime accumulation per key (reference
    * `accumulated_count += new_count`, app/services/camera.py:287-290).
    * Decimal-routed so the cumulative sum is exact at any parallelism. */
  def runningTotal(df: DataFrame, key: String, ts: String, id: String,
                   value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(key), col(id), unix_timestamp(col(ts)).as("ts_epoch"),
        Exact.dsum2Over(col(value), w).as("accumulated"))
      .orderBy(col(key), col("ts_epoch"), col(id))
  }

  /** J8-style top-K per group with deterministic tiebreak (reference
    * severity argmax, app/templates/dashboard.html:1626-1674). */
  def topKPerGroup(df: DataFrame, group: String, value: String,
                   id: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(group))
      .orderBy(col(value).desc, col(id))
    df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(group), col(id), col(value), col("rnk"))
      .orderBy(col(group), col("rnk"))
  }

  /** Sessionization: split each key's event sequence into sessions at
    * gaps > `gapSec`, returning per-session aggregates (event count,
    * start/end, total value). Session id = running count of gap-breaks —
    * one shuffle on key, one windowed pass, then a hash agg; the
    * streaming analog is session_window() with a watermark. */
  def sessionize(df: DataFrame, key: String, ts: String, value: String,
                 gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    val eps = unix_timestamp(col(ts))
    val newSession = when(
      eps - lag(eps, 1).over(w) > gapSec || lag(eps, 1).over(w).isNull,
      lit(1L)).otherwise(lit(0L))
    df.withColumn("_brk", newSession)
      .withColumn("session_id",
        sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(key), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_timestamp(col(ts))).as("session_start"),
        max(unix_timestamp(col(ts))).as("session_end"),
        Exact.dsum2(col(value)).as("total_value"))
  }
}
