package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Exact

/** A1/A2/A3/A10/A13 — total/roll-up aggregations.
  *
  * Reference semantics: lifetime sums `SUM(new_count), SUM(new_cars),
  * SUM(new_motors)` with COALESCE-to-0 (app/database.py:147-167); the
  * last-N-days variant filters `timestamp >= now - days*86400`
  * (app/database.py:169-195); per-camera grouped totals
  * (scripts/sync_stats_db.py:41-49); global roll-up of per-source stats
  * (app/utils.py:457-473); DISTINCT camera list
  * (scripts/analyze_thresholds.py:25).
  *
  * All are single-shuffle hash aggregates with map-side partials — the
  * shape that scales linearly to 100 TB. The roll-up uses Spark's
  * `rollup` so both levels come from ONE shuffle (reference computes
  * them as two passes).
  */
object Totals {

  /** A1 — global lifetime totals (one row). */
  def global(df: DataFrame, valueCol: String): DataFrame =
    df.agg(
      coalesce(Exact.dsum2(col(valueCol)), lit(0.0)).as("total_value"),
      count(lit(1)).as("n_rows"))

  /** A2 — totals over the trailing window [maxTs - seconds, maxTs].
    * "now" is the data's max ts (deterministic), computed in the same
    * job via a broadcast scalar join — no driver round-trip. */
  def trailing(df: DataFrame, tsCol: String, valueCol: String,
               seconds: Long): DataFrame = {
    val mx = df.agg(max(unix_timestamp(col(tsCol))).as("now_ts"))
    df.join(broadcast(mx))
      .filter(unix_timestamp(col(tsCol)) >= col("now_ts") - seconds)
      .agg(
        coalesce(Exact.dsum2(col(valueCol)), lit(0.0)).as("total_value"),
        count(lit(1)).as("n_rows"))
  }

  /** A2 production variant: `now` as a LITERAL epoch (the caller's wall
    * clock), so the trailing bound is a plan-time predicate that
    * reaches the parquet footers (via plans.PushdownNanosTs for the
    * nanos lake) — the data-max overload above keeps the oracle
    * deterministic but its runtime-scalar bound cannot prune the scan.
    * At 100 TB, serve the API through this one. */
  def trailingAt(df: DataFrame, tsCol: String, valueCol: String,
                 seconds: Long, nowEpoch: Long): DataFrame =
    df.filter(col(tsCol) >= timestamp_seconds(lit(nowEpoch - seconds)))
      .agg(
        coalesce(Exact.dsum2(col(valueCol)), lit(0.0)).as("total_value"),
        count(lit(1)).as("n_rows"))

  /** A3 — per-key grouped totals. */
  def byKey(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        Exact.dsum2(col(valueCol)).as("total_value"),
        count(lit(1)).as("n_rows"))
      .orderBy(keyCol)

  /** A10 — per-key + grand-total in one shuffle via rollup
    * (reference computes the global roll-up as a second pass over
    * per-source stats, app/utils.py:457-473). */
  def rollupByKey(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.rollup(col(keyCol))
      .agg(
        Exact.dsum2(col(valueCol)).as("total_value"),
        count(lit(1)).as("n_rows"),
        grouping(col(keyCol)).as("lvl"))
      .orderBy(col("lvl"), col(keyCol))

  /** A13 — DISTINCT keys. */
  def distinctKeys(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol)).distinct().orderBy(keyCol)

  /** Two-dimension CUBE: every grouping set {(k1,k2), (k1), (k2), ()}
    * in one pass — the dashboard matrix (per type × day, per type, per
    * day, grand total) that would otherwise be four scans. Spark
    * expands grouping sets BEFORE the hash aggregate (Expand: 4 rows
    * per input row), so it is one shuffle whose width is the grouping-
    * set count — a dial, not a data-scale hazard; partial aggregation
    * still applies per set. `gid` is the standard grouping bitmask
    * (k1 = MSB), which also disambiguates a real null key from an
    * aggregated-out one. Ordering inside a gid level never depends on
    * nulls: the nulled-out columns are constant there. */
  def cubeByKeys(df: DataFrame, key1: String, key2: String,
                 valueCol: String): DataFrame =
    df.cube(col(key1), col(key2))
      .agg(
        Exact.dsum2(col(valueCol)).as("total_value"),
        count(lit(1)).as("n_rows"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col(key1), col(key2))
}
