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

  /** Retention cohort matrix: users bucketed by their FIRST active
    * period (the cohort), counted in every later period they return —
    * the `(cohort, offset) -> n_users` triangle every product
    * analytics stack draws. Two hash aggregations and one join on the
    * user key: (user, period) distinct activity, min-period cohorts,
    * then a (cohort, offset) count — no window, no collect; at 100 TB
    * the shuffles are user-scale then cohort-scale. */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String,
                       intervalSec: Long = 604800L): DataFrame =
    retentionFromActivity(
      events.select(col(userCol),
          floor(unix_timestamp(col(tsCol)) / intervalSec)
            .cast("long").as("period"))
        .distinct(),
      userCol)

  /** The cohort fold behind [[retentionCohorts]], over an already-
    * distinct `(userCol, period)` activity set — shared with the
    * streaming activity index ([[graft.streaming.Ingest]]), whose
    * serving read computes retention from pair-scale state instead of
    * rescanning events. */
  def retentionFromActivity(act: DataFrame,
                            userCol: String): DataFrame = {
    val cohorts = act.groupBy(col(userCol))
      .agg(min(col("period")).as("cohort"))
    act.join(cohorts, Seq(userCol))
      .groupBy(col("cohort"),
        (col("period") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered funnel: how many users performed `steps` IN ORDER, each
    * strictly after the previous and all within `horizonSec` of their
    * first step-1 event. The earliest-completion semantics: step 1
    * anchors at the user's first step-1 event; each later step takes
    * the earliest qualifying event after the previous step's time —
    * greedy-earliest is the standard funnel definition and makes the
    * result order-independent.
    *
    * Implementation: k−1 sequential min-joins on the user key (k is
    * query-scale, 3–5), each filtering the step's events against the
    * previous step's per-user time before aggregating — event rows
    * move only for users still in the funnel. No window, no
    * per-user state. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             horizonSec: Long): DataFrame = {
    require(steps.nonEmpty, "funnel: no steps")
    val ev = events.select(col(userCol).as("_u"),
      unix_timestamp(col(tsCol)).as("_t"), col(typeCol).as("_y"))
    val first = ev.filter(col("_y") === steps.head)
      .groupBy(col("_u")).agg(min(col("_t")).as("_t1"))
      .withColumn("_tp", col("_t1"))
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      ev.filter(col("_y") === step)
        .join(prev.select(col("_u"), col("_t1"), col("_tp")), Seq("_u"))
        .filter(col("_t") > col("_tp") &&
          col("_t") <= col("_t1") + lit(horizonSec))
        .groupBy(col("_u"), col("_t1"))
        .agg(min(col("_t")).as("_tp"))
    }
    reached.zip(steps.toSeq).zipWithIndex.map {
      case ((df, name), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(name).as("event_type"),
            col("n_users"))
    }.reduce(_ union _)
  }

  /** Event-transition matrix (the Sankey behind a funnel): for every
    * consecutive pair of events per user (ordered by time, tie broken
    * on `tieCol`), count `(from_type, to_type)` — where users actually
    * go next, not just whether they complete a prescribed path. One
    * lag window partitioned by the user key (user-scale partitions,
    * streaming-friendly frame) and one hash aggregation on the
    * types-squared key. */
  def eventTransitions(events: DataFrame, userCol: String,
                       tsCol: String, typeCol: String,
                       tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events.select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }
}
