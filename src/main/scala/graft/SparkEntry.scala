package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry pairs a Spark DataFrame pipeline (the library op applied
  * to the driver testdata) with ANSI SQL the driver runs in DuckDB on the
  * same parquet. Determinism rules used throughout (so hash-compare is
  * exact at any parallelism — see graft.util.Exact):
  *   - double sums routed through DECIMAL (order-independent), one final
  *     cast back to double;
  *   - every query ends in a total-order ORDER BY on non-null keys;
  *   - integer-ish outputs cast to BIGINT on both sides;
  *   - timestamps surfaced as epoch-second BIGINT or formatted strings,
  *     never raw timestamp values (ns-vs-µs precision hazard).
  */
object SparkEntry {

  /** events with ts normalized to session-TZ (UTC) TimestampType. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("ts", col("ts").cast("timestamp"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full prediction pipeline: all-camera slot prediction + threshold
    * rules engine (SURVEY §3.2) — the reference's N+1 collapsed to one job. */
  def entry(spark: SparkSession): DataFrame =
    predictSlotRules(spark, "/root/testdata/sf0.001")

  private def predictSlotRules(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val keys = e.select(col("user_id")).distinct()
    val th = Percentiles.thresholds(e, "user_id", "ts", "value")
      .filter(col("user_id") < 100) // leave keys >= 100 on the default path
    val pred = Predict.predictSlot(e, keys, "user_id", "ts", "value",
      dow = 1, hr = 8)
    Predict.withStatus(pred, th, "user_id").orderBy("user_id")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A8: time-bucketed history (the /api/history chart query) ----
    "a8_history_buckets_15m" -> ((s, dir) =>
      TimeBuckets.history(ev(s, dir), "ts", "value", 900, "HH:mm")),
    "a8_history_day_aligned" -> ((s, dir) =>
      TimeBuckets.dayAligned(ev(s, dir), "ts", "value", "day")),
    "a8_history_dense_1h" -> ((s, dir) =>
      TimeBuckets.dense(ev(s, dir), "ts", "value", 3600)),
    // ---- A1/A2/A3/A10/A13: totals and roll-ups ----
    "a1_totals_global" -> ((s, dir) => Totals.global(ev(s, dir), "value")),
    "a2_totals_trailing_7d" -> ((s, dir) =>
      Totals.trailing(ev(s, dir), "ts", "value", 7L * 86400)),
    "a3_totals_by_camera" -> ((s, dir) =>
      Totals.byKey(ev(s, dir), "user_id", "value")),
    "a10_rollup_by_type" -> ((s, dir) =>
      Totals.rollupByKey(ev(s, dir), "event_type", "value")),
    "a13_distinct_types" -> ((s, dir) =>
      Totals.distinctKeys(ev(s, dir), "event_type")),
    // ---- A7: multi-window rolling stats ----
    "a7_window_stats" -> ((s, dir) =>
      WindowStats.multiWindow(ev(s, dir), "ts", "value",
        Seq("1h" -> 3600L, "5h" -> 18000L, "24h" -> 86400L, "7d" -> 604800L))),
    // ---- A5/A6: hourly volumes → exact percentile thresholds ----
    "a6_thresholds" -> ((s, dir) =>
      Percentiles.thresholds(ev(s, dir), "user_id", "ts", "value")),
    // ---- A4/J4: prediction pattern (two-level agg, all slots) ----
    "a4_predict_pattern" -> ((s, dir) =>
      Predict.hourlyPattern(ev(s, dir), "user_id", "ts", "value")
        .select(col("user_id"), col("dow").cast("long").as("dow"),
          col("hr").cast("long").as("hr"), col("predicted_volume"))
        .orderBy("user_id", "dow", "hr")),
    // ---- flagship: slot prediction + J3 thresholds + rules engine ----
    "j4_predict_slot_rules" -> ((s, dir) => predictSlotRules(s, dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "a8_history_buckets_15m" ->
      """WITH b AS (
        |  SELECT CAST(floor(epoch(ts)/900)*900 AS BIGINT) AS bucket_ts,
        |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
        |         COUNT(*) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT bucket_ts, total_value, n_events,
        |       strftime(make_timestamp(bucket_ts*1000000), '%H:%M') AS label
        |FROM b ORDER BY bucket_ts""".stripMargin,
    "a8_history_day_aligned" ->
      """SELECT CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
        |       COUNT(*) AS n_events,
        |       CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS bucket_ts
        |FROM events GROUP BY 3 ORDER BY 3""".stripMargin,
    "a8_history_dense_1h" ->
      """WITH bounds AS (
        |  SELECT CAST(floor(min(epoch(ts))/3600)*3600 AS BIGINT) AS lo,
        |         CAST(floor(max(epoch(ts))/3600)*3600 AS BIGINT) AS hi
        |  FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, 3600)) AS bucket_ts FROM bounds),
        |agg AS (
        |  SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_ts,
        |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
        |         COUNT(*) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT s.bucket_ts AS bucket_ts,
        |       COALESCE(a.total_value, 0.0) AS total_value,
        |       COALESCE(a.n_events, 0) AS n_events
        |FROM spine s LEFT JOIN agg a USING (bucket_ts)
        |ORDER BY s.bucket_ts""".stripMargin,
    "a1_totals_global" ->
      """SELECT CAST(COALESCE(SUM(CAST(value AS DECIMAL(28,2))), 0) AS DOUBLE) AS total_value,
        |       COUNT(*) AS n_rows
        |FROM events""".stripMargin,
    "a2_totals_trailing_7d" ->
      """SELECT CAST(COALESCE(SUM(CAST(value AS DECIMAL(28,2))), 0) AS DOUBLE) AS total_value,
        |       COUNT(*) AS n_rows
        |FROM events
        |WHERE floor(epoch(ts)) >= (SELECT max(floor(epoch(ts))) FROM events) - 604800""".stripMargin,
    "a3_totals_by_camera" ->
      """SELECT user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
        |       COUNT(*) AS n_rows
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a10_rollup_by_type" ->
      """SELECT event_type,
        |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
        |       COUNT(*) AS n_rows,
        |       CAST(GROUPING(event_type) AS INT) AS lvl
        |FROM events GROUP BY ROLLUP(event_type)
        |ORDER BY lvl, event_type""".stripMargin,
    "a13_distinct_types" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "a7_window_stats" -> {
      val w = Seq("1h" -> 3600L, "5h" -> 18000L, "24h" -> 86400L, "7d" -> 604800L)
      val cols = w.map { case (l, sec) =>
        s"""CAST(COALESCE(SUM(CASE WHEN floor(epoch(ts)) >= m.now_ts - $sec THEN CAST(value AS DECIMAL(28,2)) END), 0) AS DOUBLE) AS total_$l,
           |COUNT(CASE WHEN floor(epoch(ts)) >= m.now_ts - $sec THEN 1 END) AS n_$l,
           |round(CAST(COALESCE(SUM(CASE WHEN floor(epoch(ts)) >= m.now_ts - $sec THEN CAST(value AS DECIMAL(28,2)) END), 0) AS DOUBLE)
           |  / greatest(COUNT(CASE WHEN floor(epoch(ts)) >= m.now_ts - $sec THEN 1 END), 1), 2) AS avg_$l""".stripMargin
      }.mkString(",\n")
      s"""WITH m AS (SELECT max(floor(epoch(ts))) AS now_ts FROM events)
         |SELECT
         |$cols
         |FROM events, m GROUP BY m.now_ts""".stripMargin
    },
    "a6_thresholds" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS hourly_volume
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |       round(quantile_cont(hourly_volume, 0.5), 6) AS p50,
        |       round(quantile_cont(hourly_volume, 0.75), 6) AS p75,
        |       round(quantile_cont(hourly_volume, 0.9), 6) AS p90,
        |       max(hourly_volume) AS max_volume
        |FROM hourly GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a4_predict_pattern" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(dayofweek(ts) AS BIGINT) AS dow,
        |         CAST(hour(ts) AS BIGINT) AS hr, CAST(ts AS DATE) AS d,
        |         SUM(CAST(value AS DECIMAL(28,2))) AS hourly_total
        |  FROM events GROUP BY 1, 2, 3, 4)
        |SELECT user_id, dow, hr,
        |       CAST(SUM(hourly_total) AS DOUBLE) / COUNT(*) AS predicted_volume
        |FROM daily GROUP BY 1, 2, 3 ORDER BY user_id, dow, hr""".stripMargin,
    "j4_predict_slot_rules" ->
      """WITH keys AS (SELECT DISTINCT user_id FROM events),
        |daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |         SUM(CAST(value AS DECIMAL(28,2))) AS hourly_total
        |  FROM events WHERE dayofweek(ts) = 1 AND hour(ts) = 8
        |  GROUP BY 1, 2),
        |slot AS (
        |  SELECT user_id, CAST(SUM(hourly_total) AS DOUBLE) / COUNT(*) AS pv
        |  FROM daily GROUP BY 1),
        |hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS hourly_volume
        |  FROM events GROUP BY 1, 2),
        |th AS (
        |  SELECT user_id,
        |         round(quantile_cont(hourly_volume, 0.5), 6) AS p50,
        |         round(quantile_cont(hourly_volume, 0.75), 6) AS p75,
        |         round(quantile_cont(hourly_volume, 0.9), 6) AS p90
        |  FROM hourly GROUP BY user_id HAVING user_id < 100),
        |pred AS (
        |  SELECT k.user_id AS user_id, COALESCE(s.pv, 0.0) AS predicted_volume
        |  FROM keys k LEFT JOIN slot s USING (user_id)),
        |joined AS (
        |  SELECT p.user_id AS user_id, p.predicted_volume AS predicted_volume,
        |         COALESCE(t.p50, 100.0) AS p50,
        |         COALESCE(t.p75, 200.0) AS p75,
        |         COALESCE(t.p90, 300.0) AS p90
        |  FROM pred p LEFT JOIN th t USING (user_id))
        |SELECT user_id, predicted_volume, p50, p75, p90,
        |       CASE WHEN predicted_volume > p90 THEN 'MACET TOTAL'
        |            WHEN predicted_volume > p75 THEN 'MACET'
        |            WHEN predicted_volume > p50 THEN 'PADAT LANCAR'
        |            ELSE 'LANCAR' END AS status,
        |       CASE WHEN predicted_volume > p90 THEN 'Cari rute alternatif'
        |            WHEN predicted_volume > p75 THEN 'Pertimbangkan rute lain'
        |            WHEN predicted_volume > p50 THEN 'Waspada perlambatan'
        |            ELSE 'Lalu lintas lancar' END AS recommendation
        |FROM joined ORDER BY user_id""".stripMargin,
  )
}
