package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Exact

/** A8 — the `/api/history` chart query family.
  *
  * Reference semantics: bucket epoch timestamps to a fixed interval via
  * `int(ts // interval) * interval`, accumulate sums per bucket, sort by
  * bucket, format a display label (reference: app/routes.py:105-137; the
  * in-memory dense-bucket variant app/utils.py:567-689; period→interval
  * table app/routes.py:83-103).
  *
  * Spark-first design: one `groupBy` on the computed bucket column — a
  * single shuffle keyed on the bucket, partial (map-side) aggregation
  * first, so at 100 TB the shuffle carries one row per (partition ×
  * bucket), not per event. Label formatting happens after aggregation
  * (cardinality = number of buckets, not rows).
  */
object TimeBuckets {

  /** Epoch-floor bucket: `floor(epoch(ts) / interval) * interval`,
    * the exact arithmetic of reference app/routes.py:112. */
  def bucketCol(ts: Column, intervalSec: Long): Column =
    (floor(unix_timestamp(ts) / intervalSec) * intervalSec).cast("long")

  /** Tumbling-bucket aggregation with a formatted label
    * (reference label formats: app/routes.py:124-127). */
  def history(events: DataFrame, tsCol: String, valueCol: String,
              intervalSec: Long, labelFmt: String = "HH:mm"): DataFrame =
    events
      .groupBy(bucketCol(col(tsCol), intervalSec).as("bucket_ts"))
      .agg(
        Exact.dsum2(col(valueCol)).as("total_value"),
        count(lit(1)).as("n_events"))
      .withColumn("label", date_format(timestamp_seconds(col("bucket_ts")), labelFmt))
      .orderBy("bucket_ts")

  /** Day-aligned variant (reference app/utils.py:614-647: 24h/custom
    * modes align buckets to day/hour starts via mktime of Y/M/D). */
  def dayAligned(events: DataFrame, tsCol: String, valueCol: String,
                 unit: String): DataFrame =
    events
      .groupBy(date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(
        Exact.dsum2(col(valueCol)).as("total_value"),
        count(lit(1)).as("n_events"))
      .withColumn("bucket_ts", unix_timestamp(col("bucket")))
      .drop("bucket")
      .orderBy("bucket_ts")

  /** Dense (zero-filled) bucket spine — reference X8 pre-allocates
    * zero-filled buckets then fills (app/utils.py:663-689). Spark form:
    * `sequence()` + `explode` calendar spine, left join, coalesce to 0.
    * The spine is tiny (one row per bucket) → broadcast to the agg side;
    * at 100 TB the expensive side is already aggregated before the join.
    */
  def dense(events: DataFrame, tsCol: String, valueCol: String,
            intervalSec: Long): DataFrame = {
    val agg = history(events, tsCol, valueCol, intervalSec).drop("label")
    val bounds = events.agg(
      (floor(min(unix_timestamp(col(tsCol))) / intervalSec) * intervalSec)
        .cast("long").as("lo"),
      (floor(max(unix_timestamp(col(tsCol))) / intervalSec) * intervalSec)
        .cast("long").as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), lit(intervalSec))).as("bucket_ts"))
    spine.join(agg, Seq("bucket_ts"), "left")
      .select(
        col("bucket_ts"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("bucket_ts")
  }

  /** Period→(span, interval) plan-selection table — the reference's
    * `/api/history?period=` dispatch (app/routes.py:83-103): each period
    * name fixes a trailing time span and a bucket width. */
  val periods: Map[String, (Long, Long)] = Map(
    "30m" -> (1800L, 60L),
    "1h" -> (3600L, 60L),
    "6h" -> (21600L, 300L),
    "12h" -> (43200L, 900L),
    "24h" -> (86400L, 1800L),
    "7d" -> (604800L, 14400L),
    "30d" -> (2592000L, 86400L))

  /** Resolve a period name, falling back — like the reference's if/elif
    * dispatch, whose pre-set defaults survive an unrecognized name
    * (app/routes.py:79-103) — to the 30m span / 60s interval. */
  def spanInterval(period: String): (Long, Long) =
    periods.getOrElse(period, (1800L, 60L))

  /** A8 by period name: trailing-span filter anchored at the data's max
    * timestamp (deterministic "now", like A2), bucketed at the period's
    * interval. The span filter is a broadcast of one scalar row — at
    * 100 TB the time predicate reaches the scan (PushdownNanosTs) and
    * the groupBy stays one bucket-keyed shuffle. */
  def forPeriod(events: DataFrame, tsCol: String, valueCol: String,
                period: String, labelFmt: String = "HH:mm"): DataFrame = {
    val (span, interval) = spanInterval(period)
    val now = events.agg(max(unix_timestamp(col(tsCol))).as("_now_ts"))
    val filtered = events.crossJoin(broadcast(now))
      .filter(unix_timestamp(col(tsCol)) >= col("_now_ts") - span)
      .drop("_now_ts")
    history(filtered, tsCol, valueCol, interval, labelFmt)
  }

  /** The production variant of [[forPeriod]]: `now` is a LITERAL epoch
    * (the API caller's wall clock, routes.py:87), so the span bound is
    * a plan-time timestamp comparison that predicate pushdown — and
    * plans.PushdownNanosTs through the TIMESTAMP(NANOS) conversion —
    * delivers to the parquet footers. The data-max-anchored overload
    * above cannot prune the scan (its bound is a runtime scalar); at
    * 100 TB that is the difference between reading 7 days and reading
    * the lake, so serve charts through THIS one. Equal output whenever
    * `nowEpoch` equals the data max (pinned in ReferenceSemanticsSpec,
    * plan-asserted in NanosPushdownSpec). */
  def forPeriodAt(events: DataFrame, tsCol: String, valueCol: String,
                  period: String, nowEpoch: Long,
                  labelFmt: String = "HH:mm"): DataFrame = {
    val (span, interval) = spanInterval(period)
    val filtered = events.filter(
      col(tsCol) >= timestamp_seconds(lit(nowEpoch - span)))
    history(filtered, tsCol, valueCol, interval, labelFmt)
  }

  /** A8 "custom" period (the drifted `/api/history?period=custom&start_ts`
    * surface, SURVEY §2.11; in-memory impl at reference app/utils.py:
    * 570-612): one full day of day-aligned buckets starting at the
    * midnight of `startTs`, dense (zero-filled) like the reference's
    * pre-allocated buckets. */
  def customDay(events: DataFrame, tsCol: String, valueCol: String,
                startTsEpoch: Long, intervalSec: Long): DataFrame = {
    val dayStart = startTsEpoch - java.lang.Math.floorMod(startTsEpoch, 86400L)
    val filtered = events.filter(
      unix_timestamp(col(tsCol)) >= dayStart &&
        unix_timestamp(col(tsCol)) < dayStart + 86400L)
    val agg = history(filtered, tsCol, valueCol, intervalSec).drop("label")
    val spine = events.sparkSession.range(86400L / intervalSec)
      .select((lit(dayStart) + col("id") * intervalSec).as("bucket_ts"))
    spine.join(agg, Seq("bucket_ts"), "left")
      .select(col("bucket_ts"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("bucket_ts")
  }

  /** Per-key gap-fill with linear interpolation — the telemetry
    * question [[dense]]'s zero-fill answers wrongly for continuous
    * signals: an unobserved bucket between two readings means "the
    * sensor was between them", not "the value was 0". Buckets the
    * events per key, builds each key's dense spine between its OWN
    * first and last observed bucket, and fills interior gaps by
    * linear interpolation between the nearest observed neighbors
    * (`observed` marks real buckets; the spine's endpoints are
    * observed by construction, so no edge extrapolation is invented).
    *
    * Scale shape: the aggregation is a hash agg on `(key, bucket)`;
    * then ONE `lead` window per key ORDER BY bucket generates each
    * gap's rows directly — `sequence(prev+1, next−1)` exploded from
    * the observed row that precedes the gap, with the interpolated
    * value computed AT GENERATION (prev/next value and time are both
    * on that row), unioned with the observed rows. Gaps exist only
    * between consecutive observed buckets of one key, so the spine
    * endpoints are observed by construction and nothing is
    * extrapolated — identical semantics to the earlier
    * spine-join + IGNORE-NULLS-fill formulation (hash-pinned by the
    * oracle) at a fraction of the plan: no bounds aggregate, no
    * dense-spine join (measured 5.9 → ~1 s). Buckets whose events all
    * carry NULL values are interpolated through (nearest non-null
    * neighbors anchor the fill), exactly as the IGNORE-NULLS form and
    * the oracle do — no non-null-valueCol precondition.
    * Interpolation arithmetic is plain IEEE doubles in a fixed
    * expression shape, replayed verbatim by the DuckDB oracle
    * (`a8_interpolate_gaps`).
    */
  def interpolateGaps(events: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, intervalSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = events.select(col(keyCol),
        (floor(unix_timestamp(col(tsCol)) / intervalSec) * intervalSec)
          .cast("long").as("bucket_ts"),
        col(valueCol))
      .groupBy(col(keyCol), col("bucket_ts"))
      .agg(Exact.dsum2(col(valueCol)).as("obs_value"),
        count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ts"))
    // Anchor every row on its nearest NON-NULL-valued neighbors, not
    // its adjacent rows: a bucket whose events all carry NULL values
    // aggregates to obs_value NULL, and the contract (matching the
    // spine-join + IGNORE-NULLS-fill formulation this replaced, which
    // the oracle still replays) is to interpolate THROUGH such
    // buckets, not to emit NULL and poison the adjacent gaps. The
    // backward anchors ride w's RUNNING frame; the forward anchors
    // ride a DESCENDING-order running frame (last-ignoreNulls over
    // rows already seen in descending order = first non-null
    // at-or-after the row in ascending order) — running frames
    // stream in O(rows), where the first cut's UNBOUNDED FOLLOWING
    // frames re-scanned ahead per row and benched 0.36 → 2.5 s at
    // sf0.1. Both orders share the one hash partitioning on the key
    // (two in-partition sorts, no extra exchange); with non-null
    // values (_pv,_pt)=(obs,bucket) and (_nvE,_ntE)=(lead obs, lead
    // bucket), so the arithmetic — and the oracle hash — is
    // bit-identical to the plain-lead form.
    val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(col(keyCol))
      .orderBy(col("bucket_ts").desc)
    val wNextI = wDesc.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wNextE = wDesc.rowsBetween(Window.unboundedPreceding, -1)
    val obsTs = when(col("obs_value").isNotNull, col("bucket_ts"))
    val withNext = b.select(col(keyCol), col("bucket_ts"),
      col("obs_value"), col("n_events"),
      lead(col("bucket_ts"), 1).over(w).as("_nt"),
      last(col("obs_value"), ignoreNulls = true).over(wPrev).as("_pv"),
      last(obsTs, ignoreNulls = true).over(wPrev).as("_pt"),
      last(col("obs_value"), ignoreNulls = true).over(wNextI).as("_nvI"),
      last(obsTs, ignoreNulls = true).over(wNextI).as("_ntI"),
      last(col("obs_value"), ignoreNulls = true).over(wNextE).as("_nvE"),
      last(obsTs, ignoreNulls = true).over(wNextE).as("_ntE"))
    def fill(pv: Column, pt: Column, nv: Column, nt: Column): Column =
      when(pv.isNull, nv).when(nv.isNull, pv)
        .otherwise(pv + (nv - pv) *
          ((col("bucket_ts") - pt).cast("double") /
            (nt - pt).cast("double")))
    val observedRows = withNext.select(col(keyCol), col("bucket_ts"),
      col("n_events"),
      when(col("obs_value").isNotNull, col("obs_value"))
        .otherwise(fill(col("_pv"), col("_pt"), col("_nvI"), col("_ntI")))
        .as("value"),
      col("obs_value").isNotNull.as("observed"))
    val gapRows = withNext
      .filter(col("_nt") > col("bucket_ts") + intervalSec)
      .select(col(keyCol), col("_pv"), col("_pt"), col("_nvE"),
        col("_ntE"),
        explode(sequence(col("bucket_ts") + intervalSec,
          col("_nt") - intervalSec, lit(intervalSec))).as("bucket_ts"))
      .select(col(keyCol), col("bucket_ts"), lit(0L).as("n_events"),
        fill(col("_pv"), col("_pt"), col("_nvE"), col("_ntE")).as("value"),
        lit(false).as("observed"))
    observedRows.union(gapRows)
  }
}
