package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's `traffic_stats.json` snapshot document (S7/S8,
  * app/utils.py:405-511): a nested doc
  * `{sources: {camera_id: stats}, global_total: {...},
  *   window_stats: {"1h": {...}, ...}, last_update}`
  * plus a LEGACY flat format `{camera_id: stats}` normalized on load
  * (utils.py:417-433; migration scripts/migrate_stats.py:26-51).
  *
  * Spark-first: the snapshot is a DERIVED VIEW — one aggregation job
  * over the observations table, written via the JSON sink (Spark's
  * commit protocol replaces the reference's tmp→bak→rename dance, X9).
  * Reading tries the v2 schema and falls back to legacy (detected by the
  * `sources` key), exploding either into the same per-camera rows.
  */
object Snapshot {

  private val statsStruct: StructType = StructType(Seq(
    StructField("accumulated_count", LongType),
    StructField("accumulated_cars", LongType),
    StructField("accumulated_motors", LongType),
    StructField("current_count", LongType),
    StructField("last_update", DoubleType)))

  /** Build the v2 snapshot doc from observation rows: per-camera stats
    * (running totals + last density), global roll-up, multi-window flux
    * sums. One job, two shuffles (camera agg, global agg). */
  def build(obs: DataFrame, windows: Seq[(String, Long)]): DataFrame = {
    val perCam = obs.groupBy(col("camera_id"))
      .agg(sum("new_count").as("accumulated_count"),
        sum("new_cars").as("accumulated_cars"),
        sum("new_motors").as("accumulated_motors"),
        max_by(col("total_count"), col("ts")).as("current_count"),
        (unix_timestamp(max(col("ts")))).cast("double").as("last_update"))
    val sources = perCam.agg(
      map_from_entries(sort_array(collect_list(struct(
        col("camera_id"),
        struct(col("accumulated_count"), col("accumulated_cars"),
          col("accumulated_motors"), col("current_count"),
          col("last_update")))))).as("sources"))
    val global = perCam.agg(
      struct(sum("accumulated_count").as("accumulated_count"),
        sum("accumulated_cars").as("cars"),
        sum("accumulated_motors").as("motorcycles"),
        sum("current_count").as("current_count")).as("global_total"))
    val now = obs.agg(max(unix_timestamp(col("ts"))).as("now_ts"))
    val winAggs = windows.map { case (label, sec) =>
      struct(
        coalesce(sum(when(unix_timestamp(col("ts")) >= col("now_ts") - sec,
          col("new_count"))), lit(0L)).as("total_volume"),
        coalesce(sum(when(unix_timestamp(col("ts")) >= col("now_ts") - sec,
          col("new_cars"))), lit(0L)).as("cars"),
        coalesce(sum(when(unix_timestamp(col("ts")) >= col("now_ts") - sec,
          col("new_motors"))), lit(0L)).as("motors")).as(s"w_$label")
    }
    val winStats = obs.crossJoin(broadcast(now))
      .groupBy(col("now_ts"))
      .agg(winAggs.head, winAggs.tail: _*)
      .select(map(windows.flatMap { case (label, _) =>
        Seq(lit(label), col(s"w_$label"))
      }: _*).as("window_stats"),
        col("now_ts").cast("double").as("last_update"))
    sources.crossJoin(global).crossJoin(winStats)
  }

  /** S8 — write the snapshot (one nested row) as JSON. */
  def write(snapshot: DataFrame, path: String): Unit =
    snapshot.coalesce(1).write.mode("overwrite").json(path)

  /** S7 — read a snapshot back into per-camera rows, accepting BOTH the
    * v2 nested format and the legacy flat map. Detection mirrors the
    * reference: presence of the `sources` key (utils.py:420). */
  def readSources(s: SparkSession, path: String): DataFrame = {
    val raw = s.read.option("wholetext", value = true).text(path)
    val v2 = StructType(Seq(
      StructField("sources", MapType(StringType, statsStruct))))
    // Both parses as columns of the SAME row (not a crossJoin of two
    // derived one-row frames): with >1 input file the cross join would
    // multiply rows and pair mismatched parses.
    val chosen = raw.select(coalesce(
      from_json(col("value"), v2).getField("sources"),
      from_json(col("value"), MapType(StringType, statsStruct))).as("m"))
    chosen.select(explode(col("m")).as(Seq("camera_id", "st")))
      .select(col("camera_id"), col("st.accumulated_count"),
        col("st.accumulated_cars"), col("st.accumulated_motors"),
        col("st.current_count"), col("st.last_update"))
  }
}
