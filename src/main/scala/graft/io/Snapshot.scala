package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's `traffic_stats.json` snapshot document (S7/S8,
  * app/utils.py:405-511): a nested doc
  * `{sources: {camera_id: stats}, global_total: {...},
  *   window_stats: {"1h": {...}, ...}, last_update}`
  * plus a LEGACY flat format `{camera_id: stats}` normalized on load
  * (utils.py:417-433; migration scripts/migrate_stats.py:26-51).
  *
  * Spark-first: the snapshot is a DERIVED VIEW over observation rows,
  * written via the JSON sink (Spark's commit protocol replaces the
  * reference's tmp→bak→rename dance, X9). The view decomposes into
  * MERGEABLE pieces so the streaming sink can maintain it
  * incrementally (graft.streaming.Ingest.startSnapshotSink):
  *   - [[perCamera]] — per-camera lifetime roll-up (sums + argmax);
  *     [[mergePerCamera]] folds a new batch's roll-up into persisted
  *     state, so accumulated_* never re-reads history;
  *   - [[applyMirrors]] — the mirror short-circuit
  *     (app/services/camera.py:140-154): a camera configured with
  *     `mirror_id` serves its source's stats verbatim;
  *   - [[assemble]] — wraps a per-camera frame plus a (bounded)
  *     observation slice for the trailing windows into the nested doc.
  * [[build]] = perCamera → mirrors → assemble over the full history;
  * the incremental sink runs the same code over state + a
  * watermark-horizon slice and produces a byte-identical document.
  */
object Snapshot {

  private val statsStruct: StructType = StructType(Seq(
    StructField("accumulated_count", LongType),
    StructField("accumulated_cars", LongType),
    StructField("accumulated_motors", LongType),
    StructField("current_count", LongType),
    StructField("last_update", DoubleType)))

  /** Per-camera lifetime stats at the observation grain: running totals
    * (flux sums), last density (argmax by ts) and last-update epoch.
    * `_max_ts` carries the exact (µs) max timestamp purely as the merge
    * tiebreak key — `last_update` is floored to seconds for doc parity
    * with the reference, which is too coarse to order batches. */
  def perCamera(obs: DataFrame): DataFrame =
    obs.groupBy(col("camera_id"))
      .agg(sum("new_count").as("accumulated_count"),
        sum("new_cars").as("accumulated_cars"),
        sum("new_motors").as("accumulated_motors"),
        max_by(col("total_count"), col("ts")).as("current_count"),
        (unix_timestamp(max(col("ts")))).cast("double").as("last_update"),
        max(col("ts")).as("_max_ts"))

  private val statCols = Seq("accumulated_count", "accumulated_cars",
    "accumulated_motors", "current_count", "last_update", "_max_ts")

  /** Fold a new batch's [[perCamera]] roll-up into persisted state:
    * lifetime sums ADD; the density/last-update slots come from
    * whichever side owns the later `_max_ts` (so an out-of-order batch
    * cannot roll `current_count` backwards). Full outer join — cameras
    * appear on either side. The result is exactly `perCamera(all obs so
    * far)`, without ever touching history. */
  def mergePerCamera(state: DataFrame, batch: DataFrame): DataFrame = {
    val s = state.select(col("camera_id") +:
      statCols.map(c => col(c).as(s"s_$c")): _*)
    val b = batch.select(col("camera_id") +:
      statCols.map(c => col(c).as(s"b_$c")): _*)
    def add(c: String): Column =
      (coalesce(col(s"s_$c"), lit(0L)) + coalesce(col(s"b_$c"), lit(0L))).as(c)
    val batchNewer = col("b__max_ts").isNotNull &&
      (col("s__max_ts").isNull || col("b__max_ts") >= col("s__max_ts"))
    s.join(b, Seq("camera_id"), "full_outer")
      .select(col("camera_id"),
        add("accumulated_count"), add("accumulated_cars"),
        add("accumulated_motors"),
        when(batchNewer, col("b_current_count"))
          .otherwise(col("s_current_count")).as("current_count"),
        when(batchNewer, col("b_last_update"))
          .otherwise(col("s_last_update")).as("last_update"),
        when(batchNewer, col("b__max_ts"))
          .otherwise(col("s__max_ts")).as("_max_ts"))
  }

  /** Mirror short-circuit (app/services/camera.py:140-154): a camera
    * whose catalog row sets `mirror_id` serves the FULL stats row of
    * its source — current and accumulated alike, exactly the
    * reference's per-tick copy. A mirror camera needs no observations
    * of its own (the reference skips processing entirely in mirror
    * mode); one with a missing/stat-less source keeps its own stats
    * (the reference's `mirror_id in global_stats` guard). `mirrors` is
    * catalog-sized → broadcast; the source-side self-join is
    * camera-bounded. */
  def applyMirrors(perCam: DataFrame, mirrors: DataFrame): DataFrame = {
    val cols = perCam.columns.filterNot(_ == "camera_id").toSeq
    require(cols.contains("last_update"), "stats frame needs last_update")
    val mm = broadcast(mirrors.select(col("camera_id"), col("mirror_id"))
      .filter(col("mirror_id").isNotNull))
    val all = perCam.select(col("camera_id"))
      .union(mm.select(col("camera_id"))).distinct()
    val own = perCam.select(col("camera_id") +:
      cols.map(c => col(c).as(s"o_$c")): _*)
    val src = perCam.select(col("camera_id").as("mirror_id") +:
      cols.map(c => col(c).as(s"m_$c")): _*)
    val useMirror = col("mirror_id").isNotNull &&
      col("m_last_update").isNotNull
    all.join(mm, Seq("camera_id"), "left")
      .join(own, Seq("camera_id"), "left")
      .join(src, Seq("mirror_id"), "left")
      .select(col("camera_id") +: cols.map(c =>
        when(useMirror, col(s"m_$c")).otherwise(col(s"o_$c")).as(c)): _*)
      .filter(col("last_update").isNotNull)
  }

  /** Window-history duplication for mirrors: the reference copies the
    * source's history deque into the mirror's entry, and save_stats
    * extends `all_history` with every entry — so mirrored history is
    * counted TWICE in window_stats (utils.py:457-476). This reproduces
    * that: one extra copy of the source's observations, relabeled as
    * the mirror camera. */
  def withMirroredObs(obs: DataFrame, mirrors: DataFrame): DataFrame = {
    val mm = broadcast(mirrors.filter(col("mirror_id").isNotNull)
      .select(col("mirror_id").as("camera_id"),
        col("camera_id").as("_as_cam")))
    val copies = obs.join(mm, Seq("camera_id"))
      .withColumn("camera_id", col("_as_cam")).drop("_as_cam")
      .select(obs.columns.map(col).toIndexedSeq: _*)
    obs.union(copies)
  }

  /** Wrap a per-camera stats frame plus an observation slice into the
    * nested v2 doc. `winObs` only needs to cover the longest trailing
    * window (older rows contribute nothing to the CASE-filtered sums
    * and cannot own the max timestamp) — which is what lets the
    * streaming sink pass a bounded slice instead of the lake. */
  def assemble(perCam: DataFrame, winObs: DataFrame,
               windows: Seq[(String, Long)]): DataFrame = {
    val pc = perCam.drop("_max_ts")
    val sources = pc.agg(
      map_from_entries(sort_array(collect_list(struct(
        col("camera_id"),
        struct(col("accumulated_count"), col("accumulated_cars"),
          col("accumulated_motors"), col("current_count"),
          col("last_update")))))).as("sources"))
    val global = pc.agg(
      struct(sum("accumulated_count").as("accumulated_count"),
        sum("accumulated_cars").as("cars"),
        sum("accumulated_motors").as("motorcycles"),
        sum("current_count").as("current_count")).as("global_total"))
    val now = winObs.agg(max(unix_timestamp(col("ts"))).as("now_ts"))
    val winAggs = windows.map { case (label, sec) =>
      struct(
        coalesce(sum(when(unix_timestamp(col("ts")) >= col("now_ts") - sec,
          col("new_count"))), lit(0L)).as("total_volume"),
        coalesce(sum(when(unix_timestamp(col("ts")) >= col("now_ts") - sec,
          col("new_cars"))), lit(0L)).as("cars"),
        coalesce(sum(when(unix_timestamp(col("ts")) >= col("now_ts") - sec,
          col("new_motors"))), lit(0L)).as("motors")).as(s"w_$label")
    }
    val winStats = winObs.crossJoin(broadcast(now))
      .groupBy(col("now_ts"))
      .agg(winAggs.head, winAggs.tail: _*)
      .select(map(windows.flatMap { case (label, _) =>
        Seq(lit(label), col(s"w_$label"))
      }: _*).as("window_stats"),
        col("now_ts").cast("double").as("last_update"))
    sources.crossJoin(global).crossJoin(winStats)
  }

  /** Build the v2 snapshot doc from observation rows: per-camera stats
    * (running totals + last density), global roll-up (which, like the
    * reference's save_stats loop, includes mirrored copies — mirrors
    * double-count by design), multi-window flux sums. */
  def build(obs: DataFrame, windows: Seq[(String, Long)],
            mirrors: Option[DataFrame] = None): DataFrame = {
    val pc0 = perCamera(obs)
    val pc = mirrors.map(m => applyMirrors(pc0, m)).getOrElse(pc0)
    val winObs = mirrors.map(m => withMirroredObs(obs, m)).getOrElse(obs)
    assemble(pc, winObs, windows)
  }

  /** S8 — write the snapshot (one nested row) as JSON, published via
    * the reference's tmp→bak→move protocol (utils.py:494-508, X9): the
    * slow part (computing + writing the doc) happens in a staging
    * directory, the live doc is renamed aside — never unlinked — and
    * only then replaced, so a crash at any point leaves a complete doc
    * on disk ([[Fs.publish]]). */
  def write(snapshot: DataFrame, path: String): Unit = {
    val s = snapshot.sparkSession
    val staging = path + "_tmp"
    Fs.delete(s, staging)
    snapshot.coalesce(1).write.mode("overwrite").json(staging)
    Fs.publish(s, staging, path)
  }

  /** S7 — read a snapshot back into per-camera rows, accepting BOTH the
    * v2 nested format and the legacy flat map. Detection mirrors the
    * reference: presence of the `sources` key (utils.py:420).
    *
    * Crash-recovery half of the bak-swap protocol: like the reference's
    * loader, which tries the main file and then `.bak`
    * (app/utils.py:405-441), the read first heals a crash inside
    * [[Fs.publish]] — if `path` is missing but `_bak_<leaf>` survives,
    * the bak is moved back into place before reading, so a crash
    * between publish's two renames costs nothing but the not-yet-live
    * update. */
  def readSources(s: SparkSession, path: String): DataFrame = {
    Fs.recoverPublished(s, path)
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
