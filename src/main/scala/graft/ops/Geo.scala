package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2.10 — congestion-aware route ETA (reference: client-side JS at
  * app/templates/dashboard.html:1161-1232): each route segment picks the
  * minimum speed among congestion zones within range, route ETA is the
  * sum of segment times, and the best route is the argmin.
  *
  * Spark shape: J7 broadcast range join (zones are a catalog — the
  * broadcast side) → per-segment min → per-route sum → min_by. At 100 TB
  * of segments this stays one broadcast join + two shuffles (segment,
  * route), no driver loop.
  */
object Geo {

  /** Haversine distance in meters (spherical earth, R=6371 km) — the
    * general-purpose distance used when planar small-angle isn't enough.
    * Not used in oracle queries (libm sin/cos may differ across engines
    * at ulp level); pinned by ScalaTest against known distances. */
  def haversineM(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    val r = lit(6371000.0)
    val dLat = radians(lat2 - lat1)
    val dLng = radians(lng2 - lng1)
    val a = sin(dLat / 2) * sin(dLat / 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLng / 2) * sin(dLng / 2)
    r * lit(2.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** Per-segment effective speed: min zone speed within `radiusM`
    * (congestion can only slow you down — capped at `baseKmh`), then
    * per-route ETA = Σ length/speed, ranked ascending (rank 1 = the
    * recommended route, reference dashboard.html:1229-1232). */
  def routeEta(segments: DataFrame, zones: DataFrame, radiusM: Double,
               baseKmh: Double): DataFrame = {
    val joined = Joins.withinRangeGrid(
      zones, "z_lat", "z_lng", segments, "s_lat", "s_lng", radiusM)
    val perSeg = joined.groupBy("route_id", "seg_id")
      .agg(min("speed_kmh").as("zone_speed"))
    val segs = segments.join(perSeg, Seq("route_id", "seg_id"), "left")
      .withColumn("eff_kmh",
        least(coalesce(col("zone_speed"), lit(baseKmh)), lit(baseKmh)))
      // integer milliseconds (floor) so the route sum is EXACT and
      // order-independent — float summation order would differ by plan
      .withColumn("seg_time_ms",
        floor(col("length_m").cast("double") * 3600.0 / col("eff_kmh"))
          .cast("long"))
    val routes = segs.groupBy("route_id")
      .agg(sum(col("seg_time_ms")).as("total_time_ms"),
        count(lit(1)).as("n_segments"),
        sum(when(col("zone_speed").isNotNull, 1L).otherwise(0L))
          .as("n_congested"))
    // unpartitioned window — deliberate: it ranks ROUTES, whose
    // cardinality is bounded by the route catalog (a handful in the
    // reference), not by segment/observation volume; the single
    // partition holds one row per route
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("total_time_ms"), col("route_id"))
    routes.withColumn("rnk", row_number().over(w).cast("int"))
  }
}
