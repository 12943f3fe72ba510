package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2.3 — the join family. The reference never writes a SQL JOIN; every
  * join is an application-level dict lookup or nested loop (SURVEY §2.3).
  * Here each becomes a native Spark join with an explicit distribution
  * strategy chosen for 100 TB:
  *
  *  - dimension lookups (J1/J2/J3) → `broadcast()` hash joins: the dim
  *    side is catalog-sized (36 cameras / thresholds / names) and must
  *    never shuffle the fact side;
  *  - existence checks (P8/O7) → left_semi / left_anti (no payload
  *    duplication, no row explosion);
  *  - J6 pattern replay → crossJoin of a tiny generated spine against a
  *    pre-aggregated pattern (both sides small by construction — the
  *    100-TB fact table is reduced BEFORE the cross join);
  *  - J7 geo range join → broadcast nested-loop with a distance
  *    predicate; the zone side is the broadcast side.
  */
object Joins {

  /** J1/J2 — name-lookup enrichment via broadcast left join with a
    * default for misses (reference: scripts/sync_stats_db.py:70-92,
    * "Unknown Camera" default). */
  def enrichWithNames(fact: DataFrame, dim: DataFrame, key: String,
                      nameCol: String, default: String): DataFrame =
    fact.join(broadcast(dim), Seq(key), "left")
      .withColumn(nameCol, coalesce(col(nameCol), lit(default)))

  /** S11/O3 — export top-K: ORDER BY ts DESC LIMIT k with name
    * substitution (reference: scripts/export_data.py:24-86). Catalyst
    * plans TakeOrderedAndProject: each partition keeps only its local
    * top-K, so at 100 TB the driver sees K rows per partition, not the
    * table. Tie-broken on a unique id for determinism. */
  def exportTopK(fact: DataFrame, tsCol: String, idCol: String, k: Int,
                 dim: DataFrame, key: String, nameCol: String): DataFrame =
    enrichWithNames(
      fact.orderBy(col(tsCol).desc, col(idCol).desc).limit(k),
      dim, key, nameCol, "Unknown Camera")

  /** J6 — template-backfill pattern replay: cross join of a generated
    * date spine against a time-of-day pattern, emitting the pattern
    * shifted onto each target date (reference: app/utils.py:221-248).
    * Both inputs are tiny aggregates → the cross join is O(days×slots). */
  def replayPattern(pattern: DataFrame, hrCol: String,
                    startDate: String, days: Int): DataFrame = {
    val spine = pattern.sparkSession.range(1)
      .select(explode(sequence(
        to_date(lit(startDate)),
        date_add(to_date(lit(startDate)), days - 1),
        expr("interval 1 day"))).as("target_date"))
    spine.crossJoin(pattern)
      .withColumn("target_ts",
        unix_timestamp(col("target_date").cast("timestamp")) +
          col(hrCol).cast("long") * 3600)
  }

  /** J5 — mirror self-lookup: a camera configured with `mirror_id`
    * serves the stats of its mirror source (reference:
    * app/services/camera.py:140-154). One broadcast of the catalog plus
    * a self-join of the per-camera stats on the mirror key; cameras
    * without a mirror (or whose mirror has no stats) keep their own. */
  def mirrorLookup(stats: DataFrame, dim: DataFrame, key: String,
                   mirrorCol: String, valueCols: Seq[String]): DataFrame = {
    val mirrored = stats.select(
      (col(key).as(mirrorCol)) +: valueCols.map(c => col(c).as(s"m_$c")): _*)
    stats.join(broadcast(dim), Seq(key), "left")
      .join(mirrored, Seq(mirrorCol), "left")
      .select((col(key) +:
        valueCols.map(c => coalesce(col(s"m_$c"), col(c)).as(s"eff_$c"))) :+
        (col(mirrorCol).isNotNull && col(s"m_${valueCols.head}").isNotNull)
          .as("mirrored"): _*)
  }

  /** J7 — geo range join: points within `radiusM` meters of a zone,
    * planar small-angle metric (dx·m-per-deg-lat)² + (dy·m-per-deg-lng)².
    * The reference does this client-side per route segment
    * (app/templates/dashboard.html:1168-1205). Zone side broadcasts;
    * Spark plans BroadcastNestedLoopJoin — the only correct strategy for
    * a theta join, and the broadcast side is the small catalog. */
  def withinRange(zones: DataFrame, zLat: String, zLng: String,
                  points: DataFrame, pLat: String, pLng: String,
                  radiusM: Double): DataFrame = {
    val mLat = lit(110540.0) // meters per degree latitude
    val mLng = lit(109640.0) // meters per degree longitude near the equator
    // x*x, not pow(x,2): plain multiplication is exactly reproducible
    // across engines; Math.pow is not guaranteed correctly rounded.
    val dx = (col(zLat) - col(pLat)) * mLat
    val dy = (col(zLng) - col(pLng)) * mLng
    val d2 = dx * dx + dy * dy
    points.join(broadcast(zones), d2 <= lit(radiusM) * lit(radiusM))
  }

  /** Grid-bucketed range join — the 100 TB shape of [[withinRange]].
    * Every point hashes to ONE grid cell; every zone fans out to its
    * (2k+1)² covering cells, k = ceil(radius/cell) (a match within the
    * radius forces |cell delta| <= k on both axes — floors of values
    * differing by <= r/c differ by <= ceil(r/c) — so no qualifying
    * pair can escape); the join is then an EQUI-join on the cell key
    * with the exact distance predicate as a residual filter. Output is
    * row-identical to the nested-loop form at ANY cell size (GeoSpec
    * pins it), but the plan is a hash join: with a catalog-sized zone
    * side it broadcasts like before, and when BOTH sides are huge it
    * degrades gracefully to a shuffle hash join on the cell key.
    *
    * ADAPTIVE CELL: with cell = radius (the k=1 minimum-replication
    * choice), candidate pairs per point ≈ zoneDensity·9r² — a dense
    * metro catalog makes every probe wade through the full 3r×3r box.
    * Shrinking the cell tightens the candidate window toward the 2r×2r
    * bounding box at the cost of (2k+1)² zone replication, and the two
    * move at very different rates: candidate area (2k+1)²(r/k)² falls
    * 9r² → 6.25r² → 5.06r² for k = 1,2,4 (saturating at 4r²) while
    * replication grows 9 → 25 → 81. So the cell adapts DOWN only when
    * the HOTTEST radius-sized cell holds more than `maxZonesPerCell`
    * zones, and is clamped at radius/2 (k <= 2, replication <= 25× of
    * the CATALOG side only). The estimator is a max-zones-per-cell
    * groupBy on the catalog side (one bounded row back), NOT a
    * bounding-box average: a clustered catalog (one metro plus sparse
    * country) has hot-cell density orders of magnitude above its
    * average, which is exactly where the fat-cell candidate blowup
    * lives (GeoSpec pins a clustered catalog tripping the cut that the
    * average would miss).
    * MEASURED (×10 dense-catalog probe, 150k zones / 1k points): an
    * r/8 clamp let k reach 8 — a 43M-row broadcast build that cost
    * 20 s against the 3.7 s pinned-at-r run, while candidates only
    * fell 9.5M → 7.1M; k = 2 keeps that candidate cut at 25×
    * replication.
    *
    * EAGER STATS JOB: the estimate runs `zones.groupBy(cell).count()`
    * AT DATAFRAME-CONSTRUCTION TIME — plan-only consumers (explain /
    * audit) pay a real catalog scan, and the cell is frozen from the
    * catalog's state at construction. Catalogs whose optimizer-
    * estimated size is under `adaptStatsMinBytes` (default 1 MiB)
    * SHORT-CIRCUIT to cell = radius with zero extra jobs: a catalog
    * that small broadcasts whole, so even its worst-case candidate set
    * (every zone in one cell) is the bounded nested-loop work the
    * non-grid form does anyway — an extra stats job can never pay for
    * itself there. Pass 0 to force the probe (tests), or a huge value
    * to pin cell = radius for a catalog known statically uniform. */
  def withinRangeGrid(zones: DataFrame, zLat: String, zLng: String,
                      points: DataFrame, pLat: String, pLng: String,
                      radiusM: Double,
                      maxZonesPerCell: Double = 32.0,
                      adaptStatsMinBytes: Long = 1L << 20): DataFrame = {
    val mLatD = 110540.0
    val mLngD = 109640.0
    val cellM = adaptiveCellM(zones, zLat, zLng, radiusM,
      maxZonesPerCell, adaptStatsMinBytes)
    val k = math.ceil(radiusM / cellM).toInt
    val mLat = lit(mLatD)
    val mLng = lit(mLngD)
    def cx(latC: Column): Column = floor(latC * mLat / cellM).cast("long")
    def cy(lngC: Column): Column = floor(lngC * mLng / cellM).cast("long")
    val zExp = zones
      .withColumn("_cx", explode(array((-k to k).map(d =>
        cx(col(zLat)) + d): _*)))
      .withColumn("_cy", explode(array((-k to k).map(d =>
        cy(col(zLng)) + d): _*)))
    val pCells = points
      .withColumn("_cx", cx(col(pLat)))
      .withColumn("_cy", cy(col(pLng)))
    val dx = (col(zLat) - col(pLat)) * mLat
    val dy = (col(zLng) - col(pLng)) * mLng
    val d2 = dx * dx + dy * dy
    pCells.join(broadcast(zExp), Seq("_cx", "_cy"))
      .filter(d2 <= lit(radiusM) * lit(radiusM))
      .drop("_cx", "_cy")
  }

  /** The adaptive-cell decision of [[withinRangeGrid]], exposed so the
    * spec can pin WHICH cell a catalog shape produces (not just the
    * row-identical output every cell size gives). See the scaladoc
    * there for the estimator rationale and the eager-job caveat. */
  private[graft] def adaptiveCellM(zones: DataFrame,
                                   zLat: String, zLng: String,
                                   radiusM: Double,
                                   maxZonesPerCell: Double,
                                   adaptStatsMinBytes: Long): Double = {
    val mLatD = 110540.0
    val mLngD = 109640.0
    val zoneStatsBytes = zones.queryExecution.optimizedPlan.stats.sizeInBytes
    if (zoneStatsBytes < adaptStatsMinBytes) radiusM
    else {
      // hottest radius-sized cell: at most one row per OCCUPIED cell
      // leaves the map side (bounded by catalog cardinality), one row
      // reaches the driver
      val st = zones
        .filter(col(zLat).isNotNull && col(zLng).isNotNull)
        .groupBy(floor(col(zLat) * mLatD / radiusM).cast("long"),
          floor(col(zLng) * mLngD / radiusM).cast("long"))
        .agg(count(lit(1)).as("_c"))
        .agg(max(col("_c"))).head()
      // empty / all-null-coordinate catalog → null max → radius cell
      if (st.isNullAt(0)) radiusM
      else {
        val hot = st.getLong(0).toDouble
        if (hot <= maxZonesPerCell) radiusM
        else math.max(radiusM * math.sqrt(maxZonesPerCell / hot),
          radiusM / 2.0)
      }
    }
  }
}
