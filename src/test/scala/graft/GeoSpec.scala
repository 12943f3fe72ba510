package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._

/** Grid-bucketed range join: row-identical to the nested-loop theta
  * join, by construction and by this spec. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def zonesDf = (1 to 60).map { i =>
    (i.toLong,
      -6.90 - ((i * 7) % 200).toDouble / 1000.0,
      107.60 + ((i * 11) % 200).toDouble / 1000.0)
  }.toDF("zone_id", "z_lat", "z_lng")

  private def pointsDf = (1 to 80).map { i =>
    (i.toLong,
      -6.90 - ((i * 13) % 200).toDouble / 1000.0,
      107.60 + ((i * 17) % 200).toDouble / 1000.0)
  }.toDF("point_id", "p_lat", "p_lng")

  test("grid range join equals nested-loop range join row for row") {
    for (radius <- Seq(250.0, 2000.0, 9000.0)) {
      val bnl = Joins.withinRange(zonesDf, "z_lat", "z_lng",
          pointsDf, "p_lat", "p_lng", radius)
        .select("zone_id", "point_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val grid = Joins.withinRangeGrid(zonesDf, "z_lat", "z_lng",
          pointsDf, "p_lat", "p_lng", radius)
        .select("zone_id", "point_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(grid == bnl, s"radius $radius: grid and BNL disagree")
      // and the grid join never duplicates a pair
      val n = Joins.withinRangeGrid(zonesDf, "z_lat", "z_lng",
        pointsDf, "p_lat", "p_lng", radius).count()
      assert(n == grid.size.toLong)
    }
  }

  test("adaptive cell (dense catalog, k > 1) stays row-identical to BNL") {
    // force the density trigger: the whole catalog inside a tight box
    // (~±0.005 deg) so zones-per-radius-cell far exceeds the threshold
    // and the cell shrinks below radius (k >= 2). The shrunken grid
    // must still produce EXACTLY the nested-loop pair set — the lemma
    // |cell delta| <= ceil(r/c) under distance <= r.
    // adaptStatsMinBytes = 0 forces the stats probe: a test-sized
    // in-memory catalog otherwise short-circuits to cell = radius.
    val z = (1 to 300).map { i =>
      (i.toLong, -6.900 - (i % 10).toDouble / 1000.0,
        107.600 + (i % 11).toDouble / 1000.0)
    }.toDF("zone_id", "z_lat", "z_lng")
    for (radius <- Seq(700.0, 2000.0)) {
      val bnl = Joins.withinRange(z, "z_lat", "z_lng",
          pointsDf, "p_lat", "p_lng", radius)
        .select("zone_id", "point_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val grid = Joins.withinRangeGrid(z, "z_lat", "z_lng",
          pointsDf, "p_lat", "p_lng", radius, adaptStatsMinBytes = 0L)
        .select("zone_id", "point_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(grid == bnl, s"radius $radius: adaptive grid and BNL disagree")
      val n = Joins.withinRangeGrid(z, "z_lat", "z_lng",
        pointsDf, "p_lat", "p_lng", radius, adaptStatsMinBytes = 0L).count()
      assert(n == grid.size.toLong, "adaptive grid duplicated a pair")
      // and forcing the cell back to radius (huge threshold) agrees too
      val fixed = Joins.withinRangeGrid(z, "z_lat", "z_lng",
          pointsDf, "p_lat", "p_lng", radius,
          maxZonesPerCell = Double.MaxValue, adaptStatsMinBytes = 0L)
        .select("zone_id", "point_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fixed == bnl)
    }
  }

  test("clustered catalog (hot metro + sparse country) trips the max-" +
    "per-cell trigger a bounding-box average would miss") {
    // 240 zones inside one ~±0.005 deg metro box PLUS 60 zones spread
    // over a ~10 deg country: the bounding-box AVERAGE density is ~0
    // zones per radius-cell (huge box, 300 zones) — the old estimator
    // kept cell = radius and left every metro probe wading through a
    // fat hot cell. The max-zones-per-cell estimator sees the metro
    // cell (~hundreds of zones) and shrinks the cell regardless of how
    // much empty country the box spans. Row-identity vs BNL must hold
    // on exactly this shape.
    val metro = (1 to 240).map { i =>
      (i.toLong, -6.900 - (i % 10).toDouble / 1000.0,
        107.600 + (i % 11).toDouble / 1000.0)
    }
    val sparse = (1 to 60).map { i =>
      (240L + i, -1.0 - (i % 8).toDouble, 100.0 + (i % 7).toDouble)
    }
    val z = (metro ++ sparse).toDF("zone_id", "z_lat", "z_lng")
    val radius = 2000.0
    // the trigger itself: the hot metro cell holds ~hundreds of zones,
    // so the max-per-cell estimate shrinks the cell to the r/2 clamp —
    // while the OLD bounding-box-average estimate over the ~10-deg box
    // (300 zones / ~1.2e12 m² → ~1e-3 zones per radius cell) would
    // have kept cell = radius. And the 1 MiB short-circuit pins a
    // test-sized catalog at radius without running the probe.
    val cell = Joins.adaptiveCellM(z, "z_lat", "z_lng", radius,
      maxZonesPerCell = 32.0, adaptStatsMinBytes = 0L)
    assert(cell == radius / 2.0,
      s"hot-cell trigger did not clamp: cell=$cell")
    assert(Joins.adaptiveCellM(z, "z_lat", "z_lng", radius,
      maxZonesPerCell = 32.0, adaptStatsMinBytes = 1L << 20) == radius,
      "test-sized catalog must short-circuit the stats probe")
    val bnl = Joins.withinRange(z, "z_lat", "z_lng",
        pointsDf, "p_lat", "p_lng", radius)
      .select("zone_id", "point_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val grid = Joins.withinRangeGrid(z, "z_lat", "z_lng",
        pointsDf, "p_lat", "p_lng", radius, adaptStatsMinBytes = 0L)
      .select("zone_id", "point_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid == bnl, "clustered-catalog adaptive grid and BNL disagree")
    val n = Joins.withinRangeGrid(z, "z_lat", "z_lng",
      pointsDf, "p_lat", "p_lng", radius, adaptStatsMinBytes = 0L).count()
    assert(n == grid.size.toLong, "clustered-catalog grid duplicated a pair")
  }

  test("grid range join handles cell-boundary and negative coordinates") {
    // points exactly on a cell boundary multiple (floor edge) and in the
    // southern/western hemisphere
    val z = Seq((1L, -0.0181, -0.0182)).toDF("zone_id", "z_lat", "z_lng")
    val p = Seq(
      (1L, -0.0181, -0.0182), // same spot → distance 0
      (2L, 0.0, 0.0),
      (3L, -0.036, -0.036))
      .toDF("point_id", "p_lat", "p_lng")
    val radius = 2000.0 // ~0.0181 deg lat
    val bnl = Joins.withinRange(z, "z_lat", "z_lng", p, "p_lat", "p_lng", radius)
      .select("point_id").collect().map(_.getLong(0)).toSet
    val grid = Joins.withinRangeGrid(z, "z_lat", "z_lng", p, "p_lat", "p_lng", radius)
      .select("point_id").collect().map(_.getLong(0)).toSet
    assert(grid == bnl)
    assert(grid.contains(1L))
  }
}
