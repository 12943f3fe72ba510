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
          pointsDf, "p_lat", "p_lng", radius)
        .select("zone_id", "point_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(grid == bnl, s"radius $radius: adaptive grid and BNL disagree")
      val n = Joins.withinRangeGrid(z, "z_lat", "z_lng",
        pointsDf, "p_lat", "p_lng", radius).count()
      assert(n == grid.size.toLong, "adaptive grid duplicated a pair")
      // and forcing the cell back to radius (huge threshold) agrees too
      val fixed = Joins.withinRangeGrid(z, "z_lat", "z_lng",
          pointsDf, "p_lat", "p_lng", radius,
          maxZonesPerCell = Double.MaxValue)
        .select("zone_id", "point_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fixed == bnl)
    }
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
