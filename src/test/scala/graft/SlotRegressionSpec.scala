package graft

import graft.ml.SlotRegression
import org.apache.spark.sql.functions._

class SlotRegressionSpec extends SparkSpec {
  import spark.implicits._

  /** Events with a planted linear structure: value ≈ base + bDow·dow +
    * cHr·hr (+ deterministic jitter), several dates per slot so the
    * slot label is a real mean. dow here is the SQLite-%w convention
    * (0=Sunday) to match Predict.dowCol. */
  private def fixture(base: Double, bDow: Double, cHr: Double,
                      jitter: Double = 0.0) = {
    // 2024-02-04 is a Sunday → dayOffset d gives dow = d % 7
    val rows = for {
      d <- 0 until 14
      hr <- Seq(0, 3, 8, 12, 17, 21)
      u <- 1L to 3L
    } yield {
      val dow = d % 7
      val j = jitter * (((d * 31 + hr * 7 + u * 13) % 11) - 5) / 5.0
      val v = math.rint((base + bDow * dow + cHr * hr + j) * 100) / 100
      (u, java.sql.Timestamp.valueOf(f"2024-02-${4 + d}%02d $hr%02d:15:00"),
        v)
    }
    rows.toDF("user_id", "ts", "value")
  }

  /** Double-precision Cramer solve over the same slot labels — the
    * real-valued model the fixed-point form truncates. */
  private def cramerRef(slots: Seq[(Long, Long, Long)]) = {
    val n = slots.size.toDouble
    val (sx1, sx2) = (slots.map(_._1).sum.toDouble, slots.map(_._2).sum.toDouble)
    val sx11 = slots.map(s => s._1 * s._1).sum.toDouble
    val sx22 = slots.map(s => s._2 * s._2).sum.toDouble
    val sx12 = slots.map(s => s._1 * s._2).sum.toDouble
    val sy = slots.map(_._3).sum.toDouble
    val sx1y = slots.map(s => s._1 * s._3).sum.toDouble
    val sx2y = slots.map(s => s._2 * s._3).sum.toDouble
    val det0 = n * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
    val detA = sy * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1y * sx22 - sx12 * sx2y) + sx2 * (sx1y * sx12 - sx11 * sx2y)
    val detB = n * (sx1y * sx22 - sx12 * sx2y) -
      sy * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx2y - sx1y * sx2)
    val detC = n * (sx11 * sx2y - sx12 * sx1y) -
      sx1 * (sx1 * sx2y - sx1y * sx2) + sy * (sx1 * sx12 - sx11 * sx2)
    (detA / det0, detB / det0, detC / det0)
  }

  test("closed form recovers a planted linear model; u6 coefficients " +
    "are the truncated real-valued Cramer solution (cents scale)") {
    val df = fixture(base = 100.0, bDow = 10.0, cHr = 5.0)
    val co = SlotRegression
      .modelTable(df, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(co.keySet == Set(1L, 2L, 3L))
    co.values.foreach { case (a, b, c) =>
      // exact linear data → coefficients equal the planted model in
      // u6 (value × 1e6) up to the two integer truncations (slot
      // label ±1 cent, coefficient ±1e-4 cent)
      assert(math.abs(a - 100000000L) <= 20000L, s"a=$a")
      assert(math.abs(b - 10000000L) <= 20000L, s"b=$b")
      assert(math.abs(c - 5000000L) <= 20000L, s"c=$c")
    }
    // and the fixed-point solution tracks the double Cramer solve on
    // the SAME integer labels to sub-truncation distance
    val slots = SlotRegression
      .slotLabels(df, "user_id", "ts", "value")
      .filter(col("user_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val (ra, rb, rc) = cramerRef(slots)
    val (ua, ub, uc) = co(1L)
    assert(math.abs(ua / 10000.0 - ra) <= 1.0, s"a: ${ua / 10000.0} vs $ra")
    assert(math.abs(ub / 10000.0 - rb) <= 1.0, s"b: ${ub / 10000.0} vs $rb")
    assert(math.abs(uc / 10000.0 - rc) <= 1.0, s"c: ${uc / 10000.0} vs $rc")
  }

  test("MLlib LinearRegression (normal solver) agrees with the closed " +
    "form on the same slot labels — the north-star pin") {
    val df = fixture(base = 250.0, bDow = -7.5, cHr = 3.25, jitter = 40.0)
    val slots = SlotRegression.slotLabels(df, "user_id", "ts", "value")
      .filter(col("user_id") === 2L).cache()
    val co = SlotRegression.fitU6(slots, "user_id")
      .collect().map(r => (r.getAs[Long]("a_u6"), r.getAs[Long]("b_u6"),
        r.getAs[Long]("c_u6"))).head
    val asm = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x1", "x2")).setOutputCol("features")
    val lr = new org.apache.spark.ml.regression.LinearRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setSolver("normal").setRegParam(0.0)
    val train = asm.transform(slots
      .select(col("dow").cast("double").as("x1"),
        col("hr").cast("double").as("x2"),
        (col("y").cast("double") / 100.0).as("label")))
    val m = lr.fit(train)
    val (a, b, c) = (m.intercept, m.coefficients(0), m.coefficients(1))
    slots.unpersist()
    // u6 → value units; jittered data, so compare against MLlib's
    // float solution with a tolerance dominated by the u6 truncation
    assert(math.abs(co._1 / 1e6 - a) <= math.max(1e-3, math.abs(a) * 1e-4),
      s"intercept ${co._1 / 1e6} vs $a")
    assert(math.abs(co._2 / 1e6 - b) <= math.max(1e-3, math.abs(b) * 1e-4),
      s"dow coef ${co._2 / 1e6} vs $b")
    assert(math.abs(co._3 / 1e6 - c) <= math.max(1e-3, math.abs(c) * 1e-4),
      s"hr coef ${co._3 / 1e6} vs $c")
  }

  test("fixed-point algebra EXACTLY matches a BigInt replay on random " +
    "slot frames (no silent long overflow within the documented " +
    "label bound, signs included)") {
    val rnd = new scala.util.Random(20260815L)
    def coefRef(det: BigInt, det0: BigInt): Long =
      if (det0 == 0) 0L
      else {
        val ad = det.abs
        val q = (ad / det0) * 10000 + ((ad % det0) * 10000) / det0
        (if (det < 0) -q else q).toLong
      }
    for (trial <- 1 to 8) {
      // random sparse slot grid, labels up to ±1e7 cents (the
      // documented headroom is ~8e8) — negative labels exercise every
      // sign-split branch
      val slots = for {
        dow <- 0 to 6; hr <- Seq(0, 4, 9, 13, 17, 22)
        if rnd.nextDouble() > 0.25
      } yield (1L, dow.toLong, hr.toLong, rnd.nextLong() % 10000000L)
      val df = slots.toDF("user_id", "dow", "hr", "y")
      val got = SlotRegression.fitU6(df, "user_id").collect().head
      val n = BigInt(slots.size)
      def s(f: ((Long, Long, Long, Long)) => BigInt): BigInt =
        slots.map(f).sum
      val (sx1, sx2) = (s(r => BigInt(r._2)), s(r => BigInt(r._3)))
      val sx11 = s(r => BigInt(r._2) * r._2)
      val sx22 = s(r => BigInt(r._3) * r._3)
      val sx12 = s(r => BigInt(r._2) * r._3)
      val sy = s(r => BigInt(r._4))
      val sx1y = s(r => BigInt(r._2) * r._4)
      val sx2y = s(r => BigInt(r._3) * r._4)
      val det0 = n * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
      val detA = sy * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1y * sx22 - sx12 * sx2y) +
        sx2 * (sx1y * sx12 - sx11 * sx2y)
      val detB = n * (sx1y * sx22 - sx12 * sx2y) -
        sy * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx2y - sx1y * sx2)
      val detC = n * (sx11 * sx2y - sx12 * sx1y) -
        sx1 * (sx1 * sx2y - sx1y * sx2) + sy * (sx1 * sx12 - sx11 * sx2)
      assert(got.getAs[Long]("det0") == det0.toLong, s"trial $trial det0")
      assert(got.getAs[Long]("a_u6") == coefRef(detA, det0),
        s"trial $trial a")
      assert(got.getAs[Long]("b_u6") == coefRef(detB, det0),
        s"trial $trial b")
      assert(got.getAs[Long]("c_u6") == coefRef(detC, det0),
        s"trial $trial c")
    }
  }

  test("fitStatsU6: a perfectly linear corpus reads ~zero residuals; " +
    "a jittered one reads MAE/max of the true residual distribution") {
    val perfect = fixture(base = 100.0, bDow = 10.0, cHr = 5.0)
    val ps = SlotRegression.fitStatsU6(perfect, "user_id", "ts", "value")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // exact-linear data: residuals bounded by the u6 coefficient
    // truncation alone (≤ ~1e-4 cents per feature unit × hr ≤ 23)
    ps.foreach { case (mae, mx) =>
      assert(mae <= 10000L && mx <= 30000L, s"mae=$mae max=$mx")
    }
    // jittered: stats equal a local replay over the collected slots
    val jit = fixture(base = 250.0, bDow = -7.5, cHr = 3.25, jitter = 40.0)
    val slots = SlotRegression.slotLabels(jit, "user_id", "ts", "value")
      .filter(col("user_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val co = SlotRegression
      .modelTable(jit, "user_id", "ts", "value")
      .filter(col("user_id") === 1L)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).head
    val ars = slots.map { case (dow, hr, y) =>
      math.abs(y * 10000L - (co._1 + co._2 * dow + co._3 * hr)) }
    val got = SlotRegression.fitStatsU6(jit, "user_id", "ts", "value")
      .filter(col("user_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(got == ((slots.length.toLong, ars.sum / slots.length, ars.max)),
      s"got $got")
  }

  test("rank-deficient keys (fewer than 3 informative slots) fall " +
    "back to the constant slot-mean model; negative labels keep the " +
    "sign-split division exact") {
    // user 9 has ONE slot → det0 = 0 → pred = slot mean · 1e4;
    // user 8 has negative values → y < 0 exercises every sign branch
    val df = Seq(
      (9L, java.sql.Timestamp.valueOf("2024-02-05 08:00:00"), 123.45),
      (9L, java.sql.Timestamp.valueOf("2024-02-12 08:30:00"), 100.55),
      (8L, java.sql.Timestamp.valueOf("2024-02-05 08:00:00"), -50.25),
      (8L, java.sql.Timestamp.valueOf("2024-02-05 09:00:00"), -60.75),
      (8L, java.sql.Timestamp.valueOf("2024-02-06 10:00:00"), -70.0)
    ).toDF("user_id", "ts", "value")
    val out = SlotRegression.predictU6(df, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // user 9, Monday(dow=1) hr=8: mean cents = (12345+10055)/2 = 11200
    assert(out((9L, 1L, 8L)) == 11200L * 10000L, out.toString)
    // user 8: 3 distinct slots → full-rank fit reproduces the three
    // negative labels exactly (3 points, 3 params, integer plane):
    // y values in cents: -5025, -6075, -7000
    val co8 = SlotRegression.modelTable(df, "user_id", "ts", "value")
      .filter(col("user_id") === 8L)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).head
    def pred(dow: Long, hr: Long): Double =
      (co8._1 + co8._2 * dow + co8._3 * hr) / 10000.0
    assert(math.abs(pred(1, 8) - (-5025.0)) <= 1.0, pred(1, 8).toString)
    assert(math.abs(pred(1, 9) - (-6075.0)) <= 1.0, pred(1, 9).toString)
    assert(math.abs(pred(2, 10) - (-7000.0)) <= 1.0, pred(2, 10).toString)
  }
}
