package graft

import graft.ops.Forecast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ForecastSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200L // 2024-01-01 00:00:00 UTC, bucket-aligned

  /** One event per hourly bucket for `n` buckets, value by position. */
  private def series(key: String, n: Int, value: Int => Double): DataFrame =
    (0 until n).map(i =>
      (key, new Timestamp((t0 + i * 3600L) * 1000L), value(i)))
      .toDF("k", "ts", "v")

  test("decompose: additive identity value = trend + seasonal + residual") {
    val df = series("a", 24 * 8, i => 10.0 + (i % 24) + (i % 5) * 0.25)
      .union(series("b", 24 * 6, i => 40.0 + (i % 7)))
    val out = Forecast.seasonalDecompose(df, "k", "ts", "v").collect()
    val withAll = out.filter(!_.isNullAt(5))
    assert(withAll.length > 24 * 6) // interior buckets decompose
    withAll.foreach { r =>
      val v = r.getDouble(2); val t = r.getDouble(3)
      val s = r.getDouble(4); val e = r.getDouble(5)
      // exact in micro-units by construction; doubles reassemble to <1e-9
      assert(math.abs(v - (t + s + e)) < 1e-9, s"row $r")
    }
  }

  test("decompose on a constant series: trend = c, seasonal = residual = 0") {
    val out = Forecast.seasonalDecompose(
      series("c", 24 * 4, _ => 7.5), "k", "ts", "v").collect()
    val full = out.filter(!_.isNullAt(3))
    assert(full.length == 24 * 4 - 24) // 12 null-trend edge buckets each end
    full.foreach { r =>
      assert(r.getDouble(3) == 7.5 && r.getDouble(4) == 0.0 &&
        r.getDouble(5) == 0.0)
    }
  }

  test("forecast on a constant series is the constant, one per horizon bucket") {
    val out = Forecast.forecastNextBuckets(
      series("c", 24 * 4, _ => 3.25), "k", "ts", "v", horizon = 24).collect()
    assert(out.length == 24)
    assert(out.forall(_.getDouble(2) == 3.25))
    // future buckets start strictly after the last full-trend bucket
    val lastFullTrend = t0 + (24 * 4 - 1 - 12) * 3600L
    assert(out.map(_.getLong(1)).min == lastFullTrend + 3600L)
  }

  test("ewma: constant fixpoint; renormalizes over missing buckets") {
    val const = Forecast.ewmaSmooth(
      series("c", 50, _ => 9.75), "k", "ts", "v").collect()
    assert(const.length == 50 && const.forall(_.getDouble(2) == 9.75))

    // two observations 3 buckets apart: at the second, only weights
    // w0 (self) and w3 (the earlier bucket) are present
    val sparse = Seq(
      ("k", new Timestamp(t0 * 1000L), 10.0),
      ("k", new Timestamp((t0 + 3 * 3600L) * 1000L), 20.0))
      .toDF("k", "ts", "v")
    val out = Forecast.ewmaSmooth(sparse, "k", "ts", "v", decay = 0.5)
      .orderBy("bucket_ts").collect()
    assert(out(0).getDouble(2) == 10.0)
    val w0 = 1000000L; val w3 = 125000L
    val expect = BigDecimal((2000L * w0 + 1000L * w3).toDouble /
      ((w0 + w3).toDouble * 100.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1).getDouble(2) == expect)
  }

  test("cusum: flags an injected level shift only at/after the shift") {
    val shiftAt = 100
    val df = series("k", 150, i => if (i < shiftAt) 10.0 else 50.0)
    val out = Forecast.cusumChangepoints(df, "k", "ts", "v",
      k = 0.5, h = 5.0).collect()
    assert(out.nonEmpty)
    val shiftTs = t0 + shiftAt * 3600L
    // z is standardized against the GLOBAL key mean, so the pre-shift
    // segment (below the mean) legitimately accumulates downward CUSUM;
    // the upward detector is the one that must localize the shift
    val ups = out.filter(r => r.getString(5) == "up")
    assert(ups.nonEmpty)
    assert(ups.map(_.getLong(1)).min >= shiftTs)
    assert(ups.map(_.getLong(1)).min <= shiftTs + 10 * 3600L)
    assert(out.filter(_.getLong(1) < shiftTs)
      .forall(_.getString(5) == "down"))
  }

  test("cusum: zero-variance keys carry no standardizable signal → excluded") {
    val out = Forecast.cusumChangepoints(
      series("flat", 60, _ => 5.0), "k", "ts", "v").collect()
    assert(out.isEmpty)
  }

  test("crossCorrelation: ±1 on linear pairs, null on zero variance") {
    val n = 48
    val df = series("up", n, i => 1.0 + i) // x
      .union(series("dbl", n, i => 2.0 + 2 * i)) // 2x shifted → corr 1
      .union(series("down", n, i => (n + 1).toDouble - i)) // −x → corr −1
      .union(series("flat", n, _ => 4.0)) // zero variance → null
    val out = Forecast.crossCorrelation(df, "k", "ts", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(("dbl", "up")) == Some(1.0))
    assert(out(("down", "up")) == Some(-1.0))
    assert(out(("dbl", "down")) == Some(-1.0))
    assert(out(("dbl", "flat")) == None && out(("flat", "up")) == None)
    assert(out.size == 6) // 4 choose 2
  }

  test("decompose: deterministic across partitionings") {
    val df = series("a", 24 * 5, i => 10.0 + (i % 24) + (i % 3) * 0.5)
    val a = Forecast.seasonalDecompose(df.repartition(7), "k", "ts", "v")
      .collect()
    val b = Forecast.seasonalDecompose(df.repartition(2), "k", "ts", "v")
      .collect()
    assert(a.sameElements(b))
  }

  test("acf: exactly-periodic series has acf 1.0 at its period's" +
    " multiples; constant series is all-null") {
    val df = series("p12", 24 * 6, i => if (i % 12 == 0) 100.0 else 10.0)
      .union(series("flat", 24 * 6, _ => 5.0))
    val out = Forecast.acf(df, "k", "ts", "v", maxLag = 30).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(("p12", 12)) == Some(1.0))
    assert(out(("p12", 24)) == Some(1.0))
    assert(out(("p12", 6)).get < 0.5) // off-period lags decorrelate
    assert((1 to 30).forall(l => out(("flat", l)).isEmpty))
    assert(out.size == 60)
  }

  test("dominantPeriod: picks the fundamental over its harmonic on an" +
    " acf tie; constant keys drop out") {
    val df = series("p12", 24 * 6, i => if (i % 12 == 0) 100.0 else 10.0)
      .union(series("flat", 24 * 6, _ => 5.0))
    val out = Forecast.dominantPeriod(df, "k", "ts", "v",
      minLag = 2, maxLag = 48).collect()
    assert(out.length == 1) // flat has no defined acf anywhere
    // lags 12, 24, 36, 48 all score acf = 1.0; shorter-lag tie-break
    assert(out.head.getString(0) == "p12" && out.head.getInt(1) == 12 &&
      out.head.getDouble(2) == 1.0)
  }

  test("madAnomalies: flags only the planted spike, never warmup rows;" +
    " med/mad exact on a known window") {
    // 30 steady buckets, spike at 28 — windows 0..23 are warmup
    val df = series("a", 30, i => if (i == 28) 500.0 else 10.0)
    val out = Forecast.madAnomalies(df, "k", "ts", "v",
      window = 24, k = 3.5).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == t0 + 28 * 3600L)
    assert(out.head.getDouble(2) == 500.0) // value
    assert(out.head.getDouble(3) == 10.0)  // rolling median
    assert(out.head.getDouble(4) == 0.0)   // MAD of a steady window

    // spike INSIDE the warmup never flags (no full window yet), and
    // the later window's median is immune to it (robustness)
    val warm = series("b", 30, i =>
      if (i == 5) 500.0 else if (i == 27) 200.0 else 10.0)
    val out2 = Forecast.madAnomalies(warm, "k", "ts", "v",
      window = 24, k = 3.5).collect()
    assert(out2.map(_.getLong(1)).toSeq == Seq(t0 + 27 * 3600L))
    assert(out2.head.getDouble(3) == 10.0) // median unmoved by the 500
  }

  test("madAnomalies: even-window two-middle medians are exact") {
    // window [1, 3, 5, 100] → med = (3+5)/2 = 4.0;
    // devs |x−4| = [3, 1, 1, 96] → mad = (1+3)/2 = 2.0
    val df = series("a", 5,
      i => Seq(1.0, 3.0, 5.0, 100.0, 1000.0)(i))
    val out = Forecast.madAnomalies(df, "k", "ts", "v",
      window = 4, k = 3.5).collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 1000.0 &&
      out.head.getDouble(3) == 4.0 && out.head.getDouble(4) == 2.0)
  }
}
