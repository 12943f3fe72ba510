package graft

import org.apache.spark.sql.functions._

/** plans.PushdownNanosTs: time-range predicates through the
  * TIMESTAMP(NANOS)→timestamp conversion must reach the parquet scan
  * as raw-nanos bounds, without changing results. */
class NanosPushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ts-range filter reaches the parquet scan as pushed raw bounds") {
    val q = Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-12 00:00:00").cast("timestamp"))
      .select("event_id")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(ts,"),
      s"no pushed lower bound on raw ts:\n$scan")
    assert(scan.contains("LessThanOrEqual(ts,"),
      s"no pushed upper bound on raw ts:\n$scan")
  }

  test("forPeriodAt's literal span bound reaches the parquet scan") {
    val q = graft.ops.TimeBuckets.forPeriodAt(
      Tables.events(spark, dir), "ts", "value", "7d",
      nowEpoch = java.sql.Timestamp.valueOf("2024-01-30 00:00:00")
        .getTime / 1000)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(ts,"),
      s"forPeriodAt span bound not pushed to the scan:\n$scan")
  }

  test("trailingAt and multiWindowAt push their literal bounds to the scan") {
    val nowEpoch = java.sql.Timestamp.valueOf("2024-01-30 00:00:00")
      .getTime / 1000
    val t = graft.ops.Totals.trailingAt(Tables.events(spark, dir),
      "ts", "value", 7L * 86400L, nowEpoch)
    assert(t.queryExecution.executedPlan.toString
      .contains("GreaterThanOrEqual(ts,"), "trailingAt bound not pushed")
    val w = graft.ops.WindowStats.multiWindowAt(Tables.events(spark, dir),
      "ts", "value", Seq("1h" -> 3600L, "7d" -> 7L * 86400L), nowEpoch)
    assert(w.queryExecution.executedPlan.toString
      .contains("GreaterThanOrEqual(ts,"), "multiWindowAt bound not pushed")
  }

  test("pushed bounds admit exactly the rows the exact predicate keeps") {
    val all = Tables.events(spark, dir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("es"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lo = java.sql.Timestamp.valueOf("2024-01-05 00:00:00").getTime / 1000
    val hi = java.sql.Timestamp.valueOf("2024-01-12 00:00:00").getTime / 1000
    val expected = all.filter { case (_, es) => es >= lo && es < hi }.keySet
    val got = Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-12 00:00:00").cast("timestamp"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("equality and literal-on-left comparisons also derive bounds") {
    val q = Tables.events(spark, dir)
      .filter(lit("2024-01-12 00:00:00").cast("timestamp") > col("ts"))
      .select("event_id")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("LessThanOrEqual(ts,"),
      s"mirrored comparison not bounded:\n$scan")
  }

  test("disjunctive predicates derive no unsound bounds") {
    // a bound implied by only ONE branch of an OR must not be conjoined
    val df = Tables.events(spark, dir)
    val cutoff = lit("2024-01-25 00:00:00").cast("timestamp")
    val got = df.filter(col("ts") >= cutoff || col("user_id") === 1)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val all = df.select(col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("user_id"))
      .collect()
    val lo = java.sql.Timestamp.valueOf("2024-01-25 00:00:00").getTime / 1000
    val expected = all.filter(r =>
      r.getLong(1) >= lo || r.getLong(2) == 1L).map(_.getLong(0)).toSet
    assert(got == expected)
  }
}
