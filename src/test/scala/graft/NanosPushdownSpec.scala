package graft

import org.apache.spark.sql.functions._

/** plans.PushdownNanosTs: time-range predicates through the
  * TIMESTAMP(NANOS)→timestamp conversion must reach the parquet scan
  * as raw-nanos bounds, without changing results.
  *
  * The driver testdata has carried `events.ts` as both parquet
  * TIMESTAMP(NANOS) (read as raw long + converted, the case the rule
  * exists for) and native timestamp[us] (filters translate on their
  * own) across refreshes. `Tables.events` adapts by schema; these
  * plan-shape tests do the same: on the nanos layout they demand the
  * rule's derived `...ThanOrEqual(ts,` bounds, on the native layout the
  * source's own translated bound. The rule machinery itself is pinned
  * separately on a synthetic nanos-long column, so coverage does not
  * depend on which layout the current testdata happens to use. */
class NanosPushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Raw parquet ts is a nanos long (rule-rewrite layout)? */
  private def nanosLayout: Boolean = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
  }

  test("ts-range filter reaches the parquet scan as pushed raw bounds") {
    val q = Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-12 00:00:00").cast("timestamp"))
      .select("event_id")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(ts,"),
      s"no pushed lower bound on raw ts:\n$scan")
    val upper =
      if (nanosLayout) scan.contains("LessThanOrEqual(ts,") // derived
      else scan.contains("LessThan(ts,") // native translation
    assert(upper, s"no pushed upper bound on raw ts:\n$scan")
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
    val bounded =
      if (nanosLayout) scan.contains("LessThanOrEqual(ts,")
      else scan.contains("LessThan(ts,")
    assert(bounded, s"mirrored comparison not bounded:\n$scan")
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

  // ---- rule machinery pinned on a synthetic nanos long, independent of
  // the testdata layout ----

  /** The conversion `Tables.events` applies to a raw-nanos long. */
  private def conv(c: org.apache.spark.sql.Column) =
    timestamp_micros(expr(s"${c.toString} div 1000"))

  test("rule derives raw-long bounds from a range over the conversion") {
    graft.plans.PushdownNanosTs.install(spark)
    val base = java.time.Instant.parse("2024-01-05T00:00:00Z")
      .getEpochSecond * 1000000000L
    // spark.range (not a local Seq): ConvertToLocalRelation would fold
    // a LocalRelation query away before the rule could be observed
    val df = spark.range(1000)
      .select(col("id"), (lit(base) + col("id") * 1000000000L).as("raw"))
    val q = df.withColumn("ts", conv(col("raw")))
      .filter(col("ts") >= lit("2024-01-05 00:01:00").cast("timestamp") &&
        col("ts") < lit("2024-01-05 00:02:00").cast("timestamp"))
      .select("id")
    val opt = q.queryExecution.optimizedPlan.toString
    // derived conjuncts on the RAW long: x >= 1000k-999 and x <= 1000k+999
    val loK = (java.time.Instant.parse("2024-01-05T00:01:00Z")
      .getEpochSecond * 1000000L) * 1000L - 999L
    val hiK = ((java.time.Instant.parse("2024-01-05T00:02:00Z")
      .getEpochSecond * 1000000L) - 1L) * 1000L + 999L
    assert(opt.contains(s">= $loK"), s"no derived lower raw bound:\n$opt")
    assert(opt.contains(s"<= $hiK"), s"no derived upper raw bound:\n$opt")
    // and the rewrite must not change results
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (60L until 120L))
  }

  test("rule derives no bounds from a disjunction over the conversion") {
    graft.plans.PushdownNanosTs.install(spark)
    val base = java.time.Instant.parse("2024-01-05T00:00:00Z")
      .getEpochSecond * 1000000000L
    val df = spark.range(100)
      .select(col("id"), (lit(base) + col("id") * 1000000000L).as("raw"))
    val q = df.withColumn("ts", conv(col("raw")))
      .filter(col("ts") >= lit("2024-01-05 00:01:00").cast("timestamp") ||
        col("id") === 3L)
      .select("id")
    val opt = q.queryExecution.optimizedPlan.toString
    // the bound the rule WOULD derive from the ts branch must be absent
    val loK = (java.time.Instant.parse("2024-01-05T00:01:00Z")
      .getEpochSecond * 1000000L) * 1000L - 999L
    assert(!opt.contains(loK.toString),
      s"unsound bound conjoined from OR:\n$opt")
    assert(q.collect().map(_.getLong(0)).toSet ==
      ((60L until 100L).toSet + 3L))
  }
}
