package graft

import graft.ops.{TimeBuckets, Totals, WindowStats}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Pins reference display/boundary semantics not already covered by the
  * oracle queries (which fix one parameterization each). */
class ReferenceSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, Timestamp.valueOf("2024-02-01 10:07:00"), 5.0),
    (2L, Timestamp.valueOf("2024-02-01 10:22:00"), 7.0),
    (3L, Timestamp.valueOf("2024-02-03 09:00:00"), 11.0))
    .toDF("user_id", "ts", "value")

  test("bucket labels: HH:mm for short periods, dd/MM for day periods (routes.py:124-127)") {
    val short = TimeBuckets.history(rows, "ts", "value", 900, "HH:mm")
      .orderBy("bucket_ts").collect()
    assert(short.head.getAs[String]("label") == "10:00")
    val daily = TimeBuckets.history(rows, "ts", "value", 86400, "dd/MM")
      .orderBy("bucket_ts").collect()
    assert(daily.map(_.getAs[String]("label")).toSeq == Seq("01/02", "03/02"))
  }

  test("trailing window cutoff is inclusive of now - w (utils.py:539)") {
    // now = max ts = 2024-02-03 09:00:00; w = exactly the gap to row 2
    val gap = (Timestamp.valueOf("2024-02-03 09:00:00").getTime -
      Timestamp.valueOf("2024-02-01 10:22:00").getTime) / 1000
    val t = Totals.trailing(rows, "ts", "value", gap).collect().head
    assert(t.getAs[Long]("n_rows") == 2L) // row 2 at the boundary included
    assert(t.getAs[Double]("total_value") == 18.0)
  }

  test("window-stats avg is rounded to 2 decimals (utils.py:551)") {
    val r = WindowStats.multiWindow(rows, "ts", "value",
      Seq("all" -> 10L * 86400L)).collect().head
    // (5+7+11)/3 = 7.666... → 7.67
    assert(r.getAs[Double]("avg_all") == 7.67)
  }

  test("bucket alignment: epoch-floor buckets, not first-event-anchored (routes.py:112)") {
    val b = TimeBuckets.history(rows, "ts", "value", 900, "HH:mm")
      .orderBy("bucket_ts").collect()
    // 10:07 lands in the 10:00 bucket (floor), not a 10:07-anchored one
    val epoch0 = b.head.getAs[Long]("bucket_ts")
    assert(epoch0 % 900 == 0)
  }

  test("day-aligned buckets use midnight boundaries (utils.py:574-576)") {
    val d = TimeBuckets.dayAligned(rows, "ts", "value", "day")
      .orderBy("bucket_ts").collect()
    assert(d.length == 2)
    assert(d.forall(_.getAs[Long]("bucket_ts") % 86400 == 0))
  }

  test("forPeriod: 7d span filters to the trailing week at 4h buckets (routes.py:98-100)") {
    // now = max ts (Feb 3 09:00); the Feb 1 rows are within 7d → kept
    val out = TimeBuckets.forPeriod(rows, "ts", "value", "7d", "dd/MM")
      .collect()
    assert(out.map(_.getAs[Long]("n_events")).sum == 3L)
    assert(out.forall(_.getAs[Long]("bucket_ts") % 14400 == 0))
    // 30m span: only the last row survives
    val m30 = TimeBuckets.forPeriod(rows, "ts", "value", "30m").collect()
    assert(m30.map(_.getAs[Long]("n_events")).sum == 1L)
  }

  test("forPeriod: unknown period falls back to the 30m/60s default (routes.py:79-103)") {
    // the reference's if/elif chain leaves its pre-set defaults in
    // place for unrecognized names — no error, 30m span, 1m buckets
    assert(TimeBuckets.spanInterval("bogus") == (1800L, 60L))
    val bogus = TimeBuckets.forPeriod(rows, "ts", "value", "bogus")
      .collect().map(_.toSeq)
    val m30 = TimeBuckets.forPeriod(rows, "ts", "value", "30m")
      .collect().map(_.toSeq)
    assert(bogus.toSeq == m30.toSeq)
    val nowEpoch = java.sql.Timestamp.valueOf("2024-02-03 09:00:00")
      .getTime / 1000
    val bogusAt = TimeBuckets.forPeriodAt(rows, "ts", "value", "bogus",
      nowEpoch).collect().map(_.toSeq)
    assert(bogusAt.toSeq == m30.toSeq)
  }

  test("forPeriodAt with nowEpoch == data max equals the data-anchored forPeriod") {
    val nowEpoch = Timestamp.valueOf("2024-02-03 09:00:00").getTime / 1000
    val anchored = TimeBuckets.forPeriod(rows, "ts", "value", "7d", "dd/MM")
      .collect().map(_.toSeq)
    val literal = TimeBuckets.forPeriodAt(rows, "ts", "value", "7d",
      nowEpoch, "dd/MM").collect().map(_.toSeq)
    assert(literal.toSeq == anchored.toSeq)
  }

  test("trailingAt / multiWindowAt with nowEpoch == data max equal the anchored forms") {
    val nowEpoch = Timestamp.valueOf("2024-02-03 09:00:00").getTime / 1000
    val gap = 7L * 86400L
    assert(Totals.trailingAt(rows, "ts", "value", gap, nowEpoch)
      .collect().map(_.toSeq).toSeq ==
      Totals.trailing(rows, "ts", "value", gap)
        .collect().map(_.toSeq).toSeq)
    val ws = Seq("1h" -> 3600L, "7d" -> gap)
    assert(WindowStats.multiWindowAt(rows, "ts", "value", ws, nowEpoch)
      .collect().map(_.toSeq).toSeq ==
      WindowStats.multiWindow(rows, "ts", "value", ws)
        .collect().map(_.toSeq).toSeq)
  }

  test("uuid surfaces: v4 shape from uuid(), deterministic v3 shape from nameUuid") {
    val uuidRe =
      "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    val r = rows.select(graft.ops.Scalars.randomUuid().as("u"),
      graft.ops.Scalars.nameUuid(col("user_id")).as("n")).collect()
    assert(r.forall(_.getAs[String]("u").matches(uuidRe)))
    assert(r.forall(_.getAs[String]("n").matches(uuidRe)))
    assert(r.forall(_.getAs[String]("n")(14) == '3')) // version nibble
    assert(r.map(_.getAs[String]("u")).distinct.length == 3) // random ids unique
    // name-based: same input → same id, on a fresh plan too
    val again = rows.select(graft.ops.Scalars.nameUuid(col("user_id")).as("n"))
      .collect().map(_.getString(0))
    assert(r.map(_.getAs[String]("n")).sameElements(again))
  }
}
