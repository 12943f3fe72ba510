package graft

import graft.ops.Intervals
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def iv(rows: (String, Long, Long, Long)*): DataFrame =
    rows.toDF("k", "id", "s", "e")

  test("overlapJoin: containment, partial, touching endpoints, and" +
    " disjoint — closed-interval semantics") {
    val a = iv(("u", 1L, 100L, 200L))
    val b = iv(
      ("u", 10L, 120L, 150L),  // contained
      ("u", 11L, 180L, 260L),  // partial
      ("u", 12L, 200L, 300L),  // touches at a single point (closed: hits)
      ("u", 13L, 50L, 100L),   // touches at the start
      ("u", 14L, 201L, 300L),  // disjoint by 1s
      ("v", 15L, 120L, 150L))  // right range, wrong key
    val out = Intervals.overlapJoin(a, b, "k", "id", "s", "e",
      bucketSec = 60L).collect()
      .map(r => (r.getLong(2), r.getLong(7), r.getLong(8), r.getLong(9)))
    assert(out.toSeq == Seq(
      (10L, 120L, 150L, 30L),
      (11L, 180L, 200L, 20L),
      (12L, 200L, 200L, 0L),
      (13L, 100L, 100L, 0L)))
  }

  test("overlapJoin: exactly-once across bucket boundaries — pairs" +
    " sharing many buckets surface once, equal to the naive theta join") {
    // long intervals straddling many 10s buckets, several per key
    val a = iv((0 until 40).map(i =>
      (s"k${i % 3}", i.toLong, (i * 7).toLong, (i * 7 + 25).toLong)): _*)
    val b = iv((0 until 40).map(i =>
      (s"k${i % 3}", (100 + i).toLong, (i * 5 + 3).toLong,
        (i * 5 + 40).toLong)): _*)
    for (g <- Seq(3L, 10L, 1000L)) { // fan-out heavy, typical, one-bucket
      val fast = Intervals.overlapJoin(a, b, "k", "id", "s", "e", g)
        .select("k", "a_id", "b_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val naive = a.as("a").join(b.as("b"),
          col("a.k") === col("b.k") &&
            col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
        .select(col("a.k"), col("a.id"), col("b.id")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(fast.sorted.toSeq == naive.sorted.toSeq, s"bucketSec=$g")
      assert(fast.length == fast.distinct.length, s"dup at bucketSec=$g")
    }
  }

  test("overlapStats: left-preserving with zero counts; seconds sum" +
    " over multiple hits") {
    val a = iv(("u", 1L, 100L, 200L), ("u", 2L, 500L, 600L))
    val b = iv(("u", 10L, 150L, 160L), ("u", 11L, 190L, 250L))
    val out = Intervals.overlapStats(a, b, "k", "id", "s", "e", 60L)
      .collect().map(r => (r.getLong(1), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq((1L, 2L, 20L), (2L, 0L, 0L)))
  }

  test("overlapJoinAuto: equals the naive theta join (and the bucketed" +
    " form) on a mixed fixture INCLUDING a year-long outlier, with" +
    " exactly-once pairs and closed-interval edge semantics") {
    // second-scale sessions plus one year-long outlier per key — the
    // case the flat bucket explode can't afford (a 4h bucket would
    // fan the outlier to 2190 rows; the level scheme indexes it <= 3)
    val a = iv(((0 until 30).map(i =>
      (s"k${i % 2}", i.toLong, (i * 40).toLong, (i * 40 + 55).toLong)) ++
      Seq(("k0", 900L, 0L, 31536000L))): _*) // the year-long outlier
    val b = iv(((0 until 30).map(i =>
      (s"k${i % 2}", (100 + i).toLong, (i * 31 + 7).toLong,
        (i * 31 + 49).toLong)) ++
      Seq(("k1", 901L, 500L, 20000000L))): _*)
    val auto = Intervals.overlapJoinAuto(a, b, "k", "id", "s", "e")
      .select("k", "a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val naive = a.as("a").join(b.as("b"),
        col("a.k") === col("b.k") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.k"), col("a.id"), col("b.id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(auto.sorted.toSeq == naive.sorted.toSeq)
    assert(auto.length == auto.distinct.length, "duplicate pair emitted")
    val bucketed = Intervals.overlapJoin(a, b, "k", "id", "s", "e",
        bucketSec = 3600L)
      .select("k", "a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(bucketed.sorted.toSeq == naive.sorted.toSeq)
  }

  test("overlapJoinAuto: identical-start pairs, touching endpoints and" +
    " empty sides (the direction-split and level edge cases)") {
    val a = iv(("u", 1L, 100L, 200L), ("u", 2L, 100L, 150L),
      ("u", 3L, 300L, 300L)) // zero-span interval
    val b = iv(("u", 10L, 100L, 120L),  // same start as 1 and 2
      ("u", 11L, 200L, 250L),           // touches 1 at a point
      ("u", 12L, 300L, 300L),           // zero-span meets zero-span
      ("u", 13L, 301L, 400L))           // disjoint from 3 by 1s
    val out = Intervals.overlapJoinAuto(a, b, "k", "id", "s", "e")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L)))
    // empty b side: no pairs, no crash (levels default safely)
    val empty = Intervals.overlapJoinAuto(a, b.filter(lit(false)),
      "k", "id", "s", "e")
    assert(empty.count() == 0L)
  }

  test("overlapStatsAuto matches overlapStats") {
    val a = iv(("u", 1L, 100L, 200L), ("u", 2L, 500L, 600L))
    val b = iv(("u", 10L, 150L, 160L), ("u", 11L, 190L, 250L))
    val auto = Intervals.overlapStatsAuto(a, b, "k", "id", "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(4), r.getLong(5)))
    assert(auto.toSeq == Seq((1L, 2L, 20L), (2L, 0L, 0L)))
  }

  test("overlapJoin plan: equi-join on (key, bucket), no nested loop") {
    val a = iv(("u", 1L, 100L, 200L))
    val b = iv(("u", 10L, 120L, 150L))
    val plan = Intervals.overlapJoin(a, b, "k", "id", "s", "e", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
