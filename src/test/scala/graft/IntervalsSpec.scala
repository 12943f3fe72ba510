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

  test("overlapJoin plan: equi-join on (key, bucket), no nested loop") {
    val a = iv(("u", 1L, 100L, 200L))
    val b = iv(("u", 10L, 120L, 150L))
    val plan = Intervals.overlapJoin(a, b, "k", "id", "s", "e", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
