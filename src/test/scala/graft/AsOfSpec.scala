package graft

import graft.ops.AsOf
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof backward: latest right <= left per key, inclusive ties, null when none") {
    val left = Seq(
      (1L, "k1", ts("2024-02-01 10:00:00")),
      (2L, "k1", ts("2024-02-01 10:05:00")),
      (3L, "k1", ts("2024-02-01 09:00:00")), // before any right row
      (4L, "k2", ts("2024-02-01 10:00:00")))
      .toDF("id", "k", "ts")
    val right = Seq(
      ("k1", ts("2024-02-01 09:30:00"), 10.0),
      ("k1", ts("2024-02-01 10:00:00"), 20.0), // tie with left id=1 → inclusive
      ("k1", ts("2024-02-01 10:04:00"), 30.0),
      ("k2", ts("2024-02-01 09:59:00"), 99.0))
      .toDF("k", "ts", "v")
    val out = AsOf.asofBackward(left, right, "k", "ts", Seq("v"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("asof_v") == 20.0) // tie inclusive
    assert(out(1).getAs[Double]("asof_v") == 30.0) // latest preceding
    assert(out(2).isNullAt(out(2).fieldIndex("asof_v"))) // none precede
    assert(out(3).getAs[Double]("asof_v") == 99.0) // per-key isolation
  }

  test("asof forward: earliest right >= left per key, inclusive ties, null when none") {
    val left = Seq(
      (1L, "k1", ts("2024-02-01 10:00:00")),
      (2L, "k1", ts("2024-02-01 10:05:00")),
      (3L, "k1", ts("2024-02-01 11:00:00")), // after every right row
      (4L, "k2", ts("2024-02-01 10:00:00")))
      .toDF("id", "k", "ts")
    val right = Seq(
      ("k1", ts("2024-02-01 10:00:00"), 10.0), // tie with id=1 → inclusive
      ("k1", ts("2024-02-01 10:04:00"), 20.0),
      ("k1", ts("2024-02-01 10:30:00"), 30.0),
      ("k2", ts("2024-02-01 10:01:00"), 99.0))
      .toDF("k", "ts", "v")
    val out = AsOf.asofForward(left, right, "k", "ts", Seq("v"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("asof_v") == 10.0) // tie inclusive
    assert(out(1).getAs[Double]("asof_v") == 30.0) // earliest following
    assert(out(2).isNullAt(out(2).fieldIndex("asof_v"))) // none follow
    assert(out(3).getAs[Double]("asof_v") == 99.0)
  }

  test("asof nearest: closer side wins, backward on ties, tolerance nulls out") {
    val left = Seq(
      (1L, "k1", ts("2024-02-01 10:10:00")), // back 10 min, fwd 20 min → back
      (2L, "k1", ts("2024-02-01 10:25:00")), // back 25, fwd 5 → fwd
      (3L, "k1", ts("2024-02-01 10:15:00")), // equidistant 15/15 → backward
      (4L, "k1", ts("2024-02-01 13:00:00"))) // nearest is 150 min > tol → null
      .toDF("id", "k", "ts")
    val right = Seq(
      ("k1", ts("2024-02-01 10:00:00"), 1.0),
      ("k1", ts("2024-02-01 10:30:00"), 2.0))
      .toDF("k", "ts", "v")
    val out = AsOf.asofNearest(left, right, "k", "ts", 3600.0, Seq("v"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("asof_v") == 1.0 &&
      out(0).getAs[Double]("asof_dist") == 600.0)
    assert(out(1).getAs[Double]("asof_v") == 2.0 &&
      out(1).getAs[Double]("asof_dist") == 300.0)
    assert(out(2).getAs[Double]("asof_v") == 1.0, "tie must prefer backward")
    assert(out(3).isNullAt(out(3).fieldIndex("asof_v")) &&
      out(3).isNullAt(out(3).fieldIndex("asof_dist")))
  }

  test("pitFeatures: every dim attaches as-of the fact ts, never a" +
    " later feature (leakage-free); missing history is null") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val fact = Seq(
      (1L, "k1", ts("2024-02-01 10:05:00")),
      (2L, "k1", ts("2024-02-01 11:05:00")),
      (3L, "k2", ts("2024-02-01 10:00:00"))) // no k2 features at all
      .toDF("id", "k", "ts")
    val f1 = Seq(
      ("k1", ts("2024-02-01 10:00:00"), 10.0),
      ("k1", ts("2024-02-01 11:00:00"), 20.0)) // future for fact 1
      .toDF("k", "ts", "a")
    val f2 = Seq(("k1", ts("2024-02-01 09:00:00"), 7L))
      .toDF("k", "ts", "b")
    val out = AsOf.pitFeatures(fact, "k", "ts",
        Seq(("f1", f1, Seq("a")), ("f2", f2, Seq("b"))))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("f1_a") == 10.0 &&
      out(0).getAs[Long]("f2_b") == 7L)
    assert(out(1).getAs[Double]("f1_a") == 20.0 &&
      out(1).getAs[Long]("f2_b") == 7L)
    assert(out(2).isNullAt(out(2).fieldIndex("f1_a")) &&
      out(2).isNullAt(out(2).fieldIndex("f2_b")))
  }
}
