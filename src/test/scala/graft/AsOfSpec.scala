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
}
