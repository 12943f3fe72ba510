package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed synthetic stream: term "t<g>" appears g times per block,
    * over `blocks` blocks — total N = blocks * G(G+1)/2 items,
    * true count of t<g> = blocks * g. */
  private def skewed(gMax: Int, blocks: Int) =
    (1 to blocks).flatMap(_ =>
      (1 to gMax).flatMap(g => Seq.fill(g)(s"t$g"))).toDF("term")

  test("exact regime (capacity ≥ distinct): summary equals groupBy count") {
    val df = skewed(30, 4)
    val mg = Sketches.mgSummary(df.repartition(6), "term", capacity = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mg == exact)
  }

  test("eviction regime: MG bound holds, summary bounded, hitters present") {
    val gMax = 60; val blocks = 5
    val df = skewed(gMax, blocks)
    val n = blocks.toLong * gMax * (gMax + 1) / 2
    val cap = 16
    val mg = Sketches.mgSummary(df.repartition(8), "term", cap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mg.size <= cap)
    val maxErr = n / (cap + 1)
    mg.foreach { case (t, est) =>
      val truth = blocks.toLong * t.drop(1).toLong
      assert(est <= truth, s"$t overestimated: $est > $truth")
      assert(est >= truth - maxErr, s"$t under bound: $est < $truth - $maxErr")
    }
    // every term with true count > N/(cap+1) must survive
    (1 to gMax).filter(g => blocks.toLong * g > maxErr).foreach { g =>
      assert(mg.contains(s"t$g"), s"heavy hitter t$g evicted")
    }
  }

  test("exact regime is partitioning-invariant") {
    val df = skewed(25, 3)
    val a = Sketches.mgSummary(df.repartition(2), "term", 128)
      .orderBy("term").collect().toSeq
    val b = Sketches.mgSummary(df.repartition(11), "term", 128)
      .orderBy("term").collect().toSeq
    assert(a == b)
  }

  test("heavyShingles ranks by count desc then shingle asc") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown cat sleeps"),
      (3L, "the quick brown fox runs")).toDF("doc_id", "text")
    val out = Sketches.heavyShingles(docs, "text", 3, 1024, 5).collect()
    assert(out.length == 5)
    assert(out(0).getString(1) == "the quick brown" && out(0).getLong(2) == 3L)
    assert(out(1).getString(1) == "quick brown fox" && out(1).getLong(2) == 2L)
    // rnk contiguous from 1, counts non-increasing
    assert(out.map(_.getLong(0)).toSeq == (1L to 5L))
    assert(out.sliding(2).forall(p => p(0).getLong(2) >= p(1).getLong(2)))
  }

  test("fused shingle MG == explode-path MG (exact regime), hard inputs") {
    // short docs (< n tokens: contribute nothing), empty text, null
    // text, punctuation-only (tokenizes to []), repeated shingles
    // inside one doc (positional counting, not distinct), digits,
    // and enough bulk to cross partition merges
    val docs = (Seq(
      (1L, "a b"), (2L, ""), (3L, null), (4L, "... !!!"),
      (5L, "x y z x y z x y z"), (6L, "cam 01 cam 01 cam 01"),
      (7L, "The QUICK brown FOX")) ++
      (8L to 200L).map(i => (i, s"stop word run ${i % 7} stop word run")))
      .toDF("doc_id", "text")
    val fused = Sketches.heavyShingles(docs.repartition(9), "text", 3,
        capacity = 1 << 12, k = 40)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val exploded = {
      val top = Sketches.shingleSummaryExploded(docs.repartition(4),
          "text", 3, capacity = 1 << 12)
        .orderBy(col("est").desc, col("term")).limit(40)
      top.select(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("est").desc, col("term")) match { case w =>
            row_number().over(w).cast("long").as("rnk") },
        col("term").as("shingle"), col("est").as("cnt"))
        .orderBy("rnk")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    }
    assert(fused == exploded)
  }
}
