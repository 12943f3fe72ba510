package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval overlap join — the join type between equi (J1) and as-of
  * (x_asof_*): pairs of rows whose [start,end] ranges intersect on the
  * same key (activity windows × incident windows, shipment windows ×
  * outage windows). The reference's slot logic compares point
  * timestamps to slot bounds (utils.py:417-470 routes a timestamp into
  * its hour slot); this is the two-sided generalization a telemetry
  * team reaches for next.
  *
  * A naive theta-join (`a.s <= b.e && b.s <= a.e`) is a broadcast
  * nested loop over the key group — quadratic per key and not
  * shuffle-partitionable. The scale form here is epoch-bucket
  * blocking:
  *
  *   - each interval explodes to the `bucketSec`-wide epoch buckets it
  *     covers (cost per row = len/bucketSec + 1, a tuning dial — set
  *     bucketSec near the typical interval length so the fan-out is a
  *     small constant);
  *   - candidates join hash-partitioned on (key, bucket) — an equi
  *     shuffle, AQE-splittable, never a nested loop over a whole key;
  *   - a pair is EMITTED ONLY in the bucket containing
  *     max(a.start, b.start). Both sides provably cover that bucket
  *     when the intervals overlap (max(s) ≤ min(e) ≤ each end), and
  *     the bucket is unique per pair — exactly-once without a
  *     distinct/dedup shuffle;
  *   - the exact closed-interval predicate verifies each candidate.
  *
  * Hot (key,bucket) cells mean genuinely many concurrent intervals —
  * the output itself is quadratic there; the blocking does not
  * manufacture skew that the answer doesn't have.
  */
object Intervals {

  /** All (a,b) pairs sharing `keyCol` with closed-interval overlap:
    * a.s ≤ b.e ∧ b.s ≤ a.e. Both inputs carry (keyCol, idCol, sCol,
    * eCol) with epoch-second longs, s ≤ e. Output: key, a_id, b_id,
    * both ranges, the intersection [ov_s, ov_e] and its length in
    * seconds; ordered. */
  def overlapJoin(a: DataFrame, b: DataFrame, keyCol: String,
                  idCol: String, sCol: String, eCol: String,
                  bucketSec: Long = 14400L): DataFrame = {
    require(bucketSec >= 1, s"bucketSec must be >= 1, got $bucketSec")
    def exploded(df: DataFrame, tag: String): DataFrame =
      df.select(col(keyCol), col(idCol).as(s"${tag}_id"),
          col(sCol).as(s"${tag}_s"), col(eCol).as(s"${tag}_e"))
        .withColumn("_bkt", explode(sequence(
          floorDiv(col(s"${tag}_s"), bucketSec),
          floorDiv(col(s"${tag}_e"), bucketSec))))
    val pairs = exploded(a, "a").join(exploded(b, "b"), Seq(keyCol, "_bkt"))
      // ownership: exactly the bucket holding the later start — both
      // sides cover it iff the pair overlaps, so no pair is lost and
      // none is double-counted
      .filter(col("_bkt") === floorDiv(greatest(col("a_s"), col("b_s")),
        bucketSec))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
    pairs.select(col(keyCol), col("a_id"), col("b_id"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e"),
        greatest(col("a_s"), col("b_s")).as("ov_s"),
        least(col("a_e"), col("b_e")).as("ov_e"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("ov_len"))
      .orderBy(keyCol, "a_id", "b_id")
  }

  /** AUTO-SIZED overlap join — same output contract as [[overlapJoin]]
    * with no `bucketSec` dial and no long-outlier fan-out hazard
    * (a single year-long interval under a 4-hour bucket explodes to
    * 2190 rows in the flat scheme AND pays one candidate per shared
    * bucket for every long×long pair; here it indexes ≤ ~3 rows and
    * pays O(1) per true pair).
    *
    * Scheme: multi-LEVEL tiling + start-containment decomposition.
    *   - overlap(a,b) ⟺ the LATER-starting interval's start lies
    *     inside the other (max(s) ≤ min(e)); so the join splits into
    *     two disjoint point-in-interval directions: b.s ∈ [a.s, a.e]
    *     (covers b.s ≥ a.s) and a.s ∈ [b.s, b.e] with b.s < a.s —
    *     each true pair is found in EXACTLY one direction, no
    *     ownership filter, no dedup shuffle.
    *   - point-in-interval: every interval is indexed at ONE level
    *     k = the smallest with g·2^k ≥ its span (g = the auto base
    *     grain), where it covers ≤ 2 tiles (≤ 3 under fp slop in the
    *     level computation — the sequence() keeps correctness either
    *     way); a probe point lies in exactly ONE tile per level, so
    *     each (interval, contained point) pair meets exactly once on
    *     the (level, tile) equi-key.
    *   - probes fan out only to the DISTINCT levels present in the
    *     index (collected to the driver — a ≤64-value level domain,
    *     bounded by construction).
    * The auto grain g is the median span (clamped ≥ 1); any g gives
    * the same answer (levels absorb mis-sizing — g only tunes how
    * many levels exist), so the approx-median is a pure tuning knob.
    * Hot (key, level, tile) cells mean genuinely many concurrent
    * intervals — output-inherent skew, as in [[overlapJoin]]. */
  def overlapJoinAuto(a: DataFrame, b: DataFrame, keyCol: String,
                      idCol: String, sCol: String,
                      eCol: String): DataFrame = {
    def norm(df: DataFrame, tag: String): DataFrame =
      df.select(col(keyCol), col(idCol).as(s"${tag}_id"),
        col(sCol).as(s"${tag}_s"), col(eCol).as(s"${tag}_e"))
    val na = norm(a, "a").cache()
    val nb = norm(b, "b").cache()
    // auto grain: median span across both inputs (approx — tuning
    // only), clamped >= 1. Bounded driver collect: one scalar.
    val spans = na.select((col("a_e") - col("a_s")).as("sp"))
      .unionAll(nb.select((col("b_e") - col("b_s")).as("sp")))
    val gRow = spans.agg(
      percentile_approx(col("sp"), lit(0.5), lit(1000))).head()
    val g = if (gRow.isNullAt(0)) 1L else math.max(1L, gRow.getLong(0))
    // g * 2^k in pure long arithmetic (pow-as-double would lose exact
    // tile boundaries past 2^53)
    def gk(k: Column): Column = call_function("shiftleft", lit(g), k)
    // level of an interval: smallest k >= 0 with g*2^k >= span. The
    // double log2 may mis-round near powers of two; that only shifts
    // WHICH level an interval indexes at (and how many tiles the
    // sequence emits — <= 3 instead of <= 2), never correctness: the
    // probe visits every level present in the index.
    def levelOf(s: Column, e: Column): Column =
      greatest(lit(0),
        ceil(log(2.0, greatest((e - s).cast("double") / g, lit(1.0))))
          .cast("int"))
    def index(df: DataFrame, tag: String): DataFrame = {
      val k = levelOf(col(s"${tag}_s"), col(s"${tag}_e"))
      df.withColumn("_lvl", k)
        .withColumn("_tile", explode(sequence(
          floorDiv(col(s"${tag}_s"), gk(col("_lvl"))),
          floorDiv(col(s"${tag}_e"), gk(col("_lvl"))))))
    }
    val ia = index(na, "a")
    val ib = index(nb, "b")
    // distinct levels present per index side — the probe fan-out.
    // Driver collect justified: the level domain is <= 64 by the long
    // range, in practice a handful.
    def levelsOf(ix: DataFrame): Seq[Int] = {
      val lv = ix.select(col("_lvl")).distinct()
        .collect().map(_.getInt(0)).toSeq
      if (lv.isEmpty) Seq(0) else lv
    }
    def probes(df: DataFrame, tag: String, levels: Seq[Int]): DataFrame =
      df.withColumn("_lvl", explode(array(levels.map(lit): _*)))
        .withColumn("_tile", floorDiv(col(s"${tag}_s"), gk(col("_lvl"))))
    // direction 1: b starts inside a (b_s >= a_s)
    val d1 = ia.join(probes(nb, "b", levelsOf(ia)),
        Seq(keyCol, "_lvl", "_tile"))
      .filter(col("b_s") >= col("a_s") && col("b_s") <= col("a_e"))
    // direction 2: a starts STRICTLY inside b (b_s < a_s) — disjoint
    // from d1 by the strict inequality, jointly exhaustive because the
    // later-starting side's start is always contained on overlap
    val d2 = ib.join(probes(na, "a", levelsOf(ib)),
        Seq(keyCol, "_lvl", "_tile"))
      .filter(col("a_s") > col("b_s") && col("a_s") <= col("b_e"))
    val pairs = d1.select(col(keyCol), col("a_id"), col("b_id"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e"))
      .unionAll(d2.select(col(keyCol), col("a_id"), col("b_id"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e")))
    val out = pairs.select(col(keyCol), col("a_id"), col("b_id"),
        col("a_s"), col("a_e"), col("b_s"), col("b_e"),
        greatest(col("a_s"), col("b_s")).as("ov_s"),
        least(col("a_e"), col("b_e")).as("ov_e"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("ov_len"))
      .orderBy(keyCol, "a_id", "b_id")
    graft.util.CacheRelease.releaseAfterFirstAction(out, Seq(na, nb))
  }

  /** Per-a-row overlap aggregate: how many b-intervals intersect each
    * a-interval and the total intersected seconds — the "incidents
    * during this session" rollup, without materializing pairs in the
    * output. Left-preserving: a-rows with no overlap keep n=0, sec=0. */
  def overlapStats(a: DataFrame, b: DataFrame, keyCol: String,
                   idCol: String, sCol: String, eCol: String,
                   bucketSec: Long = 14400L): DataFrame =
    statsFromPairs(a, overlapJoin(a, b, keyCol, idCol, sCol, eCol,
      bucketSec), keyCol, idCol, sCol, eCol)

  /** [[overlapStats]] over the auto-sized join — no bucket dial. */
  def overlapStatsAuto(a: DataFrame, b: DataFrame, keyCol: String,
                       idCol: String, sCol: String,
                       eCol: String): DataFrame =
    statsFromPairs(a, overlapJoinAuto(a, b, keyCol, idCol, sCol, eCol),
      keyCol, idCol, sCol, eCol)

  private def statsFromPairs(a: DataFrame, pairs: DataFrame,
                             keyCol: String, idCol: String, sCol: String,
                             eCol: String): DataFrame = {
    val hits = pairs
      .groupBy(col(keyCol), col("a_id"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(col("ov_len")).as("overlap_sec"))
    a.select(col(keyCol), col(idCol).as("a_id"),
        col(sCol).as("a_s"), col(eCol).as("a_e"))
      .join(hits, Seq(keyCol, "a_id"), "left")
      .select(col(keyCol), col("a_id"), col("a_s"), col("a_e"),
        coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"),
        coalesce(col("overlap_sec"), lit(0L)).as("overlap_sec"))
      .orderBy(keyCol, "a_id")
  }

  /** Long floor-division in pure integer arithmetic — exact for the
    * FULL long range (a double-division floor mis-rounds once the
    * quotient leaves 2^53, silently breaking the exactly-once
    * ownership filter for epoch-millisecond-scale inputs). `pmod` is
    * always in [0, d), so subtracting it lands exactly on the bucket
    * boundary and the division is exact; negative starts (pre-1970)
    * still block correctly because this is a true floor, not a
    * truncation. */
  private[graft] def floorDiv(c: Column, d: Long): Column =
    floorDiv(c, lit(d))

  private[graft] def floorDiv(c: Column, d: Column): Column =
    call_function("div", c - pmod(c, d), d)
}
