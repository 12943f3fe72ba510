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

  /** Per-a-row overlap aggregate: how many b-intervals intersect each
    * a-interval and the total intersected seconds — the "incidents
    * during this session" rollup, without materializing pairs in the
    * output. Left-preserving: a-rows with no overlap keep n=0, sec=0. */
  def overlapStats(a: DataFrame, b: DataFrame, keyCol: String,
                   idCol: String, sCol: String, eCol: String,
                   bucketSec: Long = 14400L): DataFrame = {
    val hits = overlapJoin(a, b, keyCol, idCol, sCol, eCol, bucketSec)
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
    call_function("div", c - pmod(c, lit(d)), lit(d))
}
