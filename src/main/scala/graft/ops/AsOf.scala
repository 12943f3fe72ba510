package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — the time-series operator Spark has no native
  * node for (the builder brief's canonical example). For each left row,
  * attach the latest right row with `right.ts <= left.ts` per key.
  *
  * Implementation: the union+window technique, NOT a range join — tag
  * both sides, sort within key by (ts, tag) with right-before-left on
  * ties, and carry the right payload forward with `last(ignoreNulls)`.
  * ONE shuffle on the key (same as any windowed op), no range-predicate
  * nested loop, no per-key driver work; at 100 TB this is a single
  * sort-within-partitions after a hash partition on key. This is how
  * Flink/kdb-style as-of joins decompose onto a shuffle engine.
  */
object AsOf {

  /** `left` and `right` must share `keyCol`; `tsCol` is epoch-comparable
    * in both. Right-side payload columns `valueCols` arrive as
    * `asof_<name>` (null when no right row precedes the left row). */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // tag: right=0 sorts before left=1 on ts ties → inclusive <= semantics
    val l = left.withColumn("_tag", lit(1))
    val r = right.select(
      (col(keyCol) +: col(tsCol).as(tsCol) +: valueCols.map(col)): _*)
      .withColumn("_tag", lit(0))
    // align schemas: left keeps its payload, right contributes _r_<v>
    val lAligned = valueCols.foldLeft(l)((d, v) =>
      d.withColumn(s"_r_$v", lit(null).cast(right.schema(v).dataType)))
    val rAligned = valueCols.foldLeft(r)((d, v) =>
      d.withColumnRenamed(v, s"_r_$v"))
    val lProj = lAligned.select(
      (Seq(col(keyCol), col(tsCol), col("_tag")) ++
        valueCols.map(v => col(s"_r_$v")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col)): _*)
    val rProj = rAligned.select(
      (Seq(col(keyCol), col(tsCol), col("_tag")) ++
        valueCols.map(v => col(s"_r_$v")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // Deterministic tiebreak among right rows sharing (key, ts): order by
    // a payload-derived hash so `last` always lands on the same row (rows
    // with equal hashes have equal payloads → same carried values either
    // way). Without this the pick is partition-order-dependent (SURVEY
    // hazard 7).
    val unioned = lProj.union(rProj).withColumn("_tb",
      when(col("_tag") === 0, xxhash64(valueCols.map(v => col(s"_r_$v")): _*))
        .otherwise(lit(0L)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_tag"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned)((d, v) =>
      d.withColumn(s"asof_$v", last(col(s"_r_$v"), ignoreNulls = true).over(w)))
    carried.filter(col("_tag") === 1)
      .select((leftCols.map(col) ++ valueCols.map(v => col(s"asof_$v"))): _*)
  }

  /** Point-in-time multi-table feature join — the feature-store read
    * path: attach to every fact row, for EACH feature table, the
    * latest feature row at-or-before the fact's own timestamp.
    * Strictly `dim.ts <= fact.ts`, so training examples can never see
    * a feature computed after the label event (leakage-free by
    * construction — the property feature stores exist to enforce).
    * `dims` entries are (prefix, table, payloadCols); payload arrives
    * as `<prefix>_<col>`, null when no feature row precedes the fact.
    *
    * Decomposes into k chained [[asofBackward]] unions — k hash
    * shuffles on the SAME entity key (at 100 TB, AQE coalesces and
    * the key partitioning is reusable across the chain), never a
    * range join or per-key loop. */
  def pitFeatures(fact: DataFrame, keyCol: String, tsCol: String,
                  dims: Seq[(String, DataFrame, Seq[String])]): DataFrame =
    dims.foldLeft(fact) { case (acc, (prefix, dim, cols)) =>
      cols.foldLeft(asofBackward(acc, dim, keyCol, tsCol, cols)) {
        (d, c) => d.withColumnRenamed(s"asof_$c", s"${prefix}_$c")
      }
    }

  /** As-of FORWARD join: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` per key — the "next reading" lookup
    * (next checkpoint, next price tick). Same union+window decomposition
    * and cost as [[asofBackward]] (one hash shuffle + sort), traversed
    * in descending ts so `last(ignoreNulls)` carries the nearest
    * FOLLOWING right row; right still sorts before left on ts ties, so
    * the `>=` is inclusive. */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("_tag", lit(1))
    val r = right.select(
      (col(keyCol) +: col(tsCol).as(tsCol) +: valueCols.map(col)): _*)
      .withColumn("_tag", lit(0))
    val lAligned = valueCols.foldLeft(l)((d, v) =>
      d.withColumn(s"_r_$v", lit(null).cast(right.schema(v).dataType)))
    val rAligned = valueCols.foldLeft(r)((d, v) =>
      d.withColumnRenamed(v, s"_r_$v"))
    val lProj = lAligned.select(
      (Seq(col(keyCol), col(tsCol), col("_tag")) ++
        valueCols.map(v => col(s"_r_$v")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col)): _*)
    val rProj = rAligned.select(
      (Seq(col(keyCol), col(tsCol), col("_tag")) ++
        valueCols.map(v => col(s"_r_$v")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = lProj.union(rProj).withColumn("_tb",
      when(col("_tag") === 0, xxhash64(valueCols.map(v => col(s"_r_$v")): _*))
        .otherwise(lit(0L)))
    // descending ts: among right rows at one (key, ts) the LAST one in
    // traversal order wins — ascending _tb keeps the pick payload-
    // deterministic (equal hashes ⇒ equal payloads), mirroring backward
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col("_tag"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned)((d, v) =>
      d.withColumn(s"asof_$v", last(col(s"_r_$v"), ignoreNulls = true).over(w)))
    carried.filter(col("_tag") === 1)
      .select((leftCols.map(col) ++ valueCols.map(v => col(s"asof_$v"))): _*)
  }

  /** As-of NEAREST join: the closer of the backward and forward matches
    * within `tolerance` (in `tsCol`'s native units after a double cast;
    * timestamps compare in seconds); ties prefer backward (the value
    * that was already known at left.ts). Composes the two directional
    * joins sequentially — two key shuffles; the directional frames
    * carry the matched right ts so distance is computed per row, and
    * a match outside tolerance degrades to null exactly like a missing
    * side. Columns arrive as `asof_<v>` plus `asof_dist` (null when
    * neither side qualifies). */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, tolerance: Double,
                  valueCols: Seq[String]): DataFrame = {
    val rts = right.withColumn("_rts", col(tsCol))
    val vAll = valueCols :+ "_rts"
    val back = asofBackward(left, rts, keyCol, tsCol, vAll)
    val bRenamed = vAll.foldLeft(back)((d, v) =>
      d.withColumnRenamed(s"asof_$v", s"_b_$v"))
    val both = asofForward(bRenamed, rts, keyCol, tsCol, vAll)
    val t = col(tsCol).cast("double")
    val db = t - col("_b__rts").cast("double")
    val df = col("asof__rts").cast("double") - t
    val okB = col("_b__rts").isNotNull && db <= tolerance
    val okF = col("asof__rts").isNotNull && df <= tolerance
    val useB = okB && (!okF || db <= df)
    val picked = valueCols.foldLeft(both)((d, v) =>
      d.withColumn(s"_n_$v",
        when(useB, col(s"_b_$v"))
          .when(okF, col(s"asof_$v"))
          .otherwise(lit(null).cast(right.schema(v).dataType))))
      .withColumn("asof_dist",
        when(useB, db).when(okF, df).otherwise(lit(null).cast("double")))
    picked.select((left.columns.map(col) ++
      valueCols.map(v => col(s"_n_$v").as(s"asof_$v")) :+
      col("asof_dist")): _*)
  }
}
