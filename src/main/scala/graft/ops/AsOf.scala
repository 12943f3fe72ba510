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
}
