package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-profiling summary — the per-column statistics a pipeline health
  * check runs before/after every transform stage (the engine-level
  * generalization of the reference's eyeball scripts
  * scripts/check_db_total.py).
  *
  * Two dials:
  *  - DEFAULT (`exact = false`): approximate distincts via HLL++. All
  *    columns profile in ONE wide aggregation = one table scan — HLL
  *    sketches are mergeable fixed-size state, so unlike exact
  *    count_distinct they don't force an Expand (row copy per distinct
  *    agg). This is the 100 TB path: the shuffle carries one sketch per
  *    column per partition, never a value set.
  *  - `exact = true`: exact count_distinct, one aggregation job per
  *    column, unioned. Deliberately NOT a single wide aggregation:
  *    multiple exact count_distincts in one agg plan through an Expand
  *    (measured 5× slower here), while the per-column jobs each scan ONE
  *    column, so with columnar pruning the union's total I/O is about
  *    one full-table read anyway; the extra cost is only n_cols job
  *    schedulings. Kept as the oracle-verifiable path.
  */
object Profiler {

  /** Typed min/max slots for a field: numeric columns → min_num/max_num,
    * strings → min_str/max_str, timestamps → epoch seconds in
    * min_num/max_num. */
  private def typedMinMax(f: StructField)
      : (Column, Column, Column, Column) = {
    val c = col(f.name)
    f.dataType match {
      case _: NumericType =>
        (min(c).cast("double"), max(c).cast("double"),
          lit(null).cast("string"), lit(null).cast("string"))
      case _: TimestampType =>
        (min(unix_timestamp(c)).cast("double"),
          max(unix_timestamp(c)).cast("double"),
          lit(null).cast("string"), lit(null).cast("string"))
      case _: StringType =>
        (lit(null).cast("double"), lit(null).cast("double"),
          min(c), max(c))
      case _ =>
        (lit(null).cast("double"), lit(null).cast("double"),
          lit(null).cast("string"), lit(null).cast("string"))
    }
  }

  /** Per-column: row/non-null/distinct counts plus typed min/max.
    * `exact = false` (default) uses approx_count_distinct in one
    * single-scan aggregation; `exact = true` runs one exact job per
    * column. Output schema is identical for both. */
  def summary(df: DataFrame, exact: Boolean = false,
              rsd: Double = 0.05): DataFrame =
    if (exact) {
      val perCol = df.schema.fields.map { f =>
        val c = col(f.name)
        val (minNum, maxNum, minStr, maxStr) = typedMinMax(f)
        df.agg(
          count(lit(1)).as("n_rows"),
          count(c).as("n_nonnull"),
          count_distinct(c).as("n_distinct"),
          minNum.as("min_num"), maxNum.as("max_num"),
          minStr.as("min_str"), maxStr.as("max_str"))
          .select(lit(f.name).as("col_name"), col("n_rows"),
            col("n_nonnull"), col("n_distinct"), col("min_num"),
            col("max_num"), col("min_str"), col("max_str"))
      }
      perCol.reduce(_ union _)
    } else {
      // one wide agg (single scan), then unpivot the per-column slots
      // into rows — the explode is over n_cols structs on ONE row
      val aggs = df.schema.fields.flatMap { f =>
        val c = col(f.name)
        val (minNum, maxNum, minStr, maxStr) = typedMinMax(f)
        Seq(count(c).as(s"_nn_${f.name}"),
          approx_count_distinct(c, rsd).as(s"_nd_${f.name}"),
          minNum.as(s"_mn_${f.name}"), maxNum.as(s"_mx_${f.name}"),
          minStr.as(s"_ms_${f.name}"), maxStr.as(s"_xs_${f.name}"))
      }.toSeq
      val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val rows = df.schema.fields.map { f =>
        struct(lit(f.name).as("col_name"), col("n_rows"),
          col(s"_nn_${f.name}").as("n_nonnull"),
          col(s"_nd_${f.name}").as("n_distinct"),
          col(s"_mn_${f.name}").as("min_num"),
          col(s"_mx_${f.name}").as("max_num"),
          col(s"_ms_${f.name}").as("min_str"),
          col(s"_xs_${f.name}").as("max_str"))
      }.toIndexedSeq
      one.select(explode(array(rows: _*)).as("r")).select("r.*")
    }

  /** HLL++ approximate distinct — the count-distinct that scales (the
    * sketch is mergeable, so the shuffle carries fixed-size state
    * instead of the key set). rsd = relative standard deviation. */
  def approxDistinct(df: DataFrame, colName: String,
                     rsd: Double = 0.05): Long =
    df.agg(approx_count_distinct(col(colName), rsd)).collect().head.getLong(0)
}
