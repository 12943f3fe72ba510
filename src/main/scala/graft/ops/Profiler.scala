package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-profiling summary — the per-column statistics a pipeline health
  * check runs before/after every transform stage (the engine-level
  * generalization of the reference's eyeball scripts
  * scripts/check_db_total.py). One aggregation job per column, unioned.
  *
  * Deliberately NOT a single wide aggregation: multiple exact
  * count_distincts in one agg plan through an Expand (one row copy per
  * distinct agg — measured 5× slower here), while the per-column jobs
  * each scan ONE column, so with columnar pruning the union's total
  * I/O is about one full-table read anyway; the extra cost is only
  * n_cols job schedulings. For approximate profiling at interactive
  * latency, [[approxDistinct]] (HLL, Expand-free) is the dial.
  */
object Profiler {

  /** Per-column: row/non-null/distinct counts plus typed min/max
    * (numeric columns → min_num/max_num, strings → min_str/max_str,
    * timestamps → epoch seconds in min_num/max_num). */
  def summary(df: DataFrame): DataFrame = {
    val perCol = df.schema.fields.map { f =>
      val c = col(f.name)
      val (minNum, maxNum, minStr, maxStr) = f.dataType match {
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
      df.agg(
        count(lit(1)).as("n_rows"),
        count(c).as("n_nonnull"),
        count_distinct(c).as("n_distinct"),
        minNum.as("min_num"), maxNum.as("max_num"),
        minStr.as("min_str"), maxStr.as("max_str"))
        .select(lit(f.name).as("col_name"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    perCol.reduce(_ union _)
  }

  /** HLL++ approximate distinct — the count-distinct that scales (the
    * sketch is mergeable, so the shuffle carries fixed-size state
    * instead of the key set). rsd = relative standard deviation. */
  def approxDistinct(df: DataFrame, colName: String,
                     rsd: Double = 0.05): Long =
    df.agg(approx_count_distinct(col(colName), rsd)).collect().head.getLong(0)
}
