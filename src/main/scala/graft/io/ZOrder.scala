package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered file layout — the lakehouse
  * OPTIMIZE ZORDER pattern (public Delta/Iceberg docs) rebuilt on plain
  * parquet: interleave the bits of two scan dimensions, range-partition
  * and sort files by the interleaved value, and every file's min/max
  * footer stats become tight on BOTH dimensions at once. A 2-D range
  * predicate (camera × time, user × value, …) then prunes row groups on
  * either column — where a linear sort is tight on its leading column
  * only, so the second dimension reads everything. Pure layout
  * optimization: content identical, benefit measured (ZOrderSpec pins
  * scan-output rows z-ordered ≪ linearly-sorted at equal file counts).
  *
  * At 100 TB this is the difference between "point-in-rectangle queries
  * read ~the answer" and "read the whole time range": the curve keeps
  * locality in every dimension it interleaves, and the write is one
  * range shuffle — a rare offline job, the [[graft.ops.Embeddings]]
  * index-build trade. */
object ZOrder {

  /** Morton z-value of two non-negative ints, `bits` bits each,
    * bit-interleaved (a's bits in the odd positions). Pure column
    * expression — whole-stage codegen, no UDF. Values must fit
    * `bits` (caller scales/offsets first; [[zOrderBy]] min-max
    * normalizes for you). */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "zValue2: bits in [1, 31]")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)),
        2 * i + 1)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_.bitwiseOR(_))
  }

  /** Rank-normalize a column to [0, 2^bits) via its min/max (a two-row
    * broadcastable aggregate), so arbitrary numeric ranges interleave
    * with full bit utilization. Constant columns map to 0. */
  private def normalized(d: DataFrame, c: String, bits: Int): Column = {
    val span = col(s"_max_$c") - col(s"_min_$c")
    val scaled = when(span > 0,
      ((col(c) - col(s"_min_$c")).cast("double") / span.cast("double")) *
        lit((1L << bits) - 1).cast("double"))
      .otherwise(lit(0.0))
    floor(scaled).cast("long")
  }

  /** Return `df` clustered on the z-curve of `(ca, cb)`: range-
    * partitioned into `numFiles` splits and sorted within each by the
    * interleaved value — write the result with any sink and each file
    * covers a compact rectangle of (ca, cb) space. The helper column
    * is dropped; row content is untouched. */
  def zOrderBy(df: DataFrame, ca: String, cb: String, numFiles: Int,
               bits: Int = 16): DataFrame = {
    val stats = df.agg(
      min(col(ca)).cast("long").as(s"_min_$ca"),
      max(col(ca)).cast("long").as(s"_max_$ca"),
      min(col(cb)).cast("long").as(s"_min_$cb"),
      max(col(cb)).cast("long").as(s"_max_$cb"))
    val z = df.crossJoin(broadcast(stats))
      .withColumn("_z", zValue2(
        normalized(df, ca, bits), normalized(df, cb, bits), bits))
      .drop(s"_min_$ca", s"_max_$ca", s"_min_$cb", s"_max_$cb")
    z.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** [[zOrderBy]] + parquet write with small row groups (`blockBytes`),
    * so footer min/max pruning operates at sub-file granularity — the
    * knob that turns tight per-file rectangles into skipped IO. */
  def writeZOrdered(df: DataFrame, path: String, ca: String, cb: String,
                    numFiles: Int, bits: Int = 16,
                    blockBytes: Long = 128L * 1024 * 1024): Unit =
    zOrderBy(df, ca, cb, numFiles, bits)
      .write.option("parquet.block.size", blockBytes)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)
}
