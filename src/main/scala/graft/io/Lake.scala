package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-lake layout ops — the reference's date-partitioned event log
  * (reference: app/services/camera.py:54-86 writes
  * raw/YYYY/MM/DD/traffic_log_<camera>.csv; app/utils.py:329-365 resolves
  * one date dir manually).
  *
  * Spark-first: `partitionBy(year, month, day)` on write gives Hive-style
  * directories; reads filter on the partition columns and Catalyst prunes
  * to the one directory — the manual path construction disappears and the
  * same query works at 100 TB (a day's partition is all you scan).
  * Parquet replaces CSV as the default lake format (columnar + stats);
  * CSV remains available for reference-shaped output.
  */
object Lake {

  /** S9 — append events into a date-partitioned lake.
    * `maxRecordsPerFile` guards against giant files at scale; dynamic
    * partition overwrite leaves other dates untouched.
    *
    * `routeByDay = true` repartitions on the date columns first, so a
    * BACKFILL spanning many days writes one task per day instead of
    * one file per task × day it touches (with `maxRecordsPerFile`
    * still splitting big days into bounded files). Off by default:
    * the steady-state producer is the streaming sink, whose per-batch
    * appends are small and task-local — routing there would add a
    * shuffle per tick for nothing, and [[compactDay]] is the
    * small-file antidote on closed partitions either way. */
  def writePartitioned(df: DataFrame, tsCol: String, root: String,
                       format: String = "parquet",
                       mode: SaveMode = SaveMode.Append,
                       routeByDay: Boolean = false): Unit = {
    val dated = df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
    val routed =
      if (routeByDay) dated.repartition(col("year"), col("month"), col("day"))
      else dated
    routed.write.partitionBy("year", "month", "day")
      .option("header", "true") // no-op for parquet, reference-shaped for csv
      .format(format).mode(mode).save(root)
  }

  /** S10 — scan one day with partition pruning (no manual paths). The
    * filter lands on partition columns, so Spark lists exactly one
    * directory regardless of lake size. */
  def readDay(s: SparkSession, root: String, y: Int, m: Int, d: Int,
              format: String = "parquet"): DataFrame =
    s.read.format(format).option("header", "true").load(root)
      .filter(col("year") === y && col("month") === m && col("day") === d)

  /** Bucketed co-located table write — the 100 TB answer to the
    * reference's `(camera_id, timestamp)` index (app/database.py:33-36).
    * Facts bucketed on the join/agg key mean every subsequent
    * join-on-key and groupBy-on-key reads pre-partitioned data: NO
    * shuffle at query time (LakeBucketingSpec pins the plan). Bucket
    * count is a cluster-lifetime choice — pick ~2-4× executor count so
    * every core has work; co-locating two tables requires equal bucket
    * counts on the same key. `sortBy` additionally orders within each
    * bucket file (time-range scans read sorted runs). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.format("parquet").mode(mode)
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Range-clustered sorted write — the lake layout for selective
    * time/key scans at 100 TB. `repartitionByRange` assigns contiguous
    * key ranges to files and `sortWithinPartitions` orders rows inside
    * each file, so every parquet row group carries tight min/max stats
    * on the sort keys: a point or range predicate skips whole files and
    * row groups at scan time (predicate pushdown does the skipping —
    * no manual path math, no index table). This is the write-side dual
    * of X1's `(camera_id, timestamp)` SQLite index
    * (reference app/database.py:33-36): same read selectivity, but the
    * "index" is the physical order plus footer stats, costs one range
    * shuffle at write time, and needs no maintenance.
    * LakeBucketingSpec asserts the clustering (one key → one file). */
  def writeSortedByRange(df: DataFrame, root: String, nFiles: Int,
                         sortCols: Seq[String],
                         mode: SaveMode = SaveMode.Overwrite): Unit = {
    val keys = sortCols.map(col)
    df.repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.format("parquet").mode(mode).save(root)
  }

  /** Z-order clustered write — two-dimensional locality for the lake.
    * `writeSortedByRange` gives perfect footer min/max on ONE sort
    * prefix; a predicate on the second column alone prunes nothing.
    * Here both cluster keys are linearly quantized to `bits` levels
    * (min/max sampled in one tiny agg), their bits interleaved into a
    * Morton code, and the data range-partitioned + sorted by that code
    * — so every file covers a small RECTANGLE in (a, b) space and
    * footer min/max stay tight on BOTH columns at once. Point/range
    * predicates on either key (or both) skip most files at scan time;
    * that's the standard lakehouse answer for two-column selectivity
    * (e.g. camera_id × time, lat × lng) without maintaining an index.
    * Linear quantization is the simple dial — for heavily skewed keys,
    * rank-based bucketing slots in at the `quant` expressions without
    * changing the interleave. Write cost: one scalar agg + one range
    * shuffle, same as a plain sorted write. */
  def writeZOrdered(df: DataFrame, root: String, nFiles: Int,
                    colA: String, colB: String, bits: Int = 8,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.Column
    val mm = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double")))
      .collect().head
    val levels = 1L << bits
    def quant(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(greatest(
        floor((c.cast("double") - lo) / (hi - lo) * levels), lit(0L)),
        lit(levels - 1)).cast("long")
    val qa = quant(col(colA), mm.getDouble(0), mm.getDouble(1))
    val qb = quant(col(colB), mm.getDouble(2), mm.getDouble(3))
    def bitOf(c: Column, i: Int): Column =
      shiftrightunsigned(c, i).bitwiseAND(lit(1L))
    val z = (0 until bits).map(i =>
      shiftleft(bitOf(qa, i), 2 * i) + shiftleft(bitOf(qb, i), 2 * i + 1))
      .reduce(_ + _)
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z") // projection after the sort — per-partition order kept
      .write.format("parquet").mode(mode).save(root)
  }

  /** Operational compaction for one day partition — the antidote to the
    * streaming sink's small-files problem (a 2 s micro-batch cadence
    * writes ~43k files/day/partition; parquet scan cost is dominated by
    * file count long before data volume at that shape). Rewrites the
    * partition into `ceil(bytes / targetFileBytes)` files via a staging
    * directory + bak-swap publish ([[Fs.publish]]): readers can observe
    * a missing partition only inside the two-rename window, a crash at
    * any point leaves a complete copy on disk (live or `_bak`), and
    * rows are byte-identical (no ordering guarantees were ever promised
    * inside a day). Run it on closed (past-day) partitions from a
    * maintenance job — the streaming writer only ever appends to TODAY,
    * so compacting yesterday races nothing. */
  def compactDay(s: SparkSession, root: String, y: Int, m: Int, d: Int,
                 targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    // heal any crash artifact from a PREVIOUS compaction before making
    // new ones: a partition left at its _bak_ name (crash between
    // publish's two renames) is restored, a stale bak next to a live
    // partition is dropped — so the require below never faults on a
    // partition that is merely mid-recovery, and generic readers (plain
    // spark.read.parquet on the root, which cannot heal themselves) see
    // the tree whole again after the first maintenance pass
    repair(s, root)
    val dir = s"$root/year=$y/month=$m/day=$d"
    require(Fs.exists(s, dir), s"no partition at $dir")
    val bytes = Fs.totalBytes(s, dir, _.endsWith(".parquet"))
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    // underscore prefix: invisible to partition discovery while staging
    val staging = s"$root/year=$y/month=$m/_compact_day=$d"
    s.read.parquet(dir).coalesce(nFiles.toInt)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    Fs.publish(s, staging, dir)
  }

  /** Publish-crash recovery sweep for a lake root ([[Fs.recoverTree]]):
    * restores partitions stranded at their `_bak_` name by a crash
    * inside a [[compactDay]] publish and clears stale baks. A snapshot
    * or IVF index heals inside its own reader; a lake is read by plain
    * `spark.read.parquet(root)`, which cannot — so run this at startup
    * or before maintenance ([[compactDay]] calls it first). Idempotent;
    * walks directories only (catalog-scale). Returns restored paths. */
  def repair(s: SparkSession, root: String): Seq[String] =
    Fs.recoverTree(s, root)

  /** Detection-grain CSV sink with the REFERENCE's exact lake schema
    * (app/services/camera.py:54-86): header
    * `timestamp,source_id,source_name,class_id,confidence,bbox`, with
    * `timestamp` = epoch seconds (`time.time()`) rendered as plain
    * fixed-point with microsecond precision (`%.6f` — never scientific
    * notation, fractional seconds preserved; the reference's
    * `str(float)` shortest-repr can print fewer trailing digits, which
    * parses identically), confidence formatted `%.4f`, and bbox
    * stringified like a Python list `[x1, y1, x2, y2]`. Partitioned by
    * year/month/day like the reference's `raw/YYYY/MM/DD/` directories.
    * Input: a typed frame with `tsCol` (timestamp), source_id,
    * source_name, class_id, confidence (double), x1..y2.
    *
    * This is schema-parity glue, not the preferred lake format —
    * [[writePartitioned]] with parquet is the scale path; this sink
    * exists so reference-side consumers (and [[readDetections]]) can
    * parse every field of every row identically. */
  def writeDetections(det: DataFrame, tsCol: String, root: String,
                      mode: SaveMode = SaveMode.Append): Unit =
    det
      .withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .withColumn("timestamp", format_string("%.6f", col(tsCol).cast("double")))
      .withColumn("confidence", format_string("%.4f", col("confidence")))
      .withColumn("bbox", concat(lit("["),
        concat_ws(", ", col("x1"), col("y1"), col("x2"), col("y2")),
        lit("]")))
      .select("timestamp", "source_id", "source_name", "class_id",
        "confidence", "bbox", "year", "month", "day")
      .write.partitionBy("year", "month", "day")
      .option("header", "true").format("csv").mode(mode).save(root)

  /** Read a reference-shaped detection CSV lake back into typed rows:
    * parses the stringified bbox into x1..y2 longs and the `%.4f`
    * confidence into a double. Tolerant of the reference's own files
    * (same header, same formats). */
  def readDetections(s: SparkSession, root: String): DataFrame = {
    val bboxRe = "\\[(-?\\d+), (-?\\d+), (-?\\d+), (-?\\d+)\\]"
    s.read.option("header", "true").csv(root)
      .select(
        timestamp_seconds(col("timestamp").cast("double")).as("ts"),
        col("source_id"), col("source_name"), col("class_id"),
        col("confidence").cast("double").as("confidence"),
        regexp_extract(col("bbox"), bboxRe, 1).cast("long").as("x1"),
        regexp_extract(col("bbox"), bboxRe, 2).cast("long").as("y1"),
        regexp_extract(col("bbox"), bboxRe, 3).cast("long").as("x2"),
        regexp_extract(col("bbox"), bboxRe, 4).cast("long").as("y2"),
        col("year").cast("int").as("year"),
        col("month").cast("int").as("month"),
        col("day").cast("int").as("day"))
  }

  /** A9 — per-day lake stats: count per source pivoted by class (reference
    * app/utils.py:353-381 builds by_camera[name][class] dicts in a loop).
    * Explicit pivot values keep this a single-pass job (no distinct scan)
    * — at scale, enumerate classes from the catalog, not the data. */
  def dayStatsPivot(df: DataFrame, keyCol: String, classCol: String,
                    classes: Seq[String]): DataFrame = {
    val piv = df.groupBy(col(keyCol))
      .pivot(classCol, classes)
      .agg(count(lit(1)))
    // null-fill pivot misses + total
    val filled = classes.foldLeft(piv)((d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L))))
    filled.withColumn("total", classes.map(col).reduce(_ + _))
  }
}
