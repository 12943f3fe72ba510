package graft

import org.apache.spark.sql.functions._
import graft.io.Lake

/** Bucketed co-located tables: the scale story for repeated joins/aggs on
  * a stable key (camera_id). Both sides bucketed on the key with equal
  * bucket counts → the join and the downstream groupBy read
  * pre-partitioned data and the physical plan has NO shuffle exchange. */
class LakeBucketingSpec extends SparkSpec {

  test("join + groupBy on the bucket key run with no shuffle exchange") {
    import spark.implicits._
    val obs = (0 until 2000)
      .map(i => (s"cam${i % 16}", i.toLong, (i % 50).toLong))
      .toDF("camera_id", "ts", "new_count")
    val thr = (0 until 16).map(i => (s"cam$i", i * 10L)).toDF("camera_id", "p50")
    Lake.writeBucketed(obs, "obs_bucketed", "camera_id", 8,
      sortCols = Seq("camera_id", "ts"))
    Lake.writeBucketed(thr, "thr_bucketed", "camera_id", 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange-free claim is about
      // bucketing, not about the dim side being tiny
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = spark.table("obs_bucketed")
        .join(spark.table("thr_bucketed"), "camera_id")
        .groupBy("camera_id")
        .agg(sum("new_count").as("total"), max("p50").as("p50"))
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      // and the result is still correct
      val row = q.filter(col("camera_id") === "cam3").collect().head
      val expected = (0 until 2000).filter(_ % 16 == 3).map(_ % 50).sum.toLong
      assert(row.getAs[Long]("total") == expected)
      assert(row.getAs[Long]("p50") == 30L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS obs_bucketed")
      spark.sql("DROP TABLE IF EXISTS thr_bucketed")
    }
  }

  test("writeSortedByRange clusters a key's rows into one file (footer-stat skipping)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toString
    val df = (0 until 4000)
      .map(i => (s"cam${i % 40}", i.toLong, (i % 7).toLong))
      .toDF("camera_id", "ts", "v")
    Lake.writeSortedByRange(df, dir, nFiles = 8,
      sortCols = Seq("camera_id", "ts"))
    val back = spark.read.parquet(dir)
    // range partitioning ⇒ all rows of one camera live in exactly one
    // file, so a camera predicate touches 1 of 8 files (parquet min/max
    // on the sorted key does the skipping at scan time)
    val touched = back.filter(col("camera_id") === "cam7")
      .select(input_file_name()).distinct().count()
    assert(touched == 1L, s"expected 1 file for one key, got $touched")
    assert(back.inputFiles.length == 8)
    // rows inside each FILE arrive sorted by (camera_id, ts) — check in
    // row-arrival order per file (driver-side; 4k rows)
    val byFile = back
      .select(input_file_name().as("f"), col("camera_id"), col("ts"))
      .collect().groupBy(_.getString(0))
    byFile.values.foreach { rows =>
      val seq = rows.map(r => (r.getString(1), r.getLong(2))).toSeq
      assert(seq == seq.sorted, "rows not sorted within a file")
    }
  }

  test("writeZOrdered keeps per-file min/max tight on BOTH cluster keys") {
    import spark.implicits._
    // two independent uniform keys — a single-column sort leaves the
    // second key's per-file span at ~the full range
    val df = (0 until 4096)
      .map(i => (i.toLong, ((i * 2654435761L) % 4096).toLong, i % 7))
      .toDF("a", "b", "v")
    def spans(dir: String): (Double, Double) = {
      val byFile = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .collect()
      (byFile.map(_.getAs[Long]("sa")).sum.toDouble / byFile.length,
        byFile.map(_.getAs[Long]("sb")).sum.toDouble / byFile.length)
    }
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    Lake.writeZOrdered(df, zDir, nFiles = 16, "a", "b")
    val (za, zb) = spans(zDir)
    val sDir = java.nio.file.Files.createTempDirectory("graft_s").toString
    Lake.writeSortedByRange(df, sDir, nFiles = 16, sortCols = Seq("a"))
    val (sa, sb) = spans(sDir)
    // single-column sort: a is perfectly clustered, b is not at all
    assert(sa < 4096 / 8.0 && sb > 4096 / 2.0, s"baseline sa=$sa sb=$sb")
    // z-order: BOTH keys' file spans are a fraction of the range
    // (16 files ≈ 4x4 rectangles → span ≈ range/4 on each axis)
    assert(za < 4096 / 2.0 && zb < 4096 / 2.0, s"z-order za=$za zb=$zb")
    // and a predicate on the NON-prefix key now skips most files
    val zTouched = spark.read.parquet(zDir)
      .filter(col("b") between (100, 200))
      .select(input_file_name()).distinct().count()
    assert(zTouched <= 8, s"b-predicate touched $zTouched of 16 z files")
    // rows survive the layout change
    assert(spark.read.parquet(zDir).count() == 4096)
  }

  test("bucketed scan exposes the bucket partitioning to the optimizer") {
    import spark.implicits._
    val df = (0 until 100).map(i => (s"k$i", i.toLong)).toDF("camera_id", "v")
    Lake.writeBucketed(df, "probe_bucketed", "camera_id", 4)
    try {
      val agg = spark.table("probe_bucketed")
        .groupBy("camera_id").agg(count(lit(1)))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"groupBy on bucket key shuffled:\n$plan")
      assert(agg.count() == 100)
    } finally spark.sql("DROP TABLE IF EXISTS probe_bucketed")
  }
}
