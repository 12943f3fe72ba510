package graft

import graft.io.Batches
import org.apache.spark.sql.functions._

/** Behavior pin for SCHEMA EVOLUTION across a sink's b=<batchId>
  * layout: a long-running stream redeployed with newer code may start
  * writing batches with an ADDED column. This spec documents exactly
  * what readers see — silently losing the new column (or the old
  * rows) would corrupt downstream state without an error. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("Batches.read surfaces columns added by NEWER batches " +
    "(mergeSchema), nulling them on elder rows — never silently " +
    "dropping a column") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_schevo").toString + "/sink"
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/b=0")
    Seq((2L, "b", 7.5)).toDF("id", "v", "w").write.parquet(s"$root/b=1")
    val out = Batches.read(spark, root).get
    assert(out.columns.toSet == Set("id", "v", "w", "b"),
      s"evolved column lost: ${out.columns.mkString(",")}")
    val rows = out.select("id", "v", "w")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows == Set((1L, "a", None), (2L, "b", Some(7.5))), rows)
  }

  test("Batches.compact folds evolved batches without losing the " +
    "added column — flat and prefix-partitioned layouts both") {
    def rows(root: String) = Batches.read(spark, root).get
      .select("id", "v", "w")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val expect = Set((1L, "a", None), (2L, "b", Some(7.5)),
      (3L, "c", Some(9.0)))

    val flat = java.nio.file.Files
      .createTempDirectory("graft_schevo_c").toString + "/sink"
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$flat/b=0")
    Seq((2L, "b", 7.5)).toDF("id", "v", "w").write.parquet(s"$flat/b=1")
    assert(Batches.compact(spark, flat, upTo = 1L))
    Seq((3L, "c", 9.0)).toDF("id", "v", "w").write.parquet(s"$flat/b=2")
    assert(rows(flat) == expect, rows(flat))
    // fold again so the evolved base re-folds with a newer tail
    assert(Batches.compact(spark, flat, upTo = 2L))
    assert(rows(flat) == expect, rows(flat))

    // prefix-partitioned base: the unionByName path
    val part = java.nio.file.Files
      .createTempDirectory("graft_schevo_p").toString + "/sink"
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$part/b=0")
    Seq((2L, "b", 7.5)).toDF("id", "v", "w").write.parquet(s"$part/b=1")
    assert(Batches.compact(spark, part, upTo = 1L,
      partitionBy = Seq("p"),
      deriveTail = df => df.withColumn("p",
        org.apache.spark.sql.functions
          .pmod(col("id"), lit(4)).cast("int"))))
    Seq((3L, "c", 9.0)).toDF("id", "v", "w").write.parquet(s"$part/b=2")
    assert(Batches.compact(spark, part, upTo = 2L,
      partitionBy = Seq("p"),
      deriveTail = df => df.withColumn("p",
        org.apache.spark.sql.functions
          .pmod(col("id"), lit(4)).cast("int"))))
    assert(rows(part) == expect, rows(part))
  }
}
