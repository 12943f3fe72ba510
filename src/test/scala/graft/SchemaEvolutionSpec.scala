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
}
