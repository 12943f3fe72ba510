package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Camera-config catalog reader — the reference's `cctv_config.json`
  * (app/utils.py:386-394): a JSON array of camera entries where `lat`/
  * `lng` appear as BOTH float and string in the real file (SURVEY §1.1
  * item 4) and `mirror_id` is present on some entries only.
  *
  * Spark-first handling of the mixed-type reality: declare lat/lng as
  * StringType in the read schema (a JSON number parses into a string
  * field fine), then cast to double — the same defensive coercion the
  * reference client does with parseFloat (dashboard.html:600), expressed
  * once at the boundary so everything downstream is typed.
  */
object Catalog {

  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("url", StringType),
    StructField("active", BooleanType),
    StructField("lat", StringType), // mixed float/string in the wild
    StructField("lng", StringType),
    StructField("mirror_id", StringType) // present on some entries only
  ))

  /** S5 — read a JSON-array catalog into a typed dimension DF. */
  def readConfig(s: SparkSession, path: String): DataFrame =
    s.read.option("multiLine", value = true).schema(schema).json(path)
      .withColumn("lat", col("lat").cast("double"))
      .withColumn("lng", col("lng").cast("double"))

  /** S6 — write the catalog back (the reference pretty-prints the JSON
    * array on camera edits, app/routes.py:66-68). A catalog is
    * driver-sized; one output file keeps it a single JSON document dir. */
  def writeConfig(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(path)

  /** Thresholds catalog `{camera_id: {p50,p75,p90,max}}` →
    * (camera_id, p50, p75, p90, max) dimension (reference:
    * scripts/analyze_thresholds.py:55-60). Map-object JSON needs the
    * keys exploded. */
  def readThresholds(s: SparkSession, path: String): DataFrame = {
    val entry = StructType(Seq(
      StructField("p50", DoubleType), StructField("p75", DoubleType),
      StructField("p90", DoubleType), StructField("max", DoubleType)))
    // one JSON object keyed by camera id → explode into rows
    s.read.option("wholetext", value = true).text(path)
      .select(from_json(col("value"), MapType(StringType, entry)).as("m"))
      .select(explode(col("m")).as(Seq("camera_id", "t")))
      .select(col("camera_id"), col("t.p50"), col("t.p75"), col("t.p90"),
        col("t.max").as("max_volume"))
  }

  /** P8/O7 — zombie cleanup: keep stats rows whose key exists in the
    * config (left_semi); the removed set is the anti join (reference:
    * app/utils.py:513-521 set difference). */
  def pruneZombies(stats: DataFrame, config: DataFrame, statsKey: String,
                   configKey: String): DataFrame =
    stats.join(broadcast(config.select(col(configKey).as(statsKey))),
      Seq(statsKey), "left_semi")
}
