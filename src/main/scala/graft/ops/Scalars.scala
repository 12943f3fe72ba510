package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2.7 — scalar function families: date/time (the reference's dominant
  * family), math/clamps/truncation, and the IOU box-overlap primitive.
  * All are pure column expressions → whole-stage-codegen'd, no UDFs
  * (SURVEY §2.8: native expressions preferred; a Scala UDF would break
  * codegen and serialize every row through the JVM boundary at 100 TB).
  */
object Scalars {

  /** The reference's date/time projection set in one pass:
    * dow (SQLite %w convention, 0=Sunday — app/database.py:112,127),
    * hour (app/database.py:128), date string (app/routes.py:224),
    * display labels %H:%M, %d/%m, %a %d %b (app/routes.py:124-127,
    * app/utils.py:618-647), seconds-of-day (app/utils.py:230-232),
    * hour-bucket epoch (scripts/analyze_thresholds.py:35). */
  def datetimeFamily(df: DataFrame, ts: String, id: String): DataFrame =
    df.select(
      col(id),
      (dayofweek(col(ts)) - 1).cast("long").as("dow"),
      hour(col(ts)).cast("long").as("hr"),
      date_format(col(ts), "yyyy-MM-dd").as("date_str"),
      date_format(col(ts), "HH:mm").as("label_hm"),
      date_format(col(ts), "dd/MM").as("label_dm"),
      date_format(col(ts), "EEE, dd MMM").as("label_abbrev"),
      date_format(col(ts), "yyyy-MM-dd HH:mm:ss").as("label_full"),
      (hour(col(ts)) * 3600 + minute(col(ts)) * 60 + second(col(ts)))
        .cast("long").as("secs_of_day"),
      unix_timestamp(date_trunc("hour", col(ts))).as("hour_bucket"))
      .orderBy(id)

  /** Gaussian diurnal multiplier `peak * exp(-((h-mu)^2)/width)` —
    * the synthetic-traffic curve (app/utils.py:125-126; camera variant
    * app/services/camera.py:119-125) — with the reference's clamps
    * (max/min → greatest/least) and int-truncation semantics
    * (`int()` truncates toward zero, SURVEY §7.4 hazard 4). */
  def diurnalCurve(spark: org.apache.spark.sql.SparkSession,
                   peak: Double, mu: Double, width: Double,
                   floorV: Double, capV: Double): DataFrame = {
    import spark.implicits._
    val h = col("hr").cast("double") - lit(mu)
    spark.range(24).select(col("id").cast("long").as("hr"))
      .withColumn("raw", // h*h, not pow: exact cross-engine reproducibility
        round(lit(peak) * exp(-(h * h) / lit(width)), 6))
      .withColumn("clamped",
        greatest(least(col("raw"), lit(capV)), lit(floorV)))
      .withColumn("as_int", col("clamped").cast("long"))
      .orderBy("hr")
  }

  /** IOU of two [x1,y1,x2,y2] boxes with the reference's +1-pixel area
    * convention (app/services/camera.py:88-104). Pure integer overlap
    * arithmetic + one exact double division → deterministic. */
  def iou(ax1: Column, ay1: Column, ax2: Column, ay2: Column,
          bx1: Column, by1: Column, bx2: Column, by2: Column): Column = {
    val iw = greatest(least(ax2, bx2) - greatest(ax1, bx1) + 1, lit(0L))
    val ih = greatest(least(ay2, by2) - greatest(ay1, by1) + 1, lit(0L))
    val inter = iw * ih
    val aArea = (ax2 - ax1 + 1) * (ay2 - ay1 + 1)
    val bArea = (bx2 - bx1 + 1) * (by2 - by1 + 1)
    val union = aArea + bArea - inter
    when(union > 0, inter.cast("double") / union.cast("double"))
      .otherwise(lit(0.0))
  }

  /** §2.9 batch analog of the static-object dedup: synthesize integer
    * boxes from the event stream, pair each observation with its
    * predecessor per key (`lag`, the prev_rects pattern of
    * app/services/camera.py:35,239-256), and mark IOU > 0.5 as static
    * (excluded from flux counts in the reference). */
  def iouStaticPairs(df: DataFrame, key: String, ts: String,
                     id: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val boxed = df.select(col(key), col(id), col(ts),
      (col(id) % 80).as("x1"),
      ((col(id) * 7) % 80).as("y1"))
      .withColumn("x2", col("x1") + (col(key) % 40) + 10)
      .withColumn("y2", col("y1") + ((col(key) * 3) % 40) + 10)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(id))
    boxed
      .withColumn("px1", lag(col("x1"), 1).over(w))
      .withColumn("py1", lag(col("y1"), 1).over(w))
      .withColumn("px2", lag(col("x2"), 1).over(w))
      .withColumn("py2", lag(col("y2"), 1).over(w))
      .filter(col("px1").isNotNull)
      .withColumn("iou", iou(
        col("x1"), col("y1"), col("x2"), col("y2"),
        col("px1"), col("py1"), col("px2"), col("py2")))
      .withColumn("is_static", col("iou") > 0.5)
      .select(col(key), col(id), col("iou"), col("is_static"))
      .orderBy(col(key), col(id))
  }

  /** Id-generation surface (reference camera ids are `uuid.uuid4()`
    * strings, app/utils.py:6; generated, never queried). Random ids use
    * Spark's native `uuid()` — v4-random like the reference, seeded per
    * partition, nondeterministic across runs by nature. */
  def randomUuid(): Column = expr("uuid()")

  /** Deterministic name-based UUID (RFC-4122 v3 shape: md5 of the name
    * with the version nibble forced to '3' and the variant nibble to
    * '8') — the reproducible-pipeline alternative: same input → same id
    * on any executor, any run, so backfills and retries never mint
    * duplicate identities. Pure codegen'd string ops. */
  def nameUuid(name: Column): Column = {
    val h = md5(name.cast("string"))
    concat_ws("-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      concat(lit("3"), substring(h, 14, 3)),
      concat(lit("8"), substring(h, 18, 3)),
      substring(h, 21, 12))
  }

  /** WMO weather-code banding (dashboard.html:541-546): the dashboard's
    * if-chain over open-meteo WW codes, order-preserved — 0 exact, then
    * upper-bound bands (<=3, <=48, <=67, <=82), then the >=95 storm
    * band, with the chain's implicit fall-through ("Cloudy", codes
    * 83..94) as the otherwise. A pure codegen'd `when` chain: at
    * 100 TB this is a map-only projection, joinable against any fact
    * table without a dimension lookup. */
  def weatherDesc(code: Column): Column =
    when(code === 0, "Cerah")
      .when(code <= 3, "Berawan")
      .when(code <= 48, "Berkabut")
      .when(code <= 67, "Hujan")
      .when(code <= 82, "Hujan Ringan")
      .when(code >= 95, "Badai Petir")
      .otherwise("Cloudy")

  /** The icon half of [[weatherDesc]] — same chain, same bands. */
  def weatherIcon(code: Column): Column =
    when(code === 0, "☀️")
      .when(code <= 3, "⛅")
      .when(code <= 48, "🌫️")
      .when(code <= 67, "🌧️")
      .when(code <= 82, "🌦️")
      .when(code >= 95, "⛈️")
      .otherwise("☁️")
}
