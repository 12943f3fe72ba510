package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata tables (TESTDATA.md).
  *
  * Role mapping for reference semantics (FIXTURES.md §A): `events` is the
  * traffic-stream analog of the reference's `traffic_history` table
  * (reference: app/database.py:18-30) — `user_id` ↔ `camera_id`,
  * `ts` ↔ observation timestamp, `event_type` ↔ vehicle class,
  * `value` ↔ count. The star-schema tables exercise join/agg/sort/top-k;
  * `documents`/`embeddings` serve the training-data-pipeline operators.
  *
  * At 100 TB these reads are unchanged: `spark.read.parquet` scans are
  * planned with partition pruning + predicate pushdown; callers push
  * filters immediately after these readers so Catalyst fuses them into
  * the scan.
  */
object Tables {
  private def rd(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame     = rd(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame     = rd(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame   = rd(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = rd(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = rd(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame     = rd(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame   = rd(s, dir, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's TimestampType
    * (µs) cannot hold; read nanos as long and convert with integer
    * division (`div`, not `/` — double division loses precision above
    * 2^53 and epoch-nanos is ~1.7e18). Data is µs-grained → lossless. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // time-range predicates over the converted column can't reach the
    // parquet scan on their own; this rule derives the raw-nanos bounds
    // (graft.plans.PushdownNanosTs) so S1-style point-in-time scans
    // skip row groups
    graft.plans.PushdownNanosTs.install(s)
    val df = rd(s, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = rd(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = rd(s, dir, "embeddings")
}
