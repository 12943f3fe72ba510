package graft
import org.apache.spark.sql.SparkSession
/** Dev profiler: time named queries (default sf0.1) with the same
  * full-evaluation noop sink Bench uses; 5 reps to separate JIT/GC noise
  * from real per-query cost. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // byte-proportional AQE coalescing serializes the engine's
      // CPU-heavy stacked-window stages at bench data sizes (see
      // Bench.scala for the measurement); off in every engine session.
      // SPARK_GRAFT_COALESCE=true flips it back on for same-window
      // A/Bs of the trade.
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("SPARK_GRAFT_COALESCE", "false"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART_SIZE", "1mb"))
      .config("spark.sql.session.timeZone", "UTC")
      // same rationale as Bench: the default 100-entry codegen cache
      // thrashes under AQE's many small stages and serializes tasks
      // behind janino recompiles — absolute numbers from a timing main
      // without this are inflated and non-comparable to Bench
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-26s min=${times.min}%.3f  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
