package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe behind the [[TextDedup.contamination]] mode notes: times the
  * broadcast-eval (cluster map-only) and symmetric-shuffle forms on
  * local[32], optionally with the train side multiplied (PROBE_MULT) to
  * confirm the local ranking does NOT flip with corpus growth — in one
  * JVM a hash shuffle is a memory copy, so the broadcast mode's network
  * win cannot show up here at any multiplier; its claim is plan-shape
  * (TextDedupSpec's map-only assertion), not a local timing.
  *   sbt "runMain graft.ops.ProbeContam"   # PROBE_MULT=30 for 30x train
  */
object ProbeContam {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // byte-proportional AQE coalescing serializes the engine\'s
      // CPU-heavy stacked-window stages at bench data sizes (see
      // Bench.scala for the measurement); off in every engine session
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("PROBE_MULT", "1").toInt
    val d = graft.Tables.documents(spark, dir)
    val train0 = d.filter(col("source") =!= "src0")
    val train =
      if (mult == 1) train0
      else (0 until mult).map { i =>
        train0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
      }.reduce(_ union _)
    val ev = d.filter(col("source") === "src0")
    println(s"train docs=${train.count()} eval docs=${ev.count()}")
    Seq("bcast" -> true, "shuffle" -> false).foreach { case (name, mode) =>
      val times = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        TextDedup.contamination(train, ev, "doc_id", "text", 3,
            broadcastEval = mode)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-8s min=${times.min}%.3f  " +
        times.map(t => f"$t%.2f").mkString(","))
    }
    spark.stop()
  }
}
