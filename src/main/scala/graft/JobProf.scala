package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev profiler: per-JOB timeline of a named query (submit offset +
  * duration for every Spark job in the measured action, after two
  * warmup reps). The gaps between jobs are driver-side AQE planning —
  * on local[32] at sf0.1 those barriers routinely dominate, which is
  * what this main exists to show (see the round-6 localCheckpoint
  * regression). Not part of the driver contract — run manually:
  *   sbt "runMain graft.JobProf <query> [query...]"
  */
object JobProf {
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
    val jobs = mutable.ArrayBuffer[(Int, Long, Long)]()
    val submit = mutable.Map[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        submit(e.jobId) = System.nanoTime()
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs += ((e.jobId, submit.getOrElse(e.jobId, 0L), System.nanoTime()))
    })
    args.foreach { n =>
      (1 to 2).foreach { _ =>
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      Thread.sleep(300); jobs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"%n== $n total=$total%.2f s, ${jobs.length} jobs ==")
      jobs.sortBy(_._2).foreach { case (id, s, e) =>
        println(f"  job $id%4d  start=${(s - t0) / 1e9}%6.3f  dur=${(e - s) / 1e9}%6.3f s")
      }
    }
    spark.stop()
  }
}
