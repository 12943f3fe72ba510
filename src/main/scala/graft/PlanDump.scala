package graft
import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named declared queries to
  * `<outDir>/<query>_<suffix>.txt` — the round-artifact format the
  * optimization judge reads (`plans/r{N}/<query>_{before,after}.txt`).
  * Session confs mirror Bench's engine session (UTC, AQE coalescing
  * off) so the dumped plan is the shape the bench actually runs.
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query...>
  * (SPARK_GRAFT_SF_DIR overrides the data dir; plans are
  * data-independent in shape, so sf0.01 is the default). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = args(0); val suffix = args(1); val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    new File(outDir).mkdirs()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val pw = new PrintWriter(new File(outDir, s"${n}_$suffix.txt"))
      try pw.write(txt) finally pw.close()
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
