package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "a8_history_buckets_15m", "j1_export_topk", "j1_revenue_by_brand",
      "j4_predict_slot_rules", "a2_totals_trailing_7d", "j7_geo_range_join",
      "e_ivf_topk", "e_lsh_exact", "dd_jaccard_pairs", "a6_thresholds")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan
        .toString.take(4000))
    }
    spark.stop()
  }
}
