package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextDedup
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.documents(spark, "/root/testdata/sf0.1").select("doc_id", "text")
    val docs = (0 until 30).map(i => base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
      .reduce(_ union _).cache()
    docs.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[p] $name%-28s rows=$n%9d ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    val keep = TextDedup.exactDedup(docs, "doc_id", "text").select(col("keep_id").as("doc_id"))
    val reps = docs.join(keep, Seq("doc_id"), "left_semi").coalesce(32).cache()
    reps.count()
    // ---- minhashLshPairs body, instrumented ----
    val idCol = "doc_id"
    val sh = TextDedup.shingleHashes(reps, idCol, "text", 3).cache()
    t("sh materialize") { sh.count() }
    val rows = 16 / 4
    val sig = TextDedup.minhashSignatures(sh, idCol, 16)
    val bandStructs = (0 until 4).map { b =>
      struct((0 until rows).map(r => col(s"mh${b * rows + r}").as(s"v$r")): _*)
    }
    val banded = sig.select(col(idCol),
      posexplode(array(bandStructs: _*)).as(Seq("band", "key")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.key") === col("y.key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"))
      .distinct()
      .cache()
    t("cand materialize") { cand.count() }
    val candDocs = cand.select(col("a_id").as(idCol))
      .union(cand.select(col("b_id").as(idCol))).distinct()
    t("candDocs") { candDocs.count() }
    val shCand = sh.join(candDocs, Seq(idCol), "left_semi")
    t("shCand") { shCand.count() }
    t("verify join") {
      TextDedup.verifyPairs(cand, sh, idCol)
        .filter(col("jaccard") >= 0.8).count()
    }
    spark.stop()
  }
}
