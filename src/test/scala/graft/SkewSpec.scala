package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces the same rows as a plain join") {
    val fact = (1 to 200).map(i => (if (i % 3 == 0) 1L else i.toLong, i.toLong))
      .toDF("k", "fv") // key 1 is hot
    val dim = Seq((1L, "hot"), (2L, "a"), (5L, "b")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).orderBy("fv")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(fact, dim, "k", col("fv"), 8).orderBy("fv")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("saltedSum equals plain groupBy sum") {
    val df = (1 to 500).map(i => ((i % 4).toLong, i.toDouble)).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(28,2)")).cast("double").as("t"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSum(df, "k", "v", col("v"), 8)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Double]("total_value"),
        r.getAs[Long]("n_rows"))).toSet
    assert(salted == plain)
  }

  test("dropHotKeys removes high-document-frequency index entries") {
    val idx = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L), (2L, 30L))
      .toDF("doc_id", "sh_h")
    val kept = Skew.dropHotKeys(idx, "sh_h", maxDocFreq = 2)
      .select("sh_h").distinct().as[Long].collect().toSet
    assert(kept == Set(20L, 30L)) // shingle 10 (df=3) dropped
  }

  test("qdot registers as a SQL function via extensions") {
    graft.functions.GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT qdot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS v")
      .as[Long].collect()
    assert(out.head == 32L)
  }
}
