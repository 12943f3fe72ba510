package graft

import graft.functions.QDot
import org.apache.spark.sql.functions._

class QDotSpec extends SparkSpec {
  import spark.implicits._

  test("qdot: fused codegen kernel matches zip_with+aggregate exactly") {
    val d = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (2L, Seq(-7L, 0L, 9L), Seq(2L, 100L, -3L)),
      (3L, Seq.empty[Long], Seq.empty[Long]))
      .toDF("id", "a", "b")
    val out = d.select(col("id"),
        QDot.qdot(col("a"), col("b")).as("fused"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("composed"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("fused") == r.getAs[Long]("composed"))
    }
    assert(out.find(_.getLong(0) == 1L).get.getAs[Long]("fused") == 32L)
  }

  test("qdot: null array yields null, null elements are skipped") {
    val d = Seq(
      (1L, Some(Seq(Some(1L), None, Some(3L))), Some(Seq(Some(2L), Some(5L), Some(7L)))),
      (2L, None, Some(Seq(Some(1L)))))
      .toDF("id", "a", "b")
    val out = d.select(col("id"), QDot.qdot(col("a"), col("b")).as("v"))
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("v") == 2L + 21L)
    assert(out(1).isNullAt(1))
  }

  test("qdot participates in whole-stage codegen") {
    // spark.range keeps the projection lazy (a local Seq constant-folds
    // into LocalTableScan before codegen gets a say)
    val d = spark.range(4)
      .withColumn("a", array(col("id"), col("id") + 1))
      .withColumn("b", array(col("id") + 2, col("id") + 3))
    val q = d.select(col("id"), QDot.qdot(col("a"), col("b")).as("v"))
    // the "*(n)" stage prefix marks operators inside WholeStageCodegen
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"))
    val out = q.orderBy("id").collect()
    // id=0: [0,1]·[2,3] = 3
    assert(out(0).getAs[Long]("v") == 3L)
  }
}
