package graft

import graft.ml.TrafficModel
import org.apache.spark.sql.functions._

class TrafficModelSpec extends SparkSpec {
  import spark.implicits._

  test("training frame matches the A4 inner aggregate shape") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", col("ts").cast("timestamp"))
    val tf = TrafficModel.trainingFrame(e, "user_id", "ts", "value")
    assert(tf.columns.toSet ==
      Set("user_id", "dow", "hr", "d", "hourly_total"))
    assert(tf.count() > 0)
    // label is non-negative (flux sums)
    assert(tf.filter(col("hourly_total") < 0).count() == 0)
  }

  test("MLlib pipeline fits and predicts close to per-slot means on strong signal") {
    // Synthetic: two cameras with different constant hourly volumes —
    // a linear model with one-hot features must recover them near-exactly
    val rows = for {
      cam <- Seq(1L, 2L); day <- 1 to 14; hr <- Seq(8, 9)
    } yield (cam, java.sql.Timestamp.valueOf(f"2024-02-$day%02d $hr%02d:30:00"),
      if (cam == 1L) 100.0 else 20.0)
    val hist = rows.toDF("user_id", "ts", "value")
    val model = TrafficModel.fit(hist, "user_id", "ts", "value")
    val keys = Seq(1L, 2L).toDF("user_id")
    val pred = TrafficModel.predictSlots(model, keys, "user_id")
      .filter(col("hr") === 8)
    val byCam = pred.groupBy("user_id")
      .agg(avg("predicted_volume").as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byCam(1L) > byCam(2L) + 30.0,
      s"camera signal must dominate: $byCam")
  }

  test("scoreAndClassify attaches reference statuses consistent with thresholds") {
    val rows = for {
      cam <- Seq(1L, 2L); day <- 1 to 14; hr <- Seq(8, 9)
    } yield (cam, java.sql.Timestamp.valueOf(f"2024-02-$day%02d $hr%02d:30:00"),
      if (cam == 1L) 400.0 else 10.0)
    val hist = rows.toDF("user_id", "ts", "value")
    val model = TrafficModel.fit(hist, "user_id", "ts", "value")
    val keys = Seq(1L, 2L).toDF("user_id")
    // no thresholds row for cam 2 → reference defaults (100/200/300)
    val thresholds = Seq((1L, 50.0, 150.0, 350.0))
      .toDF("user_id", "p50", "p75", "p90")
    val out = TrafficModel.scoreAndClassify(model, keys, thresholds, "user_id")
    assert(out.count() == 2 * 7 * 24)
    // every row's status agrees with its own thresholds columns
    val bad = out.filter(
      (col("predicted_volume") > col("p90") && col("status") =!= "MACET TOTAL") ||
      (col("predicted_volume") <= col("p50") && col("status") =!= "LANCAR"))
      .count()
    assert(bad == 0)
    // defaults applied for the missing key
    assert(out.filter(col("user_id") === 2L && col("p50") === 100.0).count() == 7 * 24)
  }

  test("LR beats the constant-mean baseline on camera-structured data") {
    val rows = for {
      cam <- Seq(1L, 2L, 3L); day <- 1 to 14; hr <- 7 to 10
    } yield (cam, java.sql.Timestamp.valueOf(f"2024-02-$day%02d $hr%02d:15:00"),
      cam * 50.0 + hr)
    val hist = rows.toDF("user_id", "ts", "value")
    val model = TrafficModel.fit(hist, "user_id", "ts", "value")
    val fitRmse = TrafficModel.rmse(model, hist, "user_id", "ts", "value")
    val tf = TrafficModel.trainingFrame(hist, "user_id", "ts", "value")
    val stats = tf.agg(avg("hourly_total").as("mu"),
      sqrt(avg(pow(col("hourly_total") - tf.agg(avg("hourly_total"))
        .head.getDouble(0), 2))).as("sd")).head
    assert(fitRmse < stats.getDouble(1) / 2,
      s"LR rmse $fitRmse should beat constant baseline sd ${stats.getDouble(1)}")
  }

  test("GBT variant learns slot interactions the linear model cannot") {
    // interaction signal: the 2x2 (cam, hr) table is NOT additive, so
    // the linear model keeps a constant residual of 60 in every cell;
    // trees carve the four cells. (Deliberately asymmetric — a perfect
    // XOR table would give every FIRST split exactly zero gain and
    // greedy trees would never start.)
    val cell = Map((1L, 8) -> 200.0, (1L, 9) -> 20.0,
      (2L, 8) -> 40.0, (2L, 9) -> 100.0)
    val rows = for {
      cam <- Seq(1L, 2L); day <- 1 to 14; hr <- Seq(8, 9)
    } yield (cam, java.sql.Timestamp.valueOf(f"2024-02-$day%02d $hr%02d:30:00"),
      cell((cam, hr)))
    val hist = rows.toDF("user_id", "ts", "value")
    val gbt = TrafficModel.fitGbt(hist, "user_id", "ts", "value")
    val gbtRmse = TrafficModel.rmse(gbt, hist, "user_id", "ts", "value")
    val lr = TrafficModel.fit(hist, "user_id", "ts", "value")
    val lrRmse = TrafficModel.rmse(lr, hist, "user_id", "ts", "value")
    assert(gbtRmse < lrRmse / 2,
      s"GBT ($gbtRmse) should fit the interaction far better than LR ($lrRmse)")
    // deterministic: same seed, same fit
    val gbt2 = TrafficModel.fitGbt(hist, "user_id", "ts", "value")
    assert(TrafficModel.rmse(gbt2, hist, "user_id", "ts", "value") == gbtRmse)
  }

  test("predictions are non-negative and cover every slot") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", col("ts").cast("timestamp"))
    val model = TrafficModel.fit(e, "user_id", "ts", "value")
    val keys = e.select("user_id").distinct().limit(5)
    val pred = TrafficModel.predictSlots(model, keys, "user_id")
    assert(pred.count() == 5 * 7 * 24)
    assert(pred.filter(col("predicted_volume") < 0).count() == 0)
  }
}
