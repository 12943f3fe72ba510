package graft

import graft.io.ZOrder
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2: bit interleave is the Morton curve") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
      (7L, 5L)).toDF("a", "b")
      .select(ZOrder.zValue2(col("a"), col("b"), bits = 3).as("z"))
      .as[Long].collect().toSeq
    // z(a,b) with a in odd bit positions: (0,0)=0 (1,0)=2 (0,1)=1
    // (1,1)=3 (2,3)=13 (7,5)=[111/101 -> 1 1 1 0 1 1 = 59]
    assert(rows == Seq(0L, 2L, 1L, 3L, 13L, 59L))
  }

  private def events = Tables.events(spark, "/root/testdata/sf0.001")
    .select("event_id", "user_id", "value")

  test("zOrderBy: pure layout — content identical, helper column gone") {
    val in = events
    val out = ZOrder.zOrderBy(in, "user_id", "value", numFiles = 8)
    assert(out.columns.toSeq == in.columns.toSeq)
    assert(out.count() == in.count())
    assert(out.agg(sum(hash(out.columns.map(col): _*))).head.getLong(0) ==
      in.agg(sum(hash(in.columns.map(col): _*))).head.getLong(0))
  }

  test("z-ordered files cover compact rectangles on BOTH dimensions;" +
    " second-dimension predicates scan far fewer rows than a linear" +
    " sort") {
    // deterministic independent-uniform grid: x = i mod 256, y = a
    // Knuth-hashed shuffle of i — 64k rows, so file rectangles are
    // crisp (events at sf0.001 is too small/quirky to gate 2x claims)
    // x from the low byte, y a bijective scramble of the HIGH byte —
    // every (x, y) cell exactly once, and y is independent of x
    val grid = spark.range(65536).select(
      col("id").as("row_id"),
      pmod(col("id"), lit(256)).as("x"),
      pmod(expr("id div 256") * lit(97L), lit(256)).as("y"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder")
    val zPath = s"$tmp/z"; val linPath = s"$tmp/lin"
    val nFiles = 64
    // one row group per file: footer stats at file granularity
    ZOrder.writeZOrdered(grid, zPath, "x", "y", nFiles, bits = 8)
    grid.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(linPath)
    // per-file span of the SECOND dimension: z keeps y-locality; the
    // x-sorted layout spans ~all of y in every file
    def ySpans(p: String): Seq[Long] =
      new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(F.min("y"), F.max("y")).head
          r.getLong(1) - r.getLong(0)
        }
    def mean(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    val (zs, ls) = (ySpans(zPath), ySpans(linPath))
    assert(mean(zs) < 80.0 && mean(ls) > 200.0,
      f"z mean y-span ${mean(zs)}%.1f vs linear ${mean(ls)}%.1f of 255")
    // measured: scan-emitted rows (surviving row groups) under a
    // y-range predicate — the dimension the linear sort is helpless on
    def scanRows(p: String, pred: org.apache.spark.sql.Column): Long = {
      val d = spark.read.parquet(p).filter(pred)
      d.collect()
      graft.util.PlanMetrics.allNodes(d.queryExecution.executedPlan)
        .collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
        }.sum
    }
    val yPred = col("y").between(0, 15) // 1/16 of the space
    val (zY, lY) = (scanRows(zPath, yPred), scanRows(linPath, yPred))
    assert(zY * 4 <= lY, s"y-predicate: z emitted $zY vs linear $lY")
    // and the trade on the linear layout's OWN dimension is bounded:
    // z stays within 4x of the near-optimal x-sorted scan there
    val xPred = col("x").between(0, 15)
    val (zX, lX) = (scanRows(zPath, xPred), scanRows(linPath, xPred))
    assert(zX <= lX * 4 && zX < 65536 / 4,
      s"x-predicate: z emitted $zX vs linear $lX")
  }
}
