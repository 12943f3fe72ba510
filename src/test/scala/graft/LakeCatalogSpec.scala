package graft

import graft.io.{Catalog, Lake}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class LakeCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned lake: write → pruned day read round-trips") {
    val root = Files.createTempDirectory("lake").toString
    val d = Seq(
      (1L, Timestamp.valueOf("2024-02-01 10:00:00"), "cam1"),
      (2L, Timestamp.valueOf("2024-02-01 23:59:59"), "cam2"),
      (3L, Timestamp.valueOf("2024-02-02 00:00:00"), "cam1"))
      .toDF("id", "ts", "cam")
    Lake.writePartitioned(d, "ts", root, mode = SaveMode.Overwrite)
    val day1 = Lake.readDay(spark, root, 2024, 2, 1)
    assert(day1.select("id").as[Long].collect().sorted.sameElements(Array(1L, 2L)))
    // partition pruning visible in the plan: the scan must carry
    // partition filters, not a post-scan filter on data columns
    val plan = day1.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("partition"),
      s"expected pruned scan, got:\n$plan")
  }

  test("routed backfill writes one file per day partition") {
    val root = Files.createTempDirectory("lake_routed").toString
    // 3 days spread over an 8-partition input: the unrouted write would
    // emit up to 8 files per day; routed collapses to one task per day
    val rows = (0 until 240).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-02-${i % 3 + 1}%02d 10:00:00"), s"cam$i")
    }
    val d = rows.toDF("id", "ts", "cam").repartition(8)
    Lake.writePartitioned(d, "ts", root, mode = SaveMode.Overwrite,
      routeByDay = true)
    def filesIn(day: Int): Int = {
      val dir = new java.io.File(s"$root/year=2024/month=2/day=$day")
      Option(dir.listFiles()).toSeq.flatten
        .count(_.getName.endsWith(".parquet"))
    }
    (1 to 3).foreach(day => assert(filesIn(day) == 1,
      s"day $day: expected 1 routed file, found ${filesIn(day)}"))
    // and the data round-trips
    assert(Lake.readDay(spark, root, 2024, 2, 2).count() == 80L)
  }

  test("compactDay heals a partition stranded mid-publish by a prior crash") {
    val root = Files.createTempDirectory("lake_heal").toString
    val d = Seq(
      (1L, Timestamp.valueOf("2024-02-01 10:00:00"), "cam1"),
      (2L, Timestamp.valueOf("2024-02-02 11:00:00"), "cam2"))
      .toDF("id", "ts", "cam")
    Lake.writePartitioned(d, "ts", root, mode = SaveMode.Overwrite)
    // simulate a crash between publish's two renames on day=1: the live
    // dir is gone, the full copy sits at its escaped _bak_ sibling
    val monthDir = new java.io.File(s"$root/year=2024/month=2")
    assert(new java.io.File(monthDir, "day=1")
      .renameTo(new java.io.File(monthDir, "_bak_day%3D1")))
    // compacting ANY day first sweeps the tree: day=1 comes back
    Lake.compactDay(spark, root, 2024, 2, 2)
    assert(new java.io.File(monthDir, "day=1").isDirectory)
    assert(!new java.io.File(monthDir, "_bak_day%3D1").exists)
    assert(Lake.readDay(spark, root, 2024, 2, 1)
      .select("id").as[Long].collect().sameElements(Array(1L)))
  }

  test("dayStatsPivot counts per class with zero-fill and total") {
    val d = Seq(("a", "car"), ("a", "car"), ("a", "motorcycle"), ("b", "car"))
      .toDF("src", "cls")
    val out = Lake.dayStatsPivot(d, "src", "cls", Seq("car", "motorcycle"))
      .orderBy("src").collect()
    assert(out(0).getAs[Long]("car") == 2L)
    assert(out(0).getAs[Long]("motorcycle") == 1L)
    assert(out(0).getAs[Long]("total") == 3L)
    assert(out(1).getAs[Long]("motorcycle") == 0L) // zero-filled miss
    assert(out(1).getAs[Long]("total") == 1L)
  }

  test("compactDay: collapses a fragmented day to few files, rows identical, other days untouched") {
    val root = Files.createTempDirectory("compact").toString
    val manyRows = (1 to 400).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-02-01 10:${i % 60}%02d:00"), s"cam${i % 3}")) ++
      Seq((9999L, Timestamp.valueOf("2024-02-02 09:00:00"), "cam9"))
    val df = manyRows.toDF("id", "ts", "cam").repartition(20) // 20 small files/day
    Lake.writePartitioned(df, "ts", root, mode = SaveMode.Overwrite)
    def parquets(day: Int) = Option(new java.io.File(
        s"$root/year=2024/month=2/day=$day").listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet"))
    val beforeFiles = parquets(1).length
    assert(beforeFiles > 5, s"fixture should fragment, got $beforeFiles files")
    val beforeRows = spark.read.parquet(root).orderBy("id")
      .collect().map(_.toSeq).toSeq
    val otherDayFiles = parquets(2).map(_.getName).toSet
    Lake.compactDay(spark, root, 2024, 2, 1)
    assert(parquets(1).length == 1, s"expected 1 file, got ${parquets(1).length}")
    assert(parquets(2).map(_.getName).toSet == otherDayFiles) // untouched
    val afterRows = spark.read.parquet(root).orderBy("id")
      .collect().map(_.toSeq).toSeq
    assert(afterRows == beforeRows)
  }

  test("recoverTree heals a crashed compactDay publish and clears stale baks") {
    val root = Files.createTempDirectory("compact_rec").toString
    val rows = (1 to 50).map(i =>
      (i.toLong, Timestamp.valueOf("2024-02-01 10:00:00"), s"cam${i % 3}")) ++
      Seq((999L, Timestamp.valueOf("2024-02-02 09:00:00"), "cam9"))
    Lake.writePartitioned(rows.toDF("id", "ts", "cam"), "ts", root,
      mode = SaveMode.Overwrite)
    val before = spark.read.parquet(root).orderBy("id")
      .collect().map(_.toSeq).toSeq
    val dayDir = s"$root/year=2024/month=2/day=1"
    // crash between publish's two renames: the live day partition sits
    // at its bak name (with '=' escaped — a raw `_bak_day=1` would be
    // INFERRED as a conflicting partition column and crash every read
    // of the root, not just miss a day), nothing at the published path.
    // A plain lake read must still SUCCEED, minus the in-flight day.
    graft.io.Fs.rename(spark, dayDir,
      s"$root/year=2024/month=2/_bak_day%3D1")
    val during = spark.read.parquet(root).count()
    assert(during == 1L, s"expected only the day-2 row mid-crash, got $during")
    val restored = graft.io.Fs.recoverTree(spark, root)
    assert(restored == Seq(dayDir), s"restored=$restored")
    assert(spark.read.parquet(root).orderBy("id")
      .collect().map(_.toSeq).toSeq == before)
    // crash after the swap but before the bak delete: stale bak next
    // to the live dir is hidden from readers and swept away, data
    // untouched
    val stale = s"$root/year=2024/month=2/_bak_day%3D2"
    graft.io.Fs.fs(spark, stale).mkdirs(new org.apache.hadoop.fs.Path(stale))
    assert(spark.read.parquet(root).count() == before.length)
    assert(graft.io.Fs.recoverTree(spark, root).isEmpty)
    assert(!graft.io.Fs.exists(spark, stale))
    assert(spark.read.parquet(root).orderBy("id")
      .collect().map(_.toSeq).toSeq == before)
  }

  test("detection CSV lake: reference-shaped write → typed read round-trips") {
    val root = Files.createTempDirectory("detlake").toString
    val det = Seq(
      // fractional-second fixture: time.time() has sub-second precision
      (Timestamp.valueOf("2024-02-01 10:00:00.123456"), "cam1", "Cam One",
        "car", 0.87654321, 10L, 20L, 110L, 220L),
      (Timestamp.valueOf("2024-02-02 11:30:00"), "cam2", "Cam Two",
        "motorcycle", 0.5, 0L, 0L, 5L, 7L))
      .toDF("ts", "source_id", "source_name", "class_id", "confidence",
        "x1", "y1", "x2", "y2")
    Lake.writeDetections(det, "ts", root)
    // raw file parity: the reference's exact header and row formats
    val rawFile = new java.io.File(root)
      .listFiles().filter(_.isDirectory).head // year=2024
    val csv = {
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files)
        else if (f.getName.endsWith(".csv")) Seq(f) else Nil
      files(rawFile).flatMap(f =>
        scala.io.Source.fromFile(f).getLines().toList)
    }
    assert(csv.contains(
      "timestamp,source_id,source_name,class_id,confidence,bbox"))
    // FULL rows including the timestamp field: plain fixed-point epoch
    // seconds (no scientific notation), fractional part preserved
    assert(csv.contains(
      "1706781600.123456,cam1,Cam One,car,0.8765,\"[10, 20, 110, 220]\""),
      s"rows were:\n${csv.mkString("\n")}")
    assert(csv.contains(
      "1706873400.000000,cam2,Cam Two,motorcycle,0.5000,\"[0, 0, 5, 7]\""),
      s"rows were:\n${csv.mkString("\n")}")
    // typed read-back
    val back = Lake.readDetections(spark, root).orderBy("source_id").collect()
    assert(back.length == 2)
    assert(back(0).getAs[Timestamp]("ts") ==
      Timestamp.valueOf("2024-02-01 10:00:00.123456"))
    assert(back(0).getAs[String]("class_id") == "car")
    assert(back(0).getAs[Double]("confidence") == 0.8765) // %.4f rounding
    assert(back(0).getAs[Long]("x1") == 10L &&
      back(0).getAs[Long]("y2") == 220L)
    assert(back(1).getAs[Long]("x2") == 5L)
    assert(back(0).getAs[Int]("year") == 2024 &&
      back(0).getAs[Int]("day") == 1)
  }

  test("catalog read coerces mixed-type lat/lng and nullable mirror_id") {
    val f = Files.createTempFile("cfg", ".json")
    // lat as number on one entry, as string on the other — the reference
    // file has BOTH (SURVEY §1.1); mirror_id present on some entries only
    Files.writeString(f,
      """[{"id":"u1","name":"Cam A","url":"rtsp://a","active":true,
        |  "lat":-6.95,"lng":107.6,"mirror_id":null},
        | {"id":"u2","name":"Cam B","url":"rtsp://b","active":false,
        |  "lat":"-6.954","lng":"107.61"}]""".stripMargin)
    val cfg = Catalog.readConfig(spark, f.toString).orderBy("id").collect()
    assert(cfg.length == 2)
    assert(math.abs(cfg(0).getAs[Double]("lat") + 6.95) < 1e-9)
    assert(math.abs(cfg(1).getAs[Double]("lat") + 6.954) < 1e-9)
    assert(cfg(1).isNullAt(cfg(1).fieldIndex("mirror_id")))
  }

  test("catalog write → read round-trips (S6)") {
    val dir = Files.createTempDirectory("cfgout").toString
    val df = Seq(("u1", "Cam A", "rtsp://a", true, -6.95, 107.6))
      .toDF("id", "name", "url", "active", "lat", "lng")
      .withColumn("mirror_id", lit(null).cast("string"))
    Catalog.writeConfig(df, s"$dir/cfg")
    val back = spark.read.json(s"$dir/cfg")
    assert(back.count() == 1)
    assert(back.head().getAs[String]("name") == "Cam A")
  }

  test("haversine distance matches known geodesics within 0.5%") {
    // 1 degree of latitude ≈ 111.19 km on the R=6371km sphere
    val d = Seq((0.0, 0.0, 1.0, 0.0)).toDF("lat1", "lng1", "lat2", "lng2")
    val m = d.select(graft.ops.Geo.haversineM(
      col("lat1"), col("lng1"), col("lat2"), col("lng2"))).as[Double]
      .collect().head
    assert(math.abs(m - 111194.9) < 500)
    // symmetric and zero at identity
    val z = Seq((3.5, 100.2)).toDF("a", "b")
      .select(graft.ops.Geo.haversineM(col("a"), col("b"), col("a"), col("b")))
      .as[Double].collect().head
    assert(z == 0.0)
  }

  test("thresholds map-object explodes into a typed dimension") {
    val f = Files.createTempFile("thr", ".json")
    Files.writeString(f,
      """{"u1": {"p50": 10.0, "p75": 20.0, "p90": 30.0, "max": 99.0},
        | "u2": {"p50": 1.5, "p75": 2.5, "p90": 3.5, "max": 9.0}}""".stripMargin)
    val t = Catalog.readThresholds(spark, f.toString).orderBy("camera_id")
      .collect()
    assert(t.length == 2)
    assert(t(0).getAs[String]("camera_id") == "u1")
    assert(t(0).getAs[Double]("p90") == 30.0)
    assert(t(1).getAs[Double]("max_volume") == 9.0)
  }

  test("pruneZombies keeps only configured keys (semi join)") {
    val stats = Seq(("u1", 5), ("u2", 7), ("zombie", 9)).toDF("camera_id", "v")
    val cfg = Seq(("u1", "A"), ("u2", "B")).toDF("id", "name")
    val kept = Catalog.pruneZombies(stats, cfg, "camera_id", "id")
      .select("camera_id").as[String].collect().sorted
    assert(kept.sameElements(Array("u1", "u2")))
  }
}
