package graft

import graft.io.Snapshot
import graft.streaming.{Detection, Ingest}
import java.nio.file.Files
import java.sql.Timestamp

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fixture = Seq(
    Detection("cam1", ts("2024-02-01 10:00:00"), "car", 0.9, 0, 0, 10, 10),
    Detection("cam1", ts("2024-02-01 10:00:02"), "car", 0.9, 0, 0, 10, 10),
    Detection("cam1", ts("2024-02-01 10:00:02"), "motorcycle", 0.9, 200, 200, 210, 210),
    Detection("cam2", ts("2024-02-01 10:00:00"), "car", 0.9, 5, 5, 15, 15))

  test("snapshot build: per-camera sources + global rollup + window stats") {
    val obs = Ingest.batchObservations(fixture.toDS()).toDF()
    val snap = Snapshot.build(obs, Seq("1h" -> 3600L, "24h" -> 86400L))
      .collect().head
    val sources = snap.getAs[Map[String, org.apache.spark.sql.Row]]("sources")
    assert(sources.keySet == Set("cam1", "cam2"))
    assert(sources("cam1").getAs[Long]("accumulated_count") == 2L) // static excluded
    assert(sources("cam1").getAs[Long]("current_count") == 2L)     // last density
    val g = snap.getAs[org.apache.spark.sql.Row]("global_total")
    assert(g.getAs[Long]("accumulated_count") == 3L)
    val w = snap.getAs[Map[String, org.apache.spark.sql.Row]]("window_stats")
    assert(w("1h").getAs[Long]("total_volume") == 3L)
  }

  test("snapshot v2 write → read round-trip") {
    val obs = Ingest.batchObservations(fixture.toDS()).toDF()
    val dir = Files.createTempDirectory("snap").toString
    Snapshot.write(Snapshot.build(obs, Seq("1h" -> 3600L)), s"$dir/stats")
    val back = Snapshot.readSources(spark, s"$dir/stats")
      .orderBy("camera_id").collect()
    assert(back.length == 2)
    assert(back(0).getAs[String]("camera_id") == "cam1")
    assert(back(0).getAs[Long]("accumulated_count") == 2L)
  }

  test("legacy flat snapshot normalizes on read (migration path)") {
    val f = Files.createTempFile("legacy", ".json")
    Files.writeString(f,
      """{"camA": {"accumulated_count": 7, "accumulated_cars": 5,
        |          "accumulated_motors": 2, "current_count": 3,
        |          "last_update": 1700000000.0}}""".stripMargin)
    val back = Snapshot.readSources(spark, f.toString).collect()
    assert(back.length == 1)
    assert(back.head.getAs[String]("camera_id") == "camA")
    assert(back.head.getAs[Long]("accumulated_count") == 7L)
    assert(back.head.getAs[Double]("last_update") == 1.7e9)
  }
}
