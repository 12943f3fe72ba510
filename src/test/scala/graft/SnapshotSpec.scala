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

  test("applyMirrors: copy-when-source-exists, keep-own otherwise, double-counted windows") {
    val obs = Ingest.batchObservations(fixture.toDS()).toDF()
    // cam9: pure mirror of cam1 (no own obs); cam2: mirror of a camera
    // with no stats → keeps its own (the reference's existence guard)
    val mirrors = Seq(("cam9", "cam1"), ("cam2", "ghost"))
      .toDF("camera_id", "mirror_id")
    val pc = Snapshot.applyMirrors(Snapshot.perCamera(obs), mirrors)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(pc.keySet == Set("cam1", "cam2", "cam9"))
    assert(pc("cam9") == pc("cam1"))
    assert(pc("cam2") != pc("cam1")) // ghost source → own stats kept
    // global + windows double-count the mirrored camera, like the
    // reference's save_stats loop over copied entries
    val snap = Snapshot.build(obs, Seq("24h" -> 86400L), Some(mirrors))
      .collect().head
    val g = snap.getAs[org.apache.spark.sql.Row]("global_total")
    assert(g.getAs[Long]("accumulated_count") == 5L) // 3 + cam1's 2 again
    val w = snap.getAs[Map[String, org.apache.spark.sql.Row]]("window_stats")
    assert(w("24h").getAs[Long]("total_volume") == 5L)
  }

  test("mergePerCamera: sums add, later batch owns density, out-of-order batch cannot roll back") {
    // split at the OBSERVATION grain (streaming carries the IOU-dedup
    // state across batches, so per-batch obs match the full run's)
    val obs = Ingest.batchObservations(fixture.toDS()).toDF().cache()
    import org.apache.spark.sql.functions.col
    val b1 = Snapshot.perCamera(
      obs.filter(col("ts") === ts("2024-02-01 10:00:00")))
    val b2 = Snapshot.perCamera(
      obs.filter(col("ts") === ts("2024-02-01 10:00:02")))
    val full = Snapshot.perCamera(obs)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val fwd = Snapshot.mergePerCamera(b1, b2)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(fwd == full)
    // reversed arrival order: same lifetime sums, density still from
    // the later timestamp
    val rev = Snapshot.mergePerCamera(b2, b1)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(rev == full)
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
