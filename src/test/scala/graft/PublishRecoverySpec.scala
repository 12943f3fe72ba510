package graft

import graft.io.{Fs, Snapshot}
import graft.ops.Embeddings
import graft.streaming.{Detection, Ingest}
import java.sql.Timestamp

/** Crash-window semantics of the bak-swap publish (Fs.publish /
  * Fs.recoverPublished) and its read-path healing — the Spark analog of
  * the reference's tmp→bak→move writer (app/utils.py:494-508) and
  * main-then-.bak loader (app/utils.py:405-441). */
class PublishRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val fixture = Seq(
    Detection("cam1", ts("2024-02-01 10:00:00"), "car", 0.9, 0, 0, 10, 10),
    Detection("cam1", ts("2024-02-01 10:00:02"), "car", 0.9, 0, 0, 10, 10),
    Detection("cam2", ts("2024-02-01 10:00:00"), "car", 0.9, 5, 5, 15, 15))

  private def bakOf(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    new org.apache.hadoop.fs.Path(p.getParent, "_bak_" + p.getName).toString
  }

  test("publish swaps content and leaves no bak behind") {
    val root = tmp("graft_pub")
    val path = s"$root/snap"
    val obs = Ingest.batchObservations(fixture.toDS()).toDF().cache()
    Snapshot.write(Snapshot.build(obs, Seq("1h" -> 3600L)), path)
    val v1 = Snapshot.readSources(spark, path).collect()
    assert(v1.map(_.getString(0)).toSet == Set("cam1", "cam2"))
    assert(!Fs.exists(spark, bakOf(path)), "bak must be cleared after publish")
    // publish again (a second snapshot tick) — replaces in place
    Snapshot.write(Snapshot.build(obs, Seq("1h" -> 3600L)), path)
    assert(Fs.exists(spark, path) && !Fs.exists(spark, bakOf(path)))
  }

  test("crash between publish's two renames: reader heals from the bak") {
    val root = tmp("graft_pub_crash")
    val path = s"$root/snap"
    val obs = Ingest.batchObservations(fixture.toDS()).toDF().cache()
    Snapshot.write(Snapshot.build(obs, Seq("1h" -> 3600L)), path)
    val before = Snapshot.readSources(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // simulate a crash after step 1 (path → bak) and before step 2:
    // the published path is gone, the complete old copy sits at the bak
    Fs.rename(spark, path, bakOf(path))
    assert(!Fs.exists(spark, path) && Fs.exists(spark, bakOf(path)))
    // the reader's recoverPublished fallback serves the old snapshot
    val after = Snapshot.readSources(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before)
    // and the heal is durable: the path is back, the bak consumed
    assert(Fs.exists(spark, path) && !Fs.exists(spark, bakOf(path)))
    // recoverPublished is a no-op once healthy
    assert(!Fs.recoverPublished(spark, path))
  }

  test("re-running publish after a crash is idempotent (staging survives the crash)") {
    val root = tmp("graft_pub_retry")
    val path = s"$root/snap"
    val obs = Ingest.batchObservations(fixture.toDS()).toDF().cache()
    Snapshot.write(Snapshot.build(obs, Seq("1h" -> 3600L)), path)
    // build v2 in staging but crash after step 1: path is at the bak,
    // staging is complete, nothing live
    val staging = path + "_tmp"
    Snapshot.build(obs, Seq("24h" -> 86400L))
      .coalesce(1).write.mode("overwrite").json(staging)
    Fs.rename(spark, path, bakOf(path))
    // the retried publish completes the swap and clears the bak
    Fs.publish(spark, staging, path)
    assert(Fs.exists(spark, path) && !Fs.exists(spark, bakOf(path)))
    assert(!Fs.exists(spark, staging))
    val rows = Snapshot.readSources(spark, path).collect()
    assert(rows.map(_.getString(0)).toSet == Set("cam1", "cam2"))
  }

  test("crash matrix: every intermediate publish state serves a complete doc after recovery") {
    // publish(staging, path) = [A] delete stale bak, [B] path -> bak,
    // [C] staging -> path, [D] delete bak. Simulate a crash after each
    // step and assert the invariant the protocol promises: after
    // recoverPublished, `path` holds a COMPLETE doc (the old one before
    // C, the new one from C on) and a retried/next publish converges.
    val obs = Ingest.batchObservations(fixture.toDS()).toDF().cache()
    val oldSnap = Snapshot.build(obs, Seq("1h" -> 3600L))
    val newSnap = Snapshot.build(obs, Seq("24h" -> 86400L))
    def camsAt(path: String) = Snapshot.readSources(spark, path)
      .collect().map(_.getString(0)).toSet
    val allCams = Set("cam1", "cam2")

    for (crashAfter <- Seq("A", "B", "C", "D")) {
      val root = tmp(s"graft_pub_matrix_$crashAfter")
      val path = s"$root/snap"
      val staging = path + "_tmp"
      Snapshot.write(oldSnap, path) // live v1
      newSnap.coalesce(1).write.mode("overwrite").json(staging) // staged v2
      // replay publish's steps up to the crash point
      Fs.delete(spark, bakOf(path))                        // A
      if (crashAfter >= "B") Fs.rename(spark, path, bakOf(path))
      if (crashAfter >= "C") Fs.rename(spark, staging, path)
      if (crashAfter >= "D") Fs.delete(spark, bakOf(path))
      // invariant 1: recovery + read serves a complete doc
      Fs.recoverPublished(spark, path)
      assert(camsAt(path) == allCams, s"crash after $crashAfter: unreadable")
      // invariant 2: the system converges — rerun the publish (restage
      // if the staging dir was consumed by the crash point) and the NEW
      // doc is live with no bak left behind
      if (!Fs.exists(spark, staging))
        newSnap.coalesce(1).write.mode("overwrite").json(staging)
      Fs.publish(spark, staging, path)
      assert(camsAt(path) == allCams)
      assert(!Fs.exists(spark, bakOf(path)) && !Fs.exists(spark, staging),
        s"crash after $crashAfter: leftovers after converging publish")
    }
  }

  test("indexed IVF search heals a crashed index publish") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = e.filter($"vec_id" < 3)
    val model = Embeddings.ivfFit(e, "vec_id", "embedding", nLists = 8)
    val dir = s"${tmp("graft_ivf_crash")}/index"
    Embeddings.writeIvfIndex(model, e, "vec_id", "embedding", dir)
    val healthy = Embeddings.ivfTopKIndexed(model, spark, dir, probes,
      "vec_id", "embedding", nProbe = 2, k = 3).collect().map(_.toSeq).toSet
    // crash a rebuild mid-swap: live index renamed aside, nothing live
    Fs.rename(spark, dir, bakOf(dir))
    assert(!Fs.exists(spark, dir))
    val healed = Embeddings.ivfTopKIndexed(model, spark, dir, probes,
      "vec_id", "embedding", nProbe = 2, k = 3).collect().map(_.toSeq).toSet
    assert(healed == healthy)
    assert(Fs.exists(spark, dir) && !Fs.exists(spark, bakOf(dir)))
  }
}
