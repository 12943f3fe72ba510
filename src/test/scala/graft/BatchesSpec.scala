package graft

import graft.io.{Batches, Fs}
import org.apache.spark.sql.functions._

/** Maintenance for the streaming sinks' `b=<batchId>` layouts:
  * watermark-named compacted base, exactly-once reads through every
  * crash window, and the pre-layout fail-fast. */
class BatchesSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/sink"

  private def writeBatch(root: String, id: Long, rows: Seq[Long]): Unit =
    rows.toDF("v").coalesce(1).write.mode("overwrite")
      .parquet(s"$root/b=$id")

  /** (value, b-tag-it-was-read-under) pairs of the live layout. */
  private def readAll(root: String,
                      below: Option[Long] = None): Set[(Long, Long)] =
    Batches.read(spark, root, below)
      .map(_.select(col("v"), col("b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      .getOrElse(Set.empty)

  test("compact folds committed batches into a watermark-named base; readers see base + tail") {
    val root = newRoot("graft_batches")
    assert(Batches.read(spark, root).isEmpty)
    assert(!Batches.compact(spark, root, upTo = 10L)) // nothing to fold
    (0L to 4L).foreach(id => writeBatch(root, id, Seq(id * 10, id * 10 + 1)))
    val values = readAll(root).map(_._1)
    assert(values.size == 10)

    assert(Batches.compact(spark, root, upTo = 2L))
    assert(Batches.watermark(spark, root) == 2L)
    assert(Fs.listDirNames(spark, root).toSet == Set("b=-4", "b=3", "b=4"),
      "base encodes the fold watermark in its name; tail dirs survive")
    // every value exactly once; base rows carry the base tag, tail
    // rows their ingest batch id (provenance preserved until folded)
    assert(readAll(root) ==
      (0L to 2L).flatMap(id => Seq((id * 10, -4L), (id * 10 + 1, -4L))).toSet
        ++ Seq((30L, 3L), (31L, 3L), (40L, 4L), (41L, 4L)))

    assert(!Batches.compact(spark, root, upTo = 2L),
      "re-running with the same bound folds nothing (idempotent)")
    assert(Batches.compact(spark, root, upTo = 99L))
    assert(Fs.listDirNames(spark, root).toSet == Set("b=-6"))
    assert(readAll(root).map(_._1) == values)
  }

  test("fold-aware base sizing: a shrinking foldBase writes files for" +
    " the FOLDED size, not the pre-fold byte total") {
    val root = newRoot("graft_foldsz")
    // 40 commits x 50 rows; a fold that collapses everything to one
    // summary row. targetFileBytes tiny, so the PRE-fold total would
    // demand many files — the folded base must not inherit that
    (0L until 40L).foreach(id =>
      writeBatch(root, id, (0L until 50L).map(id * 100 + _)))
    val preBytes = Fs.totalBytes(spark, root, _.endsWith(".parquet"))
    assert(preBytes > 8L * 1024, "fixture must exceed targetFileBytes")
    assert(Batches.compact(spark, root, upTo = 39L,
      targetFileBytes = 8L * 1024,
      foldBase = df => df.agg(max(col("v")).as("v"))))
    val baseFiles = new java.io.File(s"$root/b=-41").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(baseFiles.length == 1,
      s"one summary row must land in one file, got ${baseFiles.length}")
    assert(Batches.read(spark, root).get.select("v")
      .collect().map(_.getLong(0)).toSeq == Seq(39L * 100 + 49))
    // identity fold keeps the byte-proportional sizing (several files)
    val root2 = newRoot("graft_foldsz2")
    (0L until 40L).foreach(id =>
      writeBatch(root2, id, (0L until 50L).map(id * 100 + _)))
    assert(Batches.compact(spark, root2, upTo = 39L,
      targetFileBytes = 8L * 1024))
    val base2 = new java.io.File(s"$root2/b=-41").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(base2.length > 1,
      "identity fold sizes by raw bytes (several files at a tiny target)")
  }

  test("crash artifacts — superseded base, folded leftovers, staging — are invisible and swept") {
    val root = newRoot("graft_batches_crash")
    (0L to 3L).foreach(id => writeBatch(root, id, Seq(id)))
    assert(Batches.compact(spark, root, upTo = 2L)) // base b=-4, tail b=3
    // simulate every leftover a crash inside compact can leave:
    writeBatch(root, -3L, Seq(991L)) // base superseded by b=-4's fold
    writeBatch(root, 1L, Seq(992L))  // folded batch dir (or a replay of it)
    Seq(993L).toDF("v").write.parquet(s"$root/_compact_b") // dead staging
    val live = readAll(root)
    assert(live == Set((0L, -4L), (1L, -4L), (2L, -4L), (3L, 3L)),
      s"stale artifacts leaked into a read: $live")
    // a fold with nothing new still sweeps the leftovers
    assert(!Batches.compact(spark, root, upTo = 2L))
    assert(Fs.listDirNames(spark, root).toSet == Set("b=-4", "b=3"))
  }

  test("below excludes the reader's own batch; an over-eager fold faults instead of self-suppressing") {
    val root = newRoot("graft_batches_below")
    (0L to 2L).foreach(id => writeBatch(root, id, Seq(id)))
    assert(readAll(root, below = Some(2L)).map(_._1) == Set(0L, 1L),
      "a sink reading its own store must not see its current batch")
    assert(Batches.compact(spark, root, upTo = 2L))
    // the fold went past batch 2's frontier — a batch-2 replay would
    // now read its own output from the base; fail loudly instead
    intercept[IllegalArgumentException](readAll(root, below = Some(2L)))
    assert(readAll(root, below = Some(3L)).map(_._1) == Set(0L, 1L, 2L))
  }

  test("compaction UNDER LOAD: folds interleaved with 120 live " +
    "commits keep reads identical to the never-compacted replica and " +
    "the layout bounded") {
    val rootC = newRoot("graft_b_load_c")
    val rootU = newRoot("graft_b_load_u")
    (0L until 120L).foreach { id =>
      val rows = Seq(id * 2, id * 2 + 1)
      writeBatch(rootC, id, rows)
      writeBatch(rootU, id, rows)
      // the long-running sink's cadence: fold committed history while
      // commits keep arriving (upTo = id - 1 — this batch's frontier)
      if (id > 0 && id % 16 == 0)
        assert(Batches.compact(spark, rootC, upTo = id - 1))
    }
    val served = readAll(rootC).map(_._1)
    assert(served == readAll(rootU).map(_._1),
      "compaction changed the served multiset")
    assert(served.size == 240)
    val midDirs = Fs.listDirNames(spark, rootC).count(_.startsWith("b="))
    assert(midDirs <= 20, s"layout not bounded under load: $midDirs dirs")
    // the final idle fold collapses the tail to base + nothing
    assert(Batches.compact(spark, rootC, upTo = 119L))
    assert(readAll(rootC).map(_._1) == served)
    assert(Fs.listDirNames(spark, rootC).count(_.startsWith("b=")) <= 2)
  }

  test("BloomState.append: driver and distributed build sites admit " +
    "the same membership; a mis-sized previous filter falls back to " +
    "the streamed driver insert instead of throwing") {
    import graft.io.BloomState
    val hashes = (1L to 5000L).map(_ * 2654435761L)
    val df = hashes.toDF("h")
    val prev = org.apache.spark.util.sketch.BloomFilter.create(100000L, 0.01)
    prev.putLong(42L)
    // driver path (under the threshold) vs distributed path (over it)
    val drv = BloomState.append(df, "h", Some(BloomState.fromBytes(
      BloomState.toBytes(prev))), 100000L, 0.01, driverMaxRows = 1000000L)
    val dist = BloomState.append(df, "h", Some(BloomState.fromBytes(
      BloomState.toBytes(prev))), 100000L, 0.01, driverMaxRows = 0L)
    (hashes :+ 42L).foreach { h =>
      assert(drv.mightContainLong(h), s"driver bloom missing $h")
      assert(dist.mightContainLong(h), s"distributed bloom missing $h")
    }
    // the input copy stays untouched (the crash-safety contract)
    assert(!prev.mightContainLong(hashes.head))
    // mis-sized prev (different expectedItems → incompatible merge):
    // the distributed path must fall back, not throw, and still admit
    val odd = org.apache.spark.util.sketch.BloomFilter.create(1000L, 0.1)
    odd.putLong(7L)
    val fb = BloomState.append(df, "h", Some(odd), 100000L, 0.01,
      driverMaxRows = 0L)
    (hashes :+ 7L).foreach(h =>
      assert(fb.mightContainLong(h), s"fallback bloom missing $h"))
  }

  test("requireBatchLayout fails fast on pre-layout flat parquet at the root") {
    val root = newRoot("graft_batches_flat")
    Seq(1L, 2L).toDF("v").write.parquet(root) // old flat-append layout
    val e = intercept[IllegalArgumentException](Batches.read(spark, root))
    assert(e.getMessage.contains("b=<batchId>"))
    intercept[IllegalArgumentException](Batches.compact(spark, root, 0L))
  }
}
