package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: stress the scale-sensitive operators on a corpus
  * synthetically multiplied from the test data (id-shifted unions), to
  * catch quadratic blowups that sf0.1 alone would hide. Not part of the
  * driver contract — run manually:
  *   sbt "runMain graft.ScaleProbe [multiplier]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def multiplied(base: DataFrame, idCol: String): DataFrame =
      (0 until mult).map { i =>
        base.withColumn(idCol, col(idCol) + lit(i.toLong * 10000000L))
      }.reduce(_ union _)

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[scaleprobe] $name%-28s rows=$n%10d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = multiplied(Tables.documents(spark, dir)
      .select("doc_id", "text"), "doc_id").cache()
    println(s"[scaleprobe] documents x$mult = ${docs.count()}")

    time("exact_dedup") {
      ops.TextDedup.exactDedup(docs, "doc_id", "text").count()
    }
    time("dedup_corpus_pipeline") {
      ops.TextDedup.dedupCorpus(docs, "doc_id", "text", 3, 16, 4, 0.8).count()
    }
    time("simhash_pairs") {
      ops.TextDedup.simhashPairs(docs, "doc_id", "text", 10).count()
    }
    time("pack_sequences") {
      ops.TextStats.packSequences(docs, "doc_id", "text", 512L, 64).count()
    }
    time("repetition_metrics") {
      ops.TextStats.repetitionMetrics(docs, "doc_id", "text").count()
    }
    time("mix_holdout_sample") {
      // mixing + split tags in one pass (both pure map predicates)
      ops.Sampling.withHoldout(
        ops.Sampling.uniform(docs, "doc_id", 0.5, "probe"),
        "doc_id", 0.2, "split").count()
    }
    time("tfidf_topk") {
      ops.TextStats.tfidfTopK(docs, "doc_id", "text", 3).count()
    }
    time("unigram_score") {
      ops.TextStats.unigramScore(docs, "doc_id", "text").count()
    }
    // the raw pairwise path is quadratic on dup clusters BY DESIGN on
    // this multiplied corpus (every doc has mult-1 exact copies, so the
    // TRUE answer contains mult*(mult-1)/2 pairs per doc — that's the
    // pathology dedupCorpus's exact-first stage fixes); probe it up to
    // 30x with the hot-key guard on, and audit how many candidate
    // pairs prefix filtering emits vs the naive inverted-index
    // co-occurrence join (sum over shingles of C(df,2)) it replaces
    if (mult <= 30) {
      var truePairs = 0L
      time("jaccard_guarded") {
        truePairs = ops.TextDedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8,
          maxShingleDocFreq = Some(500L)).count()
        truePairs
      }
      val sh = ops.Skew.dropHotKeys(
        ops.TextDedup.shingleHashes(docs, "doc_id", "text", 3), "sh_h", 500L)
      val candidates = ops.TextDedup.prefixCandidates(sh, "doc_id", 0.8).count()
      val naive = sh.groupBy("sh_h").count()
        .agg(sum(expr("(count * (count - 1)) div 2"))).first().getLong(0)
      println(s"[scaleprobe] jaccard candidate audit at x$mult: " +
        s"prefix candidates=$candidates vs naive co-occurrence=$naive " +
        s"(${if (naive > 0) "%.1f%%".format(100.0 * candidates / naive) else "-"}); " +
        s"true pairs=$truePairs")
      assert(candidates >= truePairs,
        "prefix filtering lost qualifying pairs — prefix lemma violated")
      assert(candidates * 4 <= naive || naive < 100000,
        s"prefix filtering ineffective: $candidates candidates vs $naive naive")
    }

    val emb = multiplied(Tables.embeddings(spark, dir)
      .select("vec_id", "embedding"), "vec_id").cache()
    println(s"[scaleprobe] embeddings x$mult = ${emb.count()}")
    time("lsh_topk") {
      ops.Embeddings.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 8, 64, 5).count()
    }
    time("cosine_neardup") {
      ops.Embeddings.cosineNearDupPairs(emb, "vec_id", "embedding",
        64, 0.99).count()
    }

    // indexed IVF search at scale: build the cell-partitioned index on
    // the multiplied corpus ONCE, then pin the "a probe reads nProbe
    // cells of the index, not the index" claim with the scan's actual
    // files-read counter — the measurement that matters at 100 TB,
    // where the unpruned scan is the difference between touching a few
    // directories and listing the lake.
    val ivfRoot = java.nio.file.Files
      .createTempDirectory("graft_probe_ivf").toString
    val ivfDir = s"$ivfRoot/index"
    val ivfModel = ops.Embeddings.ivfFit(emb, "vec_id", "embedding",
      nLists = 64)
    time("ivf_index_build") {
      ops.Embeddings.writeIvfIndex(ivfModel, emb, "vec_id", "embedding",
        ivfDir)
      spark.read.parquet(ivfDir).count()
    }
    val ivfQueries = emb.filter(col("vec_id") < 5)
    val indexed = ops.Embeddings.ivfTopKIndexed(ivfModel, spark, ivfDir,
      ivfQueries, "vec_id", "embedding", nProbe = 4, k = 10)
    time("ivf_indexed_topk") { indexed.collect().length.toLong }
    locally {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      // files live under cell=<c>/b=<tag>/ — climb to the cell ancestor
      def cellOf(f: java.io.File): Int = {
        var d = f.getParentFile
        while (d != null && !d.getName.startsWith("cell=")) d = d.getParentFile
        d.getName.stripPrefix("cell=").toInt
      }
      val filesPerCell = walk(new java.io.File(ivfDir))
        .groupBy(cellOf)
        .map { case (c, fs) => c -> fs.length }
      val probed = ops.Embeddings.probeCellsOf(ivfModel, ivfQueries,
          "vec_id", "embedding", nProbe = 4)
        .select("cell").distinct().collect().map(_.getInt(0)).toSet
      val expected = filesPerCell.filter(kv => probed(kv._1)).values.sum
      val total = filesPerCell.values.sum
      val read = util.PlanMetrics.filesReadUnder(indexed, ivfDir)
      println(s"[scaleprobe] ivf_indexed_topk files read: $read of " +
        s"$total on disk (probed ${probed.size}/${filesPerCell.size} " +
        s"cells holding $expected files)")
      assert(read == expected && read < total,
        s"IVF probe read $read files; probed cells hold $expected of " +
          s"$total — partition pruning not effective at x$mult")
    }

    // streaming snapshot sink: the incremental-MV claim is that a tick
    // costs O(batch + catalog + horizon), NOT O(history) — so per-tick
    // wall time must stay FLAT while accumulated history grows 20x.
    // Timestamps advance 6h/batch, so day partitions roll out of the
    // 24h horizon and retention (incl. b= dir deletion) fires mid-run.
    locally {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_probe_stream").toString
      val mem = MemoryStream[streaming.Detection]
      val q = streaming.Ingest.startSnapshotSink(mem.toDS(), s"$tmp/hist",
        s"$tmp/snap", s"$tmp/ckpt", Seq("1h" -> 3600L, "24h" -> 86400L))
      val nBatches = 20
      val rowsPer = 200 * mult
      val base = java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime
      val ticks = (0 until nBatches).map { i =>
        val t = base + i.toLong * 6 * 3600 * 1000
        val rows = (0 until rowsPer).map { r =>
          streaming.Detection(s"cam${r % 100}",
            new java.sql.Timestamp(t + (r / 100).toLong * 1000L),
            if (r % 3 == 0) "motorcycle" else "car", 0.9,
            (r % 97).toLong * 50, (r % 89).toLong * 50,
            (r % 97).toLong * 50 + 9, (r % 89).toLong * 50 + 9)
        }
        mem.addData(rows: _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      q.stop()
      val early = ticks.slice(2, 7).sum / 5  // skip 2 warmup ticks
      val late = ticks.takeRight(5).sum / 5
      val bdirs = graft.io.Fs
        .listDirNames(spark, s"$tmp/ckpt_snapwork/recent")
        .count(_.startsWith("b="))
      println(f"[scaleprobe] snapshot_sink tick: early=$early%.2f s " +
        f"late=$late%.2f s over $nBatches batches x $rowsPer rows " +
        s"(recent-store b= dirs at end: $bdirs)")
      assert(late <= early * 2.0 + 0.3,
        f"tick time grew with history: early=$early%.2f late=$late%.2f")
      // retention bound: 24h horizon / 6h cadence covers ~5-6 batches;
      // anything near nBatches means b= dirs are accumulating again
      assert(bdirs <= 8, s"recent store holds $bdirs batch dirs " +
        s"after $nBatches batches — retention not bounding the store")
    }

    val ev = multiplied(Tables.events(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp")), "event_id").cache()
    println(s"[scaleprobe] events x$mult = ${ev.count()}")
    time("history_buckets") {
      ops.TimeBuckets.history(ev, "ts", "value", 900, "HH:mm").count()
    }
    time("predict_pattern") {
      ops.Predict.hourlyPattern(ev, "user_id", "ts", "value").count()
    }
    spark.stop()
  }
}
