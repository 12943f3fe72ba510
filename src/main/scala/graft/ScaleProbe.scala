package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: stress the scale-sensitive operators on a corpus
  * synthetically multiplied from the test data (id-shifted unions), to
  * catch quadratic blowups that sf0.1 alone would hide. Not part of the
  * driver contract — run manually:
  *   sbt "runMain graft.ScaleProbe [multiplier] [section]"
  * With a second arg, only that section runs (so one family can probe
  * at a multiplier the full sweep can't afford): text | sampling |
  * jaccard | contamination | ann | snapshot | ndsink | ndprobe | ldsink | ldprobe | embprobe | span |
  * linehot | ndaudit | embsink | events | forecast | sketch | fuzzy |
  * interval | cdc | warehouse | graph | mvserve | pca | geo | sessions.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 20
    val only: Option[String] = args.lift(1)
    def section(name: String)(body: => Unit): Unit =
      if (only.forall(_ == name)) body
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // byte-proportional AQE coalescing serializes the engine\'s
      // CPU-heavy stacked-window stages at bench data sizes (see
      // Bench.scala for the measurement); off in every engine session
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same rationale as Bench: the default 100-entry codegen cache
      // thrashes under AQE's many small stages on the multi-stage dedup
      // pipelines — each eviction serializes 32 tasks behind a janino
      // recompile and runs fresh (unJITed) generated classes, measured
      // 344 s vs 36 s warm for the same x30 dedupCorpus call
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // the pathological pairwise fixtures (78M-pair simhash at x30)
      // can push a full-GC pause past the 120 s executor-heartbeat
      // default in one JVM; a timed-out "executor" zombifies the
      // local scheduler and poisons every number after it (observed:
      // 0.2 s ops reading 8 s). Probes prefer surviving the pause.
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.QuietLogs.suppressWindowWarns()
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

    lazy val docs = {
      val d = multiplied(Tables.documents(spark, dir)
        .select("doc_id", "text"), "doc_id").cache()
      println(s"[scaleprobe] documents x$mult = ${d.count()}")
      d
    }

    section("text") {
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
    time("bigram_score") {
      ops.TextStats.bigramScore(docs, "doc_id", "text").count()
    }
    time("keep_best_dedup") {
      ops.TextDedup.exactDedupKeepBest(docs, "doc_id", "text").count()
    }
    time("token_ids_vocab100") {
      ops.TextStats.tokenIds(docs, "doc_id", "text",
        ops.TextStats.vocabIdMap(docs, "text", 100)).count()
    }
    time("shuffle_shards") {
      ops.Sampling.shuffleShards(docs, "doc_id", 64, "probe").count()
    }
    time("line_dedup") {
      // multiplied corpus = every line repeated mult times: the worst
      // case for the first-occurrence window (hot hash groups of size
      // mult), linear in corpus size
      ops.TextDedup.dedupLines(
        docs.withColumn("text",
          regexp_replace(col("text"), " the ", "\n")),
        "doc_id", "text").count()
    }
    time("dup_span_stats") {
      // multiplied corpus = every shingle corpus-frequency x mult: the
      // doc-freq agg and 1:1 join back must stay linear, no hot key
      ops.TextDedup.dupSpanStats(docs, "doc_id", "text", 3).count()
    }
    time("remove_dup_spans") {
      // multiplied corpus = EVERY doc fully duplicated (worst case:
      // every position is a dup start, the interval merge collapses a
      // doc-length starts array per doc) — must stay linear. The
      // filter references the computed cut: a bare count() lets the
      // optimizer ELIMINATE the unique-keyed left join and measure
      // nothing but the cached scan
      ops.TextDedup.removeDupSpans(docs, "doc_id", "text", 3)
        .filter(col("n_tokens_kept") >= 0L).count()
    }
    time("chunk_documents") {
      ops.TextStats.chunkDocuments(docs, "doc_id", "text", 64, 48).count()
    }
    time("linear_score") {
      val w = docs.select(explode(ops.TextDedup.tokens(col("text")))
          .as("term")).distinct()
        .withColumn("w_micro",
          pmod(ops.TextDedup.md5Hash60(col("term")), lit(2000001L))
            - lit(1000000L))
      ops.TextStats.linearScore(docs, "doc_id", "text", w).count()
    }
    time("quality_model_train") {
      // full train->export->serve loop on the multiplied corpus:
      // synthetic labels from content (docs containing 'the'), LR fit
      // over a 200-term vocab, weights exported and served exactly
      val labeled = docs.withColumn("label",
        array_contains(ops.TextDedup.tokens(col("text")), "the")
          .cast("double"))
      ml.QualityModel.trainAndScore(labeled, docs, "doc_id", "text",
        "label", vocabSize = 200).count()
    }
    time("pretrain_recipe") {
      // the six-stage composition end-to-end: cost should track its
      // dominant stage (dedupCorpus), not multiply across stages
      val w = docs.select(explode(ops.TextDedup.tokens(col("text")))
          .as("term")).distinct().withColumn("w_micro", lit(1000L))
      ops.Pipelines.pretrainRecipe(
        docs.withColumn("src", concat(lit("s"), pmod(col("doc_id"), lit(3)))),
        "doc_id", "text", "src",
        keepLangs = Seq("en", "es"), minQuality = 0.1,
        weights = w, minScoreMicro = 20000L,
        n = 3, k = 16, bands = 4, minJ = 0.8,
        alpha = 0.5, budgetFrac = 0.9, nShards = 16, seed = "probe")
        .count()
    }
    }

    section("pca") {
      // exact-PCA stats pass (ops/Spectral): the per-row d(d+1)/2
      // product expansion feeds a 2,080-group partial agg, so cost
      // must be LINEAR in rows (the eigen-solve is driver-side over
      // d² integers — constant). Synthetic 64-dim corpus at ×10 / ×100
      // of sf0.1's 5,000 vectors.
      def vecOf(idc: org.apache.spark.sql.Column) =
        transform(sequence(lit(1), lit(64)),
          j => ((pmod(idc * 31L + j.cast("long") * 17L, lit(201L)) - 100L)
            .cast("double") / 50.0).cast("float"))
      // untimed warmup: the cold first call pays JVM + codegen setup
      // that would otherwise dominate the 50k number
      ops.Spectral.pcaVariance(spark.range(5000L)
        .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding")),
        "embedding", 64, 12).count()
      for (m <- Seq(50000L, 500000L)) {
        val df = spark.range(m)
          .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
        time(s"pca_variance_${m / 1000}k") {
          ops.Spectral.pcaVariance(df, "embedding", 64, 12).count()
        }
      }
    }

    section("embprobe") {
    // growth curve of the EMBEDDING near-dup sink's cumulative band
    // index (the last "measure first" item): per-batch collision+verify
    // cost against fabricated indexes of 100k / 300k / 1M admitted
    // vectors (4 band rows each, 64-dim quantized payloads). Unlike the
    // text sinks there is no bloom to front this: the 2^8-per-band key
    // domain saturates by design, so every batch key collides and the
    // cost driver is the per-key bucket population (index/1024 rows
    // verified per colliding key) — expected to grow linearly with the
    // admitted count; the mitigation dial is planesPerBand (see the
    // embsink section), not a membership filter.
    locally {
      def qvOf(idc: org.apache.spark.sql.Column) =
        transform(sequence(lit(1), lit(64)),
          j => pmod(idc * 31L + j.cast("long") * 17L, lit(201L)) - 100L)
      def keysOf(base: DataFrame) = base
        .select(col("id").as("vec_id"), qvOf(col("id")).as("qv"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("key",
          pmod(col("vec_id") * (col("band") * 2L + 7L), lit(256L)))
      for (m <- Seq(100000L, 300000L, 1000000L)) {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"graft_probe_ep$m").toString
        val idx = s"$tmp/idx"
        keysOf(spark.range(m).toDF()).write.parquet(s"$idx/b=0")
        // 50-vector batch: half repeats of admitted vectors (exact qv
        // match -> verified drop), half fresh
        val batch = keysOf(spark.range(50L).toDF()
          .select(when(col("id") < 25, col("id"))
            .otherwise(col("id") + 1000000000L).as("id")))
        def bestOf(k: Int)(body: => Long): Double =
          (1 to k).map { _ =>
            val t0 = System.nanoTime(); body
            (System.nanoTime() - t0) / 1e9
          }.min
        val t = bestOf(3) {
          val idxDf = io.Batches.read(spark, idx).get
          batch.as("x").join(
              idxDf.select(col("band"), col("key"), col("qv").as("_iqv")),
              Seq("band", "key"))
            .filter(ops.Embeddings.qcosine(col("qv"), col("_iqv")) >= 0.99)
            .select(col("vec_id")).distinct().count()
        }
        println(f"[scaleprobe] embprobe index=${m / 1000}k vectors " +
          f"(${m * 4 / 1000}k band rows): per-batch collision+verify $t%.2f s")
      }
    }
    }

    section("r12") {
    // round-12 additions at xmult. The Gopher filters are pure
    // map-side scans (cost must track row count); DSIR is one explode
    // + 256-key map-side-combinable agg then a map-side score/filter;
    // the CCNet bucketer's single exact-percentile reducer receives
    // one double per DOC (not per token); PQ is the memory-path ANN.
    // the Gopher ops are pure projections: a bare count() lets column
    // pruning eliminate every signal expression (measured 0.5 s for a
    // "computation" that takes 25 s) — hash-fold all columns instead
    def evalAll(d: DataFrame): Long = {
      val r = d.agg(count(lit(1)),
        sum(hash(d.columns.map(col): _*))).head
      r.getLong(0)
    }
    time("gopher_rules") {
      evalAll(ops.TextStats.gopherRules(docs, "doc_id", "text"))
    }
    time("gopher_repetition_worst") {
      // every doc made internally repetitive (newline lines, a
      // duplicated line pair, a tripled phrase): the dup-5-gram
      // coverage pass's O(tokens x dup-starts) term is live in every
      // row, not just the seeded minority
      evalAll(ops.TextStats.gopherRepetition(
        docs.withColumn("text", concat(
          regexp_replace(col("text"), " the ", "\n"),
          lit("\nsubscribe now\nsubscribe now"),
          lit(" big data lake big data lake big data lake"))),
        "doc_id", "text"))
    }
    time("dsir_fit_score_resample") {
      val target = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val model = ops.Sampling.dsirFit(docs, target, "text", 256)
      ops.Sampling.dsirResample(
        ops.Sampling.dsirScore(docs, "doc_id", "text", model),
        "doc_id", 1000.0, "probe").count()
    }
    time("ccnet_buckets") {
      evalAll(ops.TextStats.pplBuckets(docs, "doc_id", "text"))
    }
    time("corpus_report") {
      val d = docs
        .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(20))))
        .withColumn("lang",
          when(pmod(col("doc_id"), lit(3)) === 0, "en").otherwise("es"))
      evalAll(ops.TextStats.corpusReport(d, "doc_id", "text",
        "source", "lang"))
    }
    time("vocab_drift") {
      evalAll(ops.TextStats.vocabDrift(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), "text"))
    }
    time("length_batches") {
      evalAll(ops.TextStats.lengthBatches(docs, "doc_id", "text",
        bandWidth = 16, batchSize = 64))
    }
    time("sharded_postings") {
      // segment count sized so a stopword's hottest group stays at
      // ~1/64 of its postings — the claim under test is that cost
      // tracks the token stream, not the hottest term
      evalAll(ops.Retrieval.shardedPostings(docs, "doc_id", "text",
        nSegments = 64, minDf = 3L))
    }
    time("bm25_topk") {
      ops.Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("dup", "vector", "merge"), k = 100).count()
    }
    time("phrase_search") {
      ops.Retrieval.phraseMatch(docs, "doc_id", "text",
        Seq("table", "hash"), k = 100).count()
    }
    time("kwic_snippets") {
      ops.Retrieval.kwicSnippets(docs, "doc_id", "text",
        Seq("table", "hash"), window = 3, k = 100).count()
    }
    time("bm25_batch") {
      import spark.implicits._
      val qs = (0 until 50).map(i => (i.toLong,
        Seq(Seq("dup", "vector"), Seq("merge", "join"),
          Seq("table", "hash"), Seq("scan", "filter"),
          Seq("spark", "stream"))(i % 5))).toDF("query_id", "terms")
      ops.Retrieval.bm25BatchTopK(docs, "doc_id", "text", qs, k = 20)
        .count()
    }
    time("corpus_diff") {
      // b-side: drop ~8%, revise ~6% — diff output stays small while
      // both full snapshots are fingerprinted and joined
      val a = docs
      val b = docs.filter(pmod(col("doc_id"), lit(13)) =!= 5)
        .select(col("doc_id"), when(pmod(col("doc_id"), lit(17)) === 2,
          concat(col("text"), lit(" rev2"))).otherwise(col("text"))
          .as("text"))
      evalAll(ops.Corpus.corpusDiff(a, b, "doc_id", "text"))
    }
    locally {
      val emb = multiplied(Tables.embeddings(spark, dir)
        .select("vec_id", "embedding"), "vec_id").cache()
      println(s"[scaleprobe] embeddings xmult = ${emb.count()}")
      val model = ops.Embeddings.pqFit(emb, "vec_id", "embedding",
        m = 4, k = 16)
      time("pq_encode") {
        // projection again: hash-fold the code arrays so pruning
        // cannot skip the m argmins
        evalAll(ops.Embeddings.pqEncode(model, emb, "vec_id", "embedding"))
      }
      time("pq_topk_rerank") {
        ops.Embeddings.pqTopKRerank(model, emb,
          emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, shortlist = 50).count()
      }
      time("cluster_balanced_sample") {
        val ivf = ops.Embeddings.ivfFit(emb, "vec_id", "embedding", 16)
        ops.Sampling.clusterBalancedSample(ivf, emb, "vec_id",
          "embedding", 200L, "probe").count()
      }
      emb.unpersist()
    }
    }

    section("sidxsink") {
    // search-index append sink over many batches: per-batch cost must
    // track BATCH size (appendToSearchIndex reads nothing but the
    // one-row stats head), and compaction must fold the accumulated
    // b= tail without changing search results while cutting the files
    // a query's pruned scan enumerates.
    locally {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_probe_sidx").toString
      val idx = s"$tmp/idx"
      val seed = docs.limit(mult * 100)
      ops.Retrieval.writeSearchIndex(seed, "doc_id", "text", idx,
        nBuckets = 64)
      val nB = 60; val rowsPer = 20
      val mem = MemoryStream[(Long, String)]
      val q = streaming.Ingest.startSearchIndexAppendSink(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", idx,
        s"$tmp/cp")
      val times = try {
        (1 to nB).map { b =>
          mem.addData((0 until rowsPer).map { r =>
            (b.toLong * 1000000 + r) ->
              s"fresh batch $b doc $r spark shuffle join vector dup"
          }: _*)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
      } finally q.stop()
      def win(s: Seq[Double], from: Int, until: Int) =
        s.slice(from, until).sum / (until - from)
      val (early, late) = (win(times, 5, 25), win(times, nB - 20, nB))
      val terms = Seq("dup", "vector", "merge")
      def search() = {
        val t0 = System.nanoTime()
        val rows = ops.Retrieval.bm25IndexTopK(spark, idx, "doc_id",
          terms, k = 100).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        (rows, (System.nanoTime() - t0) / 1e9)
      }
      val (preRows, preT) = search()
      ops.Retrieval.compactSearchIndex(spark, idx, upTo = nB.toLong)
      val (postRows, postT) = search()
      assert(preRows == postRows, "compaction changed search results")
      assert(late <= early * 1.5 + 0.3,
        f"append cost grew with stream age: early=$early%.3f late=$late%.3f")
      println(f"[scaleprobe] sidx_sink $nB batches x $rowsPer docs: " +
        f"append early=$early%.3f s late=$late%.3f s; search " +
        f"pre-compact=$preT%.2f s post-compact=$postT%.2f s " +
        f"(watermark ${ops.Retrieval.searchWatermark(spark, idx)})")
    }
    }

    section("retq") {
    // retrieval-quality family at xmult. PRF is the only op here that
    // touches the corpus (three early-filtered passes — measured
    // against the single-pass bm25 baseline, the multiple is the
    // price of expansion); RRF fusion and MMR are post-candidate and
    // must cost |queries|*k work on top of the arms that feed them.
    import spark.implicits._
    time("prf_expand") {
      ops.Retrieval.prfExpand(docs, "doc_id", "text",
        Seq("table", "hash"), k = 100).count()
    }
    time("bm25_single_baseline") {
      ops.Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("table", "hash"), k = 100).count()
    }
    locally {
      // the index-probe twin: once the index exists, both PRF rounds
      // are bucket-pruned probes and mining is one postings pass —
      // expansion cost must track the INDEX probe, not the corpus
      val prfIdx = java.nio.file.Files
        .createTempDirectory("graft_probe_prf").toString + "/idx"
      time("prf_index_build") {
        ops.Retrieval.writeSearchIndex(docs, "doc_id", "text", prfIdx,
          nBuckets = 64)
        0L
      }
      time("prf_index_expand") {
        ops.Retrieval.prfIndexTopK(spark, prfIdx, "doc_id",
          Seq("table", "hash"), k = 100).count()
      }
    }
    val emb = multiplied(Tables.embeddings(spark, dir)
      .select("vec_id", "embedding"), "vec_id").cache()
    println(s"[scaleprobe] embeddings x$mult = ${emb.count()}")
    val qs = (0 until 50).map(i => (i.toLong,
      Seq(Seq("dup", "vector"), Seq("merge", "join"),
        Seq("table", "hash"), Seq("scan", "filter"),
        Seq("spark", "stream"))(i % 5))).toDF("query_id", "terms")
    val sparse = ops.Retrieval.bm25BatchTopK(docs, "doc_id", "text",
        qs, k = 20)
      .select(col("query_id"), col("doc_id"), col("rnk")).cache()
    val dense = ops.Embeddings.lshTopK(emb,
        emb.filter(col("vec_id") < 50), "vec_id", "embedding", 8, 64, 20)
      .select(col("query_id"), col("corpus_id").as("doc_id"),
        col("rnk")).cache()
    time("hybrid_arms") { sparse.count() + dense.count() }
    time("rrf_fuse_only") {
      // arms cached above: this isolates the fusion stage itself,
      // which must be candidate-scale (50 queries x 20+20 rows)
      ops.Retrieval.rrfFuse(Seq(sparse, dense), k = 10).count()
    }
    time("mmr_rerank_100cand") {
      // 50 queries x 100 candidates: |q| bounded greedy tasks of
      // <= n*k quantized-integer cosines each — corpus never enters
      val cand = ops.Embeddings.lshTopK(emb,
          emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          8, 64, 100)
        .select(col("query_id"), col("corpus_id").as("doc_id"),
          ((lit(101) - col("rnk")) * lit(10000L)).as("rel_u"))
        .join(emb.select(col("vec_id").as("doc_id"),
          col("embedding")), "doc_id")
      ops.Retrieval.mmrRerank(cand, "embedding", k = 10).count()
    }
    }

    section("analytics") {
    // product-analytics family at xmult over multiplied events: all
    // three must track the event count (hash aggs / one lag window /
    // k-1 user-key joins), with no all-pairs or driver loop anywhere
    val ev = multiplied(Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value"),
      "user_id").cache()
    println(s"[scaleprobe] events x$mult = ${ev.count()}")
    time("retention_cohorts") {
      ops.Analytic.retentionCohorts(ev, "user_id", "ts").count()
    }
    time("funnel_3step") {
      ops.Analytic.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 7L * 86400).count()
    }
    time("event_transitions") {
      ops.Analytic.eventTransitions(ev, "user_id", "ts",
        "event_type", "event_id").count()
    }
    time("interpolate_gaps") {
      ops.TimeBuckets.interpolateGaps(ev, "event_type", "ts",
        "value", 900L).count()
    }
    }

    section("checks") {
    // the one-pass claim, measured: adding row-local checks must cost
    // a column, not a scan — 8 checks within noise of 1 on the same
    // multiplied lineitem. unique/FK carry their own (audited) shapes.
    val li = multiplied(Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag"), "l_orderkey").cache()
    println(s"[scaleprobe] lineitem x$mult = ${li.count()}")
    def allChecks = Seq(
      ops.Checks.notNull("l_quantity"), ops.Checks.notNull("l_discount"),
      ops.Checks.notNull("l_returnflag"), ops.Checks.notNull("l_linenumber"),
      ops.Checks.inRange("l_quantity", 1.0, 50.0),
      ops.Checks.inRange("l_discount", 0.0, 0.05),
      ops.Checks.accepted("l_returnflag", Seq("A", "N")),
      ops.Checks.accepted("l_returnflag", Seq("A", "N", "R")))
    time("row_checks_1") {
      ops.Checks.rowChecks(li, allChecks.take(1)).count()
    }
    time("row_checks_8") {
      ops.Checks.rowChecks(li, allChecks).count()
    }
    time("unique_composite") {
      ops.Checks.unique(li, Seq("l_orderkey", "l_linenumber"),
        "li.(ok,ln)").count()
    }
    time("fk_anti_join") {
      ops.Checks.foreignKey(li, "l_orderkey",
        multiplied(Tables.orders(spark, dir).select("o_orderkey"),
          "o_orderkey"), "o_orderkey", "li->o").count()
    }
    }

    section("span") {
    // the substring-duplication family in a CLEAN session (the full
    // text sweep runs these after simhash's 78M-pair fixture, whose
    // heap residue swings them 2-5x — see the bench-variance notes)
    time("dup_span_stats") {
      ops.TextDedup.dupSpanStats(docs, "doc_id", "text", 3).count()
    }
    time("remove_dup_spans") {
      ops.TextDedup.removeDupSpans(docs, "doc_id", "text", 3)
        .filter(col("n_tokens_kept") >= 0L).count()
    }
    }

    section("sampling") {
    // source-shaping at scale: temperature's waterfill frame stays
    // source-cardinality-sized (the corpus pass is a map-only filter),
    // and sourceCap's ranked path shuffles ONLY over-cap sources' rows.
    // The id-shifted multiply makes dom sizes pathological on purpose:
    // sqrt is flat at 1e7, so each shifted copy collapses its 5k ids
    // into a couple of huge domains (the over-cap ranked path), while
    // the base copy spreads across ~70 small ones (the anti-join
    // passthrough) — both paths carry real weight.
    val dd = multiplied(Tables.documents(spark, dir)
      .select("doc_id", "n_chars"), "doc_id")
      .withColumn("dom",
        when(pmod(col("doc_id"), lit(7)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("d"),
            floor(sqrt(col("doc_id").cast("double"))).cast("string"))))
      .cache()
    println(s"[scaleprobe] documents x$mult = ${dd.count()}")
    time("temperature_a05") {
      ops.Sampling.temperature(dd, "dom", "doc_id", 0.5, 0.5, "probe")
        .count()
    }
    time("temperature_a03") {
      ops.Sampling.temperature(dd, "dom", "doc_id", 0.3, 0.3, "probe")
        .count()
    }
    time("source_cap") {
      ops.Sampling.sourceCap(dd, "dom", "n_chars", "doc_id", 200).count()
    }
    time("mix_sources") {
      ops.Sampling.mixSources(dd, "dom", "doc_id",
        Map("d3162" -> 2.5), defaultWeight = 0.5, seed = "probe").count()
    }
    dd.unpersist()
    }

    section("jaccard") {
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
      // containment audit: the one-sided variant keeps only the
      // contained side's prefix but must index the container side in
      // full, so its candidate reduction is bounded by the prefix
      // fraction (~1-minC) rather than the two-sided product — measure
      // the actual ratio and that the lemma holds (no true pair lost)
      var trueCont = 0L
      time("containment_guarded") {
        trueCont = ops.TextDedup.containmentPairs(docs, "doc_id", "text",
          3, 0.9, maxShingleDocFreq = Some(500L)).count()
        trueCont
      }
      val contCand = ops.TextDedup.containmentCandidates(sh, "doc_id", 0.9)
        .count()
      val naiveDir = naive * 2 // directed co-occurrence pairs
      println(s"[scaleprobe] containment candidate audit at x$mult: " +
        s"one-sided candidates=$contCand vs naive directed=$naiveDir " +
        s"(${if (naiveDir > 0) "%.1f%%".format(100.0 * contCand / naiveDir) else "-"}); " +
        s"true directed pairs=$trueCont")
      assert(contCand >= trueCont,
        "one-sided prefix lost qualifying pairs — containment lemma violated")
    }
    }

    section("contamination") {
    // contamination at a benchmark too big to broadcast EXACTLY — the
    // bloom-guarded path's reason to exist. The benchmark is the even-id
    // half of the base docs (so the assessed corpus is ~half
    // contaminated) plus mult-1 token-salted copies of all of them
    // (salting every token makes each copy's shingles DISTINCT — an
    // id-shifted union would collapse to the base set under distinct()
    // and measure nothing). Compare the exact-broadcast probe against
    // the bloom-guarded one on: what the driver ships (broadcast
    // payload vs bloom bits), what survives to the exact semi-join
    // (full hash stream vs bloom candidates), bytes shuffled, wall
    // time — and assert the outputs are row-identical (a bloom has no
    // false negatives; the exact confirm removes its false positives).
    locally {
      val baseDocs = Tables.documents(spark, dir).select("doc_id", "text")
      // assessed corpus: even-id docs verbatim (truly contaminated) +
      // odd-id docs with every token salted "q" (shingles guaranteed
      // outside the benchmark — the synthetic fixture's docs share so
      // much vocabulary that an unsalted odd half is ~fully covered by
      // the even half's shingles, and the pre-filter would correctly
      // prune nothing)
      val assessed = baseDocs.filter(col("doc_id") % 2 === 0).union(
        baseDocs.filter(col("doc_id") % 2 === 1).select(col("doc_id"),
          regexp_replace(col("text"), "(\\S+)", "$1q").as("text")))
      val bench = (1 until mult).map { i =>
        baseDocs.filter(col("doc_id") % 2 === 0).select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1s$i").as("text"))
      }.foldLeft(baseDocs.filter(col("doc_id") % 2 === 0))(_ union _)
      val benchHashes = ops.TextDedup.benchmarkHashSet(bench, "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nBench = benchHashes.count()
      val streamRows = ops.TextDedup
        .shingleHashes(assessed, "doc_id", "text", 3).count()
      val bloom = benchHashes.stat.bloomFilter("sh_h", nBench, 0.01)
      val candRows = ops.TextDedup
        .shingleHashes(assessed, "doc_id", "text", 3)
        .filter(graft.functions.BloomMightContainLong.mightContain(
          col("sh_h"), spark.sparkContext.broadcast(bloom))).count()
      // collect() so the metrics land on THESE frames' executions
      // (count() runs its own plan and leaves the frame's metrics empty)
      val exact = ops.TextDedup.contaminationAgainst(
        assessed, "doc_id", "text", 3, broadcast(benchHashes))
      time("contamination_exact_bcast") { exact.collect().length.toLong }
      val exactBcastBytes = util.PlanMetrics.metricSum(exact, "dataSize")
      val exactShuffle = util.PlanMetrics
        .metricSum(exact, "shuffleBytesWritten")
      val guarded = ops.TextDedup.contaminationBloomGuarded(
        assessed, "doc_id", "text", 3, benchHashes, nBench, 0.01)
      time("contamination_bloom") { guarded.collect().length.toLong }
      val guardShuffle = util.PlanMetrics
        .metricSum(guarded, "shuffleBytesWritten")
      println(f"[scaleprobe] contamination x$mult benchmark: " +
        f"$nBench%d bench hashes (exact broadcast ${exactBcastBytes / 1048576.0}%.1f MB " +
        f"vs bloom ${bloom.bitSize() / 8 / 1048576.0}%.1f MB); " +
        f"semi-join input $streamRows%d hash rows exact vs $candRows%d " +
        f"bloom candidates (${100.0 * candRows / streamRows}%.1f%%); " +
        f"shuffle ${exactShuffle / 1048576.0}%.2f MB exact vs " +
        f"${guardShuffle / 1048576.0}%.2f MB bloom")
      assert(exact.exceptAll(guarded).count() == 0 &&
        guarded.exceptAll(exact).count() == 0,
        "bloom-guarded contamination diverged from the exact-broadcast path")
      // the pre-filter must prune the non-contaminated half (minus fp)
      assert(candRows < streamRows,
        s"bloom pre-filter pruned nothing: $candRows of $streamRows")
      benchHashes.unpersist()
    }
    }

    section("ann") {
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
    }

    section("snapshot") {
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
    }

    section("linehot") {
    // hot-key probe for dedupLines: the motivating workload is ONE
    // boilerplate line (cookie banner / nav bar) repeated once per
    // document corpus-wide — at mult=30 that is a single md5 key with
    // ~150k repeats. The win condition is a FLAT task-time profile:
    // the min(struct) winner rule partial-aggregates map-side, so the
    // hot key reaches the reducer as one row per map partition; the
    // old row_number window funneled the whole repeat group into one
    // task's sort. Assert max task time stays within a small factor of
    // the median across every stage of the job.
    locally {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
      val durs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
          durs.add(te.taskInfo.duration); ()
        }
      }
      val boiler = docs.withColumn("text",
        concat(lit("This site uses cookies. ACCEPT | DECLINE\n"),
          coalesce(col("text"), lit(""))))
      spark.sparkContext.addSparkListener(listener)
      try time("dedup_lines_hotkey") {
        ops.TextDedup.dedupLines(boiler, "doc_id", "text").count()
      } finally spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val d = durs.asScala.toSeq.sorted
      val (p50, mx) = (d(d.size / 2), d.last)
      println(s"[scaleprobe] dedup_lines_hotkey tasks=${d.size} " +
        s"p50=${p50}ms max=${mx}ms")
      assert(mx <= p50 * 10 + 2000,
        s"hot-line task skew: p50=${p50}ms max=${mx}ms")
    }
    }

    section("ldsink") {
    // streaming line-dedup sink over MANY batches AGAINST A LARGE
    // SEEDED INDEX: batch 0 admits mult x 10_000 distinct lines, then
    // ~100 small batches (mostly fresh lines + boilerplate repeats)
    // measure the per-trigger cost curve. The round-10 finding: the
    // unguarded form anti-joins every batch against the FULL cumulative
    // index, so per-batch cost carries corpus history; the bloom guard
    // must keep it tracking batch size (flat curve) while the index
    // keeps growing.
    locally {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val nB = 100; val rowsPer = 10; val linesPer = 20
      val seedDocs = mult * 100 // x 20 lines = mult x 2000 seed lines
      def run(guard: Boolean): (Seq[Double], Long) = {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_probe_ld").toString
        val mem = MemoryStream[(Long, String)]
        val q = streaming.Ingest.startLineDedupSink(
          mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
          s"$tmp/out", s"$tmp/idx", s"$tmp/cp", compactEvery = 10,
          // bloom sized ~10x the probe's line horizon — the documented
          // sizing contract (a filter sized for an unreachable corpus
          // only buys dead IO per commit)
          bloomGuard = guard, expectedLines = 1000000L, fpp = 0.001,
          prefixParts = 256)
        val times = try {
          // seed batch: the corpus-history bulk of the index
          mem.addData((0 until seedDocs).map { d =>
            d.toLong -> (0 until linesPer)
              .map(l => s"seed line $d $l").mkString("\n")
          }: _*)
          q.processAllAvailable()
          (1 to nB).map { b =>
            val rows = (0 until rowsPer).map { r =>
              val id = b.toLong * 1000000 + r
              // mostly fresh lines (index growth) + 2 repeats: one
              // seed boilerplate, one from the previous batch
              id -> ((0 until linesPer - 2)
                .map(l => s"fresh $id $l").mkString("\n") +
                s"\nseed line ${r % seedDocs} 0" +
                s"\nfresh ${math.max(1, b - 1).toLong * 1000000 + r} 0")
            }
            mem.addData(rows: _*)
            val t0 = System.nanoTime()
            q.processAllAvailable()
            (System.nanoTime() - t0) / 1e9
          }
        } finally q.stop()
        // layout-aware read: the guarded index mixes flat tails with a
        // p=-partitioned base (plain parquet read conflicts)
        val idxRows = streaming.Ingest
          .readLineIndex(spark, s"$tmp/idx")
          .map(_.count()).getOrElse(0L)
        (times, idxRows)
      }
      def win(s: Seq[Double], from: Int, until: Int) =
        s.slice(from, until).sum / (until - from)
      val (tG, nG) = run(guard = true)
      val (tU, nU) = run(guard = false)
      val (ge, gl) = (win(tG, 5, 25), win(tG, nB - 20, nB))
      val (ue, ul) = (win(tU, 5, 25), win(tU, nB - 20, nB))
      println(f"[scaleprobe] linededup_sink $nB batches x $rowsPer docs " +
        f"on a ${nG}%d-line index: guarded early=$ge%.3f s late=$gl%.3f s; " +
        f"unguarded early=$ue%.3f s late=$ul%.3f s (index rows $nG/$nU)")
      assert(nG == nU, s"guard changed the admitted set: $nG vs $nU")
      assert(gl <= ge * 1.5 + 0.3,
        f"guarded per-batch time grew with stream age: " +
          f"early=$ge%.3f late=$gl%.3f")
    }
    }

    section("ldprobe") {
    // the guard's scale claim, isolated: per-batch PROBE cost against
    // fabricated indexes of 1M / 3M / 10M admitted lines (built
    // offline via rebuildLineDedupGuard — base + bloom, the steady
    // state of a long-running sink). A fixed 200-line batch (half
    // repeats, half fresh) probes each: the unguarded anti-join must
    // scan the whole index (cost grows with corpus history); the
    // guarded path reads only the bloom-positive residue's pruned
    // base partitions (cost tracks batch content). The bloom itself
    // is read once (the sink caches it across triggers).
    locally {
      val batchLines = 200
      for (m <- Seq(1, 3, 10)) {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"graft_probe_lp$m").toString
        val idx = s"$tmp/idx"
        spark.range(m * 1000000L)
          .select(unhex(md5(concat(lit("line"), col("id")))).as("_h"))
          .write.parquet(s"$idx/b=0")
        streaming.Ingest.rebuildLineDedupGuard(spark, idx,
          expectedLines = 20000000L, fpp = 0.001, prefixParts = 256)
        val bloom = streaming.Ingest.readLineBloom(spark, idx, below = 1L)
        val fib = spark.range(batchLines.toLong)
          .select(col("id").as("doc_id"),
            when(col("id") < batchLines / 2,
              concat(lit("line"), col("id")))
              .otherwise(concat(lit("fresh"), col("id"))).as("line"))
          .withColumn("pos", lit(0))
          .withColumn("_h", unhex(md5(col("line").cast("binary"))))
          .withColumn("_h64", streaming.Ingest.h64FromMd5(col("_h")))
          .withColumn("p", pmod(col("_h64"), lit(256)).cast("int"))
        def bestOf(k: Int)(body: => Long): Double =
          (1 to k).map { _ =>
            val t0 = System.nanoTime(); body
            (System.nanoTime() - t0) / 1e9
          }.min
        val admitted = streaming.Ingest
          .lineDedupAdmit(spark, idx, 1L, fib, bloom)
        // collect(), not count(): metrics live on THIS queryExecution
        // (count() builds its own aggregate plan and leaves these unfilled)
        val nAdm = admitted.collect().length
        val filesRead = util.PlanMetrics.filesReadUnder(admitted, idx)
        val g = bestOf(3)(streaming.Ingest
          .lineDedupAdmit(spark, idx, 1L, fib, bloom).count())
        val u = bestOf(3)(fib.join(
            streaming.Ingest.readLineIndex(spark, idx).get,
            Seq("_h"), "left_anti").count())
        println(f"[scaleprobe] ldprobe index=${m}M lines: " +
          f"guarded=$g%.2f s ($filesRead base files read, " +
          f"$nAdm admitted) unguarded=$u%.2f s")
        assert(nAdm == batchLines / 2, s"admitted $nAdm")
      }
    }
    }

    section("ndprobe") {
    // growth curve of the near-dup filter sink's cumulative band index
    // (the round-10 "measure first" item): per-batch collision probe
    // cost against fabricated indexes of 1M / 3M / 10M admitted docs
    // (4 band rows each — the index grows 4 rows/doc vs the line
    // index's tens-to-hundreds, so the bend arrives ~2 orders later
    // in corpus terms). Fixed 20-doc batch, half colliding.
    locally {
      for (m <- Seq(1, 3, 10)) {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"graft_probe_np$m").toString
        val idx = s"$tmp/idx"
        spark.range(m * 1000000L)
          .select(col("id"), explode(sequence(lit(0), lit(3))).as("band"))
          .select(col("band"),
            ops.TextDedup.md5Hash60(
              concat(col("id"), lit("b"), col("band"))).as("band_h"))
          .write.parquet(s"$idx/b=0")
        val keys = spark.range(20L)
          .select(col("id").as("doc_id"),
            explode(sequence(lit(0), lit(3))).as("band"))
          .select(col("doc_id"), col("band"),
            ops.TextDedup.md5Hash60(concat(
              when(col("doc_id") < 10, col("doc_id"))
                .otherwise(col("doc_id") + 900000000L),
              lit("b"), col("band"))).as("band_h"))
        def bestOf(k: Int)(body: => Long): Double =
          (1 to k).map { _ =>
            val t0 = System.nanoTime(); body
            (System.nanoTime() - t0) / 1e9
          }.min
        val tu = bestOf(3) {
          val prior = io.Batches.read(spark, idx).get
          keys.join(prior.select("band", "band_h"),
              Seq("band", "band_h"), "left_semi")
            .select(col("doc_id")).distinct().count()
        }
        // guard the same index in place (offline rebuild: p= base +
        // full bloom), then measure the guarded collision probe with
        // the bloom in hand (the sink's cached steady state)
        streaming.Ingest.rebuildNearDupGuard(spark, idx,
          expectedKeys = m * 8000000L, fpp = 0.001, prefixParts = 256)
        val bv = io.BloomState
          .latestVersionBefore(spark, s"$idx/_bloom", 1L).get
        val bloom = Some(io.BloomState.read(spark, s"$idx/_bloom", bv))
        val tg = bestOf(3)(streaming.Ingest
          .nearDupPriorHits(spark, idx, 1L, keys, "doc_id", bloom, 256)
          .count())
        println(f"[scaleprobe] ndprobe index=${m}M docs " +
          f"(${m * 4}M band rows): per-batch collision probe " +
          f"unguarded=$tu%.2f s guarded=$tg%.2f s")
      }
    }
    }

    section("ndsink") {
    // streaming near-dup sink over MANY batches: the per-trigger cost
    // must stay FLAT over the stream's life. Without compaction the
    // index accumulates one b= dir per micro-batch and every trigger
    // enumerates and reads ALL of them (O(completed batches) listing);
    // with compactEvery=10 the listing is bounded and per-batch wall
    // time must not trend up. Unique synthetic texts per doc: the index
    // grows by ~every admitted doc, the worst case for the read path.
    locally {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val nB = 200; val rowsPer = 20
      def run(compactEvery: Int,
              horizonSec: Long = 0L): (Seq[Double], Int, Long) = {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_probe_nd").toString
        val mem = MemoryStream[(Long, String)]
        var clk = 0L // injected clock: 10 s per micro-batch
        val q = streaming.Ingest.startNearDupFilterSink(
          mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
          s"$tmp/out", s"$tmp/idx", s"$tmp/cp",
          compactEvery = compactEvery,
          horizonSec = horizonSec, clock = () => clk)
        val times = try {
          (0 until nB).map { b =>
            clk = b.toLong * 10L
            val rows = (0 until rowsPer).map { r =>
              val id = b.toLong * 1000 + r
              id -> (s"probe document $id carrying tokens a${id * 7 % 9973} " +
                s"b${id * 13 % 9973} c${id * 17 % 9973} d${id * 19 % 9973} " +
                s"e${id * 23 % 9973} tail$id")
            }
            mem.addData(rows: _*)
            val t0 = System.nanoTime()
            q.processAllAvailable()
            (System.nanoTime() - t0) / 1e9
          }
        } finally q.stop()
        val dirs = io.Fs.listDirNames(spark, s"$tmp/idx")
          .count(_.startsWith("b="))
        val idxRows = streaming.Ingest.readNearDupIndex(spark, s"$tmp/idx")
          .map(_.count()).getOrElse(0L)
        (times, dirs, idxRows)
      }
      val (tPlain, dPlain, rPlain) = run(0)
      val (tComp, dComp, rComp) = run(10)
      // horizon = 300 s of a 10 s/batch stream: the at-rest index must
      // be bounded by the ~30-batch live window (plus uncompacted
      // tails), not by the 200-batch corpus history
      val (_, _, rHz) = run(10, horizonSec = 300L)
      def win(s: Seq[Double], from: Int, until: Int) =
        s.slice(from, until).sum / (until - from)
      val (pe, pl) = (win(tPlain, 5, 25), win(tPlain, nB - 20, nB))
      val (ce, cl) = (win(tComp, 5, 25), win(tComp, nB - 20, nB))
      println(f"[scaleprobe] neardup_sink $nB batches x $rowsPer docs: " +
        f"uncompacted early=$pe%.3f s late=$pl%.3f s ($dPlain index dirs); " +
        f"compactEvery=10 early=$ce%.3f s late=$cl%.3f s ($dComp index dirs)")
      println(f"[scaleprobe] neardup_sink index rows at rest: " +
        f"unbounded=$rPlain compacted=$rComp horizon300s=$rHz " +
        f"(live window ~30 of $nB batches)")
      assert(dComp <= 12,
        s"compaction not bounding the index layout: $dComp dirs")
      assert(cl <= ce * 2.0 + 0.3,
        f"compacted per-batch time grew with stream age: early=$ce%.3f late=$cl%.3f")
      assert(rHz * 3 < rPlain,
        s"horizon did not bound at-rest index rows: $rHz vs $rPlain")
    }
    }

    // embedding near-dup sink: the exact-verify design is immune to
    // false drops, but its per-trigger COST is governed by band-bucket
    // occupancy — at 2^8 keys per band the buckets saturate as the
    // admitted set grows and the verify-join fan-out trends O(admitted)
    // per batch; at 2^15 keys occupancy stays sparse and the cost flat.
    // Deterministically-seeded random unit vectors (worst case: nothing
    // is a near-dup, everything is admitted, the index only grows).
    section("embsink") {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val nB = 100; val rowsPer = 50; val d = 16
      def run(planesPerBand: Int): (Seq[Double], Long, Long) = {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_probe_emb").toString
        val rnd = new scala.util.Random(42)
        def mkRows(b: Int) = (0 until rowsPer).map { r =>
          (b.toLong * 1000 + r, Seq.fill(d)(rnd.nextGaussian()))
        }
        val mem = MemoryStream[(Long, Seq[Double])]
        val q = streaming.Ingest.startEmbeddingNearDupFilterSink(
          mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
          s"$tmp/out", s"$tmp/idx", s"$tmp/cp", dim = d,
          planesPerBand = planesPerBand, compactEvery = 10)
        val times = try {
          (0 until nB).map { b =>
            mem.addData(mkRows(b): _*)
            val t0 = System.nanoTime()
            q.processAllAvailable()
            (System.nanoTime() - t0) / 1e9
          }
        } finally q.stop()
        // the quantity that grows with the admitted set: how many
        // (batch-row, index-row) collisions the NEXT batch's verify
        // join would have to exact-score
        val idx = io.Batches.read(spark, s"$tmp/idx", None).get
        val probe = ops.Embeddings.signBandKeys(
          mkRows(nB).toDF("vec_id", "embedding"),
          "vec_id", "embedding", d, planesPerBand, 4)
        val fanOut = probe.join(
          idx.select(col("band"), col("key")), Seq("band", "key")).count()
        val admitted = spark.read.parquet(s"$tmp/out").count()
        (times, fanOut, admitted)
      }
      def win(s: Seq[Double], from: Int, until: Int) =
        s.slice(from, until).sum / (until - from)
      Seq(8, 15).foreach { ppb =>
        val (t, fanOut, admitted) = run(ppb)
        println(f"[scaleprobe] embsink $nB batches x $rowsPer vecs " +
          f"planesPerBand=$ppb: early=${win(t, 5, 25)}%.3f s " +
          f"late=${win(t, nB - 20, nB)}%.3f s per batch; " +
          f"$admitted admitted, next-batch verify fan-out=$fanOut " +
          f"(${fanOut.toDouble / rowsPer}%.0f exact cosines per new vector)")
      }
    }

    section("ndaudit") {
    // streaming near-dup RECALL audit at sf scale: stream the real
    // documents through the sink, then measure the false-drop rate —
    // dropped docs with NO true near-dup partner (jaccard >= 0.8)
    // anywhere in the corpus are band-collision accidents, the price of
    // the sink's no-exact-verify design.
    locally {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val baseDocs = Tables.documents(spark, dir).select("doc_id", "text")
      val rows = baseDocs.collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSeq
      // two banding operating points: the r=4 default fires with
      // ~10% probability even at jaccard 0.4, so a low-overlap corpus
      // pays real false drops; r=8 (k=32) cuts the low-similarity
      // collision rate ~40x while keeping true-dup recall — the lever
      // a deployment turns when the audit's rate is too high
      Seq((16, 4), (32, 4)).foreach { case (k, bands) =>
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_probe_nd_audit").toString
        val mem = MemoryStream[(Long, String)]
        val q = streaming.Ingest.startNearDupFilterSink(
          mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
          s"$tmp/out", s"$tmp/idx", s"$tmp/cp", k = k, bands = bands)
        try rows.grouped(math.max(1, rows.size / 10)).foreach { chunk =>
          mem.addData(chunk: _*); q.processAllAvailable()
        } finally q.stop()
        val audit = streaming.Ingest.nearDupDropAudit(
          baseDocs, s"$tmp/out", "doc_id", "text", 3, 0.8).cache()
        val dropped = audit.count()
        val falseDrops = audit.filter(col("has_near_dup") === 0L).count()
        audit.unpersist()
        println(f"[scaleprobe] neardup_sink recall audit k=$k bands=$bands: " +
          f"${rows.size} docs streamed, $dropped dropped, " +
          f"$falseDrops false drops at τ=0.8 (" +
          f"${if (dropped > 0) 100.0 * falseDrops / dropped else 0.0}%.1f%% of drops, " +
          f"${100.0 * falseDrops / rows.size}%.2f%% of corpus)")
      }
    }
    }

    section("events") {
    val ev = multiplied(Tables.events(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp")), "event_id").cache()
    println(s"[scaleprobe] events x$mult = ${ev.count()}")
    time("history_buckets") {
      ops.TimeBuckets.history(ev, "ts", "value", 900, "HH:mm").count()
    }
    time("predict_pattern") {
      ops.Predict.hourlyPattern(ev, "user_id", "ts", "value").count()
    }
    // the closed-form model: event-scale work is the ONE daily-partial
    // aggregation; everything after (slot labels, 9 sums, Cramer,
    // score join) runs at slot/key cardinality — must track events
    // linearly with a flat tail
    time("ml_slot_lr_train_predict") {
      ml.SlotRegression.predictU6(ev, "user_id", "ts", "value").count()
    }
    time("ml_lr_fit_stats") {
      ml.SlotRegression.fitStatsU6(ev, "user_id", "ts", "value").count()
    }
    }

    // ts_* family: the scale axis that matters is KEY cardinality (the
    // per-key window sort is the one unavoidable shuffle), so multiply
    // user_id, not event density — x30 at sf0.1 gives 45k series over
    // the full 720-bucket spine (32M dense grid rows for the decompose)
    section("forecast") {
    val evK = {
      val base = Tables.events(spark, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
      (0 until mult).map { i =>
        base.withColumn("user_id", col("user_id") + lit(i.toLong * 10000000L))
      }.reduce(_ union _).cache()
    }
    println(s"[scaleprobe] events (key-shifted) x$mult = ${evK.count()}")
    // toRdd.count(), NOT count(): a bare count() lets Catalyst prune
    // the window + index join entirely (a left join on unique keys
    // with no referenced columns is eliminated), which times the spine
    // instead of the operator
    time("seasonal_decompose") {
      ops.Forecast.seasonalDecompose(evK, "user_id", "ts", "value")
        .queryExecution.toRdd.count()
    }
    time("forecast_next_day") {
      ops.Forecast.forecastNextBuckets(evK, "user_id", "ts", "value")
        .queryExecution.toRdd.count()
    }
    time("ewma_smooth") {
      ops.Forecast.ewmaSmooth(evK, "user_id", "ts", "value")
        .queryExecution.toRdd.count()
    }
    time("cusum_changepoints") {
      ops.Forecast.cusumChangepoints(evK, "user_id", "ts", "value")
        .queryExecution.toRdd.count()
    }
    // the 48-lag ACF family: one window sort per key + map-side lag
    // explode, |keys|·48 partials before the only shuffle — the
    // heaviest bench query, so its curve matters most at x100
    time("acf_48lags") {
      ops.Forecast.acf(evK, "user_id", "ts", "value", 3600L, 48)
        .queryExecution.toRdd.count()
    }
    time("dominant_period") {
      ops.Forecast.dominantPeriod(evK, "user_id", "ts", "value", 3600L, 48)
        .queryExecution.toRdd.count()
    }
    evK.unpersist()
    }

    // Misra-Gries vs exact groupBy at the same task: the sketch's win
    // is the shuffle (≤2·cap summary entries per map task vs one
    // partial per distinct shingle); wall-clock parity at x-scale plus
    // result equality in the exact regime is what the probe pins
    section("sketch") {
    docs
    time("mg_heavy_shingles") {
      ops.Sketches.heavyShingles(docs, "text", 3, 1 << 16, 40).count()
    }
    time("exact_groupby_topk") {
      import org.apache.spark.sql.expressions.Window
      val sh = docs.select(explode(ops.TextDedup.shingleArray(
        ops.TextDedup.tokens(col("text")), 3)).as("shingle"))
      sh.groupBy("shingle").count()
        .orderBy(col("count").desc, col("shingle")).limit(40).count()
    }
    }

    // fuzzy join: candidate-vs-naive ratio at a gram-diverse domain —
    // the lemma's pruning leverage measured, then the verified output
    section("fuzzy") {
    // SPARK_GRAFT_FUZZY_Q: the gram-size dial. The md5-hex domain has
    // |Σ|^q gram values (16^4 = 65k, 16^6 = 16.7M) — candidates on an
    // alphabet-limited RANDOM corpus scale ~n²/|Σ|^q, so past ~100k
    // strings q=4 goes quadratic BY THE DOCUMENTED MATH; unset, the
    // probe now exercises the AUTO dial (FuzzyJoin.autoQ derives q
    // from corpus size vs alphabet — the round-13 verdict's ask), so
    // the ×100 run proves the hex corpus stays bounded with NO knob.
    val fqEnv = sys.env.get("SPARK_GRAFT_FUZZY_Q").map(_.toInt)
    val dom = {
      val d = multiplied(Tables.documents(spark, dir)
        .select("doc_id"), "doc_id")
      val h = md5(col("doc_id").cast("string").cast("binary"))
      val base = d.select(col("doc_id").cast("long").as("id"), h.as("s"))
      val mangled = d.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select((col("doc_id") + 1000000000L).cast("long").as("id"),
          concat(substring(h, 1, 1), substring(h, 3, 1),
            substring(h, 2, 1), h.substr(lit(4), length(h))).as("s"))
      base.union(mangled).cache()
    }
    val n = dom.count()
    val fq = fqEnv.getOrElse(ops.FuzzyJoin.autoQ(dom, "s", 2))
    println(s"[scaleprobe] fuzzy domain = $n (naive pairs = " +
      s"${n * (n - 1) / 2}); q = $fq" +
      (if (fqEnv.isEmpty) " (AUTO)" else " (env)"))
    time(s"fuzzy_candidates_q$fq") {
      ops.FuzzyJoin.candidates(dom, "id", "s", 2, fq).count()
    }
    time(s"fuzzy_self_pairs_q$fq") {
      ops.FuzzyJoin.selfPairs(dom, "id", "s", 2, fq).count()
    }
    dom.unpersist()
    // adversarial HOT-PREFIX corpus: every string shares the constant
    // "CAM-" prefix, so its grams have df = n — the round-12 verdict's
    // named scale-killer for all-grams blocking. Rare-first prefix
    // indexing must keep candidate counts tracking the planted-dup
    // count (linear in n), not n^2.
    val hot = {
      val d = multiplied(Tables.documents(spark, dir)
        .select("doc_id"), "doc_id")
      val h = concat(lit("CAM-"),
        md5(col("doc_id").cast("string").cast("binary")))
      val base = d.select(col("doc_id").cast("long").as("id"), h.as("s"))
      val mangled = d.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select((col("doc_id") + 1000000000L).cast("long").as("id"),
          concat(substring(h, 1, 5), substring(h, 7, 1),
            substring(h, 6, 1), h.substr(lit(8), length(h))).as("s"))
      base.union(mangled).cache()
    }
    val hn = hot.count()
    val hq = fqEnv.getOrElse(ops.FuzzyJoin.autoQ(hot, "s", 2))
    println(s"[scaleprobe] fuzzy HOT-PREFIX domain = $hn " +
      s"(naive pairs = ${hn * (hn - 1) / 2}); q = $hq" +
      (if (fqEnv.isEmpty) " (AUTO)" else " (env)"))
    time(s"fuzzy_hot_candidates_q$hq") {
      ops.FuzzyJoin.candidates(hot, "id", "s", 2, hq).count()
    }
    time(s"fuzzy_hot_self_pairs_q$hq") {
      ops.FuzzyJoin.selfPairs(hot, "id", "s", 2, hq).count()
    }
    hot.unpersist()
    }

    // interval overlap join at xN KEY cardinality (key-shifted users,
    // so the true pair count grows linearly — quadratic wall-clock
    // growth here would mean the blocking degenerated)
    section("interval") {
    val evI = {
      val base = Tables.events(spark, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("iv_s"),
          (unix_timestamp(col("ts")) + floor(col("value") * 60)
            .cast("long")).as("iv_e"))
      (0 until mult).map { i =>
        base.withColumn("user_id", col("user_id") + lit(i.toLong * 10000000L))
      }.reduce(_ union _).cache()
    }
    println(s"[scaleprobe] intervals (key-shifted) x$mult = ${evI.count()}")
    val aI = evI.filter(col("event_type").isin("view", "click"))
    val bI = evI.filter(col("event_type") === "error")
    time("interval_overlap_join") {
      ops.Intervals.overlapJoin(aI, bI, "user_id", "event_id",
        "iv_s", "iv_e").count()
    }
    time("interval_overlap_stats") {
      ops.Intervals.overlapStats(aI, bI, "user_id", "event_id",
        "iv_s", "iv_e").queryExecution.toRdd.count()
    }
    time("interval_overlap_auto") {
      ops.Intervals.overlapJoinAuto(aI, bI, "user_id", "event_id",
        "iv_s", "iv_e").count()
    }
    // LONG-OUTLIER stress: plant one multi-year session per 10k users
    // — under the flat 4h-bucket scheme each outlier explodes to
    // thousands of rows; the level scheme must stay flat (outliers
    // index at their own level in <= 3 tiles)
    val aOut = aI.unionAll(
      aI.filter(pmod(col("user_id"), lit(10000)) === 0)
        .select(col("user_id"), (col("event_id") + 900000000L)
          .as("event_id"), col("event_type"),
          lit(0L).as("iv_s"), lit(4000000000L).as("iv_e")))
    time("interval_auto_outliers") {
      ops.Intervals.overlapJoinAuto(aOut, bI, "user_id", "event_id",
        "iv_s", "iv_e").count()
    }
    time("pipe_session_incidents") {
      ops.Pipelines.sessionIncidents(
        Tables.events(spark, dir).withColumn("ts", col("ts")
          .cast("timestamp")), "user_id", "ts", "value", "event_type")
        .queryExecution.toRdd.count()
    }
    evI.unpersist()
    }

    // CDC apply over a multiplied base: the log touches ~37% of ids
    // with up to three changes each — per-id fold + delta carry must
    // track the log and the base linearly
    // PageRank at xN nodes (ring-structured synthetic graph, 1-3
    // out-edges per node — the same construction as g_pagerank): the
    // per-iteration cost is one rank-edge join + one sum by dst, so
    // the 8-iteration total must track |edges| linearly
    section("graph") {
    val gn = 5000L * mult
    val ids = spark.range(gn).toDF("doc_id")
    val gEdges = ids.select(col("doc_id").as("src"),
        explode(sequence(lit(1L), lit(1L) + pmod(col("doc_id"), lit(3L))))
          .as("k"))
      .select(col("src"),
        pmod(col("src") * (col("k") + lit(6L)) + col("k"), lit(gn))
          .as("dst"))
    println(s"[scaleprobe] graph nodes=$gn edges=${gn * 2} (8 iterations)")
    time("pagerank_8iter") {
      ops.Graph.pageRankU6(gEdges, "src", "dst", 8)
        .queryExecution.toRdd.count()
    }
    time("pagerank_seeded_8iter") {
      ops.Graph.personalizedPageRankU6(gEdges, "src", "dst",
        ids.filter(pmod(col("doc_id"), lit(17L)) === 0L), "doc_id", 8)
        .queryExecution.toRdd.count()
    }
    time("kcore_6rounds") {
      ops.Graph.kCore(gEdges, "src", "dst", k = 3, rounds = 6)
        .queryExecution.toRdd.count()
    }
    time("kcore_exact_fixpoint") {
      ops.Graph.kCoreExact(gEdges, "src", "dst", k = 3).count()
    }
    // the 100 TB layout: pre-degreed src-bucketed edges — write once,
    // then every iteration's rank⋈edges join reads the edge side
    // exchange-free (only node-scale data shuffles per iteration)
    time("pagerank_layout_write") {
      ops.Graph.writeEdgeLayout(gEdges, "src", "dst",
        "probe_pr_edges", nBuckets = 32)
      spark.table("probe_pr_edges").count()
    }
    time("pagerank_8iter_bucketed") {
      ops.Graph.pageRankU6FromLayout(spark, "probe_pr_edges", 8)
        .queryExecution.toRdd.count()
    }
    spark.sql("DROP TABLE IF EXISTS probe_pr_edges")
    }

    // Many-commit MV serving: the mv_* oracles replay 3 batches; this
    // probes the long-running shape — 200 commits per sink, serve,
    // Batches.compact, serve again. The contract: compaction changes
    // LAYOUT, never answers (checksums must match), and the
    // post-compaction serve is flat (no 200-dir listing + tiny-file
    // scan tax). Run against real serving reads, not synthetic folds.
    section("mvserve") {
    val nC = 200
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_mvserve").toString
    def checksum(df: DataFrame): Long =
      df.agg(sum(hash(df.columns.map(col): _*)).cast("long"))
        .head.getLong(0)

    // --- link-graph MV: readPageRank over the accumulated edge log
    val gn = 50000L
    val gEdges2 = spark.range(gn).toDF("src")
      .select(col("src"),
        pmod(col("src") * 7 + 1, lit(gn)).as("dst"))
      .cache()
    gEdges2.count()
    val prRoot = s"$tmp/pr"
    time(s"mvserve_pr_commit_x$nC") {
      (0 until nC).foreach { b =>
        streaming.Ingest.commitLinkGraphBatch(
          gEdges2.filter(pmod(col("src"), lit(nC)) === b),
          prRoot, b, "src", "dst")
      }
      nC.toLong
    }
    def prServe(): Long =
      checksum(streaming.Ingest.readPageRank(spark, prRoot, 4).get)
    var prPre = 0L
    time(s"mvserve_pr_serve_${nC}dirs") { prPre = prServe(); prPre }
    time("mvserve_pr_compact") {
      graft.io.Batches.compact(spark, prRoot, upTo = nC - 1L); 1L
    }
    var prPost = 0L
    time("mvserve_pr_serve_compacted") { prPost = prServe(); prPost }
    require(prPre == prPost,
      s"pagerank serving changed across compaction: $prPre vs $prPost")
    gEdges2.unpersist()

    // --- retention MV: readRetention over the activity log
    val eAct = Tables.events(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("user_id", "ts", "event_id").cache()
    println(s"[scaleprobe] mvserve activity events = ${eAct.count()}")
    val rtRoot = s"$tmp/rt"
    time(s"mvserve_rt_commit_x$nC") {
      (0 until nC).foreach { b =>
        streaming.Ingest.commitActivityBatch(
          eAct.filter(pmod(col("event_id"), lit(nC)) === b),
          rtRoot, b, "user_id", "ts", 86400L)
      }
      nC.toLong
    }
    def rtServe(): Long = checksum(
      streaming.Ingest.readRetention(spark, rtRoot, "user_id").get)
    var rtPre = 0L
    time(s"mvserve_rt_serve_${nC}dirs") { rtPre = rtServe(); rtPre }
    time("mvserve_rt_compact") {
      graft.io.Batches.compact(spark, rtRoot, upTo = nC - 1L); 1L
    }
    var rtPost = 0L
    time("mvserve_rt_serve_compacted") { rtPost = rtServe(); rtPost }
    require(rtPre == rtPost,
      s"retention serving changed across compaction: $rtPre vs $rtPost")
    eAct.unpersist()

    // --- CDC MV: readCdcSnapshot over the change log
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).cache()
    base.count()
    val cdcRoot = s"$tmp/cdc"
    time(s"mvserve_cdc_commit_x$nC") {
      (0 until nC).foreach { b =>
        val up = base.filter(pmod(col("doc_id"), lit(nC)) === b)
          .select(col("doc_id"), lit(b.toLong).as("seq"),
            lit("upsert").as("op"),
            concat(lit(s"rev$b: "), col("text")).as("text"))
        val del = base.filter(pmod(col("doc_id"), lit(nC * 2)) === b)
          .select(col("doc_id"), lit(b.toLong + 1000000L).as("seq"),
            lit("delete").as("op"), lit(null).cast("string").as("text"))
        streaming.Ingest.commitCdcBatch(up.unionByName(del), cdcRoot,
          b, "doc_id", "seq", "op")
      }
      nC.toLong
    }
    def cdcServe(): Long = checksum(streaming.Ingest.readCdcSnapshot(
      spark, cdcRoot, base, "doc_id", "seq", "op").get)
    var cdcPre = 0L
    time(s"mvserve_cdc_serve_${nC}dirs") { cdcPre = cdcServe(); cdcPre }
    time("mvserve_cdc_compact") {
      graft.io.Batches.compact(spark, cdcRoot, upTo = nC - 1L); 1L
    }
    var cdcPost = 0L
    time("mvserve_cdc_serve_compacted") { cdcPost = cdcServe(); cdcPost }
    require(cdcPre == cdcPost,
      s"cdc serving changed across compaction: $cdcPre vs $cdcPost")
    base.unpersist()
    }

    section("cdc") {
    docs
    val log = {
      val d = docs.select(col("doc_id"), col("text"))
      d.filter(pmod(col("doc_id"), lit(5L)) === 0L)
        .select(col("doc_id"), lit(1L).as("seq"), lit("upsert").as("op"),
          concat(lit("rev1: "), col("text")).as("text"))
        .unionByName(d.filter(pmod(col("doc_id"), lit(10L)) === 0L)
          .select(col("doc_id"), lit(2L).as("seq"), lit("delete").as("op"),
            lit(null).cast("string").as("text")))
        .unionByName(d.filter(pmod(col("doc_id"), lit(7L)) === 3L)
          .select(col("doc_id"), lit(3L).as("seq"), lit("delete").as("op"),
            lit(null).cast("string").as("text")))
        .unionByName(d.filter(pmod(col("doc_id"), lit(4L)) === 1L)
          .select(col("doc_id"), lit(1L).as("seq"), lit("upsert").as("op"),
            concat(lit("r: "), col("text")).as("text")))
    }
    time("cdc_apply") {
      ops.Corpus.cdcApply(docs.select(col("doc_id"), col("text")), log,
        "doc_id", "seq", "op").queryExecution.toRdd.count()
    }
    }

    // warehouse star joins at xN fact scale: lineitem/orders multiply
    // (orderkey-shifted so the join fan stays 1:1); dimensions stay
    // dimension-scale — the broadcast side must not grow
    section("warehouse") {
    val liW = multiplied(Tables.lineitem(spark, dir), "l_orderkey").cache()
    val ordW = multiplied(Tables.orders(spark, dir), "o_orderkey").cache()
    println(s"[scaleprobe] lineitem x$mult = ${liW.count()}, " +
      s"orders x$mult = ${ordW.count()}")
    time("q3_shipping_priority") {
      ops.Warehouse.shippingPriority(liW, ordW,
        Tables.customer(spark, dir), "BUILDING", "1998-01-01").count()
    }
    time("q5_local_supplier") {
      ops.Warehouse.localSupplierVolume(liW, ordW,
        Tables.customer(spark, dir), Tables.supplier(spark, dir),
        Tables.nation(spark, dir), Tables.region(spark, dir),
        "ASIA", "1997-01-01", "1998-01-01").count()
    }
    time("q10_returned_items") {
      ops.Warehouse.returnedItems(liW, ordW,
        Tables.customer(spark, dir), Tables.nation(spark, dir),
        "1997-07-01", "1997-10-01").count()
    }
    liW.unpersist(); ordW.unpersist()
    }

    // geo range join, PRODUCTION shape: a FIXED zone catalog against
    // xN point volume — the sf1 whole-basket probe multiplies BOTH
    // sides into the same 0.2-deg box (candidate pairs xN², a fixture
    // artifact); this row pins the claimed-linear fixed-catalog form.
    // Run at x1 then xN: time should scale ~linearly with the points.
    section("geo") {
    val zones = Tables.customer(spark, dir).select(
      col("c_custkey").as("zone_id"),
      (lit(-6.90) - ((col("c_custkey") * 7) % 200).cast("double") / 1000.0)
        .as("z_lat"),
      (lit(107.60) + ((col("c_custkey") * 11) % 200).cast("double") / 1000.0)
        .as("z_lng"))
    def pts(m: Int) = (0 until m).map { i =>
      Tables.supplier(spark, dir).select(
        (col("s_suppkey") + lit(i.toLong * 10000000L)).as("point_id"),
        (lit(-6.90) - (((col("s_suppkey") + i * 37) * 13) % 200)
          .cast("double") / 1000.0).as("p_lat"),
        (lit(107.60) + (((col("s_suppkey") + i * 41) * 17) % 200)
          .cast("double") / 1000.0).as("p_lng"))
    }.reduce(_ union _)
    time("geo_fixed_catalog_x1") {
      ops.Joins.withinRangeGrid(zones, "z_lat", "z_lng",
        pts(1), "p_lat", "p_lng", 2000.0).count()
    }
    time(s"geo_fixed_catalog_x$mult") {
      ops.Joins.withinRangeGrid(zones, "z_lat", "z_lng",
        pts(mult), "p_lat", "p_lng", 2000.0).count()
    }
    // dense-catalog adaptive cell: zones xN in the SAME box trips the
    // density threshold (cell shrinks, k > 1) — A/B against the cell
    // pinned at radius via maxZonesPerCell = MaxValue
    val zDense = (0 until mult).map { i =>
      zones.select((col("zone_id") + lit(i.toLong * 10000000L))
        .as("zone_id"),
        (col("z_lat") + lit((i % 7).toDouble / 35000.0)).as("z_lat"),
        (col("z_lng") + lit((i % 5).toDouble / 25000.0)).as("z_lng"))
    }.reduce(_ union _)
    // each variant timed twice — the first carries the JVM's cold
    // plan-JIT; compare the SECOND rows
    for (rep <- 1 to 2) {
      time(s"geo_dense_adaptive_$rep") {
        ops.Joins.withinRangeGrid(zDense, "z_lat", "z_lng",
          pts(1), "p_lat", "p_lng", 2000.0).count()
      }
      time(s"geo_dense_cell_pinned_r_$rep") {
        ops.Joins.withinRangeGrid(zDense, "z_lat", "z_lng",
          pts(1), "p_lat", "p_lng", 2000.0,
          maxZonesPerCell = Double.MaxValue).count()
      }
    }
    }

    // session MV watermark eviction: 200 commits of an
    // ever-advancing stream, compaction every 20 with a 10-commit
    // horizon — at-rest base rows must stay FLAT (live in-horizon
    // sessions) while the keep-everything twin grows with history
    section("sessions") {
    import spark.implicits._
    val t0 = 1706745600L
    def batchAt(root: String, i: Int): Unit =
      streaming.Ingest.commitSessionBatch(
        Seq((1L, new java.sql.Timestamp((t0 + i * 3600L) * 1000L), 1.0),
          (1L, new java.sql.Timestamp((t0 + i * 3600L + 60L) * 1000L), 2.0))
          .toDF("user_id", "ts", "value"),
        root, i.toLong, "user_id", "ts", "value", 1800L)
    def run(tag: String, horizonSec: Long): Unit = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_sessprobe$tag").toString
      time(s"sessions_200_commits_$tag") {
        (0 until 200).foreach { i =>
          batchAt(root, i)
          if (i > 0 && i % 20 == 0)
            streaming.Ingest.compactSessions(spark, root, "user_id",
              1800L, upTo = i - 1L, horizonSec = horizonSec)
        }
        0L
      }
      // last compaction fires at i=180 with upTo=179 → base b=-(179+2)
      val base = spark.read.parquet(s"$root/b=-181")
      println(s"[scaleprobe] sessions_$tag base rows = ${base.count()}" +
        s" (serve = ${streaming.Ingest.readSessions(spark, root,
          "user_id", 1800L).get.count()})")
    }
    run("evict_h10", 10L * 3600L)
    run("keep_all", 0L)
    }
    spark.stop()
  }
}
