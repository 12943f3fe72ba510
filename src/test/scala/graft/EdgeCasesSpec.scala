package graft

import graft.ops._
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Empty and single-row inputs — the places where scale code usually
  * breaks first (null bounds, empty sequences, missing groups). */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val empty = Seq.empty[(Long, Timestamp, Double)]
    .toDF("user_id", "ts", "value")
  private val one = Seq((7L, Timestamp.valueOf("2024-02-01 10:00:00"), 5.0))
    .toDF("user_id", "ts", "value")

  test("totals on empty input: zero row, not crash") {
    val g = Totals.global(empty, "value").collect().head
    assert(g.getAs[Double]("total_value") == 0.0)
    assert(g.getAs[Long]("n_rows") == 0L)
  }

  test("time buckets on empty and single-row input") {
    assert(TimeBuckets.history(empty, "ts", "value", 900, "HH:mm")
      .collect().isEmpty)
    assert(TimeBuckets.dense(empty, "ts", "value", 3600).collect().isEmpty)
    val d = TimeBuckets.dense(one, "ts", "value", 3600).collect()
    assert(d.length == 1 && d.head.getAs[Double]("total_value") == 5.0)
  }

  test("window stats on empty input: zeros everywhere") {
    val r = WindowStats.multiWindow(empty, "ts", "value", Seq("1h" -> 3600L))
      .collect()
    // empty input with a group-by-now: either zero rows or a zero row is
    // acceptable; it must not throw. If a row exists, totals are 0.
    r.foreach(row => assert(row.getAs[Double]("total_1h") == 0.0))
  }

  test("trailingRange: time-frame semantics — ties all in together, " +
    "gaps shrink the frame, boundary row exactly windowSec-1 back " +
    "included, windowSec back excluded") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // key 1: events at t=0, 0 (tie), 3599 (inside from 0), 3600 (0 now
    // out), 10000 (alone after a gap); key 2 independent
    val df = Seq(
      (1L, 10L, ts("2024-02-05 00:00:00"), 1.0),
      (1L, 11L, ts("2024-02-05 00:00:00"), 2.0),  // tie with 10
      (1L, 12L, ts("2024-02-05 00:59:59"), 4.0),  // 3599 s later: in
      (1L, 13L, ts("2024-02-05 01:00:00"), 8.0),  // 3600 s: 0 drops out
      (1L, 14L, ts("2024-02-05 02:46:40"), 16.0), // gap: alone
      (2L, 20L, ts("2024-02-05 00:30:00"), 100.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = WindowStats.trailingRange(df, "user_id", "event_id",
        "ts", "value", windowSec = 3600L)
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getDouble(4))).toMap
    // tied rows see EACH OTHER (time frame, not row frame)
    assert(out(10L) == ((2L, 3.0)) && out(11L) == ((2L, 3.0)), out.toString)
    assert(out(12L) == ((3L, 7.0)))   // 0,0,3599 all inside
    assert(out(13L) == ((2L, 12.0)))  // the two t=0 rows dropped out
    assert(out(14L) == ((1L, 16.0)))  // gap shrinks the frame
    assert(out(20L) == ((1L, 100.0))) // keys independent
  }

  test("JSON payload extraction: point lookup and typed struct parse " +
    "agree; malformed payloads yield null, never throw") {
    val df = Seq(
      """{"device":"dev-3","fw":7,"geo":{"lat":12.5}}""",
      """{"device":"dev-0","fw":0,"geo":{"lat":0.5}}""",
      """not json at all""",
      """{"device":"dev-9","fw":"""
    ).toDF("j")
    val out = df.select(
        get_json_object(col("j"), "$.device").as("d1"),
        from_json(col("j"),
          "device STRING, fw BIGINT, geo STRUCT<lat: DOUBLE>",
          Map.empty[String, String]).as("s"))
      .select(col("d1"), col("s.device").as("d2"), col("s.fw"),
        col("s.geo.lat").as("lat"))
      .collect()
    assert(out(0).getString(0) == "dev-3" &&
      out(0).getString(1) == "dev-3" &&
      out(0).getLong(2) == 7L && out(0).getDouble(3) == 12.5)
    assert(out(1).getString(0) == "dev-0" && out(1).getDouble(3) == 0.5)
    // malformed: both paths degrade to null (PERMISSIVE mode), no throw
    assert(out(2).isNullAt(0) && out(2).isNullAt(1) && out(2).isNullAt(3))
    assert(out(3).isNullAt(0) || out(3).getString(0) == "dev-9")
    assert(out(3).isNullAt(2), "truncated payload must not parse fw")
  }

  test("percentile thresholds on empty and single point") {
    assert(Percentiles.thresholds(empty, "user_id", "ts", "value")
      .collect().isEmpty)
    val t = Percentiles.thresholds(one, "user_id", "ts", "value")
      .collect().head
    // single hourly volume: all percentiles collapse to it
    assert(t.getAs[Double]("p50") == 5.0)
    assert(t.getAs[Double]("max_volume") == 5.0)
  }

  test("dedup ops on empty documents") {
    val ed = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextDedup.exactDedup(ed, "doc_id", "text").collect().isEmpty)
    assert(TextDedup.jaccardPairs(ed, "doc_id", "text", 3, 0.5)
      .collect().isEmpty)
    assert(TextDedup.simhashPairs(ed, "doc_id", "text", 10)
      .collect().isEmpty)
    assert(TextDedup.minhashLshPairs(ed, "doc_id", "text", 3, 16, 4, 0.5)
      .collect().isEmpty)
  }

  test("single-token and empty-text documents flow through text stats") {
    val d = Seq((1L, "x"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val q = TextStats.qualityMetrics(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(q.length == 3)
    assert(q(0).getAs[Long]("n_tokens") == 1L)
    assert(q(1).getAs[Long]("n_tokens") == 0L)
    assert(q(1).getAs[Double]("quality_score") == 0.0)
    val fp = d.select(TextStats.fingerprint(col("text"))).as[Long].collect()
    assert(fp(1) == 0L && fp(2) == 0L)
  }

  test("round-12 text/sampling ops on empty and degenerate inputs") {
    val ed = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextStats.gopherRules(ed, "doc_id", "text").collect().isEmpty)
    assert(TextStats.gopherRepetition(ed, "doc_id", "text").collect().isEmpty)
    // pplBuckets: empty corpus -> empty frame (null thresholds never
    // meet a row); single-doc corpus -> that doc is its own head
    assert(TextStats.pplBuckets(ed, "doc_id", "text").collect().isEmpty)
    val one = Seq((1L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val ob = TextStats.pplBuckets(one, "doc_id", "text").collect()
    assert(ob.length == 1 && ob.head.getAs[String]("ppl_bucket") == "head")
    // dsir: empty raw corpus -> all-smoothing weights, empty scores
    assert(Sampling.dsirBuckets(ed, ed, "text", 8).collect().isEmpty)
    val m = Sampling.dsirFit(ed, ed, "text", 8)
    assert(m.rawTotal == 0L && m.targetTotal == 0L &&
      m.wMicro.forall(_ == 0L))
    assert(Sampling.dsirScore(ed, "doc_id", "text", m).collect().isEmpty)
    assert(Sampling.dsirResample(
      Sampling.dsirScore(ed, "doc_id", "text", m), "doc_id", 10.0, "s")
      .collect().isEmpty)
    // clusterHoldout on an empty cluster frame
    val ec = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    assert(Sampling.clusterHoldout(ec, "cluster_id", 0.2, "s")
      .collect().isEmpty)
  }

  test("ANN with empty query set") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = graft.ops.Embeddings.bruteForceTopK(
      e, e.filter($"vec_id" < 0), "vec_id", "embedding", 5)
    assert(out.collect().isEmpty)
  }

  test("deterministic sampling: train/holdout partition the corpus, membership stable under append") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val all = d.select("doc_id").collect().map(_.getLong(0)).toSet
    val tr = graft.ops.Sampling.train(d, "doc_id", 0.2, "split")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ho = graft.ops.Sampling.holdout(d, "doc_id", 0.2, "split")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((tr & ho).isEmpty && (tr | ho) == all)
    assert(ho.nonEmpty && tr.nonEmpty)
    // growth stability: the holdout of a GROWN corpus restricted to the
    // old ids is exactly the old holdout (eval sets never churn)
    val grown = d.union(d.select(((col("doc_id") + 500000).as("doc_id") +:
      d.columns.tail.map(col)): _*))
    val ho2 = graft.ops.Sampling.holdout(grown, "doc_id", 0.2, "split")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((ho2 & all) == ho)
    // stratified rates land near their targets per stratum
    val str = graft.ops.Sampling.stratified(d, "lang", "doc_id",
      Map("en" -> 0.5), defaultRate = 0.1, seed = "samp")
    val en = d.filter(col("lang") === "en").count().toDouble
    val enKept = str.filter(col("lang") === "en").count().toDouble
    assert(math.abs(enKept / en - 0.5) < 0.15,
      s"en keep rate ${enKept / en}")
  }

  test("shuffleShards: a deterministic permutation in equal shards with dense positions") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.ops.Sampling.shuffleShards(d, "doc_id", 4, "ord")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == d.count())
    // every shard present, sizes within 2x of each other (uniform hash)
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L))
    assert(sizes.values.max <= 2 * sizes.values.min, s"skewed: $sizes")
    // positions are dense 0..n-1 per shard
    sizes.foreach { case (sh, n) =>
      assert(out.filter(_._2 == sh).map(_._3).sorted
        .sameElements(0L until n.toLong))
    }
    // the permutation decorrelates id order: the first shard-0 position
    // is not simply the smallest doc_id (would indicate id-ordered)
    val byPos = out.filter(_._2 == 0L).sortBy(_._3).map(_._1)
    assert(!byPos.sameElements(byPos.sorted))
    // rerun is bit-identical (pure function of seed and id)
    val again = graft.ops.Sampling.shuffleShards(d, "doc_id", 4, "ord")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sorted.sameElements(again.sorted))
  }

  test("writeShuffledShards: one file per shard, file row order IS the training order") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    graft.ops.Sampling.writeShuffledShards(d, "doc_id", 4, "ord", tmp)
    val expect = graft.ops.Sampling.shuffleShards(d, "doc_id", 4, "ord")
    (0 until 4).foreach { sh =>
      val dir = new java.io.File(s"$tmp/shard=$sh")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $sh split across ${files.length} files")
      // single-file read preserves row order → must equal pos order
      val got = spark.read.parquet(files.head.getPath)
        .select("doc_id").collect().map(_.getLong(0))
      val want = expect.filter(col("shard") === sh).orderBy("pos")
        .select("doc_id").collect().map(_.getLong(0))
      assert(got.sameElements(want), s"shard $sh order differs")
    }
  }

  test("curateToShards: stage composition preserves stage semantics end-to-end") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_pipeline").toString
    val out = graft.ops.Pipelines.curateToShards(d, "doc_id", "text",
      keepLangs = Seq("en", "es"), minQuality = 0.1,
      n = 3, k = 16, bands = 4, minJ = 0.8,
      nShards = 4, seed = "ord", outPath = Some(tmp))
    val rows = out.select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length < d.count(),
      "pipeline must drop something and keep something")
    // survivors == curate ∘ dedupCorpus run independently
    val curated = graft.ops.TextStats.curate(d, "doc_id", "text",
      Seq("en", "es"), 0.1).select("doc_id")
    val expect = graft.ops.TextDedup.dedupCorpus(
      d.select(col("doc_id"), col("text"))
        .join(curated, Seq("doc_id"), "left_semi"),
      "doc_id", "text", 3, 16, 4, 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == expect)
    // positions dense per shard over the FINAL survivor set
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.sameElements(0L until rs.length.toLong))
    }
    // the written export exists with the shard layout
    assert((0 until 4).exists(sh =>
      new java.io.File(s"$tmp/shard=$sh").exists()))
  }

  test("pretrainRecipe: every stage's effect is visible end-to-end and " +
    "equals the stages run independently") {
    import spark.implicits._
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("src", concat(lit("s"), pmod(col("doc_id"), lit(3))))
    // neutral model: every term weighs +1000 micro, so score_micro =
    // 1000 * n_tokens and the threshold is a min-token filter — lets
    // the model stage bite deterministically without trained weights
    val w = d.select(explode(graft.ops.TextDedup.tokens(col("text")))
        .as("term")).distinct()
      .withColumn("w_micro", lit(1000L))
    val out = graft.ops.Pipelines.pretrainRecipe(d, "doc_id", "text",
      "src", keepLangs = Seq("en", "es"), minQuality = 0.1,
      weights = w, minScoreMicro = 20000L, // >= 20 tokens
      n = 3, k = 16, bands = 4, minJ = 0.8,
      alpha = 0.5, budgetFrac = 0.9, nShards = 4, seed = "pp")
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.size < d.count())
    // reproduce independently, stage by stage
    val db = graft.ops.TextDedup.dedupLines(
      d.select(col("doc_id"), col("text"), col("src")), "doc_id", "text")
    val cur = graft.ops.TextStats.curate(db, "doc_id", "text",
      Seq("en", "es"), 0.1).select("doc_id")
    val cd = db.join(cur, Seq("doc_id"), "left_semi")
    val sc = graft.ops.TextStats.linearScore(cd, "doc_id", "text", w)
      .filter(col("score_micro") >= 20000L).select("doc_id")
    val mk = cd.join(sc, Seq("doc_id"), "left_semi")
    val sv = graft.ops.TextDedup.dedupCorpus(
      mk.select(col("doc_id"), col("text")), "doc_id", "text",
      3, 16, 4, 0.8).select("doc_id")
    val rb = graft.ops.Sampling.temperature(
      mk.join(sv, Seq("doc_id"), "left_semi"), "src", "doc_id",
      0.5, 0.9, "pp:temp")
    assert(kept == rb.select("doc_id").collect().map(_.getLong(0)).toSet)
    // the model threshold actually bit: some curated doc died on it
    assert(sc.count() < cur.count())
    // positions dense per shard over the final survivor set
    val rows = out.select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.sameElements(0L until rs.length.toLong))
    }
  }

  test("mixSources: integer weights copy exactly, fractional draw the remainder, zero drops") {
    import spark.implicits._
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("id", "src")
    val out = graft.ops.Sampling.mixSources(d, "src", "id",
        Map("a" -> 2.0, "b" -> 0.5, "c" -> 0.0), defaultWeight = 1.0,
        seed = "mix")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // weight 2.0: exactly two copies of every 'a' row, copies 0 and 1
    assert(out.filter(_._1 == 1L).map(_._2).sorted.sameElements(Array(0L, 1L)))
    assert(out.filter(_._1 == 2L).map(_._2).sorted.sameElements(Array(0L, 1L)))
    // weight 0.5: at most one copy; weight 0.0: never kept
    assert(out.count(_._1 == 3L) <= 1)
    assert(!out.exists(_._1 == 4L))
    // determinism: a second run draws the identical multiset
    val again = graft.ops.Sampling.mixSources(d, "src", "id",
        Map("a" -> 2.0, "b" -> 0.5, "c" -> 0.0), 1.0, "mix")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.sorted.sameElements(again.sorted))
  }

  test("thresholdsApprox tracks the exact thresholds within sketch tolerance") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", col("ts").cast("timestamp"))
    val exact = graft.ops.Percentiles.thresholds(e, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val approx = graft.ops.Percentiles
      .thresholdsApprox(e, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (a50, a75, a90)) =>
      val (e50, e75, e90) = exact(k)
      // approx_percentile picks an actual sample value (no interpolation)
      // — at small n the two estimators differ by at most one step of
      // the hourly-volume distribution; at high accuracy they stay close
      def close(a: Double, b: Double) =
        math.abs(a - b) <= math.max(0.2 * math.max(b.abs, 1.0), 30.0)
      assert(close(a50, e50) && close(a75, e75) && close(a90, e90),
        s"key $k: approx ($a50,$a75,$a90) vs exact ($e50,$e75,$e90)")
    }
  }

  test("approx distinct within 5% of exact on testdata") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val exact = e.select("user_id").distinct().count()
    val approx = Profiler.approxDistinct(e, "user_id", 0.02)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("interpolateGaps: interior gaps linear between neighbors," +
    " observed flags, single-obs key has no spine, empty in/out") {
    import java.time.Instant
    def ts(epoch: Long) = Timestamp.from(Instant.ofEpochSecond(epoch))
    val ev = Seq(
      ("a", ts(0L), 10.0), ("a", ts(2700L), 40.0), // gap: 900, 1800
      ("b", ts(450L), 7.0))                        // single obs
      .toDF("k", "ts", "value")
    val out = TimeBuckets.interpolateGaps(ev, "k", "ts", "value", 900L)
      .orderBy("k", "bucket_ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(out == Seq(
      ("a", 0L, 10.0, true), ("a", 900L, 20.0, false),
      ("a", 1800L, 30.0, false), ("a", 2700L, 40.0, true),
      ("b", 0L, 7.0, true)))
    assert(TimeBuckets.interpolateGaps(
      Seq.empty[(String, Timestamp, Double)].toDF("k", "ts", "value"),
      "k", "ts", "value", 900L).collect().isEmpty)
  }

  test("interpolateGaps: all-NULL-valued buckets are interpolated" +
    " through (IGNORE-NULLS anchor parity), incl. leading NULL") {
    import java.time.Instant
    def ts(epoch: Long) = Timestamp.from(Instant.ofEpochSecond(epoch))
    val ev = Seq(
      // c: observed 10 @ b0, a NULL-valued event @ b900, observed 40
      // @ b2700 — b900 keeps its event count but takes the linear
      // fill between the non-null neighbors; b1800 is a plain gap.
      ("c", ts(0L), Some(10.0)), ("c", ts(900L), None),
      ("c", ts(2700L), Some(40.0)),
      // d: the key's FIRST bucket is all-NULL — constant-fills from
      // the next observation (no left anchor), like the oracle's
      // WHEN pv IS NULL THEN nv arm.
      ("d", ts(0L), None), ("d", ts(900L), Some(5.0)))
      .toDF("k", "ts", "value")
    val out = TimeBuckets.interpolateGaps(ev, "k", "ts", "value", 900L)
      .orderBy("k", "bucket_ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(out == Seq(
      ("c", 0L, 1L, 10.0, true), ("c", 900L, 1L, 20.0, false),
      ("c", 1800L, 0L, 30.0, false), ("c", 2700L, 1L, 40.0, true),
      ("d", 0L, 1L, 5.0, false), ("d", 900L, 1L, 5.0, true)))
  }

  test("funnel: strict ordering and horizon; out-of-order and" +
    " beyond-horizon users drop at the right step") {
    import java.time.Instant
    def ts(e: Long) = Timestamp.from(Instant.ofEpochSecond(e))
    val ev = Seq(
      (1L, ts(100L), "view"), (1L, ts(200L), "click"),
      (1L, ts(300L), "purchase"),
      (2L, ts(100L), "click"), (2L, ts(200L), "view"), // click BEFORE view
      (3L, ts(100L), "view"), (3L, ts(150L), "click"),
      (3L, ts(5000L), "purchase"),                     // beyond horizon
      (4L, ts(100L), "purchase"))                      // never viewed
      .toDF("user_id", "ts", "event_type")
    val out = Analytic.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), horizonSec = 1000L)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1, "view", 3L), (2, "click", 2L),
      (3, "purchase", 1L)))
  }

  test("retentionCohorts: cohort = first active period, offsets count" +
    " distinct returning users") {
    import java.time.Instant
    def ts(e: Long) = Timestamp.from(Instant.ofEpochSecond(e))
    val ev = Seq(
      (1L, ts(5L)), (1L, ts(15L)), (1L, ts(35L)), (1L, ts(36L)),
      (2L, ts(12L)),
      (3L, ts(18L)), (3L, ts(29L)))
      .toDF("user_id", "ts")
    val out = Analytic.retentionCohorts(ev, "user_id", "ts",
        intervalSec = 10L)
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // user1 cohort 0 active periods {0,1,3} (35,36 collapse); users
    // 2,3 cohort 1; user3 returns at offset 1
    assert(out == Seq((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 2L), (1L, 1L, 1L)))
  }

  test("prediction with empty history returns 0 for all keys") {
    val keys = Seq(1L, 2L).toDF("user_id")
    val out = Predict.predictSlot(empty, keys, "user_id", "ts", "value", 1, 8)
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Double]("predicted_volume") == 0.0))
  }

  test("multi-probe LSH with empty corpus or empty query set yields no rows") {
    val emptyVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val vecs = Seq(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
      .toDF("vec_id", "embedding")
    assert(Embeddings.lshTopKMultiProbe(emptyVecs, vecs, "vec_id",
      "embedding", 2, 2, 5, 2).count() == 0)
    assert(Embeddings.lshTopKMultiProbe(vecs, emptyVecs, "vec_id",
      "embedding", 2, 2, 5, 2).count() == 0)
  }

  test("grid range join with an empty side yields no rows") {
    val z = Seq.empty[(Long, Double, Double)].toDF("zone_id", "z_lat", "z_lng")
    val p = Seq((1L, -6.9, 107.6)).toDF("point_id", "p_lat", "p_lng")
    assert(Joins.withinRangeGrid(z, "z_lat", "z_lng",
      p, "p_lat", "p_lng", 500.0).count() == 0)
    assert(Joins.withinRangeGrid(
      p.toDF("zone_id", "z_lat", "z_lng"), "z_lat", "z_lng",
      Seq.empty[(Long, Double, Double)].toDF("point_id", "p_lat", "p_lng"),
      "p_lat", "p_lng", 500.0).count() == 0)
  }

  test("bandKeys on empty and shorter-than-n documents") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextDedup.bandKeys(emptyDocs, "doc_id", "text", 3, 8, 4)
      .count() == 0)
    // a doc with fewer than n tokens has no shingles → no band rows
    val shortDoc = Seq((1L, "two words")).toDF("doc_id", "text")
    assert(TextDedup.bandKeys(shortDoc, "doc_id", "text", 3, 8, 4)
      .count() == 0)
  }

  test("fused kernel null/empty contracts: SimHash60 and MinHashK") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // null array → null (UnaryExpression contract); null ELEMENTS are
    // skipped; empty array → all-zero votes → signature 0
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("toks", ArrayType(StringType, containsNull = true))))
    val rows = Seq(
      Row(1L, null),
      Row(2L, Seq.empty[String]),
      Row(3L, Seq("alpha", null, "alpha")),
      Row(4L, Seq("alpha", "alpha")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val sim = df.select(col("id"),
        graft.functions.SimHash60.simhash60(col("toks")).as("s"))
      .orderBy("id").collect()
    assert(sim(0).isNullAt(1))
    assert(sim(1).getLong(1) == 0L)
    // null elements vote on nothing: rows 3 and 4 agree
    assert(sim(2).getLong(1) == sim(3).getLong(1))

    val hs = df.select(col("id"),
      transform(col("toks"), t => TextDedup.md5Hash60(t)).as("hs"))
    val mh = hs.select(col("id"),
        graft.functions.MinHashK.minhashK(col("hs"), 4).as("m"))
      .orderBy("id").collect()
    assert(mh(0).isNullAt(1))
    // empty set → MaxValue sentinels (callers filter zero-shingle docs)
    assert(mh(1).getSeq[Long](1).forall(_ == Long.MaxValue))
    assert(mh(2).getSeq[Long](1) == mh(3).getSeq[Long](1))
    // single-element set: signature is the hash family applied to it
    val h = df.filter(col("id") === 4L)
      .select(TextDedup.md5Hash60(lit("alpha"))).collect().head.getLong(0)
    val p = graft.functions.MinHashK.P
    val expect = (0 until 4).map(i =>
      ((2L * i + 1) * (h % p) + (17L * i + 91)) % p)
    assert(mh(3).getSeq[Long](1) == expect)
  }

  test("s1 range scan with an empty time window yields no rows") {
    val out = SparkEntry.queries("s1_range_scan")(spark, "/root/testdata/sf0.001")
    assert(out.filter(col("ts_epoch") < 0).count() == 0)
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("ts") >= lit("2031-01-01 00:00:00").cast("timestamp"))
    assert(e.count() == 0)
  }

  test("round-12b ops: empty and degenerate inputs never crash") {
    val emptyIv = Seq.empty[(String, Long, Long, Long)]
      .toDF("k", "id", "s", "e")
    val someIv = Seq(("u", 1L, 100L, 200L)).toDF("k", "id", "s", "e")
    // interval join: empty either side → empty; stats keep the a side
    assert(Intervals.overlapJoin(someIv, emptyIv, "k", "id", "s", "e")
      .count() == 0)
    assert(Intervals.overlapJoin(emptyIv, someIv, "k", "id", "s", "e")
      .count() == 0)
    assert(Intervals.overlapStats(someIv, emptyIv, "k", "id", "s", "e")
      .collect().map(r => (r.getLong(4), r.getLong(5))).toSeq ==
      Seq((0L, 0L)))
    // CDC: empty base + insert-only log builds the table from nothing
    val noBase = Seq.empty[(Long, String)].toDF("id", "text")
    val insLog = Seq((1L, 1L, "upsert", "a")).toDF("id", "seq", "op", "text")
    assert(Corpus.cdcApply(noBase, insLog, "id", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a")))
    // histogram: constant column collapses every edge; counts reconcile
    val const = Seq.fill(20)(7.5).toDF("v")
    val hrows = Profiler.histogram(const, "v", 10).collect()
    assert(hrows.map(_.getLong(3)).sum == 20)
    // quantiles from an EMPTY histogram: probabilities kept, q null
    val emptyHist = Seq.empty[(Long, Long)].toDF("unit", "n")
    val qrows = Percentiles.quantilesFromHist(emptyHist, Seq(0.5, 0.9))
      .collect()
    assert(qrows.map(_.getDouble(0)).toSeq == Seq(0.5, 0.9) &&
      qrows.forall(_.isNullAt(1)))
    // MAD: window longer than the series → nothing qualifies
    val short = Seq((7L, Timestamp.valueOf("2024-02-01 10:00:00"), 5.0),
      (7L, Timestamp.valueOf("2024-02-01 11:00:00"), 500.0))
      .toDF("user_id", "ts", "value")
    assert(Forecast.madAnomalies(short, "user_id", "ts", "value",
      window = 24).count() == 0)
    // ACF: lags beyond the series length simply produce no rows
    val acfRows = Forecast.acf(short, "user_id", "ts", "value",
      maxLag = 48).collect()
    assert(acfRows.forall(_.getInt(1) <= 1))
    // warehouse: empty fact side → empty report
    val noLi = Seq.empty[(Long, Long, Double, Double, String, Timestamp)]
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_returnflag", "l_shipdate")
    val oneOrd = Seq((1L, 10L, Timestamp.valueOf("1997-06-01 00:00:00"),
      "1-URGENT")).toDF("o_orderkey", "o_custkey", "o_orderdate",
      "o_orderpriority")
    val oneCust = Seq((10L, "alice", 1L, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    assert(Warehouse.shippingPriority(noLi, oneOrd, oneCust,
      "BUILDING", "1998-01-01").count() == 0)
  }

  test("overlapJoin: pre-1970 (negative-epoch) intervals still block" +
    " losslessly — floor division, not truncation") {
    val a = Seq(("u", 1L, -100000L, -95000L), ("u", 2L, -50L, 50L))
      .toDF("k", "id", "s", "e")
    val b = Seq(("u", 10L, -97000L, -96000L), ("u", 11L, -10L, 5L),
      ("u", 12L, -200000L, -150000L))
      .toDF("k", "id", "s", "e")
    val fast = Intervals.overlapJoin(a, b, "k", "id", "s", "e",
        bucketSec = 7L) // prime width, lots of boundary crossings
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.sorted.toSeq == Seq((1L, 10L), (2L, 11L)))
  }

  test("cubeByKeys: four grouping sets reconcile — each level sums to" +
    " the grand total; gid disambiguates a REAL null key") {
    val df = Seq(
      (Option("a"), "d1", 1.0), (Option("a"), "d2", 2.0),
      (Option("b"), "d1", 4.0),
      (Option.empty[String], "d1", 8.0)) // real null key, not a subtotal
      .toDF("k1", "k2", "value")
    val out = Totals.cubeByKeys(df, "k1", "k2", "value").collect()
    assert(out.length == 4 + 3 + 2 + 1) // cells, k1 rows, k2 rows, total
    def level(g: Long) = out.filter(_.getLong(4) == g)
    assert(level(0L).map(_.getDouble(2)).sum == 15.0)
    assert(level(1L).map(_.getDouble(2)).sum == 15.0)
    assert(level(2L).map(_.getDouble(2)).sum == 15.0)
    assert(level(3L).map(_.getDouble(2)).toSeq == Seq(15.0))
    // gid 0 row with null k1 is the REAL null group, value 8
    val realNull = level(0L).filter(_.isNullAt(0))
    assert(realNull.length == 1 && realNull.head.getDouble(2) == 8.0)
    // gid 2 (k1 aggregated out) holds the per-day rows: d1 = 13
    assert(level(2L).filter(_.getString(1) == "d1")
      .head.getDouble(2) == 13.0)
  }

  test("sessionIncidents: incidents attach to the session whose span" +
    " covers them; clean sessions kept with zero counts") {
    def t(min: Long) = new Timestamp((1704067200L + min * 60) * 1000L)
    val events = Seq(
      // user 1, session 1: 10:00–10:10 (3 activity events)
      (1L, t(0), 5.0, "view"), (1L, t(5), 5.0, "click"),
      (1L, t(10), 5.0, "view"),
      // incident inside session 1: starts min 7, lasts 2·60 s
      (1L, t(7), 2.0, "error"),
      // user 1, session 2 after a >30 min gap: clean
      (1L, t(60), 1.0, "view"),
      // incident far outside any session
      (1L, t(200), 1.0, "error"))
      .toDF("user_id", "ts", "value", "event_type")
    val out = Pipelines.sessionIncidents(events, "user_id", "ts",
      "value", "event_type").collect()
      .map(r => (r.getLong(1), r.getLong(4), r.getLong(6), r.getLong(7)))
    // (session, n_events, n_incidents, incident_sec)
    assert(out.toSeq == Seq((1L, 3L, 1L, 120L), (2L, 1L, 0L, 0L)))
  }
}
