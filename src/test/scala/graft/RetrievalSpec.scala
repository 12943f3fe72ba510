package graft

import graft.ops.{Corpus, Pipelines, Retrieval}
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "spark shuffle join spark"),
    (1L, "broadcast join plan"),
    (2L, "spark codegen whole stage codegen"),
    (3L, "shuffle partition skew shuffle shuffle"),
    (4L, ""), // zero-token doc: counted in N/avgdl, never matches
    (5L, "join join join spark"))
    .toDF("doc_id", "text")

  test("shardedPostings: per-segment sorted lists, global df, minDf prune") {
    val out = Retrieval.shardedPostings(corpus, "doc_id", "text",
      nSegments = 2, minDf = 1L).orderBy("term", "segment").collect()
    val spark0 = out.filter(_.getString(0) == "spark")
    // spark appears in docs 0,2,5 → segment 0 holds {0,2}, segment 1 {5}
    assert(spark0.map(r => (r.getInt(1), r.getString(4))).toSeq ==
      Seq((0, "0,2"), (1, "5")))
    // global df carried on every shard row, re-aggregated from partials
    assert(spark0.forall(_.getLong(2) == 3L))
    assert(spark0.map(_.getLong(3)).toSeq == Seq(2L, 1L))
    // posting lists are per-doc distinct: doc 3's triple "shuffle" is one entry
    val sh = out.filter(r => r.getString(0) == "shuffle" && r.getInt(1) == 1)
    assert(sh.head.getString(4) == "3")
  }

  test("shardedPostings: minDf prunes on the GLOBAL count, not per-segment") {
    val out = Retrieval.shardedPostings(corpus, "doc_id", "text",
      nSegments = 2, minDf = 3L)
    // spark (df=3) and join (df=3) survive; every shard row survives with them
    assert(out.select("term").distinct().as[String].collect().sorted.toSeq ==
      Seq("join", "spark"))
    // join lives in docs 0 (seg 0) and 1,5 (seg 1) → two shard rows
    val j = out.filter(col("term") === "join")
      .orderBy("segment").collect()
    assert(j.map(r => (r.getInt(1), r.getString(4))).toSeq ==
      Seq((0, "0"), (1, "1,5")))
  }

  test("bm25TopK: rare term outranks common; scores integer and reproducible") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("skew", "join"), k = 10).collect()
    // doc 3 holds the corpus's only "skew" (idf_odds (6-1+.5)/1.5) and must
    // outrank every join-only doc despite doc 5's tf=3 on the common term
    assert(out.head.getLong(0) == 3L)
    val byDoc = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 3L, 5L).subsetOf(byDoc.keySet))
    assert(!byDoc.contains(4L)) // zero-token doc never matches
    // deterministic: a second run returns bit-identical micro-unit scores
    val again = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("skew", "join"), k = 10).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("bm25TopK: k limits output; ties broken on doc id ascending") {
    // docs 10 and 11 are word-for-word identical → identical scores
    val tied = Seq((10L, "alpha beta"), (11L, "alpha beta"), (12L, "beta"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(tied, "doc_id", "text", Seq("alpha"), k = 1)
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 10L)
  }

  test("corpusDiff: added/removed/changed only, signed char delta") {
    val a = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    val b = Seq((2L, "two"), (3L, "three-revised"), (9L, "nine"))
      .toDF("doc_id", "text")
    val out = Corpus.corpusDiff(a, b, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "removed", -3L), (3L, "changed", 8L), (9L, "added", 4L)))
    // unchanged doc 2 is filtered out, not labeled
    assert(!out.exists(_.getLong(0) == 2L))
  }

  test("incrementalRefresh: equals from-scratch recompute, computes" +
    " only the delta") {
    import org.apache.spark.sql.DataFrame
    val a = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon"))
      .toDF("doc_id", "text")
    val b = Seq((2L, "gamma delta"), (3L, "epsilon zeta"), (4L, "eta"))
      .toDF("doc_id", "text")
    def metrics(d: DataFrame): DataFrame =
      graft.ops.TextStats.qualityMetrics(d, "doc_id", "text")
    var computedOn = -1L
    val refreshed = graft.ops.Corpus.incrementalRefresh(
      a, b, metrics(a), "doc_id", "text") { delta =>
      computedOn = delta.count(); metrics(delta)
    }.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val scratch = metrics(b).orderBy("doc_id").collect()
      .map(_.toSeq).toSeq
    assert(refreshed == scratch)
    // only changed doc 3 and added doc 4 were recomputed; carried doc 2
    // and removed doc 1 never re-tokenized
    assert(computedOn == 2L)
  }

  test("corpusDiffSummary: counts reconcile with the detail view") {
    val a = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    val b = Seq((2L, "two"), (3L, "three-revised"), (9L, "nine"))
      .toDF("doc_id", "text")
    val s = Corpus.corpusDiffSummary(a, b, "doc_id", "text").collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) ==
      (1L, 1L, 1L, 1L))
  }

  test("search index: bm25IndexTopK row-identical to recompute; scan" +
    " pruned to the query terms' buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sidx")
      .toString + "/idx"
    Retrieval.writeSearchIndex(corpus, "doc_id", "text", dir, nBuckets = 8)
    val terms = Seq("skew", "join")
    val mem = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val idx = Retrieval.bm25IndexTopK(spark, dir, "doc_id", terms, k = 10)
    assert(idx.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == mem)
    // measured pruning (IvfIndexSpec discipline): the postings scan
    // reads exactly the probed buckets' files, fewer than the index's
    val md = java.security.MessageDigest.getInstance("MD5")
    val probed = terms.map(t => (graft.functions.Md5Hash60.first60Bits(
      md.digest(t.getBytes("UTF-8"))) % 8L).toInt).distinct.toSet
    def partFiles(sub: String): Map[Int, Int] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      val root = new java.io.File(dir, sub)
      root.listFiles().filter(_.getName.startsWith("tb=")).map { d =>
        d.getName.stripPrefix("tb=").toInt -> walk(d).size
      }.toMap
    }
    val onDisk = partFiles("postings")
    val expected = onDisk.filter(kv => probed(kv._1)).values.sum
    val measured = Retrieval.bm25IndexTopK(spark, dir, "doc_id", terms,
      k = 10)
    measured.collect() // metrics fill on execution
    val read = graft.util.PlanMetrics.filesReadUnder(
      measured, dir + "/postings")
    assert(read == expected && read < onDisk.values.sum,
      s"postings scan read $read files; probed buckets hold $expected " +
        s"of ${onDisk.values.sum}")
    // df sidecar agrees with the corpus: 'join' lives in 3 docs
    val dfRow = spark.read.parquet(dir + "/dfreq")
      .filter(col("term") === "join").collect()
    assert(dfRow.length == 1 && dfRow.head.getAs[Long]("df_t") == 3L)
  }

  test("prfIndexTopK: row-identical to prfExpand, including across" +
    " incremental appends") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-prfidx")
    val idx = tmp.toString + "/idx"
    val incr = tmp.toString + "/incr"
    Retrieval.writeSearchIndex(corpus, "doc_id", "text", idx, nBuckets = 8)
    // a query whose literal match misses paraphrase docs, forcing a
    // real expansion round (same shape as the prfExpand spec)
    val terms = Seq("skew")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val mem = rows(Retrieval.prfExpand(corpus, "doc_id", "text", terms,
      k = 10, nDocs = 2, nTerms = 3, maxDfPct = 60))
    assert(mem.nonEmpty)
    assert(rows(Retrieval.prfIndexTopK(spark, idx, "doc_id", terms,
      k = 10, nDocs = 2, nTerms = 3, maxDfPct = 60)) == mem)
    // the additive index trees keep the equivalence across appends
    Retrieval.writeSearchIndex(corpus.filter(col("doc_id") < 3),
      "doc_id", "text", incr, nBuckets = 8)
    Retrieval.appendToSearchIndex(corpus.filter(col("doc_id") >= 3),
      "doc_id", "text", incr, batchTag = Some(3L))
    assert(rows(Retrieval.prfIndexTopK(spark, incr, "doc_id", terms,
      k = 10, nDocs = 2, nTerms = 3, maxDfPct = 60)) == mem)
  }

  test("search index append: incremental index answers identically to" +
    " a full rebuild over the union") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sidx2")
    val incr = tmp.toString + "/incr"
    val full = tmp.toString + "/full"
    val older = corpus.filter(col("doc_id") < 3)
    val newer = corpus.filter(col("doc_id") >= 3)
    Retrieval.writeSearchIndex(older, "doc_id", "text", incr, nBuckets = 8)
    Retrieval.appendToSearchIndex(newer, "doc_id", "text", incr,
      batchTag = Some(7L))
    Retrieval.writeSearchIndex(corpus, "doc_id", "text", full, nBuckets = 8)
    val terms = Seq("skew", "join", "spark")
    def hits(p: String) = Retrieval.bm25IndexTopK(spark, p, "doc_id",
      terms, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(hits(incr) == hits(full))
    // replaying the tagged append (crash recovery) changes nothing:
    // dynamic overwrite replaces b=7's partitions, never duplicates
    Retrieval.appendToSearchIndex(newer, "doc_id", "text", incr,
      batchTag = Some(7L))
    assert(hits(incr) == hits(full))
  }

  test("phraseMatch: occurrence counts, overlapping + repeated-term" +
    " phrases, shuffle-free until top-k") {
    val docs = Seq(
      (1L, "spark shuffle join spark shuffle join"),
      (2L, "shuffle spark shuffle spark shuffle"), // overlapping starts
      (3L, "spark spark spark spark"),
      (4L, "join shuffle"), // phrase absent (wrong order)
      (5L, "")).toDF("doc_id", "text")
    val out = Retrieval.phraseMatch(docs, "doc_id", "text",
      Seq("spark", "shuffle"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 2L), (2L, 2L)))
    // repeated-term phrase: "spark spark" occurs at starts 0,1,2 of doc 3
    val rep = Retrieval.phraseMatch(docs, "doc_id", "text",
      Seq("spark", "spark"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rep == Seq((3L, 3L)))
    // map-side until the final ordering: no joins, no window, no
    // aggregation — at most the one ordering exchange
    val q = Retrieval.phraseMatch(docs, "doc_id", "text",
      Seq("spark", "shuffle"), k = 10)
    q.collect()
    val nodes = graft.util.PlanMetrics
      .allNodes(q.queryExecution.executedPlan).map(_.nodeName)
    assert(!nodes.exists(n => n.contains("Window") || n.contains("Join") ||
      n.contains("HashAggregate")), nodes.mkString(","))
    assert(nodes.count(_.contains("Exchange")) <= 1, nodes.mkString(","))
  }

  test("bm25BatchTopK: one pass equals per-query bm25TopK, rank per" +
    " query, duplicate query terms collapse") {
    val qs = Seq(
      (1L, Seq("skew", "join")),
      (2L, Seq("spark", "spark", "codegen")), // dup term = set semantics
      (3L, Seq("absentterm"))) // no hits -> no rows for query 3
      .toDF("query_id", "terms")
    val batch = Retrieval.bm25BatchTopK(corpus, "doc_id", "text", qs,
      k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq.sorted
    val single = Seq(1L -> Seq("skew", "join"),
      2L -> Seq("spark", "codegen")).flatMap { case (qid, terms) =>
      Retrieval.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
        .collect().zipWithIndex.map { case (r, i) =>
          (qid, r.getLong(0), r.getLong(1), r.getLong(2), i + 1)
        }
    }.sorted
    assert(batch == single)
    assert(!batch.exists(_._1 == 3L))
  }

  test("kwicSnippets: window clamps at document edges, first-occurrence" +
    " anchor, count carried") {
    val docs = Seq(
      (1L, "spark shuffle a b c d e f"), // match at doc start
      (2L, "a b c d e f spark shuffle"), // match at doc end
      (3L, "a spark shuffle b spark shuffle c")) // two occurrences
      .toDF("doc_id", "text")
    val out = Retrieval.kwicSnippets(docs, "doc_id", "text",
      Seq("spark", "shuffle"), window = 2, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toList
    assert(out == List(
      (3L, 2L, 1L, "a spark shuffle b spark"), // anchored on FIRST hit
      (1L, 1L, 0L, "spark shuffle a b"), // left clamp
      (2L, 1L, 6L, "e f spark shuffle"))) // right clamp
  }

  test("phraseIndexTopK: positional index matches the scan form," +
    " including across appends") {
    val docs = Seq(
      (1L, "spark shuffle join spark shuffle join"),
      (2L, "shuffle spark shuffle spark shuffle"),
      (3L, "spark spark spark spark"),
      (4L, "join shuffle")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-pidx")
      .toString + "/idx"
    Retrieval.writeSearchIndex(docs.filter(col("doc_id") < 3),
      "doc_id", "text", dir, nBuckets = 8, withPositions = true)
    Retrieval.appendToSearchIndex(docs.filter(col("doc_id") >= 3),
      "doc_id", "text", dir, batchTag = Some(1L))
    for (phrase <- Seq(Seq("spark", "shuffle"), Seq("spark", "spark"),
        Seq("shuffle", "spark", "shuffle"))) {
      val scan = Retrieval.phraseMatch(docs, "doc_id", "text", phrase,
        k = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val idx = Retrieval.phraseIndexTopK(spark, dir, "doc_id", phrase,
        k = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(idx == scan, s"phrase $phrase: index $idx vs scan $scan")
    }
    // a positionless index refuses phrase queries loudly
    val flat = java.nio.file.Files.createTempDirectory("graft-pidx2")
      .toString + "/idx"
    Retrieval.writeSearchIndex(docs, "doc_id", "text", flat, nBuckets = 8)
    intercept[IllegalArgumentException] {
      Retrieval.phraseIndexTopK(spark, flat, "doc_id",
        Seq("spark", "shuffle"), k = 10)
    }
    // and the positional index still answers BM25 identically
    val mem = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaIdx = Retrieval.bm25IndexTopK(spark, dir, "doc_id",
      Seq("spark", "join"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaIdx == mem)
  }

  test("bm25TopK plan: corpus stats and term dfs broadcast, top-k is" +
    " TakeOrderedAndProject — no global sort, no window") {
    val plan = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("skew", "join"), k = 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Window"))
  }

  test("rrfFuse: hand-computed integer contributions, both-arms doc" +
    " wins, ties break on doc_id") {
    val armA = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val armB = Seq((1L, 11L, 1), (1L, 13L, 2))
      .toDF("query_id", "doc_id", "rnk")
    val out = Retrieval.rrfFuse(Seq(armA, armB), k = 10)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // 1e9 div (60+r): r=1 -> 16393442, r=2 -> 16129032, r=3 -> 15873015
    val c1 = 1000000000L / 61; val c2 = 1000000000L / 62
    val c3 = 1000000000L / 63
    assert(out.toSeq == Seq(
      (11L, c2 + c1, 2L, 1), // in both arms: beats every single-arm doc
      (10L, c1, 1L, 2),      // then by rank within the winning arm...
      (13L, c2, 1L, 3),      // ...interleaved across arms by contrib
      (12L, c3, 1L, 4)))
  }

  test("rrfFuse: arm order never changes the fused ranking (integer" +
    " sum is commutative)") {
    val armA = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("query_id", "doc_id", "rnk")
    val armB = Seq((1L, 11L, 1), (2L, 21L, 1), (2L, 20L, 2))
      .toDF("query_id", "doc_id", "rnk")
    def run(arms: Seq[org.apache.spark.sql.DataFrame]) =
      Retrieval.rrfFuse(arms, k = 5).orderBy("query_id", "rnk")
        .collect().toSeq
    assert(run(Seq(armA, armB)) == run(Seq(armB, armA)))
  }

  test("prfExpand: expansion reaches docs the literal query misses;" +
    " the integer df cap guards stopword-frequent candidates") {
    val c = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta delta"),
      (2L, "beta zeta"),         // no alpha: reachable only via "beta"
      (3L, "omega omega kappa"),
      (4L, "common common"))
      .toDF("doc_id", "text")
    // beta is in 3/5 docs (60%): admitted at maxDfPct=80, the round-2
    // ranking now reaches doc 2, which contains no literal query term
    val wide = Retrieval.prfExpand(c, "doc_id", "text", Seq("alpha"),
      k = 10, nDocs = 2, nTerms = 1, maxDfPct = 80)
      .collect().map(_.getLong(0)).toSet
    assert(wide.contains(2L))
    // at maxDfPct=50 beta is guarded out; the fb_tf tie between gamma
    // and delta (1 each) breaks on the term, picking gamma -> doc 2
    // stays unreachable and only the alpha/gamma docs rank
    val tight = Retrieval.prfExpand(c, "doc_id", "text", Seq("alpha"),
      k = 10, nDocs = 2, nTerms = 1, maxDfPct = 50)
      .collect().map(_.getLong(0)).toSet
    assert(tight == Set(0L, 1L))
  }

  test("prfExpand round 2 ranks on the TakeOrderedAndProject path —" +
    " no window over the candidate set") {
    val plan = Retrieval.prfExpand(corpus, "doc_id", "text",
      Seq("spark"), k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Window"))
  }

  test("evalRetrieval: integer-frozen recall@k, MRR and nDCG," +
    " zero-hit queries kept, floor division pinned") {
    // the baked discount table is itself a pinned contract
    assert(Retrieval.ndcgDiscounts(4) ==
      Seq(1000000L, 630930L, 500000L, 430677L))
    assert(Retrieval.ndcgIdcgPrefix(4) ==
      Seq(1000000L, 1630930L, 2130930L, 2561607L))
    val run = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (3L, 30L, 1)).toDF("query_id", "doc_id", "rnk")
    val qrels = Seq((1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
      (2L, 99L), (3L, 30L), (3L, 31L), (3L, 32L))
      .toDF("query_id", "doc_id")
    val out = Retrieval.evalRetrieval(run, qrels)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      // q1: 2 of 4 retrieved at ranks 2,3 -> dcg 1130930 over
      // idcg(4) 2561607 -> ndcg 441492
      (1L, 4L, 2L, 500000L, 500000000L, 441492L),
      // q2: judged but nothing retrieved — kept with zeros
      (2L, 1L, 0L, 0L, 0L, 0L),
      // q3: 1 of 3 at rank 1 -> dcg 1000000 over idcg(3) 2130930
      (3L, 3L, 1L, 333333L, 1000000000L, 469278L)))
  }

  test("evalRetrieval truncates the run to rnk <= k before scoring") {
    val run = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val qrels = Seq((1L, 11L), (1L, 12L)).toDF("query_id", "doc_id")
    val at2 = Retrieval.evalRetrieval(run, qrels, k = 2).collect().head
    // only the rank-2 hit counts at k=2: recall 1/2, dcg disc(2)
    assert(at2.getLong(2) == 1L && at2.getLong(3) == 500000L)
    assert(at2.getLong(5) ==
      1000000L * 630930L / Retrieval.ndcgIdcgPrefix(2)(1))
  }

  test("mineHardNegatives: top-ranked non-positives with dense" +
    " neg_rank; positives and unjudged docs below nNeg excluded") {
    val run = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (1L, 13L, 4), (2L, 20L, 1)).toDF("query_id", "doc_id", "rnk")
    val pos = Seq((1L, 10L), (1L, 12L), (2L, 20L))
      .toDF("query_id", "doc_id")
    val out = Retrieval.mineHardNegatives(run, pos, nNeg = 2)
      .orderBy("query_id", "neg_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSeq
    // q1: ranks 2 and 4 are the non-positives -> neg_rank densifies;
    // q2's only retrieved doc is positive -> no rows at all
    assert(out == Seq((1L, 11L, 2, 1), (1L, 13L, 4, 2)))
  }

  test("mmrRerank: diversity beats a higher-relevance near-duplicate;" +
    " scores are hand-computable integer units") {
    val cands = Seq(
      (1L, 1L, 1000000L, Seq(1.0f, 0.0f)),
      (1L, 2L, 900000L, Seq(1.0f, 0.0f)), // same direction as doc 1
      (1L, 3L, 500000L, Seq(0.0f, 1.0f))) // orthogonal
      .toDF("query_id", "doc_id", "rel_u", "embedding")
    val out = Retrieval.mmrRerank(cands, "embedding", k = 3,
      lambdaPct = 70).orderBy("pick").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getInt(4))).toSeq
    // pick1: doc1 pure-rel 70% = 700000; pick2: doc3's
    // (70*500000 - 30*0)/100 = 350000 beats doc2's
    // (70*900000 - 30*1000000)/100 = 330000 — the diversity win;
    // pick3: doc2 at its penalized 330000
    assert(out == Seq((1L, 700000L, 1), (3L, 350000L, 2),
      (2L, 330000L, 3)))
  }

  test("mmrRerank: input order never changes the selection; k caps" +
    " at the candidate count; rel ties break on doc_id") {
    val base = Seq(
      (1L, 5L, 800000L, Seq(1.0f, 0.0f)),
      (1L, 4L, 800000L, Seq(1.0f, 0.1f)),
      (1L, 9L, 300000L, Seq(0.0f, 1.0f)))
    def run(rows: Seq[(Long, Long, Long, Seq[Float])]) =
      Retrieval.mmrRerank(
        rows.toDF("query_id", "doc_id", "rel_u", "embedding"),
        "embedding", k = 10).orderBy("pick").collect().toSeq
    val a = run(base)
    assert(a == run(base.reverse))
    assert(a.size == 3) // k=10 capped at n=3
    // equal rel_u, no sim term yet: pick 1 goes to the lower doc_id
    assert(a.head.getLong(1) == 4L)
  }

  test("scd2Apply: changed closes+reopens, removed closes, added" +
    " opens, prior closed rows untouched; re-apply is a no-op") {
    val hist = Seq(
      (1L, "x", 1L, Option.empty[Long], true),
      (2L, "y", 1L, Option.empty[Long], true),
      (3L, "z", 0L, Some(1L), false), // already-closed old version
      (3L, "z2", 1L, Option.empty[Long], true))
      .toDF("doc_id", "text", "valid_from", "valid_to", "is_current")
    val snap = Seq((1L, "x"), (2L, "y2"), (4L, "w"))
      .toDF("doc_id", "text")
    val out = Corpus.scd2Apply(hist, snap, "doc_id", "text", 2L)
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
      r.getBoolean(4))).toSet
    assert(rows == Set(
      (1L, "x", 1L, -1L, true),    // unchanged: carried
      (2L, "y", 1L, 2L, false),    // changed: closed...
      (2L, "y2", 2L, -1L, true),   // ...and reopened at v2
      (3L, "z", 0L, 1L, false),    // prior history untouched
      (3L, "z2", 1L, 2L, false),   // removed: closed
      (4L, "w", 2L, -1L, true)))   // added: opened
    // idempotence: folding the same snapshot at v3 changes nothing
    val again = Corpus.scd2Apply(out, snap, "doc_id", "text", 3L)
      .collect().map(_.toSeq).toSet
    assert(again == out.collect().map(_.toSeq).toSet)
  }

  test("scd2AsOf: time travel reproduces each folded snapshot exactly") {
    val hist0 = Seq((1L, "x"), (2L, "y"), (3L, "z"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit(1L).as("valid_from"),
        lit(null).cast("long").as("valid_to"), lit(true).as("is_current"))
    val snap2 = Seq((1L, "x"), (2L, "y2"), (4L, "w")).toDF("doc_id", "text")
    val hist = Corpus.scd2Apply(hist0, snap2, "doc_id", "text", 2L)
    def view(v: Long) = Corpus.scd2AsOf(hist, "doc_id", "text", v)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(view(1L) == Set((1L, "x"), (2L, "y"), (3L, "z")))
    assert(view(2L) == Set((1L, "x"), (2L, "y2"), (4L, "w")))
  }

  test("cdcApply: last-writer-wins per id — upsert replaces, delete" +
    " removes, later seq beats earlier, untouched ids carry; replay" +
    " is idempotent") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "text")
    val log = Seq(
      (2L, 1L, "upsert", "b2"),         // plain update
      (3L, 1L, "upsert", "c2"),         // update...
      (3L, 2L, "delete", null),         // ...then delete: delete wins
      (4L, 2L, "upsert", "d2"),         // delete then update,
      (4L, 1L, "delete", null),         //   log order ≠ seq order
      (5L, 1L, "upsert", "e"))          // insert of a new id
      .toDF("id", "seq", "op", "text")
    val out = Corpus.cdcApply(base, log, "id", "seq", "op")
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a"), (2L, "b2"), (4L, "d2"), (5L, "e")))
    // at-least-once safety: applying the same log to the result is a
    // fixpoint (every change is already reflected)
    val again = Corpus.cdcApply(out, log, "id", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == rows)
    // empty log: snapshot unchanged
    val noop = Corpus.cdcApply(base, log.filter(lit(false)),
      "id", "seq", "op").collect().map(_.getLong(0)).toSet
    assert(noop == Set(1L, 2L, 3L, 4L))
  }

  test("tableDigest: invariant under row order and partitioning;" +
    " sensitive to any cell change; null distinct from empty string") {
    val df = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option("c")))
      .toDF("id", "s")
    def dig(d: org.apache.spark.sql.DataFrame) =
      Corpus.tableDigest(d, Seq("id", "s")).collect().head
    val base = dig(df)
    assert(base.getLong(0) == 3L)
    assert(dig(df.orderBy(col("s").desc)) == base)
    assert(dig(df.repartition(7)) == base)
    // one character in one cell changes the digest, same row count
    val mut = dig(Seq((1L, Option("a")), (2L, Option("B")),
      (3L, Option("c"))).toDF("id", "s"))
    assert(mut.getLong(0) == 3L && mut.getDecimal(1) != base.getDecimal(1))
    // a null cell is not an empty-string cell
    val withNull = dig(Seq((1L, Option.empty[String])).toDF("id", "s"))
    val withEmpty = dig(Seq((1L, Option(""))).toDF("id", "s"))
    assert(withNull.getDecimal(1) != withEmpty.getDecimal(1))
    // empty frame: zero digest, zero rows (not an error)
    val empty = dig(df.filter(lit(false)))
    assert(empty.getLong(0) == 0L && empty.getDecimal(1).longValueExact == 0L)
  }

  test("interleaveByAttr: the i-th best of every source competes at" +
    " slot i — a dominant source cannot hold consecutive places") {
    val run = Seq(
      (1L, 10L, 1, "a"), (1L, 11L, 2, "a"), (1L, 12L, 3, "a"),
      (1L, 13L, 4, "b"), (1L, 14L, 5, "b"))
      .toDF("query_id", "doc_id", "rnk", "source")
    val out = Retrieval.interleaveByAttr(run, "source")
      .orderBy("fair_rank").collect()
      .map(r => (r.getLong(1), r.getInt(5))).toSeq
    // slot 1: docs 10 (a) then 13 (b, worse rnk); slot 2: 11, 14; ...
    assert(out == Seq((10L, 1), (13L, 2), (11L, 3), (14L, 4),
      (12L, 5)))
  }

  test("retrieval-quality family: empty and no-match inputs return" +
    " empty frames, never crash") {
    // no document contains either query term -> round 1 is empty,
    // expansion is empty, round 2 scores only the (absent) literals
    assert(Retrieval.prfExpand(corpus, "doc_id", "text",
      Seq("zzz", "qqq"), k = 5).collect().isEmpty)
    val noRun = Seq.empty[(Long, Long, Int)]
      .toDF("query_id", "doc_id", "rnk")
    assert(Retrieval.rrfFuse(Seq(noRun, noRun), k = 5)
      .collect().isEmpty)
    assert(Retrieval.mineHardNegatives(noRun,
      Seq.empty[(Long, Long)].toDF("query_id", "doc_id"), 3)
      .collect().isEmpty)
    assert(Retrieval.evalRetrieval(noRun,
      Seq.empty[(Long, Long)].toDF("query_id", "doc_id"))
      .collect().isEmpty)
    assert(Retrieval.interleaveByAttr(
      Seq.empty[(Long, Long, Int, String)]
        .toDF("query_id", "doc_id", "rnk", "source"), "source")
      .collect().isEmpty)
    assert(Retrieval.mmrRerank(
      Seq.empty[(Long, Long, Long, Seq[Float])]
        .toDF("query_id", "doc_id", "rel_u", "embedding"),
      "embedding", k = 3).collect().isEmpty)
  }

  test("searchTier composition: dense pick sequence per query, picks" +
    " drawn from the fused candidate pool, self excluded by the" +
    " dense arm only") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.8f, 0.3f)), (3L, Seq(0.0f, 1.0f)),
      (5L, Seq(0.2f, 0.9f)))
      .toDF("vec_id", "embedding")
    val qs = Seq((0L, Seq("spark"))).toDF("query_id", "terms")
    val out = Pipelines.searchTier(corpus, "doc_id", "text",
        emb, "vec_id", "embedding", qs, emb.filter(col("vec_id") === 0),
        metaCols = Seq.empty, armK = 5, fuseK = 5, picks = 3)
      .orderBy("pick").collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
    assert(out.map(_.getLong(0)).forall(_ == 0L))
    // doc 0 is the query itself: reachable through BM25 (it contains
    // "spark") even though the dense arm excludes it — still fusable
    assert(out.map(_.getLong(1)).distinct.length == 3)
  }

  test("rrfFuse: fusion plan touches only the arm outputs — one" +
    " hash aggregate over a union, no corpus join") {
    val armA = Seq((1L, 10L, 1)).toDF("query_id", "doc_id", "rnk")
    val armB = Seq((1L, 11L, 1)).toDF("query_id", "doc_id", "rnk")
    val plan = Retrieval.rrfFuse(Seq(armA, armB), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "fusion must not join anything")
    assert(plan.contains("Union"))
  }
}
