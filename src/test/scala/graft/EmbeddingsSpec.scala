package graft

import graft.ops.Embeddings
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("qcosine: identical ~1, orthogonal 0, opposite ~-1") {
    val d = vecs(
      1L -> Seq(1f, 0f, 0f), 2L -> Seq(1f, 0f, 0f),
      3L -> Seq(0f, 1f, 0f), 4L -> Seq(-1f, 0f, 0f))
    val q = Embeddings.quantize(col("embedding"))
    val pairs = d.as("x").crossJoin(d.as("y"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        Embeddings.qcosine(
          Embeddings.quantize(col("x.embedding")),
          Embeddings.quantize(col("y.embedding"))).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-9)
    assert(math.abs(pairs((1L, 3L))) < 1e-9)
    assert(math.abs(pairs((1L, 4L)) + 1.0) < 1e-9)
    val _ = q
  }

  test("bruteForceTopK ranks by cosine, excludes self, tie-breaks by id") {
    val d = vecs(
      1L -> Seq(1f, 0f), 2L -> Seq(0.9f, 0.1f),
      3L -> Seq(0f, 1f), 4L -> Seq(1f, 0.01f))
    val out = Embeddings.bruteForceTopK(d, d.filter($"vec_id" === 1L),
      "vec_id", "embedding", 2).orderBy("rnk").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("corpus_id") == 4L) // closest to (1,0)
    assert(out(1).getAs[Long]("corpus_id") == 2L)
    assert(out.forall(_.getAs[Long]("corpus_id") != 1L))
  }

  test("int8 codes stay in [-127,127], peak hits 127, zero vector codes to zeros") {
    val d = vecs(1L -> Seq(0.5f, -0.25f, 0.125f), 2L -> Seq(0f, 0f, 0f))
    val rows = Embeddings.int8Quantized(d, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val q1 = rows(0).getSeq[Long](rows(0).fieldIndex("q8"))
    assert(q1 == Seq(127L, -64L, 32L)) // round-half-away at ±: 63.5→64
    assert(q1.map(math.abs).max == 127L)
    assert(rows(1).getSeq[Long](rows(1).fieldIndex("q8")) == Seq(0L, 0L, 0L))
  }

  test("int8TopK recall vs exact brute force on testdata") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" < 20)
    def keys(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keys(Embeddings.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    val coded = keys(Embeddings.int8TopK(e, q, "vec_id", "embedding", 5))
    val recall = (exact & coded).size.toDouble / exact.size
    // measured 2026-08: 0.98 at sf0.001 and sf0.01 (k=5, 20 queries);
    // int8 noise ≲ 1/254 per component moves only near-tied neighbors
    assert(recall >= 0.9, s"int8 recall $recall")
  }

  test("lshTopK results are a subset of brute-force candidates with exact scores") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = e.filter($"vec_id" < 5)
    val bf = Embeddings.bruteForceTopK(e, probes, "vec_id", "embedding", 50)
      .select("query_id", "corpus_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Embeddings.lshTopK(e, probes, "vec_id", "embedding", 4, 64, 5)
      .collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))
      // every LSH hit must carry the same exact cosine as brute force
      // (same bucket ⇒ same arithmetic), when present in the bf top-50
      bf.get(k).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
  }

  test("IVF with nProbe == nLists equals brute force exactly") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = e.filter($"vec_id" < 5)
    val model = Embeddings.ivfFit(e, "vec_id", "embedding", nLists = 4)
    val ivf = Embeddings.ivfTopK(model, e, probes, "vec_id", "embedding",
        nProbe = 4, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk")) ->
        (r.getAs[Long]("corpus_id"), r.getAs[Double]("cosine"))).toMap
    val bf = Embeddings.bruteForceTopK(e, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk")) ->
        (r.getAs[Long]("corpus_id"), r.getAs[Double]("cosine"))).toMap
    assert(ivf == bf)
  }

  test("IVF with partial probes returns a subset with exact scores") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = e.filter($"vec_id" < 5)
    val model = Embeddings.ivfFit(e, "vec_id", "embedding", nLists = 8)
    val bf = Embeddings.bruteForceTopK(e, probes, "vec_id", "embedding", 100)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id")) ->
        r.getAs[Double]("cosine")).toMap
    val ivf = Embeddings.ivfTopK(model, e, probes, "vec_id", "embedding",
      nProbe = 2, k = 5).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))
      bf.get(key).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
  }

  test("multi-probe LSH with h == nPlanes equals brute force exactly") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = e.filter($"vec_id" < 5)
    val mp = Embeddings.lshTopKMultiProbe(e, probes, "vec_id", "embedding",
        nPlanes = 3, dim = 64, k = 5, probeHamming = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk")) ->
        (r.getAs[Long]("corpus_id"), r.getAs[Double]("cosine"))).toMap
    val bf = Embeddings.bruteForceTopK(e, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk")) ->
        (r.getAs[Long]("corpus_id"), r.getAs[Double]("cosine"))).toMap
    assert(mp == bf)
  }

  test("multi-probe widens candidate coverage monotonically") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = e.filter($"vec_id" < 5)
    // k above the corpus size ⇒ the result IS the candidate set, so
    // widening the probe radius can only add pairs, never drop them
    val kAll = e.count().toInt + 1
    def hits(h: Int) = Embeddings.lshTopKMultiProbe(e, probes, "vec_id",
        "embedding", nPlanes = 6, dim = 64, k = kAll, probeHamming = h)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("corpus_id"))).toSet
    val h0 = hits(0); val h1 = hits(1)
    assert(h0.subsetOf(h1))
    assert(h1.size >= h0.size)
  }

  test("identical vectors always share an LSH bucket (full recall on exact dups)") {
    val d = vecs(1L -> Seq(0.3f, -0.2f, 0.9f), 2L -> Seq(0.3f, -0.2f, 0.9f),
      3L -> Seq(-0.5f, 0.1f, 0.2f))
    val out = Embeddings.cosineNearDupPairs(d, "vec_id", "embedding", 3, 0.99)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("a_id") == 1L)
    assert(out.head.getAs[Long]("b_id") == 2L)
  }

  test("banded near-dup recall >= 0.95 on NON-identical cos>=0.99 pairs") {
    // corpus: sf0.001 embeddings plus a perturbed twin per vector —
    // genuinely different directions (cosine < 1), still >= 0.99
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
    val twins = e.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.005)).as("embedding"))
    val u = e.union(twins)
    // ground truth: exact all-pairs cosine at the 0.99 bar
    val q = u.select(col("vec_id").as("id"),
      Embeddings.quantize(col("embedding")).as("qv"))
    val truth = q.as("x").join(q.as("y"), col("x.id") < col("y.id"))
      .withColumn("cos", Embeddings.qcosine(col("x.qv"), col("y.qv")))
      .filter(col("cos") >= 0.99)
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture must seed true near-dup pairs")
    // twins are non-identical: their cosine must be < 1
    val twinCos = q.as("x").join(q.as("y"),
        col("y.id") === col("x.id") + 100000)
      .select(Embeddings.qcosine(col("x.qv"), col("y.qv")).as("c"))
      .collect().map(_.getDouble(0))
    assert(twinCos.forall(c => c < 1.0 && c >= 0.99))
    val found = Embeddings.cosineNearDupPairs(u, "vec_id", "embedding",
        64, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact verification ⇒ no false positives
    assert(found.subsetOf(truth))
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall (${found.size}/${truth.size})")
  }

  test("semanticDedup keeps smallest-id exemplars, drops all dominated vectors") {
    // 1 and its exact twin 2 (drop 2); 3 alone; chain via angles in the
    // first two coords: 10 at 0°, 11 at 7° (cos≈0.9925 ≥ 0.99 of 10),
    // 12 at 14° (cos≈0.9925 of 11, but cos≈0.970 < 0.99 of 10) — the
    // pairwise dominance rule drops BOTH 11 and 12 (each has a
    // smaller-id near-dup), documented chain behavior
    def ang(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat, 0f)
    }
    val d = vecs(1L -> Seq(0.3f, -0.2f, 0.9f), 2L -> Seq(0.3f, -0.2f, 0.9f),
      3L -> Seq(-0.5f, 0.1f, 0.2f),
      10L -> ang(0), 11L -> ang(7), 12L -> ang(14))
    val kept = Embeddings.semanticDedup(d, "vec_id", "embedding", 3, 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 10L), s"kept $kept")
    // survivors carry their input rows unchanged (schema + values)
    val row = Embeddings.semanticDedup(d, "vec_id", "embedding", 3, 0.99)
      .filter(col("vec_id") === 3L).collect()
    assert(row.head.getAs[scala.collection.Seq[Float]]("embedding").toSeq ==
      Seq(-0.5f, 0.1f, 0.2f))
  }

  test("recallAtK: exact-vs-exact is 1.0, misses counted per query, " +
    "queries with zero hits still appear") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val queries = e.filter(col("vec_id") < 5)
    val exact = Embeddings.bruteForceTopK(e, queries,
      "vec_id", "embedding", 5)
    // self-recall: identical frames recall 1.0 everywhere
    val self = Embeddings.recallAtK(exact, exact).collect()
    assert(self.nonEmpty && self.forall(_.getDouble(3) == 1.0))
    assert(self.forall(r => r.getLong(1) == 5L && r.getLong(2) == 5L))
    // LSH full-probe radius equals brute force -> recall 1.0 (the
    // e_lsh_exact oracle identity, restated through the evaluator)
    val lshFull = Embeddings.lshTopKMultiProbe(e, queries,
      "vec_id", "embedding", nPlanes = 4, dim = 64, k = 5,
      probeHamming = 4)
    val r1 = Embeddings.recallAtK(lshFull, exact).collect()
    assert(r1.forall(_.getDouble(3) == 1.0))
    // a degenerate approx frame (one query's rows dropped entirely)
    // still yields a row for that query, with recall 0
    val crippled = exact.filter(col("query_id") =!= 0L)
    val r0 = Embeddings.recallAtK(crippled, exact).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(r0(0L) == 0.0)
    assert(r0.filterKeys(_ != 0L).values.forall(_ == 1.0))
  }

  test("ivfPqTopK with a full probe is exactly pqTopK (the composed " +
    "index's cell plumbing adds no error beyond PQ's)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    val cells = Embeddings.ivfFit(e, "vec_id", "embedding", nLists = 8)
    val pq = Embeddings.pqFit(e, "vec_id", "embedding", m = 4, k = 16)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val full = Embeddings.ivfPqTopK(cells, pq, e, q, "vec_id", "embedding",
      nProbe = 8, k = 5)
    val plain = Embeddings.pqTopK(pq, e, q, "vec_id", "embedding", 5)
    assert(key(full) == key(plain))
    // a partial probe returns k rows per query and a superset-free
    // subset of cells' candidates — rows still ranked, ties stable
    val partial = Embeddings.ivfPqTopK(cells, pq, e, q, "vec_id",
      "embedding", nProbe = 2, k = 5)
    val byQ = partial.collect().groupBy(_.getLong(0))
    assert(byQ.values.forall(rs =>
      rs.map(_.getInt(3)).sorted.sameElements(1 to rs.length)))
  }

  test("pqEncode is a shuffle-free projection (plan-asserted)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val model = Embeddings.pqFit(e, "vec_id", "embedding", m = 4, k = 16)
    val plan = Embeddings.pqEncode(model, e, "vec_id", "embedding")
      .queryExecution.executedPlan
    assert(plan.collect { case s: ShuffleExchangeLike => s }.isEmpty,
      s"encoding must not shuffle the corpus, got:\n$plan")
  }

  test("pq: codes in range, rerank lifts recall over the raw ADC scan, " +
    "and a corpus-wide shortlist reproduces exact L2 brute force") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    val model = Embeddings.pqFit(e, "vec_id", "embedding", m = 4, k = 16)
    assert(model.codebooks.length == 4 &&
      model.codebooks.forall(_.length == 16) && model.subDim == 16)
    // every code is one of the 16 per-subspace centroids
    val codes = Embeddings.pqEncode(model, e, "vec_id", "embedding")
      .collect().map(_.getSeq[Int](1))
    assert(codes.forall(cs => cs.length == 4 &&
      cs.forall(c => c >= 0 && c < 16)))
    def meanRecall(approx: org.apache.spark.sql.DataFrame,
                   exact: org.apache.spark.sql.DataFrame): Double = {
      val rs = Embeddings.recallAtK(approx, exact).collect()
        .map(_.getAs[Double]("recall"))
      rs.sum / rs.length
    }
    val exact = Embeddings.bruteForceTopKL2(e, q, "vec_id", "embedding", 5)
    val adc = Embeddings.pqTopK(model, e, q, "vec_id", "embedding", 5)
    val rr = Embeddings.pqTopKRerank(model, e, q, "vec_id", "embedding",
      k = 5, shortlist = 50)
    val (ra, rb) = (meanRecall(adc, exact), meanRecall(rr, exact))
    assert(rb >= ra, s"re-rank recall $rb below raw ADC $ra")
    // shortlist >= corpus makes the re-rank exactly brute force
    val full = Embeddings.pqTopKRerank(model, e, q, "vec_id", "embedding",
      k = 5, shortlist = 100000)
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(key(full) == key(exact))
  }
}
