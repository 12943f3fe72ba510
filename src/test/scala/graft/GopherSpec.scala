package graft

import graft.ops.TextStats
import org.apache.spark.sql.functions._

/** Gopher rule filter + full repetition family: hand-computed fixtures
  * per rule/signal, plus empty-input flow-through. The oracled
  * t_gopher_rules / t_gopher_repetition queries pin the cross-engine
  * arithmetic; these pin the SEMANTICS against worked examples. */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  private def rules(rows: (Long, String)*) =
    TextStats.gopherRules(rows.toDF("doc_id", "text"), "doc_id", "text",
      minWords = 5L, maxWords = 100L, minMeanLen = 2.0, maxMeanLen = 6.0,
      maxSymbolRatio = 0.1, maxBulletFrac = 0.5, maxEllipsisFrac = 0.3,
      minAlphaFrac = 0.8, minStopHits = 2L)
      .orderBy("doc_id").collect()

  test("gopherRules: worked example — words, mean length, stopwords") {
    val r = rules((1L, "The cat sat on the mat with a hat")).head
    // tokens: the,cat,sat,on,the,mat,with,a,hat -> 9 words, 25 chars
    assert(r.getAs[Long]("n_words") == 9L)
    assert(r.getAs[Double]("mean_word_len") == 2.777778)
    assert(r.getAs[Long]("stop_hits") == 2L) // the, with
    assert(r.getAs[Boolean]("r_words"))
    assert(r.getAs[Boolean]("r_mean_len"))
    assert(r.getAs[Boolean]("r_stopwords"))
    assert(r.getAs[Double]("symbol_ratio") == 0.0)
    assert(r.getAs[Double]("bullet_frac") == 0.0)
    assert(r.getAs[Double]("alpha_frac") == 1.0)
    assert(r.getAs[Boolean]("keep"))
  }

  test("gopherRules: bullet, ellipsis, symbol and numeral rules bite") {
    val r = rules(
      (1L, "- one thing\n- two things\nthe rest of it here"),
      (2L, "wait for it...\nthe next part with more"),
      (3L, "the count with abc 123 456 789 000 111"),
      (4L, "the thing with ## some # more ### here")
    ).map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc 1: 3 lines, 2 bulleted -> 2/3 > 0.5 fails bullets only
    assert(r(1L).getAs[Double]("bullet_frac") == 0.666667)
    assert(!r(1L).getAs[Boolean]("r_bullets"))
    assert(r(1L).getAs[Boolean]("r_ellipsis"))
    assert(!r(1L).getAs[Boolean]("keep"))
    // doc 2: 2 lines, 1 ends '...' -> 1/2 > 0.3 fails ellipsis; the
    // '...' also counts one symbol over 8 words -> 0.125 > 0.1
    assert(r(2L).getAs[Double]("ellipsis_frac") == 0.5)
    assert(!r(2L).getAs[Boolean]("r_ellipsis"))
    assert(r(2L).getAs[Double]("symbol_ratio") == 0.125)
    assert(!r(2L).getAs[Boolean]("r_symbols"))
    // doc 3: 9 ws-words, 5 numeral-only -> alpha 4/9 < 0.8
    assert(r(3L).getAs[Double]("alpha_frac") == 0.444444)
    assert(!r(3L).getAs[Boolean]("r_alpha"))
    // doc 4: 6 '#' over 6 words ('#' runs are not tokens) -> 1.0 > 0.1
    assert(r(4L).getAs[Double]("symbol_ratio") == 1.0)
    assert(!r(4L).getAs[Boolean]("r_symbols"))
  }

  test("gopherRules: empty text flows through as all-zero, keep=false") {
    val r = rules((1L, "")).head
    assert(r.getAs[Long]("n_words") == 0L)
    assert(r.getAs[Double]("mean_word_len") == 0.0)
    assert(r.getAs[Double]("alpha_frac") == 0.0)
    assert(!r.getAs[Boolean]("keep"))
  }

  private def rep(rows: (Long, String)*) =
    TextStats.gopherRepetition(rows.toDF("doc_id", "text"),
      "doc_id", "text", dupN = 5).orderBy("doc_id").collect()

  test("gopherRepetition: duplicate-line fractions by count and chars") {
    val r = rep((1L, "a b\nc d\na b")).head
    // 3 lines, 2 distinct -> 1/3 by count; 6 of 9 chars duplicated
    assert(r.getAs[Double]("dup_line_frac") == 0.333333)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.666667)
  }

  test("gopherRepetition: top-bigram char fraction, smallest-gram tie") {
    val r = rep((1L, "x y x y x")).head
    // bigrams: 2x "x y", 2x "y x"; tie -> "x y" (lexicographically
    // first); frac = 2 occurrences * 2 chars / 5 word chars
    assert(r.getAs[Double]("top2_char_frac") == 0.8)
  }

  test("gopherRepetition: duplicated 5-gram positional coverage counts " +
    "overlapping occurrences once") {
    val r = rep((1L, "a b c d e a b c d e f")).head
    // "a b c d e" repeats at starts 0 and 5 -> tokens 0..9 covered,
    // 10 of 11 chars; one distinct duplicated gram, two span starts
    assert(r.getAs[Double]("dup5_char_frac") == 0.909091)
    assert(r.getAs[Long]("dup5_ngrams") == 1L)
    assert(r.getAs[Long]("dup5_spans") == 2L)
    val none = rep((2L, "p q r s t u v w")).head
    assert(none.getAs[Double]("dup5_char_frac") == 0.0)
    assert(none.getAs[Long]("dup5_ngrams") == 0L)
    assert(none.getAs[Long]("dup5_spans") == 0L)
  }

  test("pplBuckets: head/middle/tail are nonempty, monotone in the " +
    "typicality score, and the approx mode shares the contract") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextStats.pplBuckets(d, "doc_id", "text").collect()
    val byB = out.groupBy(_.getAs[String]("ppl_bucket"))
      .map { case (b, rs) => b -> rs.map(_.getAs[Double]("avg_bigram_prob")) }
    assert(byB.keySet == Set("head", "middle", "tail"))
    // same score -> same label, so bucket ranges cannot interleave
    assert(byB("tail").max < byB("middle").min)
    assert(byB("middle").max < byB("head").min)
    // thirds (ties permitting): no bucket degenerates
    assert(byB.values.forall(_.length > out.length / 6))
    // approx mode: same schema and doc set (labels may differ at the
    // t-digest's error margin by design)
    val approx = TextStats.pplBuckets(d, "doc_id", "text", exact = false)
    assert(approx.columns.toSeq ==
      Seq("doc_id", "n_bigrams", "avg_bigram_prob", "ppl_bucket"))
    assert(approx.count() == out.length)
  }

  test("bucketLabel quantum tracks corpus scale: web-scale scores " +
    "(~1e-10, where a hardcoded 9dp collapses every tertile) still " +
    "separate, and tiny-corpus ulp absorption is preserved") {
    import org.apache.spark.sql.functions.{lit, round => rnd}
    // planted web-scale corpus: total_bigrams = 1e12 → scores sit at
    // ~1e-10 with tertile gaps of ~1e-10 — BELOW the old 9dp quantum
    val rows = Seq(
      (1L, 1.0e-10), (2L, 2.0e-10), (3L, 3.0e-10)).toDF("doc_id", "p")
    val labeled = rows.select(col("doc_id"),
        TextStats.bucketLabel(col("p"), lit(1.5e-10), lit(2.5e-10),
          lit(1000000000000L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labeled == Map(1L -> "tail", 2L -> "middle", 3L -> "head"),
      labeled.toString)
    // and the collapse the fix removes is real: at 9dp every one of
    // these scores and thresholds rounds to 0.0 → all-head
    val collapsed = rows.select(col("doc_id"),
        (rnd(col("p"), 9) >= rnd(lit(2.5e-10), 9)).as("headAt9dp"))
      .collect().map(_.getBoolean(1))
    assert(collapsed.forall(identity), "9dp no longer collapses? " +
      "then the planted fixture needs rescaling")
    // small corpus: a threshold perturbed at double-ulp distance (the
    // cross-engine percentile disagreement) must NOT flip any label
    val t0 = 0.00123456; val t1 = 0.00234567
    val ulp = java.lang.Math.ulp(t1)
    val small = Seq((1L, 0.001), (2L, t1), (3L, 0.003)).toDF("doc_id", "p")
    def lab(tt0: Double, tt1: Double) = small.select(col("doc_id"),
        TextStats.bucketLabel(col("p"), lit(tt0), lit(tt1), lit(50000L))
          .as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lab(t0, t1) == lab(t0 + ulp, t1 - ulp))
    assert(lab(t0, t1)(2L) == "head") // boundary doc: score == t1
  }

  test("vocabDrift: identical corpora read zero delta; a planted flood " +
    "surfaces with the exact ppm shift; minPpm drops the noise tail") {
    val a = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"))
      .toDF("doc_id", "text")
    val same = TextStats.vocabDrift(a, a, "text").collect()
    assert(same.nonEmpty && same.forall(_.getAs[Long]("delta_ppm") == 0L))
    // b = a plus a 6-token flood: 12 tokens total on the b side
    val b = Seq((1L, "alpha beta gamma"),
      (2L, "alpha beta delta spam spam spam spam spam spam"))
      .toDF("doc_id", "text")
    val drift = TextStats.vocabDrift(a, b, "text").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("ppm_a"), r.getAs[Long]("ppm_b"),
          r.getAs[Long]("delta_ppm"))).toMap
    // spam: absent in a, 6 of 12 tokens in b -> exactly 500000 ppm
    assert(drift("spam") == ((0L, 500000L, 500000L)))
    // alpha: 2/6 -> 333333, 2/12 -> 166666 (integer division)
    assert(drift("alpha") == ((333333L, 166666L, -166667L)))
    // the floor keeps the flood, drops everything below it
    val floored = TextStats.vocabDrift(a, b, "text", minPpm = 400000L)
      .collect().map(_.getString(0)).toSet
    assert(floored.contains("spam") && !floored.contains("gamma"))
  }

  test("gopher ops are shuffle-free projections (plan-asserted)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val d = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    for (op <- Seq(
      TextStats.gopherRules(d, "doc_id", "text"),
      TextStats.gopherRepetition(d, "doc_id", "text"))) {
      val plan = op.queryExecution.executedPlan
      assert(plan.collect { case s: ShuffleExchangeLike => s }.isEmpty,
        s"expected a pure map-side plan, got:\n$plan")
    }
  }

  test("gopherRepetition: empty and sub-n docs flow through as zeros") {
    val r = rep((1L, ""), (2L, "only four words here"))
    assert(r(0).getAs[Long]("n_tokens") == 0L)
    assert(r(0).getAs[Double]("top2_char_frac") == 0.0)
    assert(r(0).getAs[Double]("dup5_char_frac") == 0.0)
    assert(r(1).getAs[Double]("dup5_char_frac") == 0.0)
  }
}
