package graft

import graft.functions.TextKernels
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Value-parity pins for the fused text kernels (round 17) against the
  * declarative higher-order-function expressions they replaced — the
  * old forms are re-created HERE, verbatim, so a kernel regression
  * diffs loudly against the original semantics, not against itself.
  * Inputs deliberately include the degenerate shapes the Gopher
  * filters exist for: empty docs, single tokens, all-one-token docs,
  * whole-doc repeated phrases, and multi-byte characters (numChars vs
  * bytes). */
class TextKernelsSpec extends SparkSpec {
  import spark.implicits._

  // ---- the OLD declarative forms, verbatim from rounds 13-16 ----

  private def oldPhrase(phrase: Seq[String]): Column = {
    val L = phrase.length
    def matchAt(i: Column) =
      phrase.zipWithIndex.map { case (t, j) =>
        element_at(col("_w"), i + lit(j + 1)) === lit(t)
      }.reduce(_ && _)
    when(size(col("_w")) >= L,
      filter(sequence(lit(0), size(col("_w")) - L), i => matchAt(i)))
      .otherwise(array().cast("array<int>"))
  }

  private def shingleArr(w: Column, n: Int): Column = {
    val len = greatest(size(w) - (n - 1), lit(0))
    (1 until n).foldLeft(slice(w, lit(1), len)) { (acc, j) =>
      zip_with(acc, slice(w, lit(j + 1), len),
        (a, b) => concat(a, lit(" "), b))
    }
  }

  private def oldMaxRunGram(sorted: Column): Column = aggregate(
    sorted,
    struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"),
      lit("").as("bestg")),
    (acc, g) => {
      val run = when(g === acc.getField("prev"),
        acc.getField("run") + lit(1L)).otherwise(lit(1L))
      val better = run > acc.getField("best")
      struct(g.as("prev"), run.as("run"),
        when(better, run).otherwise(acc.getField("best")).as("best"),
        when(better, g).otherwise(acc.getField("bestg")).as("bestg"))
    },
    acc => struct(acc.getField("best").as("cnt"),
      acc.getField("bestg").as("gram")))

  private def oldDupValues(sorted: Column): Column = array_distinct(
    filter(zip_with(sorted, slice(sorted, lit(2),
      greatest(size(sorted) - 1, lit(0))), (a, b) => when(a === b, a)),
      v => v.isNotNull))

  private def oldRunDupChars(sorted: Column): Column = {
    def flush(acc: Column): Column =
      when(acc.getField("run") >= 2L,
        acc.getField("chars") + acc.getField("run") *
          length(acc.getField("prev")).cast("long"))
        .otherwise(acc.getField("chars"))
    aggregate(
      sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("chars")),
      (acc, g) => {
        val same = acc.getField("prev").isNotNull &&
          g === acc.getField("prev")
        struct(g.as("prev"),
          when(same, acc.getField("run") + 1L).otherwise(lit(1L))
            .as("run"),
          when(same, acc.getField("chars")).otherwise(flush(acc))
            .as("chars"))
      },
      acc => flush(acc))
  }

  private def oldCoverage(dupN: Int): (Column, Column, Column) = {
    val g = shingleArr(col("_w"), dupN)
    val dupg = oldDupValues(sort_array(g))
    val starts = filter(
      transform(g, (gr, i) =>
        when(array_contains(dupg, gr), i.cast("long"))),
      v => v.isNotNull)
    val iv = aggregate(
      starts,
      array().cast("array<struct<lo:bigint,hi:bigint>>"),
      (acc, s) => when(
        size(acc) > 0 && s <= element_at(acc, -1).getField("hi"),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(struct(element_at(acc, -1).getField("lo").as("lo"),
            greatest(element_at(acc, -1).getField("hi"), s + lit(dupN))
              .as("hi")))))
        .otherwise(concat(acc,
          array(struct(s.as("lo"), (s + lit(dupN)).as("hi"))))))
    val cov = aggregate(
      iv, lit(0L),
      (acc, v) => acc + aggregate(
        slice(col("_w"), v.getField("lo").cast("int") + 1,
          (v.getField("hi") - v.getField("lo")).cast("int")),
        lit(0L), (a, w) => a + length(w).cast("long")))
    (size(dupg).cast("long"), size(starts).cast("long"), cov)
  }

  // ---- corpora ----

  // deterministic pseudo-random docs over a tiny alphabet (heavy
  // duplication by construction) plus hand-picked degenerate shapes
  private def docs: Seq[Seq[String]] = {
    val alpha = Vector("aa", "bb", "cc", "dd", "ee")
    val rng = new scala.util.Random(171717)
    val random = (1 to 60).map { _ =>
      val len = rng.nextInt(40)
      Seq.fill(len)(alpha(rng.nextInt(alpha.size)))
    }
    val degenerate = Seq(
      Seq.empty[String],
      Seq("aa"),
      Seq("aa", "aa"),
      Seq.fill(30)("aa"),                              // one repeated token
      (1 to 5).flatMap(_ => Seq("x1", "y2", "z3")),    // repeated phrase
      Seq("aa", "bb", "aa", "bb", "aa"),               // overlapping grams
      Seq("solo", "tokens", "never", "repeat", "here"))
    random ++ degenerate
  }

  private def tokensDf = docs.zipWithIndex
    .map { case (ws, i) => (i.toLong, ws) }.toDF("id", "_w")

  private def assertSame(actual: Column, expected: Column,
                         what: String): Unit = {
    val bad = tokensDf
      .select(col("id"), actual.as("a"), expected.as("e"))
      .filter(not(col("a") <=> col("e")))
      .collect()
    assert(bad.isEmpty,
      s"$what: kernel disagrees with declarative form on " +
        bad.take(5).map(_.toString).mkString("; "))
  }

  test("PhraseScan == filtered-sequence position scan (count and first)") {
    for (phrase <- Seq(Seq("aa"), Seq("aa", "bb"), Seq("x1", "y2", "z3"),
      Seq("nope", "nothere"))) {
      val ps = TextKernels.phraseScanCol(col("_w"), phrase)
      val old = oldPhrase(phrase)
      assertSame(ps.getField("n_occ"), size(old).cast("long"),
        s"n_occ($phrase)")
      // get() not element_at(): Spark 4 element_at throws on an empty
      // array; the production caller only reads first_pos after the
      // n_occ > 0 filter, which this parity check doesn't apply
      assertSame(ps.getField("first_pos"),
        coalesce(get(old, lit(0)).cast("long"), lit(-1L)),
        s"first_pos($phrase)")
    }
  }

  test("TopGramRun == sorted run-scan argmax (count AND gram) for n=2,3,4") {
    for (n <- Seq(2, 3, 4)) {
      val k = TextKernels.topGramRunCol(col("_w"), n)
      val old = oldMaxRunGram(sort_array(shingleArr(col("_w"), n)))
      assertSame(k.getField("cnt"), old.getField("cnt"), s"cnt(n=$n)")
      assertSame(k.getField("gram"), old.getField("gram"), s"gram(n=$n)")
    }
  }

  test("DupGramCoverage == dupg/starts/interval-merge/slice-sum chain") {
    for (n <- Seq(2, 5)) {
      val k = TextKernels.dupGramCoverageCol(col("_w"), n)
      val (dupg, starts, cov) = oldCoverage(n)
      assertSame(k.getField("dup_ngrams"), dupg, s"dup_ngrams(n=$n)")
      assertSame(k.getField("dup_spans"), starts, s"dup_spans(n=$n)")
      assertSame(k.getField("cov_chars"), cov, s"cov_chars(n=$n)")
    }
  }

  test("SumCharLen / DupRunChars == interpreted folds, incl. multi-byte") {
    // lines-shaped arrays: empty strings, duplicates, multi-byte chars
    // (length() counts CHARS — ü/emoji must agree with numChars)
    val lines = Seq(
      Seq.empty[String],
      Seq(""),
      Seq("", "", "a"),
      Seq("über", "über", "x"),
      Seq("line one", "line two", "line one", "line one"),
      Seq("日本語のテキスト", "日本語のテキスト", "ascii")
    ).zipWithIndex.map { case (ls, i) => (i.toLong, ls) }
      .toDF("id", "_w")
    val oldSum = aggregate(col("_w"), lit(0L),
      (acc, w) => acc + length(w).cast("long"))
    val badSum = lines.select(
        TextKernels.sumCharLenCol(col("_w")).as("a"), oldSum.as("e"))
      .filter(not(col("a") <=> col("e"))).collect()
    assert(badSum.isEmpty, s"sumCharLen: ${badSum.mkString(";")}")
    val badDup = lines.select(
        TextKernels.dupRunCharsCol(col("_w")).as("a"),
        oldRunDupChars(sort_array(col("_w"))).as("e"))
      .filter(not(col("a") <=> col("e"))).collect()
    assert(badDup.isEmpty, s"dupRunChars: ${badDup.mkString(";")}")
  }

  test("null array propagates, kernels run inside codegen") {
    val withNull = Seq((1L, Some(Seq("aa", "bb"))), (2L, None))
      .toDF("id", "_w")
    val r = withNull.select(col("id"),
        TextKernels.topGramRunCol(col("_w"), 2).as("t"),
        TextKernels.sumCharLenCol(col("_w")).as("s"))
      .orderBy("id").collect()
    assert(!r(0).isNullAt(1) && r(0).getLong(2) == 4L)
    assert(r(1).isNullAt(1) && r(1).isNullAt(2))
    // and the plan stays inside WholeStageCodegen (no fallback) —
    // repartition first or ConvertToLocalRelation folds the project
    // away at plan time and there is no codegen stage to inspect
    val df = withNull.repartition(2)
      .select(TextKernels.dupGramCoverageCol(col("_w"), 2))
    df.collect() // finalize the AQE plan before inspecting it
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" operator prefix is the WholeStageCodegen marker in
    // the AQE plan summary — the kernel's Project must carry it
    assert(plan.contains("*(1) Project"), plan)
  }
}
