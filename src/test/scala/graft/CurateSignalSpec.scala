package graft

import graft.ops.{TextDedup, TextStats}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Value-parity pins for the fused curate kernel (round 18) against
  * the staged declarative forms it replaced — the old forms are
  * re-created HERE, verbatim from rounds 13-17 (`withLangId` /
  * `withQualityMetrics` / the curate filter + exactDedup semi-join),
  * so a kernel regression diffs loudly against the original
  * semantics. Inputs include the degenerate shapes the rules exist
  * for: empty text, punctuation-only, no-stopword text, profile-score
  * ties, multi-byte characters, exact duplicates. */
class CurateSignalSpec extends SparkSpec {
  import spark.implicits._

  // ---- the OLD declarative forms, verbatim ----

  private def oldLangId(df: DataFrame, textCol: String,
                        outCol: String): DataFrame = {
    val scoreCols = TextStats.stopwordProfiles.map { case (l, _) => s"_lid_s_$l" }
    val scored = TextStats.stopwordProfiles.foldLeft(
      df.withColumn("_lid_w", TextDedup.tokens(col(textCol)))) {
      case (d, (l, p)) =>
        d.withColumn(s"_lid_s_$l",
          size(filter(col("_lid_w"), w => w.isin(p.map(lit): _*))).cast("long"))
    }
    val best = scoreCols.map(col).reduce(greatest(_, _))
    val pick = TextStats.stopwordProfiles.reverse.foldLeft(lit("und")) {
      case (acc, (l, _)) =>
        when(col(s"_lid_s_$l") > 0 && col(s"_lid_s_$l") === best, lit(l))
          .otherwise(acc)
    }
    scored.withColumn(outCol, pick).drop("_lid_w" +: scoreCols: _*)
  }

  private def oldQuality(df: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val allStop = TextStats.stopwordProfiles.flatMap(_._2).distinct
    val t = col(textCol)
    val s2 = df.select(col(idCol), t)
      .withColumn("_qm_w", TextDedup.tokens(t))
      .withColumn("_nchars", length(t).cast("long"))
      .withColumn("_ntok", size(col("_qm_w")).cast("long"))
      .withColumn("_npunct",
        length(regexp_replace(t, "[a-zA-Z0-9\\s]+", "")).cast("long"))
      .withColumn("_nstop",
        size(filter(col("_qm_w"), w => w.isin(allStop.map(lit): _*)))
          .cast("long"))
    val nTok = col("_ntok")
    val punctRatio = when(col("_nchars") > 0,
      col("_npunct").cast("double") / col("_nchars").cast("double"))
      .otherwise(lit(0.0))
    val stopRatio = when(nTok > 0,
      col("_nstop").cast("double") / nTok.cast("double")).otherwise(lit(0.0))
    val lengthScore = least(nTok.cast("double") / 20.0, lit(1.0))
    val score = round(
      lengthScore * (lit(1.0) - punctRatio) *
        (lit(0.5) + least(stopRatio * 5.0, lit(0.5))), 6)
    s2.withColumn("n_tokens", nTok)
      .withColumn("quality_score", score)
      .select(col(idCol), col("quality_score"), col("n_tokens"))
  }

  /** The pre-round-18 curate pipeline, verbatim: langid frame joined
    * with the quality frame, filtered, exact-dedup'd via the groupBy +
    * left-semi-join-back shape. */
  private def oldCurate(df: DataFrame, idCol: String, textCol: String,
                        keepLangs: Seq[String],
                        minQuality: Double): DataFrame = {
    val lang = oldLangId(df.select(col(idCol), col(textCol)),
      textCol, "lang_pred")
    val q = oldQuality(df, idCol, textCol)
    val passed = lang.join(q, idCol)
      .filter(col("lang_pred").isin(keepLangs.map(lit): _*) &&
        col("quality_score") >= minQuality)
    val keep = TextDedup.exactDedup(
        passed.select(col(idCol), col(textCol)), idCol, textCol)
      .select(col("keep_id").as(idCol))
    passed.join(keep, Seq(idCol), "left_semi")
      .select(col(idCol), col("lang_pred"), col("quality_score"),
        col("n_tokens"))
  }

  // ---- corpus: degenerate + profile-crossing + duplicated docs ----

  private def corpus: DataFrame = {
    val hand = Seq(
      "",                                    // empty
      "!!! ??? ;;;",                         // punctuation-only, no token
      "the quick brown fox and the lazy dog is here of course",
      "el rapido zorro de la casa es los dias",
      "der hund und die katze das ist",
      "le chat les chiens des rues est la",  // fr, 'la' shared with es
      "the el the el the el",                // en/es tie material
      "la la la la",                         // es/fr shared word only
      "zzz yyy xxx www",                     // no stopword hits -> und
      "the übermensch café emoji 日本語 the", // multi-byte + stopwords
      "is a of and the es de la los el und der die das est le les des",
      "short the",
      ("the and of is a " * 20).trim,        // long, stopword-dense
      ("punct,,, the;;; and... " * 8).trim)
    val rng = new scala.util.Random(181818)
    val words = Vector("the", "a", "of", "and", "is", "el", "la", "de",
      "los", "es", "der", "die", "das", "und", "ist", "le", "les",
      "des", "est", "data", "spark", "rows", "text", "word", "x9",
      "q2", ",", "!!", "—")
    val random = (1 to 120).map { _ =>
      (0 until rng.nextInt(60)).map(_ => words(rng.nextInt(words.size)))
        .mkString(" ")
    }
    // duplicate a slice so the exact-dedup branch has work to do
    val dups = random.take(15) ++ random.take(7)
    (hand ++ random ++ dups).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def kernelCol: Column =
    graft.functions.CurateSignal.signalCol(
      TextDedup.tokens(col("text")),
      length(col("text")).cast("long"),
      length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]+", ""))
        .cast("long"),
      TextStats.stopwordProfiles, Seq("en", "es"), 0.7)

  test("kernel fields == verbatim staged langid/quality expressions") {
    val old = oldLangId(
      oldQuality(corpus, "doc_id", "text")
        .join(corpus.select(col("doc_id"), col("text")), "doc_id"),
      "text", "lang_pred")
    val both = old.join(
      corpus.select(col("doc_id"), kernelCol.as("_cs")), "doc_id")
    val bad = both.filter(
      not(col("_cs.lang_pred") <=> col("lang_pred")) ||
        not(col("_cs.n_tokens") <=> col("n_tokens")) ||
        not(col("_cs.quality_score") <=> col("quality_score")) ||
        not(col("_cs.pass") <=>
          (col("lang_pred").isin("en", "es") && col("quality_score") >= 0.7)))
      .collect()
    assert(bad.isEmpty, s"kernel disagrees: ${bad.take(5).mkString("; ")}")
  }

  test("curate == verbatim old pipeline (join + filter + dedup semi-join)") {
    val now = TextStats.curate(corpus, "doc_id", "text",
      Seq("en", "es"), 0.7).orderBy("doc_id").collect()
    val old = oldCurate(corpus, "doc_id", "text",
      Seq("en", "es"), 0.7).orderBy("doc_id").collect()
    assert(now.toSeq == old.toSeq,
      s"curate mismatch: now=${now.take(5).mkString(";")} old=${old.take(5).mkString(";")}")
    assert(now.nonEmpty, "parity corpus produced no survivors — weak test")
  }

  test("round6 == Spark Round(_, 6) on adversarial doubles") {
    val rng = new scala.util.Random(424242)
    val vals = Seq(0.0, 1.0, 0.1234565, 0.1234575, 0.9999995, 1e-7,
      0.49999949999, 0.5000005) ++
      (1 to 500).map(_ => rng.nextDouble())
    val df = vals.toDF("x")
    val bad = df.select(col("x"), round(col("x"), 6).as("e"))
      .collect()
      .filter(r => graft.functions.CurateSignalKernel.round6(r.getDouble(0))
        != r.getDouble(1))
    assert(bad.isEmpty, s"round6 mismatch on ${bad.take(5).mkString(";")}")
  }

  test("null text -> null row; kernel runs inside codegen") {
    val withNull = Seq((1L, Some("the cat and the dog is of a")), (2L, None))
      .toDF("doc_id", "text")
    val r = withNull.repartition(2)
      .select(col("doc_id"), kernelCol.as("_cs")).orderBy("doc_id").collect()
    assert(!r(0).isNullAt(1) && r(1).isNullAt(1))
    val df = withNull.repartition(2).select(kernelCol)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
