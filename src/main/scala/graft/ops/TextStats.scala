package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis family for a training-data pipeline: language ID
  * (stopword-profile heuristic), quality scoring, token counting, and
  * document fingerprinting. All pure column expressions — whole-stage
  * codegen end to end, no UDFs, embarrassingly parallel (no shuffle at
  * all until a caller aggregates).
  */
object TextStats {

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Deterministic scoring: count profile-word occurrences per
    * language, argmax with fixed tie order (profile list order). */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "des", "est"))

  private def countWord(text: Column, w: String): Column =
    size(filter(TextDedup.tokens(text), t => t === lit(w))).cast("long")

  /** Stopword-profile score for one language over a text column. */
  def langScore(text: Column, profile: Seq[String]): Column =
    profile.map(countWord(text, _)).reduce(_ + _)

  /** Language-ID: argmax of profile scores, 'und' (undetermined) when all
    * scores are zero. First profile in the list wins ties. */
  def langId(text: Column): Column = {
    val scored = stopwordProfiles.map { case (l, p) => (l, langScore(text, p)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** BPE-ish subword count: alphanumeric runs are split into 4-char
    * subword units (ceil(len/4)) and each punctuation char is its own
    * token — a cheap, deterministic proxy for a BPE tokenizer's token
    * count (no vocab needed; useful for corpus size accounting). */
  def tokenCountBpe(text: Column): Column = {
    val words = TextDedup.tokens(text)
    val sub = aggregate(words, lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long"))
    val punct = length(regexp_replace(text, "[a-zA-Z0-9\\s]+", "")).cast("long")
    sub + punct
  }

  /** Quality metrics: char count, token counts, mean token length,
    * punctuation ratio, stopword ratio, and a composite [0,1] score
    * (the reference has no text quality notion; this follows the usual
    * corpus-filtering recipe: penalize very short docs, high punctuation,
    * zero stopwords). */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = TextDedup.tokens(t)
    val nTok = size(words).cast("long")
    val nChars = length(t).cast("long")
    val meanTokLen = when(nTok > 0,
      aggregate(words, lit(0L), (acc, w) => acc + length(w).cast("long"))
        .cast("double") / nTok.cast("double")).otherwise(lit(0.0))
    val punctRatio = when(nChars > 0,
      length(regexp_replace(t, "[a-zA-Z0-9\\s]+", "")).cast("double") /
        nChars.cast("double")).otherwise(lit(0.0))
    val allStop = stopwordProfiles.flatMap(_._2).distinct
    val stopRatio = when(nTok > 0,
      size(filter(words, w => w.isin(allStop.map(lit): _*))).cast("double") /
        nTok.cast("double")).otherwise(lit(0.0))
    val lengthScore = least(nTok.cast("double") / 20.0, lit(1.0))
    val score = round(
      lengthScore * (lit(1.0) - punctRatio) *
        (lit(0.5) + least(stopRatio * 5.0, lit(0.5))), 6)
    df.select(col(idCol),
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      tokenCountWs(t).as("n_tokens_ws"),
      tokenCountBpe(t).as("n_tokens_bpe"),
      round(meanTokLen, 6).as("mean_token_len"),
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      score.as("quality_score"))
  }

  /** Corpus vocabulary: top-k tokens by frequency (ties broken
    * lexicographically). Shuffle key = token; map-side partial counts do
    * the heavy lifting at corpus scale; only k rows reach the driver. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = df.select(explode(TextDedup.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    // TakeOrdered first (parallel partial top-k per partition), THEN rank
    // the k survivors — a global row_number over all counts would funnel
    // the whole vocabulary through one reducer at corpus scale
    val top = counts.orderBy(col("n").desc, col("token")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    top.withColumn("rnk", row_number().over(w).cast("int"))
      .select("token", "n", "rnk")
  }

  /** Word n-gram frequency table, top-k (the n-gram statistics a
    * contamination / memorization audit needs). */
  def ngramTopK(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val w = TextDedup.tokens(col(textCol))
    val grams = df.select(
      explode(TextDedup.shingleArray(w, n)).as("ngram"))
    val counts = grams.groupBy("ngram").agg(count(lit(1)).as("n"))
    val top = counts.orderBy(col("n").desc, col("ngram")).limit(k)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("ngram"))
    top.withColumn("rnk", row_number().over(win).cast("int"))
      .select("ngram", "n", "rnk")
  }

  /** Document-length histogram: counts per `binWidth`-char bin —
    * the distribution check before length-based quality filtering. */
  def lengthHistogram(df: DataFrame, textCol: String, binWidth: Int): DataFrame =
    df.select((floor(length(col(textCol)) / binWidth) * binWidth)
        .cast("long").as("bin_lo"))
      .groupBy("bin_lo").agg(count(lit(1)).as("n_docs"))

  /** Document fingerprint: position-weighted rolling hash over tokens —
    * sum over positions of ((pos+1) * (md5Hash60(token) mod 1e6)) mod
    * 2^61-1. Order-sensitive (unlike a bag-of-words hash) and exactly
    * reproducible in any engine with md5. */
  def fingerprint(text: Column): Column = {
    val words = TextDedup.tokens(text)
    val pairs = zip_with(
      words,
      sequence(lit(1), greatest(size(words), lit(1))),
      (w, i) => i.cast("long") * (TextDedup.md5Hash60(w) % 1000000L))
    when(size(words) === 0, lit(0L)).otherwise(
      aggregate(pairs, lit(0L), (acc, x) => (acc + x) % 2305843009213693951L))
  }
}
