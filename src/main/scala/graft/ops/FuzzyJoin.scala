package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — entity-resolution blocking for
  * name/title dedup (the fuzzy cousin of the token-set joins in
  * ops/TextDedup: PPJoin catches word-level overlap, this catches
  * character-level typos/transpositions that change the token).
  *
  * Candidate generation is positional q-gram count filtering (Gravano
  * et al., VLDB 2001): if levenshtein(a,b) ≤ d then
  *   (1) ||a|−|b|| ≤ d (length band),
  *   (2) a and b share ≥ max(|a|,|b|) − q + 1 − q·d positional q-grams
  *       within position offset ≤ d (each edit destroys ≤ q grams).
  * So candidates come from a q-gram equi-join (one shuffle keyed on the
  * gram) + a per-pair match count — never an all-pairs product — and
  * exact `levenshtein` verifies survivors. Occurrence multiplicity can
  * OVERCOUNT matches (a repeated gram matches several positions);
  * that only admits extra candidates for the verify step — fail-open,
  * never fail-closed, so the join is lossless.
  *
  * Pairs whose count threshold is non-positive (both strings shorter
  * than q·(d+1)) carry no signal for the filter; they go through a
  * separate short-string block (length-band nested-loop over the tiny
  * sub-q·(d+1) domain — broadcastable by construction). The two paths
  * partition the pair space (max-length above/below the bar), so no
  * dedup join is needed.
  *
  * At 100 TB the residual hazard is a HOT GRAM (a constant prefix
  * shared corpus-wide makes its grams join all-pairs). The escalation
  * is the same rare-first prefix indexing the PPJoin implementation
  * already uses (ops/TextDedup.scala prefix filter): index only each
  * string's q·d+1 globally-rarest grams. Not wired here because the
  * name domains this ships against are gram-diverse; the hook is the
  * `grams` sub-plan.
  */
object FuzzyJoin {

  /** Positional q-grams (1-based) as array<struct<pos,gram>>. */
  private def pgrams(s: Column, q: Int): Column =
    transform(sequence(lit(1), greatest(length(s) - (q - 1), lit(0))),
      i => struct(i.as("pos"), s.substr(i, lit(q)).as("gram")))

  /** Candidate pairs surviving the blocking filters, before the exact
    * levenshtein verify — exposed so ScaleProbe can measure the
    * candidate-to-naive ratio. */
  private[graft] def candidates(df: DataFrame, idCol: String,
                                strCol: String, maxDist: Int,
                                q: Int): DataFrame = {
    require(maxDist >= 1 && q >= 2)
    val d = maxDist
    val shortMax = q * (d + 1) - 1 // threshold ≤ 0 ⟺ both lengths ≤ this
    val s = df.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).as("len"))

    val grams = s.filter(col("len") >= q).select(col("id"), col("s"),
        col("len"), explode(pgrams(col("s"), q)).as("pg"))
      .select(col("id"), col("s"), col("len"),
        col("pg.pos").as("pos"), col("pg.gram").as("gram"))
    val longPairs = grams.as("a").join(grams.as("b"),
        col("a.gram") === col("b.gram") &&
          col("a.id") < col("b.id") &&
          abs(col("a.pos") - col("b.pos")) <= d &&
          abs(col("a.len") - col("b.len")) <= d &&
          greatest(col("a.len"), col("b.len")) > shortMax)
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.s").as("a_s"), col("b.s").as("b_s"),
        col("a.len").as("a_len"), col("b.len").as("b_len"))
      .agg(count(lit(1)).as("_m"))
      .filter(col("_m") >=
        greatest(col("a_len"), col("b_len")) - (q - 1) - q * d)
      .select(col("a_id"), col("b_id"), col("a_s"), col("b_s"))

    val sh = s.filter(col("len") <= shortMax)
    val shortPairs = sh.as("a").join(sh.as("b"),
        col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= d)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.s").as("a_s"), col("b.s").as("b_s"))

    longPairs.union(shortPairs)
  }

  /** All pairs (a_id < b_id) with levenshtein ≤ maxDist, with the
    * distance. Exact (blocking is lossless); output ordered. */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
                maxDist: Int, q: Int = 2): DataFrame =
    candidates(df, idCol, strCol, maxDist, q)
      .withColumn("dist", levenshtein(col("a_s"), col("b_s")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
      .orderBy("a_id", "b_id")
}
