package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain curation — the provenance side of web-corpus filtering
  * (RefinedWeb/FineWeb-style pipelines gate documents by their source
  * domain before any content filter runs: a domain-level block/allow
  * decision is orders of magnitude cheaper than per-document quality
  * scoring and catches whole spam networks at once).
  *
  * Scale shape: host and registered-domain extraction are pure
  * codegen'd column expressions (native `parse_url` + split/slice —
  * no UDF, no shuffle); the domain card is one map-side-combinable
  * aggregation at DOMAIN cardinality; applying a domain decision back
  * to the corpus is a broadcast semi-join on the domain key (the
  * domain table is always tiny next to the corpus).
  */
object Domains {

  /** Lowercased host of a URL — Spark's native TryParseUrl expression
    * (the `try_` form: NULL on unparseable input instead of the ANSI
    * error, so downstream treats bad provenance as its own
    * "no-domain" group rather than failing the corpus job). */
  def hostOf(url: Column): Column = lower(try_parse_url(url, lit("HOST")))

  /** Registered domain of a host: the last two labels, or the last
    * THREE when the second-level label is a generic registry prefix
    * ("example.co.uk" → "example.co.uk", not "co.uk") — the standard
    * heuristic fallback when no public-suffix snapshot ships; swap
    * [[genericSecondLevel]] for a PSL-derived set to upgrade. Hosts
    * with fewer labels (bare "localhost") pass through unchanged. */
  val genericSecondLevel: Seq[String] =
    Seq("co", "com", "net", "org", "ac", "gov", "edu")

  def registeredDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val np = size(parts)
    val secondLevel = element_at(parts, -2)
    when(host.isNull, lit(null).cast("string"))
      .when(np >= 3 &&
        secondLevel.isin(genericSecondLevel.map(v => v: Any): _*),
        array_join(slice(parts, -3, 3), "."))
      .when(np >= 2, array_join(slice(parts, -2, 2), "."))
      .otherwise(host)
  }

  /** Per-registered-domain curation card over a corpus with a URL
    * column: document count, distinct-host count, mean token count
    * (6dp, exact integer sum inside), english fraction (6dp), and the
    * keep decision `n_docs ≥ minDocs ∧ en_frac ≥ minEnFrac` — the
    * domain-level gate. One aggregation at domain cardinality. */
  def domainCard(df: DataFrame, urlCol: String, langCol: String,
                 textCol: String, minDocs: Long,
                 minEnFrac: Double): DataFrame = {
    val host = hostOf(col(urlCol))
    // greatest(size, 0): size() of a NULL token array is -1 under
    // Spark's legacy sizeOfNull default, which would SUBTRACT from
    // the token sum while the doc still counts in n_docs (DuckDB's
    // SUM skips the NULL, i.e. contributes 0 — this aligns them).
    df.select(registeredDomain(host).as("domain"), host.as("_host"),
        col(langCol).as("_lang"),
        greatest(size(TextDedup.tokens(col(textCol))), lit(0))
          .cast("long").as("_ntok"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("_host")).as("n_hosts"),
        sum(col("_ntok")).as("_tok"),
        sum(when(col("_lang") === "en", 1L).otherwise(0L)).as("_en"))
      .select(col("domain"), col("n_docs"), col("n_hosts"),
        round(col("_tok").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_tokens"),
        round(col("_en").cast("double") / col("n_docs").cast("double"), 6)
          .as("en_frac"),
        (col("n_docs") >= minDocs &&
          round(col("_en").cast("double") / col("n_docs").cast("double"), 6)
            >= minEnFrac).as("keep"))
  }

  /** Apply a domain decision back to the corpus: keep only documents
    * whose registered domain is in the card's keep set. Broadcast
    * left-semi on the domain key — the corpus never reshuffles. */
  def filterByDomains(df: DataFrame, urlCol: String,
                      card: DataFrame): DataFrame =
    df.join(broadcast(card.filter(col("keep")).select(col("domain"))),
      registeredDomain(hostOf(col(urlCol))) === col("domain"), "left_semi")
}
