package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything here is a PURE FUNCTION of (seed, row id): the selection
  * variate is the md5-derived uniform `Synthetic.u01`, so a sample is
  * reproducible across runs, engines (the DuckDB oracle draws the same
  * rows), partitionings and cluster sizes — none of which is true of
  * `df.sample()` / `rand()`, whose draw depends on partition layout.
  * Filters are codegen'd map-side predicates: sampling 100 TB is an
  * embarrassingly parallel scan that writes the kept fraction, no
  * shuffle. Membership is STABLE under corpus growth: a document's
  * (seed, id) never changes, so yesterday's holdout rows are still
  * holdout rows after an append — the property that keeps eval sets
  * uncontaminated across pipeline runs.
  */
object Sampling {

  private def u(seed: String, id: Column): Column = Synthetic.u01(seed, id)

  /** Uniform deterministic sample: keep rows with u01(seed, id) < frac. */
  def uniform(df: DataFrame, idCol: String, frac: Double,
              seed: String): DataFrame =
    df.filter(u(seed, col(idCol)) < frac)

  /** Stratified deterministic sample: per-stratum keep rates (e.g.
    * re-balancing languages or sources), `defaultRate` for strata not
    * in the map. The rate lookup is a broadcast map literal — one
    * predicate, no join, no shuffle. */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
                 rates: Map[String, Double], defaultRate: Double,
                 seed: String): DataFrame = {
    val m = typedlit(rates)
    df.filter(u(seed, col(idCol)) <
      coalesce(m(col(stratumCol)), lit(defaultRate)))
  }

  /** Data mixing with per-source EPOCH weights — the canonical
    * pretraining recipe step ("2.5 epochs of source A, 0.5 of B"):
    * weight w yields floor(w) guaranteed copies of every row plus one
    * extra copy kept with probability frac(w), decided by
    * u01(seed, id:copy) so the draw is per-(row, copy) deterministic.
    * Output carries `copy` (0-based) so downstream shuffling/packing
    * can treat repeats as distinct rows. One explode of at most
    * ceil(w)+1 candidates per row, one codegen'd filter — no shuffle,
    * no driver state; 100 TB mixes as a scan. */
  def mixSources(df: DataFrame, sourceCol: String, idCol: String,
                 weights: Map[String, Double], defaultWeight: Double,
                 seed: String): DataFrame = {
    require(defaultWeight >= 0 && weights.values.forall(_ >= 0),
      "epoch weights must be non-negative")
    val m = typedlit(weights)
    val w = coalesce(m(col(sourceCol)), lit(defaultWeight))
    df.withColumn("_w", w)
      .withColumn("copy",
        explode(sequence(lit(0L), floor(col("_w")).cast("long"))))
      .filter(col("copy") < floor(col("_w")) ||
        u(seed, concat_ws(":", col(idCol), col("copy"))) <
          (col("_w") - floor(col("_w"))))
      .drop("_w")
  }

  /** Deterministic holdout tag: `is_holdout` = u01(seed, id) < frac.
    * Tagging (not splitting) keeps it one scan; `train`/`holdout`
    * below are the two filtered views. */
  def withHoldout(df: DataFrame, idCol: String, frac: Double,
                  seed: String): DataFrame =
    df.withColumn("is_holdout", u(seed, col(idCol)) < frac)

  def train(df: DataFrame, idCol: String, frac: Double,
            seed: String): DataFrame =
    df.filter(u(seed, col(idCol)) >= frac)

  def holdout(df: DataFrame, idCol: String, frac: Double,
              seed: String): DataFrame =
    df.filter(u(seed, col(idCol)) < frac)
}
