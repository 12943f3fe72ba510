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

  /** Temperature-based source resampling — the multilingual-pretraining
    * recipe (mT5/XLM-R style): sample sources with probability
    * q_s ∝ p_s^alpha where p_s = n_s/N is the source's corpus share.
    * alpha < 1 flattens the distribution (upweights rare sources
    * relative to their share), alpha = 1 is proportional (no change),
    * alpha > 1 sharpens toward head sources. `budgetFrac` sets the
    * target output size as a fraction of the corpus; the per-source
    * keep rate is min(1, budget * q_s / n_s) — capped at 1 because
    * this operator only DOWN-samples deterministically (use
    * [[mixSources]] with epoch weights > 1 to upsample).
    *
    * Plan shape: one partial-agg count of the (low-cardinality) source
    * column, rate arithmetic on that tiny frame, then a broadcast hash
    * join back to the corpus and a codegen'd u01 filter — the 100 TB
    * pass over the fact table is a map-only scan; the only shuffle
    * moves one row per source. Membership is a pure function of
    * (seed, id, the source histogram), so the draw is reproducible
    * and engine-independent for a fixed corpus snapshot. */
  def temperature(df: DataFrame, sourceCol: String, idCol: String,
                  alpha: Double, budgetFrac: Double,
                  seed: String): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    require(budgetFrac > 0, "budgetFrac must be positive")
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).cast("double").as("_n"))
    val total = counts.agg(sum("_n").as("_tot"),
      sum(pow(col("_n"), alpha)).as("_z"))
    val rates = counts.crossJoin(broadcast(total))
      .withColumn("_rate",
        least(lit(1.0),
          lit(budgetFrac) * col("_tot") * pow(col("_n"), alpha)
            / (col("_z") * col("_n"))))
      .select(col(sourceCol), col("_rate"))
    df.join(broadcast(rates), sourceCol)
      .filter(u(seed, col(idCol)) < col("_rate"))
      .drop("_rate")
  }

  /** Per-source quota cap — the "domain cap" curation step (à la C4 /
    * RefinedWeb): keep at most `cap` documents per source, retaining
    * the best by `scoreCol` descending (ties broken by `idCol`
    * ascending, so the kept set is deterministic).
    *
    * Scale design: a naive `row_number() OVER (PARTITION BY source)`
    * sorts EVERY source — at 100 TB that is a full shuffle of the
    * corpus and a single-task sort of the hottest domain. Instead the
    * plan is two-path: a partial-agg count finds the (few) over-cap
    * sources; under-cap sources pass through with a broadcast anti
    * join (map-only — for a web corpus this is the long tail, i.e.
    * most of the bytes); only rows of over-cap sources are shuffled
    * and ranked. The residual hazard is one pathologically hot domain
    * sorting in one task — acceptable while `cap` (and hence the
    * retained prefix) fits a task; beyond that, pre-filter with an
    * approximate per-source score threshold before ranking. */
  def sourceCap(df: DataFrame, sourceCol: String, scoreCol: String,
                idCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val over = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > cap).select(col(sourceCol))
    val under = df.join(broadcast(over), Seq(sourceCol), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val capped = df.join(broadcast(over), Seq(sourceCol), "left_semi")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap).drop("_rn")
    under.unionByName(capped)
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

  /** Deterministic GLOBAL shuffle + sharding — the export step between
    * curation and the trainer: training wants documents in a fixed
    * pseudo-random order split into equal shards, and wants the same
    * order on every rerun. The order key is `md5Hash60(seed:id)` — a
    * pure row function, so the permutation is reproducible across
    * runs, engines and cluster sizes (a `rand()`/`repartition` shuffle
    * is none of these), and uniform regardless of id distribution —
    * adjacent source documents land in unrelated shards/positions, so
    * a training batch never sees a source-correlated run. Adds
    * `ord` (the key), `shard` = ord % nShards (equal-sized in
    * expectation: ord is uniform on 2^60), and `pos` (0-based dense
    * rank within the shard by (ord, id) — id breaks 60-bit ties).
    *
    * Cost: computing ord/shard is a codegen'd projection; `pos` is one
    * hash exchange on `shard` + a per-shard sort — the SAME layout the
    * sharded write needs anyway, so the ordering is free at export
    * time ([[writeShuffledShards]] reuses it). `pos` is dense within a
    * SNAPSHOT of the corpus: appending documents keeps every existing
    * row's (shard, relative order) but renumbers `pos` after the
    * insertion points — positions are manifest coordinates, not stable
    * ids (membership/order stability comes from `ord`, which never
    * changes). At 100 TB size nShards so a shard fits a task:
    * the per-shard sort is the only super-linear term. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    seed: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("ord"), col(idCol))
    df.withColumn("ord",
        TextDedup.md5Hash60(concat(lit(seed), lit(":"),
          col(idCol).cast("string"))))
      .withColumn("shard", pmod(col("ord"), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  /** Write the shuffled corpus as `shard=<k>/` parquet, rows in
    * training order within each shard file. `repartition(nShards,
    * shard)` routes each shard to exactly one task (a task may own
    * several shards, a shard never splits), `sortWithinPartitions`
    * puts the task's rows in (shard, ord) order, and `partitionBy`
    * splits the task output per shard preserving row order — so the
    * file order IS the `pos` order and the trainer streams shards
    * sequentially with zero further shuffling. */
  def writeShuffledShards(df: DataFrame, idCol: String, nShards: Int,
                          seed: String, path: String): Unit =
    shuffleShards(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
