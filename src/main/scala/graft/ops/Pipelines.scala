package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline composition — the recipe a corpus
  * team actually runs, wired from the library's oracled stages so a
  * user gets curation → dedup → export in one call instead of
  * re-deriving the stage order (which is load-bearing: dedup-before-
  * filter vs filter-before-dedup is output-identical ONLY because
  * curate dedups on exact content, see [[TextStats.curate]]; near-dup
  * removal AFTER quality filtering avoids LSH-ing docs that die
  * anyway; sharding LAST so positions are dense over the final
  * survivor set).
  *
  * Every stage keeps the library's scale shapes: curate's narrow
  * projections, banded LSH (never all-pairs), the one hash exchange of
  * the shard write. Nothing here collects to the driver.
  */
object Pipelines {

  /** The MINIMAL recipe — [[pretrainRecipe]] without its line-dedup,
    * model-scoring, and temperature-rebalance stages: curate `docs`
    * (language + quality + exact dedup), remove LSH near-dups
    * ([[TextDedup.dedupCorpus]]'s banded pipeline over the survivors),
    * and assign the deterministic training order
    * ([[Sampling.shuffleShards]]). Use it when there is no trained
    * scoring model and no source column to rebalance on — a fine-tune
    * corpus pulled from one source, say; reach for [[pretrainRecipe]]
    * for a web-scale pretraining mix. Both compositions are oracled
    * end-to-end (`pipe_curate_shards` / `pipe_pretrain_recipe`).
    * Returns the export frame: surviving
    * (id, text, lang_pred, quality_score, n_tokens) + (ord, shard,
    * pos). Write it with [[Sampling.writeShuffledShards]]'s layout by
    * passing `outPath` — or leave None and materialize it yourself. */
  def curateToShards(docs: DataFrame, idCol: String, textCol: String,
                     keepLangs: Seq[String], minQuality: Double,
                     n: Int, k: Int, bands: Int, minJ: Double,
                     nShards: Int, seed: String,
                     outPath: Option[String] = None): DataFrame = {
    // stage boundaries cut logical lineage, exactly as in
    // [[pretrainRecipe]] (see the discussion there): without the cuts
    // AQE re-optimizes the whole accumulated plan per stage and the
    // composition measured 93 s vs 13 s at sf0.1 for identical output
    val curated = TextStats.curate(docs, idCol, textCol,
      keepLangs, minQuality).localCheckpoint()
    // curatedDocs is deliberately NOT cut (round-18 per-site A/B:
    // 2.74 s vs 3.42 s with the cut, quiet control): its lineage is
    // one raw scan + a semi join against the ALREADY-CUT curated ids
    // — re-evaluating that per dedupCorpus reference is two pruned
    // parquet scans, where the cut materialized a corpus-scale
    // (id, text) frame to executor storage. pretrainRecipe's
    // curatedDocs has the same shape and was never cut.
    val curatedDocs = docs.select(col(idCol), col(textCol))
      .join(curated.select(col(idCol)), Seq(idCol), "left_semi")
    val survivors = TextDedup.dedupCorpus(curatedDocs, idCol, textCol,
      n, k, bands, minJ)
    val enriched = survivors.join(
      curated.select(col(idCol), col("lang_pred"),
        col("quality_score"), col("n_tokens")), Seq(idCol))
      .localCheckpoint()
    val sharded = Sampling.shuffleShards(enriched, idCol, nShards, seed)
    outPath.foreach { p =>
      sharded.repartition(nShards, col("shard"))
        .sortWithinPartitions(col("shard"), col("ord"), col(idCol))
        .write.mode("overwrite").partitionBy("shard").parquet(p)
    }
    sharded
  }

  /** The FULL pretraining-corpus recipe, stage order load-bearing:
    *
    *  1. global line dedup FIRST ([[TextDedup.dedupLines]]) —
    *     boilerplate inflates quality/model scores and near-dup
    *     signatures, so strip it before anything measures the text;
    *  2. heuristic curation ([[TextStats.curate]]: language, quality,
    *     exact dedup) on the cleaned text;
    *  3. model-based scoring ([[TextStats.linearScore]] with the
    *     caller's weights) and threshold — runs AFTER curation so the
    *     model prices only docs that survived the cheap filters;
    *  4. near-dup removal ([[TextDedup.dedupCorpus]], banded LSH);
    *  5. temperature rebalance ([[Sampling.temperature]]) over the
    *     surviving source mix — sampling is LAST of the filters so the
    *     realized mixture reflects what actually survived;
    *  6. deterministic shard assignment ([[Sampling.shuffleShards]]).
    *
    * Each stage is the library's oracled/spec-pinned op; the
    * composition adds narrow semi joins only (scale shapes unchanged:
    * no stage collects, no stage goes all-pairs). Output: surviving
    * (id, text, source, score fields) + (ord, shard, pos). */
  def pretrainRecipe(docs: DataFrame, idCol: String, textCol: String,
                     sourceCol: String,
                     keepLangs: Seq[String], minQuality: Double,
                     weights: DataFrame, minScoreMicro: Long,
                     n: Int, k: Int, bands: Int, minJ: Double,
                     alpha: Double, budgetFrac: Double,
                     nShards: Int, seed: String): DataFrame = {
    // Stage boundaries CUT LOGICAL LINEAGE (eager localCheckpoint, so
    // this composition runs its stages when called). Plain persist()
    // is NOT enough here: caching bounds executor recompute but every
    // downstream ACTION still drags the full logical plan through
    // analysis and — worse — AQE's per-stage re-optimization loop,
    // whose cost grows with plan depth (constraint propagation over
    // the dedup family's self-join/explode lineage). Measured on the
    // x10 probe: a count over a fully-CACHED 4k-row stage output
    // burned ~18 s of pure driver time (0.03 s of executor time, two
    // stages) per action; with the lineage cut it is 0.1 s, and the
    // whole recipe collapsed 544 s -> ~30 s (≈ the sum of its
    // stages). localCheckpoint ties the frames to this application's
    // executors — the right trade inside a terminal pipeline whose
    // result is written once; a cross-job boundary should write
    // parquet instead. (The round-6 lesson — localCheckpoint HURT the
    // per-query dd ops — is the same curve from the other side: for a
    // single-action query the materialization barrier costs more than
    // one optimizer pass saves; for a multi-stage multi-action
    // composition the optimizer passes dominate.)
    val deboiler = TextDedup.dedupLines(
      docs.select(col(idCol), col(textCol), col(sourceCol)),
      idCol, textCol).localCheckpoint()
    val curated = TextStats.curate(deboiler, idCol, textCol,
      keepLangs, minQuality).localCheckpoint()
    val curatedDocs = deboiler
      .join(curated.select(col(idCol)), Seq(idCol), "left_semi")
    val scored = TextStats.linearScore(curatedDocs, idCol, textCol,
        weights)
      .filter(col("score_micro") >= minScoreMicro)
      .localCheckpoint()
    val modelKept = curatedDocs
      .join(scored.select(col(idCol)), Seq(idCol), "left_semi")
      .localCheckpoint()
    val survivors = TextDedup.dedupCorpus(
      modelKept.select(col(idCol), col(textCol)), idCol, textCol,
      n, k, bands, minJ)
    // checkpointed: temperature reads its input TWICE (the histogram
    // that becomes the broadcast rate table, then the probe side) and
    // this input's lineage contains the whole dedupCorpus chain
    val rebalInput = modelKept
      .join(survivors.select(col(idCol)), Seq(idCol), "left_semi")
      .localCheckpoint()
    val rebalanced = Sampling.temperature(rebalInput,
      sourceCol, idCol, alpha, budgetFrac, s"$seed:temp")
    val enriched = rebalanced
      .join(curated.select(col(idCol), col("lang_pred"),
        col("quality_score"), col("n_tokens")), Seq(idCol))
      .join(scored.select(col(idCol), col("score_micro"),
        col("score")), Seq(idCol))
    Sampling.shuffleShards(enriched, idCol, nShards, seed)
  }

  /** The QUALITY-GATE composition of the round-12 curation stages —
    * rule filter, then perplexity thirds, then a leakage-free split:
    * [[TextStats.gopherRules]] keep → [[TextStats.pplBuckets]] fit ON
    * THE SURVIVORS (deliberate: filtered-out junk must not drag the
    * tertile boundaries) with the tail third dropped (the CCNet
    * training recipe) → near-dup clusters over what remains →
    * [[Sampling.clusterHoldout]] eval tag, so near-dups of a training
    * doc can never land in the eval split. `minWords`/`minStopHits`
    * are the two rules that bite on a clean corpus; the other five
    * keep their junk-guard defaults. Returns (id, ppl_bucket,
    * cluster_id, is_holdout) for the gated survivors. Oracled
    * end-to-end (`pipe_quality_gate`). Stage boundaries cut lineage
    * exactly as in [[curateToShards]]. */
  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Long, minStopHits: Long,
                  n: Int, k: Int, bands: Int, minJ: Double,
                  holdoutFrac: Double, seed: String): DataFrame = {
    val kept = TextStats.gopherRules(docs, idCol, textCol,
        minWords = minWords, minStopHits = minStopHits)
      .filter(col("keep")).select(col(idCol))
    val keptDocs = docs.select(col(idCol), col(textCol))
      .join(kept, Seq(idCol), "left_semi").localCheckpoint()
    val gated = keptDocs.join(
        TextStats.pplBuckets(keptDocs, idCol, textCol)
          .filter(col("ppl_bucket") =!= "tail")
          .select(col(idCol), col("ppl_bucket")), Seq(idCol))
      .localCheckpoint()
    val pairs = TextDedup.minhashLshPairs(gated, idCol, textCol,
      n, k, bands, minJ, restrictSets = false)
    val clusters = TextDedup.nearDupClusters(gated.select(col(idCol)),
      pairs, idCol, rounds = 4)
    Sampling.clusterHoldout(clusters, "cluster_id", holdoutFrac, seed)
      .join(gated.select(col(idCol), col("ppl_bucket")), Seq(idCol))
      .select(col(idCol), col("ppl_bucket"), col("cluster_id"),
        col("is_holdout"))
  }

  /** The full search tier in one plan: sparse arm
    * ([[Retrieval.bm25BatchTopK]] — one corpus pass for the whole
    * query table) and dense arm ([[Embeddings.bruteForceTopK]], or
    * swap an index-backed ANN path) fused by
    * [[Retrieval.rrfFuse]], diversity-packed by
    * [[Retrieval.mmrRerank]] (rank-derived integer relevance over the
    * fused order), and joined to result-page metadata as the LAST,
    * picks-scale step — the RAG serving chain a corpus team stands up
    * over a curated lake.
    *
    * `queries` is `(query_id, terms array<string>)` for the sparse
    * arm; `queryVecs` is `(vecIdCol, vecCol)` rows for the dense arm
    * (same query_id space). Every stage keeps its audited scale shape:
    * arms corpus-pass or index-probe, fusion and MMR candidate-scale,
    * metadata via a broadcast of the picks against the docs scan.
    * Oracled end-to-end (`pipe_search_tier`): one DuckDB CTE chain
    * replays both arms, the integer RRF, the unrolled greedy MMR and
    * the metadata join bit-for-bit.
    */
  /** Session × incident overlap report — the observability composition
    * over the event stream: sessionize the activity (non-incident)
    * events, view each incident as a time window, and answer "how many
    * incidents landed inside each session, for how long" per session.
    * Wires [[Analytic.sessionize]] (per-key window, the one key
    * shuffle) into [[Intervals.overlapStats]] (epoch-bucket-blocked
    * equi-join — never a per-user nested loop); the session stats join
    * back on the (user, session) key at session scale. Incident
    * windows are [ts, ts + value·incidentSecPerValue] — the incident's
    * magnitude read as its duration.
    *
    * Output: user, session_id, session bounds, n_events, total_value,
    * n_incidents, incident_sec; ordered. Sessions with no incidents
    * are kept (n_incidents = 0) — the healthy majority is the point of
    * the report. */
  def sessionIncidents(events: DataFrame, userCol: String, tsCol: String,
                       valueCol: String, typeCol: String,
                       incidentType: String = "error",
                       gapSec: Long = 1800L,
                       incidentSecPerValue: Long = 60L,
                       bucketSec: Long = 14400L): DataFrame = {
    val sessions = Analytic.sessionize(
      events.filter(col(typeCol) =!= incidentType),
      userCol, tsCol, valueCol, gapSec)
    val a = sessions.select(col(userCol), col("session_id").as("iv_id"),
      col("session_start").as("iv_s"), col("session_end").as("iv_e"))
    // any unique-per-row column works as the b-side id (the rollup
    // never surfaces it); a stable one keeps the whole plan
    // deterministic, so derive it from the incident's own identity
    val b = events.filter(col(typeCol) === incidentType)
      .select(col(userCol),
        unix_timestamp(col(tsCol)).as("iv_s"),
        (unix_timestamp(col(tsCol)) +
          floor(col(valueCol) * incidentSecPerValue).cast("long"))
          .as("iv_e"))
      .withColumn("iv_id",
        xxhash64(col(userCol), col("iv_s"), col("iv_e")))
    val stats = Intervals.overlapStats(a, b, userCol, "iv_id",
      "iv_s", "iv_e", bucketSec)
    sessions.join(stats.withColumnRenamed("a_id", "session_id"),
        Seq(userCol, "session_id"))
      .select(col(userCol), col("session_id"), col("a_s").as("session_start"),
        col("a_e").as("session_end"), col("n_events"), col("total_value"),
        col("n_overlaps").as("n_incidents"),
        col("overlap_sec").as("incident_sec"))
      .orderBy(userCol, "session_id")
  }

  /** Entity resolution — the data-cleaning composition: rows whose
    * names are within edit distance `maxDist` collapse into one
    * entity. [[FuzzyJoin.selfPairs]] mines the match graph (lossless
    * q-gram blocking, never all-pairs), [[TextDedup.nearDupClusters]]
    * closes it transitively (min-label propagation — typo chains
    * a~b~c resolve even when levenshtein(a,c) > maxDist), and the
    * canonical form is the MINIMUM-id member's name (deterministic;
    * swap in a frequency- or recency-argmax upstream if the domain
    * has one). Output: id, name, entity_id, canonical_name; ordered.
    *
    * Scale shape: candidate mining is the fuzzy join's measured-ratio
    * blocking; label propagation is O(component diameter) hash joins;
    * the canonical attach is one id-keyed join at row scale. */
  def resolveEntities(df: DataFrame, idCol: String, nameCol: String,
                      maxDist: Int = 2, q: Int = 0,
                      rounds: Int = 6): DataFrame = {
    val pairs = FuzzyJoin.selfPairs(df, idCol, nameCol, maxDist, q)
    val clusters = TextDedup.nearDupClusters(
        df.select(col(idCol)), pairs, idCol, rounds = rounds)
      .withColumnRenamed("cluster_id", "entity_id")
    val canon = df.select(col(idCol).as("entity_id"),
      col(nameCol).as("canonical_name"))
    df.select(col(idCol), col(nameCol))
      .join(clusters, Seq(idCol))
      .join(canon, Seq("entity_id"))
      .select(col(idCol), col(nameCol), col("entity_id"),
        col("canonical_name"))
      .orderBy(idCol)
  }

  def searchTier(docs: DataFrame, idCol: String, textCol: String,
                 emb: DataFrame, vecIdCol: String, vecCol: String,
                 queries: DataFrame, queryVecs: DataFrame,
                 metaCols: Seq[String],
                 armK: Int = 20, fuseK: Int = 10, picks: Int = 3,
                 lambdaPct: Int = 70): DataFrame = {
    val sparse = Retrieval.bm25BatchTopK(docs, idCol, textCol,
        queries, armK)
      .select(col("query_id"), col(idCol).as("doc_id"), col("rnk"))
    val dense = Embeddings.bruteForceTopK(emb, queryVecs,
        vecIdCol, vecCol, armK)
      .select(col("query_id"), col("corpus_id").as("doc_id"),
        col("rnk"))
    val fused = Retrieval.rrfFuse(Seq(sparse, dense), fuseK)
    val cand = fused.select(col("query_id"), col("doc_id"),
        ((lit(fuseK + 1) - col("rnk")) * lit(100000L)).as("rel_u"))
      .join(emb.select(col(vecIdCol).as("doc_id"), col(vecCol)),
        "doc_id")
    val picked = Retrieval.mmrRerank(cand, vecCol, picks, lambdaPct)
    docs.select((Seq(col(idCol).as("doc_id")) ++
        metaCols.map(col)): _*)
      .join(broadcast(picked), "doc_id")
      .select((Seq(col("query_id"), col("doc_id"), col("pick"),
        col("mmr_u")) ++ metaCols.map(col)): _*)
  }
}
