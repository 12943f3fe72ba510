package graft
import org.apache.spark.sql.SparkSession

/** Dev plan-audit sweep: flags join shapes worth eyeballing across the
  * whole query suite. Expected (deliberate) flags as of round 2:
  *  - BroadcastNestedLoop in a2/a7/a8_history_period (one-row max-ts
  *    scalar broadcast), t_unigram_score / t_bigram_score (one-row
  *    totals scalar broadcast), j6 (pattern replay IS a cross join,
  *    tiny side), e_ann_bruteforce / e_int8_topk (the brute-force
  *    baselines are deliberate corpus × probes scans), and the
  *    e_recall_* evaluators (they contain the brute-force component;
  *    their own recall join is top-k-scale and AQE-broadcast at run);
  *  - SortMergeJoin in the dedup family / e_cosine_neardup (banded
  *    sign-LSH self-join) / t_curate / pipe_pretrain_recipe (contains
  *    dedupCorpus) / prof_events_drift (two profile snapshots joined —
  *    n_cols rows, AQE broadcasts at runtime): inverted-index and
  *    band-bucket self-joins where BOTH sides are large at scale — a
  *    shuffle join is the correct physical choice (AQE still converts
  *    to broadcast at runtime when a side turns out small).
  * Round-13 additions, all deliberate:
  *  - g_pagerank / g_pagerank_seeded: SortMergeJoin — the
  *    per-iteration rank×edges join, where BOTH sides are graph-scale
  *    at 100 TB (AQE broadcasts the node-scale rank side at runtime
  *    when it fits);
  *  - x_fuzzy_pairs: BroadcastNestedLoop — the degenerate block's
  *    length-band loop over DISTINCT sub-q·d-gram string values
  *    (value-domain-bounded by construction, see FuzzyJoin);
  *  - mv_quantiles: BroadcastNestedLoop — quantilesFromHist's
  *    bracketing joins of a 4-row probability frame against the
  *    bounded value-domain histogram (the prof_quantiles shape);
  *  - mv_pagerank: SortMergeJoin — the same graph-scale rank×edges
  *    join as g_pagerank, served from the edge-log MV (g_kcore's
  *    semi-joins read clean: AQE broadcasts the node-scale keep
  *    set).
  * Round-14 additions, deliberate:
  *  - t_lm_condprob: BroadcastNestedLoop — the one-row vocabulary
  *    scalar broadcast (the t_unigram_score/t_bigram_score totals
  *    pattern);
  *  - pipe_embed_curation: SortMergeJoin — inherited from its
  *    semanticDedup stage (the banded sign-LSH self-join, the
  *    e_semantic_dedup/e_cosine_neardup shape where both sides are
  *    corpus-scale at 100 TB). The spectral queries themselves
  *    (e_pca_*, mv_pca) read clean: pure aggregations, no joins.
  * Round-15 addition, deliberate:
  *  - t_prf_indexed: BroadcastNestedLoop — the one-row expansion-stats
  *    scalar broadcast (crossJoin(broadcast(stats)), the same pattern
  *    as t_bm25_topk's corpus-stats scalar).
  * Round-18 removals (53 flags, down from 56): t_curate no longer
  * flags — its exactDedup semi-join collapsed into one min_by
  * aggregation (no join at all); pipe_pretrain_recipe /
  * pipe_curate_shards flag via their eager internal stages only.
  * Anything NEW appearing here deserves a look.
  */
object AuditAll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.QuietLogs.suppressWindowWarns()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "BroadcastNestedLoop" -> plan.contains("BroadcastNestedLoopJoin"))
          .filter(_._2).map(_._1)
        if (flags.nonEmpty) println(s"[audit] $name: ${flags.mkString(",")}")
      } catch {
        case e: Throwable =>
          println(s"[audit] $name: ERROR ${e.getMessage.take(80)}")
      }
    }
    println("[audit] done")
    spark.stop()
  }
}
