package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Exact

/** Skew-mitigation utilities for the 100 TB plan. AQE's skew-join
  * handling covers sort-merge joins; these cover the two cases it does
  * not: broadcast-ineligible dimension joins with pathological hot keys,
  * and hot-key aggregation where one group swamps a reducer.
  */
object Skew {

  /** Salted equi-join: fact keys get a deterministic salt in [0, n);
    * the (small-ish but not broadcastable) dim side is replicated n ways
    * so each (key, salt) bucket joins independently — a hot key's rows
    * spread over n reducers instead of one. Deterministic salt (hash of
    * a unique fact column) keeps reruns identical. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltCol: Column, n: Int, joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(hash(saltCol), lit(n)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase salted aggregation for hot groups: partial agg on
    * (key, salt), final agg on key. Spark's hash aggregate already does
    * map-side partials; the explicit salt phase ADDITIONALLY splits a
    * hot key across reducers in the first shuffle, which partials can't
    * do. `aggs` are (sum-like) merge-associative expressions given the
    * partial column. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                saltCol: Column, n: Int): DataFrame = {
    // exact split-word partials (graft.util.Exact): both phases stay on
    // primitive long sums; the single decimal reassembly happens once
    // per FINAL group, after the salt fan-in
    val (hi, lo) = Exact.splitCols2(col(valueCol))
    df.withColumn("_salt", pmod(hash(saltCol), lit(n)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(hi).as("_ph"), sum(lo).as("_pl"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(Exact.combineSplitSums2(sum("_ph"), sum("_pl")).as("total_value"),
        sum("_n").as("n_rows"))
  }

  /** Stop-shingle filter: drop inverted-index entries whose shingle
    * occurs in more than `maxDocFreq` documents before pair generation —
    * the standard guard against quadratic blowup on boilerplate
    * shingles (the dedup-at-scale analog of stop words). */
  def dropHotKeys(index: DataFrame, keyCol: String, maxDocFreq: Long): DataFrame = {
    val hot = index.groupBy(col(keyCol)).count()
      .filter(col("count") > maxDocFreq).select(keyCol)
    index.join(hot, Seq(keyCol), "left_anti")
  }
}
