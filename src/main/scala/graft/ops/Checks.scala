package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation checks — the Deequ/dbt-test family a lake
  * team runs before publishing a table: completeness, uniqueness,
  * value domains, referential integrity. The reference has no
  * validation surface (its loader trusts the CSV,
  * scripts/load_data.py), but at 100 TB a silent schema drift or a
  * broken upstream join multiplies into every downstream job, so
  * checks must be first-class and as cheap as a scan.
  *
  * Scale shapes, by check class:
  *  - Row-local checks (not-null, range, accepted values) share ONE
  *    pass per table: each check is a map-side-combinable
  *    `sum(when(violated, 1))` in a single aggregation, and the
  *    per-check report rows are exploded from that one result row —
  *    adding a check to a table costs one column, not one scan.
  *  - Uniqueness is the standard two-stage count (groupBy key then
  *    fold group sizes) — no window, no sort, no collect.
  *  - Referential integrity is a left-anti join on the key — the same
  *    shuffle any FK validation costs; the parent side is projected
  *    to its key and deduplicated first.
  * Every check emits the same report row
  * `(check, target, n_rows, n_violations, pass)` so suites union
  * cleanly (oracled `t_data_checks` across four TPC-H tables).
  *
  * Null semantics: range/accepted checks count only NON-null
  * violations — nulls belong to `notNull`, so a nullable column never
  * double-counts across checks.
  */
object Checks {

  /** A row-local expectation: report name, target label, and the
    * violation predicate over a single row. */
  type RowCheck = (String, String, Column)

  def notNull(c: String): RowCheck =
    ("not_null", c, col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): RowCheck =
    ("in_range", c,
      col(c).isNotNull && !(col(c) >= lo && col(c) <= hi))

  def accepted(c: String, values: Seq[String]): RowCheck =
    ("accepted_values", c,
      col(c).isNotNull && !col(c).isin(values.map(v => v: Any): _*))

  /** The additive partial behind [[rowChecks]]: ONE row
    * `(_n, _v0.._vk)` of exact long counts for a slice of the table.
    * Partials from disjoint slices merge by plain column sums
    * ([[mergeRowCheckPartials]]) — fold order cannot change the
    * state, which is what makes the streaming quality-monitor MV
    * ([[graft.streaming.Ingest]]) bit-identical to a batch run over
    * everything ingested. */
  def rowCheckPartials(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "rowCheckPartials: no checks given")
    val aggs = coalesce(count(lit(1)), lit(0L)).as("_n") +:
      checks.zipWithIndex.map { case ((_, _, violated), i) =>
        coalesce(sum(when(violated, 1L).otherwise(0L)), lit(0L))
          .as(s"_v$i")
      }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two [[rowCheckPartials]] frames: exact column sums. */
  def mergeRowCheckPartials(a: DataFrame, b: DataFrame): DataFrame = {
    val u = a.unionByName(b)
    val sums = u.columns.map(c => coalesce(sum(col(c)), lit(0L)).as(c))
    u.agg(sums.head, sums.tail: _*)
  }

  /** Reconstitute the per-check report rows from a (possibly merged)
    * partial. `checks` must be the same list (same order) the partial
    * was built with — the partial's columns are positional. */
  def reportFromPartials(partial: DataFrame,
                         checks: Seq[RowCheck]): DataFrame = {
    val reports = checks.zipWithIndex.map { case ((name, target, _), i) =>
      struct(lit(name).as("check"), lit(target).as("target"),
        coalesce(col(s"_v$i"), lit(0L)).as("n_violations"))
    }
    partial.select(col("_n").as("n_rows"),
        explode(array(reports: _*)).as("c"))
      .select(col("c.check").as("check"), col("c.target").as("target"),
        col("n_rows"), col("c.n_violations").as("n_violations"),
        (col("c.n_violations") === 0L).as("pass"))
  }

  /** All row-local checks for one table in ONE aggregation pass. */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame =
    reportFromPartials(rowCheckPartials(df, checks), checks)

  /** Uniqueness of a (composite) key: violations = rows in excess of
    * one per key value (0 ⇔ the key is unique). Null key components
    * group like any other value. */
  def unique(df: DataFrame, keyCols: Seq[String],
             label: String): DataFrame = {
    val g = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_cnt"))
    g.agg(coalesce(sum(col("_cnt")), lit(0L)).as("n_rows"),
        coalesce(sum(col("_cnt") - lit(1L)), lit(0L))
          .as("n_violations"))
      .select(lit("unique").as("check"), lit(label).as("target"),
        col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Referential integrity: child rows whose non-null key has no
    * match in the parent's key set (null FKs are `notNull`'s
    * business, matching SQL FK semantics). */
  def foreignKey(child: DataFrame, childKey: String,
                 parent: DataFrame, parentKey: String,
                 label: String): DataFrame = {
    val viols = child.select(col(childKey))
      .filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val tot = child.agg(count(lit(1)).as("n_rows"))
    viols.crossJoin(tot)
      .select(lit("foreign_key").as("check"), lit(label).as("target"),
        col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Union any number of check reports into one suite frame. */
  def suite(reports: Seq[DataFrame]): DataFrame = {
    require(reports.nonEmpty, "suite: no reports")
    reports.reduce(_ union _)
  }

  /** k-anonymity audit (Sweeney 2002): does every combination of the
    * quasi-identifier columns cover at least `k` rows? The release
    * gate a privacy pipeline runs next to PII redaction
    * ([[TextStats]]) — redacting direct identifiers is not enough
    * when a (zip, age, segment) combination pins an individual.
    * One-row summary: group count, groups below `k`, rows those
    * expose, the smallest group, and the verdict. Scale shape: one
    * hash aggregation on the quasi-key, then a groups-scale fold —
    * the same two-stage shape as [[unique]], no window, no collect.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity: no quasi-identifier cols")
    require(k >= 2, "kAnonymity: k must be >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("group_n") < k, 1L).otherwise(0L)),
          lit(0L)).as("n_small_groups"),
        coalesce(sum(when(col("group_n") < k, col("group_n"))
          .otherwise(0L)), lit(0L)).as("n_rows_at_risk"),
        coalesce(min(col("group_n")), lit(0L)).as("min_group_n"))
      .select(col("n_groups"), col("n_small_groups"),
        col("n_rows_at_risk"), col("min_group_n"),
        (col("n_small_groups") === 0L).as("k_anonymous"))
  }

  /** The suppression worklist behind [[kAnonymity]]: each
    * quasi-identifier combination covering fewer than `k` rows, with
    * its size — what generalization/suppression has to fix before
    * release. */
  def kAnonymityGroups(df: DataFrame, quasiCols: Seq[String],
                       k: Long): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .filter(col("group_n") < k)

  /** l-diversity audit (Machanavajjhala et al. 2007): k-anonymity's
    * necessary companion — a group of 50 identical rows is perfectly
    * k-anonymous and still leaks the sensitive attribute if all 50
    * share one value. Counts DISTINCT sensitive values per
    * quasi-identifier group; the verdict holds when every group
    * carries at least `l`. Exact distinct via the standard two-stage
    * shape: group on (quasi, sensitive) first, then fold — no
    * expand-heavy countDistinct, no window. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity: no quasi-identifier cols")
    require(l >= 2, "lDiversity: l must be >= 2")
    val nd = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_distinct"))
    nd.agg(count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("n_distinct") < l, 1L).otherwise(0L)),
          lit(0L)).as("n_low_groups"),
        coalesce(min(col("n_distinct")), lit(0L)).as("min_distinct"))
      .select(col("n_groups"), col("n_low_groups"),
        col("min_distinct"),
        (col("n_low_groups") === 0L).as("l_diverse"))
  }

  /** The worklist behind [[lDiversity]]: quasi-groups whose sensitive
    * attribute carries fewer than `l` distinct values. */
  def lDiversityGroups(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: String, l: Long): DataFrame =
    df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_distinct"))
      .filter(col("n_distinct") < l)
}
