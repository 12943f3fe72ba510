package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-profiling summary — the per-column statistics a pipeline health
  * check runs before/after every transform stage (the engine-level
  * generalization of the reference's eyeball scripts
  * scripts/check_db_total.py).
  *
  * Two dials:
  *  - DEFAULT (`exact = false`): approximate distincts via HLL++. All
  *    columns profile in ONE wide aggregation = one table scan — HLL
  *    sketches are mergeable fixed-size state, so unlike exact
  *    count_distinct they don't force an Expand (row copy per distinct
  *    agg). This is the 100 TB path: the shuffle carries one sketch per
  *    column per partition, never a value set.
  *  - `exact = true`: exact distincts in TWO passes — one wide
  *    aggregation for every non-distinct stat (no count_distinct in
  *    the plan, so no Expand), plus one unpivot job that
  *    distinct-counts ALL columns at once: explode each row into
  *    (col_name, canonical string) pairs and count distinct values per
  *    column name. A single distinct-aggregate plans as a plain
  *    two-phase aggregate — the Expand (row copy per distinct agg,
  *    measured 5× slower) only appears when MULTIPLE count_distincts
  *    share one aggregation, which is exactly what the unpivot avoids.
  *    The per-partition partial distinct collapses repeated values
  *    before the shuffle, so wire cost is bounded by the per-column
  *    value cardinality, not the row count. Replaces the earlier
  *    one-job-per-column union: 14 → 6 jobs and one table scan instead
  *    of n_cols column scans on the benched events profile (measured
  *    0.38 → 0.72 s locally — the ×n_cols explode costs more in one
  *    JVM than the tiny per-column jobs it replaces, but at cluster
  *    scale the scan count and job schedulings are what dominate).
  *    Kept as the oracle-verifiable path.
  */
object Profiler {

  /** Typed min/max slots for a field: numeric columns → min_num/max_num,
    * strings → min_str/max_str, timestamps → epoch seconds in
    * min_num/max_num. */
  private def typedMinMax(f: StructField)
      : (Column, Column, Column, Column) = {
    val c = col(f.name)
    f.dataType match {
      case _: NumericType =>
        (min(c).cast("double"), max(c).cast("double"),
          lit(null).cast("string"), lit(null).cast("string"))
      case _: TimestampType =>
        (min(unix_timestamp(c)).cast("double"),
          max(unix_timestamp(c)).cast("double"),
          lit(null).cast("string"), lit(null).cast("string"))
      case _: StringType =>
        (lit(null).cast("double"), lit(null).cast("double"),
          min(c), max(c))
      case _ =>
        (lit(null).cast("double"), lit(null).cast("double"),
          lit(null).cast("string"), lit(null).cast("string"))
    }
  }

  /** Per-column: row/non-null/distinct counts plus typed min/max.
    * `exact = false` (default) uses approx_count_distinct in one
    * single-scan aggregation; `exact = true` runs one exact job per
    * column. Output schema is identical for both. */
  def summary(df: DataFrame, exact: Boolean = false,
              rsd: Double = 0.05): DataFrame =
    if (exact) {
      // pass 1: every non-distinct stat in ONE wide agg — a single
      // scan, and with no count_distinct in the plan, no Expand
      val aggs = df.schema.fields.flatMap { f =>
        val c = col(f.name)
        val (minNum, maxNum, minStr, maxStr) = typedMinMax(f)
        Seq(count(c).as(s"_nn_${f.name}"),
          minNum.as(s"_mn_${f.name}"), maxNum.as(s"_mx_${f.name}"),
          minStr.as(s"_ms_${f.name}"), maxStr.as(s"_xs_${f.name}"))
      }.toSeq
      val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val stats = one.select(explode(array(df.schema.fields.map { f =>
        struct(lit(f.name).as("col_name"), col("n_rows"),
          col(s"_nn_${f.name}").as("n_nonnull"),
          col(s"_mn_${f.name}").as("min_num"),
          col(s"_mx_${f.name}").as("max_num"),
          col(s"_ms_${f.name}").as("min_str"),
          col(s"_xs_${f.name}").as("max_str"))
      }.toIndexedSeq: _*)).as("r")).select("r.*")
      // pass 2: ALL columns' exact distincts in ONE job — unpivot each
      // row into (col_name, value) pairs where the value is a NATIVE
      // typed slot struct (one field per source type family — no
      // per-value string rendering): distinct structs ≡ distinct
      // values because exactly one slot is populated per column and
      // each embedding is injective (longs as-is, timestamps at
      // microsecond grain, doubles with -0.0 normalized to 0.0 the way
      // numeric aggregation equates them). Then one distinct-count per
      // column name: a SINGLE distinct aggregate plans as a plain
      // two-phase agg whose per-partition partial collapses repeated
      // values before the shuffle. Null source values yield a null
      // pair, dropped like count_distinct drops them.
      val kvs = df.schema.fields.map { f =>
        val c = col(f.name)
        def slot(l: Column, d: Column, s: Column) =
          struct(l.as("l"), d.as("d"), s.as("s"))
        val nl = lit(null).cast("long"); val nd = lit(null).cast("double")
        val ns = lit(null).cast("string")
        val v = f.dataType match {
          case _: TimestampType => slot(unix_micros(c), nd, ns)
          case DoubleType | FloatType =>
            slot(nl, when(c === lit(0), lit(0.0)).otherwise(c.cast("double")),
              ns)
          case ByteType | ShortType | IntegerType | LongType =>
            slot(c.cast("long"), nd, ns)
          case _: StringType => slot(nl, nd, c)
          // exotic types (decimal, binary, nested): canonical string
          // render — correct everywhere, just off the fast path
          case _ => slot(nl, nd, c.cast("string"))
        }
        struct(lit(f.name).as("col_name"),
          when(c.isNotNull, v).as("v"))
      }
      val distincts = df
        .select(explode(array(kvs.toIndexedSeq: _*)).as("kv"))
        .select(col("kv.col_name"), col("kv.v"))
        .filter(col("v").isNotNull)
        .groupBy("col_name")
        .agg(count_distinct(col("v")).as("n_distinct"))
      // n_cols-row join: broadcast, left (an all-null column has no
      // pairs → distinct count 0, matching count_distinct)
      stats.join(broadcast(distincts), Seq("col_name"), "left")
        .select(col("col_name"), col("n_rows"), col("n_nonnull"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    } else {
      // one wide agg (single scan), then unpivot the per-column slots
      // into rows — the explode is over n_cols structs on ONE row
      val aggs = df.schema.fields.flatMap { f =>
        val c = col(f.name)
        val (minNum, maxNum, minStr, maxStr) = typedMinMax(f)
        Seq(count(c).as(s"_nn_${f.name}"),
          approx_count_distinct(c, rsd).as(s"_nd_${f.name}"),
          minNum.as(s"_mn_${f.name}"), maxNum.as(s"_mx_${f.name}"),
          minStr.as(s"_ms_${f.name}"), maxStr.as(s"_xs_${f.name}"))
      }.toSeq
      val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val rows = df.schema.fields.map { f =>
        struct(lit(f.name).as("col_name"), col("n_rows"),
          col(s"_nn_${f.name}").as("n_nonnull"),
          col(s"_nd_${f.name}").as("n_distinct"),
          col(s"_mn_${f.name}").as("min_num"),
          col(s"_mx_${f.name}").as("max_num"),
          col(s"_ms_${f.name}").as("min_str"),
          col(s"_xs_${f.name}").as("max_str"))
      }.toIndexedSeq
      one.select(explode(array(rows: _*)).as("r")).select("r.*")
    }

  /** HLL++ approximate distinct — the count-distinct that scales (the
    * sketch is mergeable, so the shuffle carries fixed-size state
    * instead of the key set). rsd = relative standard deviation. */
  def approxDistinct(df: DataFrame, colName: String,
                     rsd: Double = 0.05): Long =
    df.agg(approx_count_distinct(col(colName), rsd)).collect().head.getLong(0)

  /** Profile DRIFT between two snapshots of the same schema (yesterday
    * vs today, upstream vs downstream of a pipeline change) — the
    * monitoring op that turns the profiler into a data-quality gate:
    * per column, both sides' counts / distincts / numeric ranges plus
    * null rates and the null-rate shift. Costs two [[summary]] runs
    * (each side's scans) and an n_cols-row join — nothing here adds a
    * corpus-scale stage, so drifting 100 TB against 100 TB is exactly
    * two profile passes. Divisions are long-to-double on exact counts
    * (engine-identical); `exact = true` (the oracled mode) makes every
    * figure reproducible; the default approx mode is the one-scan
    * monitoring path. String min/max are profile detail, not drift
    * signal, and are dropped here. */
  def drift(a: DataFrame, b: DataFrame,
            exact: Boolean = true): DataFrame =
    driftFromProfiles(summary(a, exact), summary(b, exact))

  /** [[drift]] over two ALREADY-COMPUTED profiles in [[summary]]'s
    * schema — the form that composes with materialized profiles: a
    * streamed [[profileFromPartials]] view against a batch baseline
    * costs an n_cols-row join, zero corpus scans. */
  def driftFromProfiles(pa: DataFrame, pb: DataFrame): DataFrame = {
    def side(p: DataFrame, tag: String) =
      p.select(col("col_name"),
        col("n_rows").as(s"n_rows_$tag"),
        col("n_nonnull").as(s"n_nonnull_$tag"),
        col("n_distinct").as(s"n_distinct_$tag"),
        col("min_num").as(s"min_num_$tag"),
        col("max_num").as(s"max_num_$tag"))
    def nullRate(tag: String) =
      (col(s"n_rows_$tag") - col(s"n_nonnull_$tag")).cast("double") /
        col(s"n_rows_$tag").cast("double")
    side(pa, "a").join(side(pb, "b"), Seq("col_name"), "full_outer")
      .withColumn("null_rate_a", nullRate("a"))
      .withColumn("null_rate_b", nullRate("b"))
      .withColumn("null_rate_shift",
        col("null_rate_b") - col("null_rate_a"))
  }

  // ---- mergeable profile partials (the streaming-MV / multi-slice
  // form: profile each slice once, fold partials, finalize) ----

  /** Injective sketch embedding per type family — the same canonical
    * slots as the exact unpivot above, rendered to the types
    * `hll_sketch_agg` accepts (long/string): ints/timestamps as longs,
    * doubles with -0.0 normalized then stringified, everything else a
    * canonical string. Nulls are skipped by the sketch like
    * count_distinct skips them. */
  private def sketchInput(f: StructField): Column = {
    val c = col(f.name)
    f.dataType match {
      case _: TimestampType => unix_micros(c)
      case DoubleType | FloatType =>
        when(c === lit(0), lit(0.0)).otherwise(c.cast("double"))
          .cast("string")
      case ByteType | ShortType | IntegerType | LongType => c.cast("long")
      case _: StringType => c
      case _ => c.cast("string")
    }
  }

  /** One data slice → one MERGEABLE profile row per column: exact
    * counts and typed min/max (all additive / lattice-mergeable) plus
    * a DataSketches HLL sketch of the column's distinct values. One
    * wide aggregation = one scan of the slice, same shape as
    * [[summary]]'s approx path — but where approx_count_distinct
    * finalizes into a number on the spot, the sketch BINARY survives,
    * so partials from different slices (micro-batches, corpus shards,
    * per-day partitions) fold with [[mergeProfilePartials]] without
    * rescanning anything. Every non-distinct stat (counts, min/max)
    * is EXACT under any fold order; the distinct ESTIMATE may shift a
    * little with fold structure (the union gadget's mode transitions,
    * and the single-pass HIP estimator that a union legitimately
    * discards, are not fold-invariant) but always carries the
    * sketch's error bound, and a FIXED fold order — e.g. a stream's
    * batch sequence — reproduces identically on replay (ProfilerSpec
    * pins exactness + tolerance across fold shapes). This is the
    * 100 TB monitoring path: profile each ingest batch once, keep one
    * n_cols-row state table current forever. */
  def profilePartials(df: DataFrame): DataFrame = {
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val (minNum, maxNum, minStr, maxStr) = typedMinMax(f)
      Seq(count(c).as(s"_nn_${f.name}"),
        hll_sketch_agg(sketchInput(f)).as(s"_sk_${f.name}"),
        minNum.as(s"_mn_${f.name}"), maxNum.as(s"_mx_${f.name}"),
        minStr.as(s"_ms_${f.name}"), maxStr.as(s"_xs_${f.name}"))
    }.toSeq
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = df.schema.fields.map { f =>
      struct(lit(f.name).as("col_name"), col("n_rows"),
        col(s"_nn_${f.name}").as("n_nonnull"),
        col(s"_mn_${f.name}").as("min_num"),
        col(s"_mx_${f.name}").as("max_num"),
        col(s"_ms_${f.name}").as("min_str"),
        col(s"_xs_${f.name}").as("max_str"),
        col(s"_sk_${f.name}").as("sketch"))
    }.toIndexedSeq
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Fold two partial profiles: counts add, min/max lattice-merge,
    * sketches union (register-wise max — order-insensitive). Null
    * slots (string columns' numeric mins, empty slices' sketches) are
    * skipped by the aggregates, matching the single-pass semantics. */
  def mergeProfilePartials(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("col_name").agg(
      sum("n_rows").as("n_rows"),
      sum("n_nonnull").as("n_nonnull"),
      min("min_num").as("min_num"),
      max("max_num").as("max_num"),
      min("min_str").as("min_str"),
      max("max_str").as("max_str"),
      hll_union_agg(col("sketch")).as("sketch"))

  /** Finalize a (merged) partial profile into [[summary]]'s schema:
    * the sketch becomes the distinct estimate (0 for an all-null
    * column whose sketch never saw a value). */
  def profileFromPartials(partials: DataFrame): DataFrame =
    partials.select(col("col_name"), col("n_rows"), col("n_nonnull"),
      coalesce(hll_sketch_estimate(col("sketch")), lit(0L))
        .as("n_distinct"),
      col("min_num"), col("max_num"), col("min_str"), col("max_str"))

  /** Equi-height histogram of a numeric column: `nBins` buckets whose
    * edges sit at the exact linear-interpolation quantiles
    * i/nBins — the skew-proof distribution view (an equi-WIDTH
    * histogram of a heavy-tailed column puts everything in bin 0;
    * see [[graft.ops.TextStats.lengthHistogram]] for that form).
    *
    * Boundaries are rounded to 6 dp and the SAME rounded values drive
    * bin assignment: the two engines' interpolation can differ in the
    * last ulp ((1−g)·a+g·b vs a+g·(b−a)), and an unrounded boundary
    * would leak that ulp into bin membership. Buckets are closed-left
    * on their quantile edge (v == edge goes up); empty buckets (ties
    * collapsing edges) simply don't appear.
    *
    * Scale shape: one exact-percentile aggregation (Spark's sort-based
    * `percentile` — a profiling pass by design; swap
    * `percentile_approx` in interactive contexts), then bin assignment
    * as a map-side filter over the ≤nBins broadcast edge array and one
    * nBins-row hash agg. Nulls are excluded (no quantile membership). */
  def histogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val probs = array((1 until nBins).map(i => lit(i.toDouble / nBins)): _*)
    val v = col(valueCol).cast("double")
    val th = df.filter(v.isNotNull).agg(
      transform(percentile(v, probs), q => round(q, 6)).as("_qs"),
      min(v).as("_lo"), max(v).as("_hi"))
    df.filter(v.isNotNull).select(v.as("_v")).crossJoin(broadcast(th))
      .withColumn("bin", size(filter(col("_qs"), b => b <= col("_v"))))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        first(col("_qs")).as("_qs"), first(col("_lo")).as("_lo"),
        first(col("_hi")).as("_hi"))
      .select(col("bin"),
        when(col("bin") === 0, col("_lo"))
          .otherwise(try_element_at(col("_qs"), col("bin"))).as("bin_lo"),
        when(col("bin") === nBins - 1, col("_hi"))
          .otherwise(try_element_at(col("_qs"), col("bin") + 1))
          .as("bin_hi"),
        col("n_rows"))
      .orderBy("bin")
  }
}
