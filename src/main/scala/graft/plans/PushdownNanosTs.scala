package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule making time-range predicates prunable through the
  * TIMESTAMP(NANOS) → TimestampType conversion.
  *
  * The testdata's `events.ts` is parquet TIMESTAMP(NANOS), which Spark
  * reads as a raw BIGINT (`nanosAsLong`); `Tables.events` converts with
  * `timestamp_micros(ts div 1000)`. That projection makes every
  * time-range filter a predicate over a COMPUTED column, which
  * `DataSourceStrategy.translateFilter` cannot translate — so the scan
  * reads the whole table (`PushedFilters: []`), and at 100 TB the
  * reference's core point-in-time query (S1/S2: `WHERE camera_id = ?
  * AND ts >= ? AND ts <= ?`, app/database.py:74-93) would never skip a
  * row group on time.
  *
  * This rule finds comparisons of `timestamp_micros(x div 1000)`
  * against timestamp literals inside Filter conditions and conjoins the
  * implied NECESSARY bound on the raw nanos column x. The original
  * predicate is kept (exact semantics are untouched); the added raw
  * conjunct is a plain `x >= literal` that the file source translates
  * into a parquet filter, enabling footer min/max row-group and file
  * skipping. Bound math (div truncates toward zero, so derive bounds
  * valid for any sign): `x div 1000 >= k  ⟹  x >= 1000k − 999` and
  * `x div 1000 <= k  ⟹  x <= 1000k + 999` — loose by < 1 µs, which
  * only ever ADMITS extra rows that the kept original predicate then
  * rejects.
  *
  * Registered by [[install]] via `experimentalMethods.extraOptimizations`
  * (the "User Provided Optimizers" batch runs after predicate pushdown
  * has already moved filters down next to the relation, and before
  * physical planning translates scan filters — exactly the window this
  * rewrite needs).
  */
object PushdownNanosTs extends Rule[LogicalPlan] {

  /** timestamp_micros(x div 1000) → x (the raw nanos expression). */
  private object NanosConv {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide)
          if d.right.isInstanceOf[Literal] &&
            d.right.asInstanceOf[Literal].value == 1000L &&
            d.right.dataType == LongType =>
        Some(d.left)
      case _ => None
    }
  }

  private def tsMicros(l: Literal): Option[Long] = l.dataType match {
    case TimestampType => Option(l.value).map(_.asInstanceOf[Long])
    case _ => None
  }

  private def geBound(x: Expression, k: Long): Expression =
    GreaterThanOrEqual(x, Literal(k * 1000L - 999L))

  private def leBound(x: Expression, k: Long): Expression =
    LessThanOrEqual(x, Literal(k * 1000L + 999L))

  /** Necessary raw-nanos bounds implied by one comparison. */
  private def boundsOf(e: Expression): Seq[Expression] = e match {
    case GreaterThanOrEqual(NanosConv(x), l: Literal) =>
      tsMicros(l).map(m => geBound(x, m)).toSeq
    case GreaterThan(NanosConv(x), l: Literal) =>
      tsMicros(l).map(m => geBound(x, m + 1)).toSeq
    case LessThanOrEqual(NanosConv(x), l: Literal) =>
      tsMicros(l).map(m => leBound(x, m)).toSeq
    case LessThan(NanosConv(x), l: Literal) =>
      tsMicros(l).map(m => leBound(x, m - 1)).toSeq
    case EqualTo(NanosConv(x), l: Literal) =>
      tsMicros(l).toSeq.flatMap(m => Seq(geBound(x, m), leBound(x, m)))
    // literal on the left: mirror
    case GreaterThanOrEqual(l: Literal, NanosConv(x)) =>
      tsMicros(l).map(m => leBound(x, m)).toSeq
    case GreaterThan(l: Literal, NanosConv(x)) =>
      tsMicros(l).map(m => leBound(x, m - 1)).toSeq
    case LessThanOrEqual(l: Literal, NanosConv(x)) =>
      tsMicros(l).map(m => geBound(x, m)).toSeq
    case LessThan(l: Literal, NanosConv(x)) =>
      tsMicros(l).map(m => geBound(x, m + 1)).toSeq
    case EqualTo(l: Literal, NanosConv(x)) =>
      tsMicros(l).toSeq.flatMap(m => Seq(geBound(x, m), leBound(x, m)))
    case _ => Nil
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = conjuncts(cond)
      // only derive bounds from TOP-LEVEL conjuncts: a bound implied by
      // a disjunct branch is not necessary for the whole predicate
      val derived = existing.flatMap(boundsOf)
        .filterNot(b => existing.exists(_.semanticEquals(b)))
      if (derived.isEmpty) f
      else Filter(derived.foldLeft(cond)(And(_, _)), child)
  }

  /** Idempotently register on a session (covers sessions built without
    * the spark.sql.extensions config). */
  def install(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraOptimizations.exists(_ eq this))
      em.extraOptimizations = em.extraOptimizations :+ this
  }
}
