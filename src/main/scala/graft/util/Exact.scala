package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for oracle-parity aggregation.
  *
  * Double summation is order-dependent; on a 1000-executor cluster the
  * partial-aggregate merge order is nondeterministic, so `sum(double)`
  * is not reproducible run-to-run (nor engine-to-engine vs DuckDB).
  * Routing sums through DECIMAL makes the arithmetic exact and
  * associative — identical results at any parallelism — then one final
  * correctly-rounded cast back to double. This is also the right call
  * at 100 TB: decimal sums cost a few cycles more per row but make
  * results stable under AQE re-planning, speculative retries, and
  * partition-count changes.
  */
object Exact {
  /** Order-independent exact sum of a double column (2-decimal data). */
  def dsum2(c: Column): Column =
    sum(c.cast("decimal(28,2)")).cast("double")

  /** Order-independent exact sum with 6-decimal capture. */
  def dsum6(c: Column): Column =
    sum(c.cast("decimal(28,6)")).cast("double")

  /** Exact average: decimal sum / count, one double division (IEEE
    * correctly rounded → engine-independent given identical inputs). */
  def davg2(c: Column): Column =
    (sum(c.cast("decimal(28,2)")).cast("double") / count(c)).as("avg")
}
