package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-function MinHash signature of a shingle-hash SET (array<long>),
  * fused into one loop: h_i(s) = ((2i+1)·(s mod P) + (17i+91)) mod P,
  * signature element i = min over the set of h_i — numerically
  * IDENTICAL to the groupBy-with-k-min-aggregates formulation it
  * replaces (same hash family, same modulus, exact long arithmetic),
  * so the generated DuckDB oracles are unaffected.
  *
  * Why a custom Expression (SURVEY §7.3 bar): signatures become a pure
  * PROJECTION over the per-doc set array — no corpus-wide groupBy
  * shuffle to assemble k mins per document (at 100 TB the exploded
  * (id, sh_h) aggregation re-shuffles the whole inverted index just to
  * fold it back per doc), and the k×|set| fold runs inside whole-stage
  * codegen with one primitive array, where a higher-order-function
  * fold would evaluate interpreted per element.
  *
  * Null contract: null array → null (UnaryExpression default); null
  * ELEMENTS are skipped (the set builder never produces them). An
  * EMPTY array yields sentinel Long.MaxValue mins — callers filter
  * zero-shingle docs out first (pinned semantics: such docs have no
  * signature).
  */
case class MinHashK(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_k"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if k > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_k requires array<bigint> and k > 0, got $other, k=$k")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinHashK.ofHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashK.ofHashes($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashK =
    copy(child = newChild)
}

object MinHashK {
  /** Hash-family modulus (products fit in Long: (2k−1)·P < 2^63). */
  val P = 1000000007L

  /** The fused kernel: k running mins over the affine hash family. */
  def ofHashes(a: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val m = a.numElements()
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i)) {
        val hh = a.getLong(i) % P
        var j = 0
        while (j < k) {
          val v = ((2L * j + 1) * hh + (17L * j + 91)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API for the fused kernel. */
  def minhashK(hashSet: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashK(GraftColumnBridge.expression(hashSet), k))
}
