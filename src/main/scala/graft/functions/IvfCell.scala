package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused nearest-centroid assignment for the IVF family — one loop over
  * the vector per row instead of the declarative
  * `array_min(array(struct(-2·qdot(qv, c_j) + ‖c_j‖², j), …)).cell`
  * form it replaces ([[graft.ops.Embeddings.cellOfQuantized]]).
  *
  * Why (round-18 full-plan sweep, `samp_cluster_balanced`): predicate
  * pushdown has no duplication guard, so the join-key
  * `isnotnull(cell)` filter re-inlined the WHOLE assignment — 16
  * copies of the quantization `transform` per row in the scan-adjacent
  * Filter — and lambda-bearing expressions are excluded from Spark's
  * subexpression elimination, so every copy evaluated. The kernel is
  * ONE expression node: a pushed filter carries one call, and the
  * quantization (for FLOAT input) happens inside the same loop — no
  * intermediate arrays, no struct array, no per-element lambda
  * dispatch, whole-stage codegen throughout.
  *
  * Value parity with the declarative form (IvfIndexSpec pins it
  * verbatim): distances are exact longs d_j = −2·(q·c_j) + ‖c_j‖²
  * (the per-row ‖q‖² constant cancels in the argmin), the float path
  * quantizes exactly like [[graft.ops.Embeddings.quantize]]
  * ((long) floor((double) x · 10⁴)), dot products skip null elements
  * (QDotProduct's contract), and ties break to the LOWEST cell — the
  * struct-lexicographic `array_min` order, reproduced by a strict-`<`
  * ascending scan. Null contract: null ARRAY → null cell
  * (UnaryExpression default; the declarative form mapped an all-null
  * distance column to cell 0 — defensive only, no caller feeds null
  * vectors, and the pushed `isnotnull(cell)` filters both the same
  * way on real data). */
object IvfCellKernel {

  /** Argmin cell over an ALREADY-QUANTIZED long vector. */
  def cellQ(a: ArrayData, cents: Array[Array[Long]],
            norms: Array[Long]): Int = {
    val m = a.numElements()
    var bestD = Long.MaxValue
    var bestJ = 0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(m, c.length)
      var dot = 0L
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) dot += a.getLong(i) * c(i)
        i += 1
      }
      val d = -2L * dot + norms(j)
      if (d < bestD) { bestD = d; bestJ = j }
      j += 1
    }
    bestJ
  }

  /** Argmin cell over a RAW float vector — quantizes inline
    * ((long) floor((double) x · 10⁴), the [[graft.ops.Embeddings.quantize]]
    * semantics) so no intermediate long array is ever materialized. */
  def cellF(a: ArrayData, cents: Array[Array[Long]],
            norms: Array[Long]): Int = {
    val m = a.numElements()
    var bestD = Long.MaxValue
    var bestJ = 0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(m, c.length)
      var dot = 0L
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          dot += math.floor(a.getFloat(i).toDouble * 10000.0).toLong * c(i)
        }
        i += 1
      }
      val d = -2L * dot + norms(j)
      if (d < bestD) { bestD = d; bestJ = j }
      j += 1
    }
    bestJ
  }
}

/** Nearest-centroid cell id of a vector column (array<long> quantized,
  * or array<float> raw — quantized inline). See [[IvfCellKernel]]. */
case class IvfCell(child: Expression, centroids: Seq[Seq[Long]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "ivf_cell: empty centroid table")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ivf_cell requires array<float> or array<bigint>, got $other")
    }

  @transient private lazy val cents: Array[Array[Long]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Long] =
    cents.map { c =>
      var s = 0L; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (isFloat) IvfCellKernel.cellF(a, cents, norms)
    else IvfCellKernel.cellQ(a, cents, norms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "long[][]")
    val nRef = ctx.addReferenceObj("norms", norms, "long[]")
    val fn = if (isFloat) "cellF" else "cellQ"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.IvfCellKernel.$fn($a, $cRef, $nRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCell =
    copy(child = newChild)
}

object IvfCell {
  /** Column API: nearest-centroid cell of `v` (quantized long or raw
    * float vector) against a small centroid table. */
  def cellCol(v: Column, centroids: Array[Array[Long]]): Column =
    GraftColumnBridge.column(
      IvfCell(GraftColumnBridge.expression(v),
        centroids.map(_.toIndexedSeq).toIndexedSeq))
}
