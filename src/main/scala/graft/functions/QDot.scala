package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two BIGINT arrays — the ANN hot-path
  * kernel. This is the one operator where a custom Catalyst `Expression`
  * earns its keep over composed built-ins (SURVEY §7.3): the
  * `zip_with + aggregate` formulation materializes an intermediate
  * array per row-pair and walks it twice; this codegen emits ONE fused
  * loop over the two `ArrayData`, no allocation, inside whole-stage
  * codegen. Semantics are identical (exact Long arithmetic), so the
  * DuckDB oracle is unaffected.
  *
  * Null contract: null if either side is null (BinaryExpression
  * default); null ELEMENTS are treated as 0 (quantized vectors never
  * contain nulls; the guard keeps the expression total).
  */
case class QDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getLong(i) * y.getLong(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDotProduct =
    copy(left = newLeft, right = newRight)
}

object QDot {
  /** Column API for the fused kernel. */
  def qdot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      QDotProduct(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))
}
