package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a BIGINT column against a broadcast
  * [[org.apache.spark.util.sketch.BloomFilter]] — the map-side
  * pre-filter of the guarded contamination path
  * (graft.ops.TextDedup.contaminationBloomGuarded).
  *
  * The filter rides a `Broadcast` handle, not the plan tree: a
  * benchmark-scale bloom is megabytes, and embedding it as a literal
  * would bloat every serialized task. Codegen resolves the broadcast
  * once per operator via `addReferenceObj` and probes with
  * `mightContainLong` — no boxing, no UDF. Bloom semantics: may return
  * true for absent values (bounded by the filter's fpp), NEVER false
  * for present ones — callers rely on the no-false-negatives side only
  * and re-verify positives exactly.
  */
case class BloomMightContainLong(child: Expression,
                                 bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_long requires bigint, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
         |  $ref.value()).mightContainLong($v);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContainLong = copy(child = newChild)
}

object BloomMightContainLong {
  /** Column API for the broadcast-bloom membership probe. */
  def mightContain(c: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftColumnBridge.column(
      BloomMightContainLong(GraftColumnBridge.expression(c), bloom))
}
