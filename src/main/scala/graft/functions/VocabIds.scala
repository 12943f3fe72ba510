package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary application fused into one codegen loop: token array →
  * id array under a broadcast (term → id) table, OOV → -1. Numerically
  * identical to the declarative
  * `transform(tokens, t => coalesce(element_at(map_literal, t), -1))`
  * it replaces in [[graft.ops.TextStats.tokenIds]] (same lookups, same
  * OOV sentinel — the `t_token_ids` oracle is unaffected), with two
  * scale wins the scaladoc there promised:
  *
  *  - the vocab rides a `Broadcast` handle resolved once per operator
  *    (`addReferenceObj`), not a plan-tree map LITERAL serialized into
  *    every task — a real tokenizer vocab is 10^4–10^6 entries, and
  *    the literal form re-ships and re-hashes it per task;
  *  - the lookup loop stays inside whole-stage codegen probing a
  *    `HashMap<UTF8String, Long>` directly on the scan's string bytes
  *    (UTF8String hashes/compares by bytes — no String decode per
  *    token), where the higher-order `transform` evaluates interpreted
  *    per element and falls out of codegen.
  *
  * Null contract: null array → null (UnaryExpression default); a null
  * ELEMENT maps to -1, matching the declarative form's
  * `element_at(map, null) → null → coalesce → -1`.
  */
case class VocabIds(child: Expression,
                    vocab: Broadcast[java.util.HashMap[UTF8String, java.lang.Long]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vocab_ids"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vocab_ids requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    VocabIds.ofTokens(input.asInstanceOf[ArrayData], vocab.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabBc", vocab,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.VocabIds.ofTokens($a,
         |  (java.util.HashMap) $ref.value());""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): VocabIds =
    copy(child = newChild)
}

object VocabIds {

  /** The fused kernel: one pass, byte-level probes, OOV/null → -1. */
  def ofTokens(a: ArrayData,
               m: java.util.HashMap[UTF8String, java.lang.Long]): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) -1L
        else {
          val v = m.get(a.getUTF8String(i))
          if (v == null) -1L else v.longValue()
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: broadcasts the vocab once (stable UTF8String key
    * copies — probe-side UTF8Strings pointing into row buffers compare
    * by bytes against them). */
  def vocabIds(tokens: Column, spark: SparkSession,
               vocab: Map[String, Long]): Column = {
    val jm = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(16, vocab.size * 2))
    vocab.foreach { case (t, id) =>
      jm.put(UTF8String.fromString(t), java.lang.Long.valueOf(id))
    }
    val bc = spark.sparkContext.broadcast(jm)
    GraftColumnBridge.column(VocabIds(GraftColumnBridge.expression(tokens), bc))
  }
}
