package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash of a token array, fused into ONE loop: for each token,
  * md5 → first 60 bits (exactly [[Md5Hash60]]'s hash, so the DuckDB
  * oracle replays it); each hash bit votes +1/-1 on the signature bit,
  * weighted by token frequency (duplicate array elements vote once
  * each); signature bit b is 1 iff the vote sum is positive —
  * equivalently iff 2 * ones(b) > n_tokens, which is how the loop
  * tallies it (integer counters, no sign array).
  *
  * Why a custom Expression (SURVEY §7.3 bar): the declarative forms are
  * both wrong for the hot path. explode(tokens) × explode(bits 0..59)
  * shuffles a ×60 row blowup of the corpus through two aggregations
  * (~480 bytes of shuffle per input token — at 100 TB that shuffle IS
  * the job); the shuffle-free higher-order `aggregate`/`zip_with` fold
  * allocates a 60-long array per token and evaluates INTERPRETED
  * (higher-order lambdas are CodegenFallback), measured ~4× slower than
  * the explode form locally. This kernel is a pure projection — input
  * partitioning survives, zero shuffle — and runs inside whole-stage
  * codegen with one MessageDigest reused across rows.
  *
  * Null contract: null array → null (UnaryExpression default); null
  * ELEMENTS are skipped entirely (they vote on nothing and don't count
  * toward n) — the tokenizer never produces them; the guard keeps the
  * expression total. NOTE this differs from the explode formulation it
  * replaced, where a null token's null hash fell through
  * when().otherwise(-1) and voted -1 on EVERY bit (e.g.
  * ["alpha", null] → nonzero signature here, 0 there): the
  * "bit-identical to the explode form" equivalence holds only for
  * null-free arrays (tokenizer output), which is what the equivalence
  * spec exercises.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

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
          s"simhash60 requires array<string>, got $other")
    }

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.ofTokens(input.asInstanceOf[ArrayData], md)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val digestCls = "java.security.MessageDigest"
    val mdRef = ctx.addMutableState(digestCls, "simhashMd5",
      v => s"""try { $v = $digestCls.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash60.ofTokens($a, $mdRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  /** The fused kernel: per-bit one-counts over the tokens' 60-bit md5
    * hashes, then bit b of the result is 1 iff 2 * ones(b) > n. */
  def ofTokens(a: ArrayData, md: java.security.MessageDigest): Long = {
    val counts = new Array[Int](60)
    var n = 0
    val m = a.numElements()
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i)) {
        val h = Md5Hash60.first60Bits(md.digest(a.getUTF8String(i).getBytes))
        n += 1
        var b = 0
        while (b < 60) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (2L * counts(b) > n) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Column API for the fused kernel. */
  def simhash60(tokens: Column): Column =
    GraftColumnBridge.column(SimHash60(GraftColumnBridge.expression(tokens)))
}
