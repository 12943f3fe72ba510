package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of md5 as a non-negative BIGINT — the cross-engine
  * deterministic string hash of the dedup/text family, fused.
  *
  * Semantics are EXACTLY `conv(substring(md5(s), 1, 15), 16, 10)` (and
  * DuckDB's `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)` oracle
  * side): the first 15 hex digits of the digest are its first 8 bytes
  * big-endian, unsigned-shifted right by 4. The composed form
  * hex-formats the 16-byte digest into a 32-char string, substrings it,
  * and re-parses base-16 per call; this expression assembles the Long
  * straight from the digest bytes — no hex string, no parse — and
  * reuses one MessageDigest instance per operator instance instead of
  * allocating per row. This is the inner loop of every shingle /
  * minhash / simhash / fingerprint query (millions of evaluations per
  * scan), which is what justifies a custom Expression over built-ins
  * (SURVEY §7.3 bar).
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5hash60"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5hash60 requires a string argument, got ${child.dataType}")

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(input: Any): Any = {
    val b = md.digest(input.asInstanceOf[UTF8String].getBytes)
    Md5Hash60.first60Bits(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val digestCls = "java.security.MessageDigest"
    val mdRef = ctx.addMutableState(digestCls, "md5digest",
      v => s"""try { $v = $digestCls.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      s"""
         |byte[] $bytes = $mdRef.digest($s.getBytes());
         |${ev.value} = graft.functions.Md5Hash60.first60Bits($bytes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  /** First 8 digest bytes big-endian, >>> 4 — i.e. hex digits 1..15. */
  def first60Bits(b: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (b(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  /** Column API for the fused hash. */
  def md5hash60(s: Column): Column =
    GraftColumnBridge.column(Md5Hash60(GraftColumnBridge.expression(s)))
}
