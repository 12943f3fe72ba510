package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused language-ID + quality-score + keep-decision kernel for the
  * curation pipeline ([[graft.ops.TextStats.curate]] / `t_curate`).
  *
  * Why (round-17 full-plan sweep, queued for round 18): `curate`
  * filters on BOTH `lang_pred` and `quality_score`, and predicate
  * pushdown has no duplication guard — pushing that filter through the
  * staged langid/quality projections re-inlined the whole cascade into
  * the scan-adjacent Filter: 16 copies of
  * `regexp_extract_all(lower(text))` for the language argmax plus 4
  * for the quality rules, per row, per scan (and the lang/quality
  * self-join read the corpus 4×). At 100 TB the tokenizer IS the map
  * stage, so that was ~24× scan CPU. There is no cheap equivalent
  * predicate (the rules genuinely need token/stopword counts), so the
  * fix is the proven TextKernels pattern: ONE expression consuming the
  * token array once, whose single `pass` field is what the filter
  * references — a pushed filter carries ONE tokenization, and the
  * output projection's three field reads collapse to one evaluation
  * (struct-returning kernels are CSE-eligible; lambdas are not).
  *
  * Output: struct(lang_pred, n_tokens, quality_score, pass).
  * Value parity with the staged declarative forms is pinned verbatim
  * by CurateSignalSpec:
  *  - lang_pred: per-profile stopword-hit counts over the token array,
  *    argmax with first-profile-wins ties, 'und' when all zero
  *    ([[graft.ops.TextStats.langId]] semantics);
  *  - n_tokens: size of the token array;
  *  - quality_score: round6(min(n_tok/20, 1) · punctFactor ·
  *    (0.5 + min(stop_ratio·5, 0.5))) with the exact operation order
  *    and zero-guards of [[graft.ops.TextStats.qualityMetrics]];
  *    round6 is Spark Round's own double path
  *    (BigDecimal.valueOf → setScale(6, HALF_UP) → doubleValue);
  *  - pass: lang_pred ∈ keepLangs && quality_score >= minQuality —
  *    the curate filter, fused so the pushed predicate is one call.
  * Null contract: any null child → null row (TernaryExpression
  * default). The old form computed 'und'/null metrics for null text
  * and the filter dropped the row either way; no caller feeds null
  * token arrays for non-null text. Null token ELEMENTS are defensive
  * only (tokenizer output has none): they count toward n_tokens (size
  * semantics) but never match a stopword (isin-null → not kept). */
object CurateSignalKernel {

  val outType: StructType = StructType(Seq(
    StructField("lang_pred", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("quality_score", DoubleType, nullable = false),
    StructField("pass", BooleanType, nullable = false)))

  private val und = UTF8String.fromString("und")

  /** Spark Round(x, 6) HALF_UP on doubles, verbatim semantics. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def signal(toks: ArrayData, nChars: Long, nPunct: Long,
             langs: Array[UTF8String],
             profSets: Array[java.util.HashSet[UTF8String]],
             stopSet: java.util.HashSet[UTF8String],
             keepSet: java.util.HashSet[UTF8String],
             minQuality: Double): InternalRow = {
    val m = toks.numElements()
    val nProf = profSets.length
    val scores = new Array[Long](nProf)
    var nStop = 0L
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val w = toks.getUTF8String(i)
        var j = 0
        while (j < nProf) {
          if (profSets(j).contains(w)) scores(j) += 1L
          j += 1
        }
        if (stopSet.contains(w)) nStop += 1L
      }
      i += 1
    }
    var best = 0L
    var j = 0
    while (j < nProf) { if (scores(j) > best) best = scores(j); j += 1 }
    // greatest(...) over the scores; argmax = FIRST profile in list
    // order with score > 0 and score == best (TextStats.langId's
    // reversed-fold evaluates exactly this), else 'und'
    var lang = und
    var k = 0
    var found = false
    while (!found && k < nProf) {
      if (scores(k) > 0L && scores(k) == best) { lang = langs(k); found = true }
      k += 1
    }
    val nTok = m.toLong
    val lengthScore = math.min(nTok.toDouble / 20.0, 1.0)
    val punctFactor =
      if (nChars > 0L) 1.0 - (nPunct.toDouble / nChars.toDouble) else 1.0
    val stopTerm =
      if (nTok > 0L) (nStop.toDouble / nTok.toDouble) * 5.0 else 0.0
    val score =
      round6(lengthScore * punctFactor * (0.5 + math.min(stopTerm, 0.5)))
    val pass = keepSet.contains(lang) && score >= minQuality
    new GenericInternalRow(Array[Any](lang, nTok, score, pass))
  }
}

/** struct(lang_pred, n_tokens, quality_score, pass) of a (token-array,
  * n_chars, n_punct) triple — see [[CurateSignalKernel]]. */
case class CurateSignal(first: Expression, second: Expression,
                        third: Expression,
                        profiles: Seq[(String, Seq[String])],
                        keepLangs: Seq[String], minQuality: Double)
    extends TernaryExpression {
  require(profiles.nonEmpty, "curate_signal: empty profile table")

  override def dataType: DataType = CurateSignalKernel.outType
  override def prettyName: String = "curate_signal"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"curate_signal requires (array<string>, bigint, bigint), got $other")
    }

  @transient private lazy val langsU8: Array[UTF8String] =
    profiles.map { case (l, _) => UTF8String.fromString(l) }.toArray
  @transient private lazy val profSets: Array[java.util.HashSet[UTF8String]] =
    profiles.map { case (_, ws) =>
      val s = new java.util.HashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray
  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    profiles.flatMap(_._2).distinct
      .foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  @transient private lazy val keepSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    keepLangs.foreach(l => s.add(UTF8String.fromString(l)))
    s
  }

  override protected def nullSafeEval(toks: Any, nChars: Any,
                                      nPunct: Any): Any =
    CurateSignalKernel.signal(toks.asInstanceOf[ArrayData],
      nChars.asInstanceOf[Long], nPunct.asInstanceOf[Long],
      langsU8, profSets, stopSet, keepSet, minQuality)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("langs", langsU8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val p = ctx.addReferenceObj("profSets", profSets, "java.util.HashSet[]")
    val st = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    val kp = ctx.addReferenceObj("keepSet", keepSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (a, nc, np) =>
      s"""${ev.value} = graft.functions.CurateSignalKernel.signal(
         |  $a, $nc, $np, $l, $p, $st, $kp, ${minQuality}D);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CurateSignal =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CurateSignal {
  /** Column API: the fused curate signal over (tokens, n_chars,
    * n_punct). */
  def signalCol(tokens: Column, nChars: Column, nPunct: Column,
                profiles: Seq[(String, Seq[String])],
                keepLangs: Seq[String], minQuality: Double): Column =
    GraftColumnBridge.column(CurateSignal(
      GraftColumnBridge.expression(tokens),
      GraftColumnBridge.expression(nChars),
      GraftColumnBridge.expression(nPunct),
      profiles, keepLangs, minQuality))
}
