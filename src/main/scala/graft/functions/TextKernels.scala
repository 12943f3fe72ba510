package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row kernels for the token-array position-scan family —
  * phrase search/KWIC ([[graft.ops.Retrieval]]) and the Gopher
  * repetition signals ([[graft.ops.TextStats]]).
  *
  * Why custom Expressions (SURVEY §7.3 bar): these ops are pure
  * per-row projections, but their declarative forms are chains of
  * higher-order functions — `filter(sequence(...))` position scans,
  * `aggregate` run-scans over `sort_array(shingles)` — and Spark
  * evaluates every higher-order lambda INTERPRETED per element
  * (`t_phrase_search`/`t_kwic`/`t_repetition`/`t_gopher_repetition`
  * spent ~11 s of the 178 s round-16 basket in lambda evaluation; the
  * round-15 attempt to go FURTHER into HoF folds measured 1.8× worse
  * for exactly this reason). Each kernel here is the [[SimHash60]] /
  * [[MinHashK]] precedent: one imperative JVM loop per row, no
  * per-element dispatch, no intermediate array materialization (the
  * sorted shingle copies disappear entirely — a hash map replaces
  * sort + run-scan), running inside whole-stage codegen as a single
  * static call. Input partitioning survives — zero shuffle, scan
  * parallelism is the only scale knob, exactly like the declarative
  * forms they replace.
  *
  * Value parity: each kernel is value-identical to the declarative
  * form it replaces for NULL-FREE element arrays (all callers feed
  * tokenizer/split output, which never contains null elements) —
  * pinned by TextKernelsSpec against the old expressions and by the
  * unchanged DuckDB oracles. Null contract: null ARRAY → null
  * (UnaryExpression default); null ELEMENTS are defensive only —
  * phrase slots never match them, gram kernels skip grams that would
  * contain them, char sums count them as 0.
  *
  * Tie-break note ([[TopGramRun]]): "first gram to reach the max run
  * over a sorted array" IS the binary-smallest gram among those with
  * maximal count — the hash-map argmax uses that ordering explicitly,
  * so the sort is gone but the winner is unchanged.
  */
object TextKernels {

  private def structOf(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) })

  val phraseScanType: StructType =
    structOf("n_occ" -> LongType, "first_pos" -> LongType)
  val topGramType: StructType =
    structOf("cnt" -> LongType, "gram" -> StringType)
  val dupCoverageType: StructType =
    structOf("dup_ngrams" -> LongType, "dup_spans" -> LongType,
      "cov_chars" -> LongType)
  val spanCutType: StructType =
    structOf("text" -> StringType, "kept" -> LongType,
      "removed" -> LongType)

  /** n-gram at start i (space-joined tokens), or null if any slot in
    * [i, i+n) is a null element. */
  private def gramAt(a: ArrayData, i: Int, n: Int): UTF8String = {
    val parts = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      if (a.isNullAt(i + j)) return null
      parts(j) = a.getUTF8String(i + j)
      j += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
  }

  /** Gram counts for all n-grams of the array; null grams skipped. */
  private def gramCounts(a: ArrayData, n: Int,
                         grams: Array[UTF8String])
      : java.util.HashMap[UTF8String, Array[Long]] = {
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < grams.length) {
      val g = gramAt(a, i, n)
      grams(i) = g
      if (g != null) {
        val c = counts.get(g)
        if (c == null) counts.put(g, Array(1L)) else c(0) += 1L
      }
      i += 1
    }
    counts
  }

  // ---- phrase scan ----

  def phraseScan(a: ArrayData, phrase: Array[UTF8String]): InternalRow = {
    val m = a.numElements()
    val last = m - phrase.length
    var nOcc = 0L
    var first = -1L
    var i = 0
    while (i <= last) {
      var j = 0
      var ok = true
      while (ok && j < phrase.length) {
        ok = !a.isNullAt(i + j) && phrase(j).equals(a.getUTF8String(i + j))
        j += 1
      }
      if (ok) {
        nOcc += 1L
        if (first < 0L) first = i.toLong
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nOcc, first))
  }

  // ---- most-frequent n-gram ----

  def topGramRun(a: ArrayData, n: Int): InternalRow = {
    val m = a.numElements()
    val nGrams = math.max(m - n + 1, 0)
    val grams = new Array[UTF8String](nGrams)
    val counts = gramCounts(a, n, grams)
    var bestCnt = 0L
    var bestGram = UTF8String.EMPTY_UTF8
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > bestCnt ||
        (c == bestCnt && bestCnt > 0L && e.getKey.compareTo(bestGram) < 0)) {
        bestCnt = c
        bestGram = e.getKey
      }
    }
    new GenericInternalRow(Array[Any](bestCnt, bestGram))
  }

  // ---- duplicated-n-gram positional coverage ----

  def dupGramCoverage(a: ArrayData, n: Int): InternalRow = {
    val m = a.numElements()
    val nGrams = math.max(m - n + 1, 0)
    val grams = new Array[UTF8String](nGrams)
    val counts = gramCounts(a, n, grams)
    var dupNgrams = 0L
    val it = counts.values().iterator()
    while (it.hasNext) if (it.next()(0) >= 2L) dupNgrams += 1L
    // starts whose gram repeats, merged into disjoint [lo, hi) token
    // intervals (ascending order is free — starts are scanned in
    // position order), then covered token chars summed interval-wise
    var dupSpans = 0L
    var covChars = 0L
    var lo = -1
    var hi = -1
    def flush(): Unit = if (lo >= 0) {
      var j = lo
      while (j < hi) {
        if (!a.isNullAt(j)) covChars += a.getUTF8String(j).numChars().toLong
        j += 1
      }
    }
    var i = 0
    while (i < nGrams) {
      val g = grams(i)
      if (g != null && counts.get(g)(0) >= 2L) {
        dupSpans += 1L
        if (lo >= 0 && i <= hi) { if (i + n > hi) hi = i + n }
        else { flush(); lo = i; hi = i + n }
      }
      i += 1
    }
    flush()
    new GenericInternalRow(Array[Any](dupNgrams, dupSpans, covChars))
  }

  // ---- char sums ----

  /** Sum of numChars over non-null elements. */
  def sumCharLen(a: ArrayData): Long = {
    val m = a.numElements()
    var s = 0L
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i)) s += a.getUTF8String(i).numChars().toLong
      i += 1
    }
    s
  }

  /** Char mass of values occurring >= 2 times: sum of cnt·numChars over
    * duplicated values (order-independent, so the caller's sort_array
    * disappears). Null elements skipped. */
  def dupRunChars(a: ArrayData): Long = {
    val m = a.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i)) {
        val v = a.getUTF8String(i)
        val c = counts.get(v)
        if (c == null) counts.put(v, Array(1L)) else c(0) += 1L
      }
      i += 1
    }
    var s = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c >= 2L) s += c * e.getKey.numChars().toLong
    }
    s
  }

  // ---- span cut ----

  /** Cut every [s, s+n) token span (starts SORTED ascending) out of
    * the token array; returns (kept text space-joined, kept count,
    * removed count). One pass: merge overlapping/touching intervals,
    * emit the complement. Null tokens count as kept but contribute no
    * text (array_join's skip-null convention). */
  def spanCut(toks: ArrayData, starts: ArrayData, n: Int): InternalRow = {
    val m = toks.numElements()
    val nS = starts.numElements()
    val kept = new java.util.ArrayList[UTF8String](m)
    var keptCount = 0L
    def emit(from: Int, until: Int): Unit = {
      var j = from
      while (j < until) {
        keptCount += 1L
        if (!toks.isNullAt(j)) kept.add(toks.getUTF8String(j))
        j += 1
      }
    }
    var pos = 0 // next uncovered token index
    var i = 0
    var lo = -1L
    var hi = -1L
    def closeInterval(): Unit = if (lo >= 0L) {
      emit(pos, math.min(lo, m.toLong).toInt)
      pos = math.min(math.max(hi, pos.toLong), m.toLong).toInt
    }
    while (i < nS) {
      if (!starts.isNullAt(i)) {
        val s = starts.getLong(i)
        if (lo >= 0L && s <= hi) { if (s + n > hi) hi = s + n }
        else { closeInterval(); lo = s; hi = s + n }
      }
      i += 1
    }
    closeInterval()
    emit(pos, m)
    val text = UTF8String.concatWs(UTF8String.fromString(" "),
      kept.toArray(new Array[UTF8String](kept.size())): _*)
    new GenericInternalRow(Array[Any](text, keptCount, m - keptCount))
  }

  // ---- Column API ----

  def phraseScanCol(tokens: Column, phrase: Seq[String]): Column =
    GraftColumnBridge.column(
      PhraseScan(GraftColumnBridge.expression(tokens), phrase))
  def topGramRunCol(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(
      TopGramRun(GraftColumnBridge.expression(tokens), n))
  def dupGramCoverageCol(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(
      DupGramCoverage(GraftColumnBridge.expression(tokens), n))
  def sumCharLenCol(arr: Column): Column =
    GraftColumnBridge.column(
      SumCharLen(GraftColumnBridge.expression(arr)))
  def dupRunCharsCol(arr: Column): Column =
    GraftColumnBridge.column(
      DupRunChars(GraftColumnBridge.expression(arr)))
  def spanCutCol(tokens: Column, starts: Column, n: Int): Column =
    GraftColumnBridge.column(
      SpanCut(GraftColumnBridge.expression(tokens),
        GraftColumnBridge.expression(starts), n))
}

/** Shared type-check: the child must be array<string>. */
private[functions] trait StringArrayKernel { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
    }
}

/** Occurrences of a literal token phrase in a token array: one fused
  * loop returning (n_occ, first_pos); first_pos is the 0-based start of
  * the first occurrence, -1 when none (callers filter n_occ > 0 before
  * reading it). Replaces `size(filter(sequence(0, m-L), i =>
  * element_at==...))` — see [[TextKernels]]. */
case class PhraseScan(child: Expression, phrase: Seq[String])
    extends UnaryExpression with StringArrayKernel {
  require(phrase.nonEmpty, "phraseScan: empty phrase")

  override def dataType: DataType = TextKernels.phraseScanType
  override def prettyName: String = "phrase_scan"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  @transient private lazy val phraseU8: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.phraseScan(input.asInstanceOf[ArrayData], phraseU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("phrase", phraseU8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.phraseScan($a, $p);")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseScan =
    copy(child = newChild)
}

/** Most frequent n-gram of a token array as (cnt, gram); ties break to
  * the binary-smallest gram; (0, "") when fewer than n tokens. Replaces
  * `aggregate(sort_array(shingles), run-scan)` — see [[TextKernels]]. */
case class TopGramRun(child: Expression, n: Int)
    extends UnaryExpression with StringArrayKernel {
  require(n >= 1, s"topGramRun: n must be >= 1, got $n")

  override def dataType: DataType = TextKernels.topGramType
  override def prettyName: String = "top_gram_run"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.topGramRun(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.topGramRun($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): TopGramRun =
    copy(child = newChild)
}

/** Duplicated-n-gram stats of a token array: (dup_ngrams = distinct
  * grams occurring >= 2 times, dup_spans = start positions whose gram
  * repeats, cov_chars = token chars inside the positional union of the
  * duplicated spans). Replaces the dupValues/starts/interval-merge/
  * slice-sum HoF chain — see [[TextKernels]]. */
case class DupGramCoverage(child: Expression, n: Int)
    extends UnaryExpression with StringArrayKernel {
  require(n >= 1, s"dupGramCoverage: n must be >= 1, got $n")

  override def dataType: DataType = TextKernels.dupCoverageType
  override def prettyName: String = "dup_gram_coverage"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.dupGramCoverage(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.dupGramCoverage($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): DupGramCoverage =
    copy(child = newChild)
}

/** Sum of numChars over a string array's non-null elements. Replaces
  * the interpreted `aggregate(arr, 0L, acc + length(w))` fold. */
case class SumCharLen(child: Expression)
    extends UnaryExpression with StringArrayKernel {
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_char_len"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.sumCharLen(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.sumCharLen($a);")

  override protected def withNewChildInternal(newChild: Expression): SumCharLen =
    copy(child = newChild)
}

/** ExactSubstr span cut: remove every [s, s+n) token window (left =
  * array<string> tokens, right = array<bigint> SORTED start positions)
  * and reassemble the survivors — (text, kept, removed) in one fused
  * loop, replacing the interval-merge + complement-segment +
  * slice-flatten HoF chain of TextDedup.cutSpans. Null contract: null
  * in either child → null row (the caller coalesces absent starts to
  * an empty array first). */
case class SpanCut(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  require(n >= 1, s"spanCut: n must be >= 1, got $n")

  override def dataType: DataType = TextKernels.spanCutType
  override def prettyName: String = "span_cut"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"span_cut requires (array<string>, array<bigint>), got $other")
    }

  override protected def nullSafeEval(toks: Any, starts: Any): Any =
    TextKernels.spanCut(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.spanCut($a, $b, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCut =
    copy(left = newLeft, right = newRight)
}

/** Char mass of duplicated values in a string array (cnt·len summed over
  * values with cnt >= 2) — order-independent, replacing the
  * sort_array + interpreted run-scan fold. */
case class DupRunChars(child: Expression)
    extends UnaryExpression with StringArrayKernel {
  override def dataType: DataType = LongType
  override def prettyName: String = "dup_run_chars"

  // null-in -> null-out (nullSafeEval); declaring it lets the
  // optimizer rules gated on nullIntolerant apply (null-literal
  // folding, not-null constraint scans through the kernel)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.dupRunChars(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.dupRunChars($a);")

  override protected def withNewChildInternal(newChild: Expression): DupRunChars =
    copy(child = newChild)
}
