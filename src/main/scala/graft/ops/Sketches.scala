package graft.ops

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketches — the heavy-hitter layer next to
  * the profiler's HLL distinct counts (ops/Profiler.scala). The driving
  * case is corpus boilerplate mining: "which shingles dominate the
  * corpus" over 100 TB, where `groupBy(shingle).count()` shuffles one
  * partial per DISTINCT shingle (billions), while a mergeable
  * Misra-Gries summary ships at most `capacity` entries per map task —
  * the shuffle is O(capacity × partitions) regardless of corpus size.
  *
  * Guarantees (Misra-Gries, with the batch-decrement variant; see
  * Agarwal et al., "Mergeable Summaries", PODS 2012): for every term,
  *   true_count − N/(capacity+1)  ≤  est  ≤  true_count
  * and every term with true_count > N/(capacity+1) is present in the
  * summary. When `capacity ≥ |distinct terms|` no eviction ever fires
  * and the summary is EXACT — the regime the DuckDB oracle runs in
  * (documented in SketchesSpec; the eviction regime is property-tested
  * against the bound instead, since eviction-order effects make exact
  * evicted counts merge-order-dependent — same honesty split as the
  * profiler's HLL estimates).
  */
object Sketches {

  /** Mutable Misra-Gries buffer: counts + the total item count (the N
    * of the error bound). Kryo-serialized only at partial-agg shuffle
    * boundaries; within a partition it is mutated in place. */
  final class MGBuf(val counts: JHashMap[String, Long],
                    var n: Long) extends Serializable

  /** Decrement-all-by-the-(cap+1)-th-largest and drop ≤0 — the MG batch
    * compression. Runs only when size exceeds `cap`; amortized O(log)
    * per item because each compress removes at least half the entries
    * of a 2·cap-full map. */
  private def compress(m: JHashMap[String, Long], cap: Int): Unit =
    if (m.size > cap) {
      val vals = new Array[Long](m.size)
      var i = 0
      val it0 = m.values.iterator
      while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val t = vals(vals.length - 1 - cap) // (cap+1)-th largest
      val it = m.entrySet.iterator
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - t
        if (v <= 0) it.remove() else e.setValue(v)
      }
    }

  /** Typed Aggregator over a string column. The in-partition map is
    * allowed to grow to 2·capacity before compressing (halves the
    * compress frequency; the shuffled partial is still ≤ 2·capacity
    * entries, a constant). */
  final class MisraGries(capacity: Int)
      extends Aggregator[String, MGBuf, Map[String, Long]] {
    require(capacity >= 1)
    override def zero: MGBuf = new MGBuf(new JHashMap, 0L)
    override def reduce(b: MGBuf, term: String): MGBuf = {
      b.n += 1
      b.counts.put(term, b.counts.getOrDefault(term, 0L) + 1L)
      if (b.counts.size > 2 * capacity) compress(b.counts, capacity)
      b
    }
    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val (into, from) = if (a.counts.size >= b.counts.size) (a, b) else (b, a)
      val it = from.counts.entrySet.iterator
      while (it.hasNext) {
        val e = it.next()
        into.counts.put(e.getKey,
          into.counts.getOrDefault(e.getKey, 0L) + e.getValue)
      }
      into.n += from.n
      if (into.counts.size > 2 * capacity) compress(into.counts, capacity)
      into
    }
    override def finish(b: MGBuf): Map[String, Long] = {
      compress(b.counts, capacity)
      val sb = Map.newBuilder[String, Long]
      val it = b.counts.entrySet.iterator
      while (it.hasNext) {
        val e = it.next(); sb += ((e.getKey, e.getValue))
      }
      sb.result()
    }
    override def bufferEncoder: Encoder[MGBuf] = Encoders.kryo[MGBuf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** MG summary of an exploded term column → (term, est) rows. */
  def mgSummary(terms: DataFrame, termCol: String,
                capacity: Int): DataFrame = {
    val ds = terms.select(col(termCol).cast("string")).na.drop()
      .as(Encoders.STRING)
    ds.select(new MisraGries(capacity).toColumn.name("mg"))
      .select(explode(col("mg")).as(Seq("term", "est")))
  }

  /** [[MisraGries]] fused with positional shingle ASSEMBLY: input is
    * the TOKEN ARRAY of a document; `reduce` walks the `len − n + 1`
    * shingle positions with one StringBuilder, feeding the same MG
    * buffer — identical counts to exploding
    * [[TextDedup.shingleArray]] into [[MisraGries]] (space-joined
    * windows, every position, docs shorter than `n` contribute
    * nothing; SketchesSpec pins value parity against the explode
    * path). The fusion exists because the explode form materializes
    * one row PER SHINGLE through `n − 1` interpreted `zip_with`
    * concat passes before the aggregator sees it — per-row work the
    * sketch's whole design is meant to avoid (round 17: ~2× on
    * t_heavy_shingles; the shuffle was already summary-sized, this
    * recovers the map-side cost). */
  final class MisraGriesShingles(capacity: Int, n: Int)
      extends Aggregator[Seq[String], MGBuf, Map[String, Long]] {
    require(capacity >= 1 && n >= 1)
    private val delegate = new MisraGries(capacity)
    override def zero: MGBuf = delegate.zero
    override def reduce(b: MGBuf, toks: Seq[String]): MGBuf = {
      if (toks == null) return b
      val m = toks.length - n + 1
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        val sh = sb.toString
        b.n += 1
        b.counts.put(sh, b.counts.getOrDefault(sh, 0L) + 1L)
        if (b.counts.size > 2 * capacity) compress(b.counts, capacity)
        i += 1
      }
      b
    }
    override def merge(a: MGBuf, b: MGBuf): MGBuf = delegate.merge(a, b)
    override def finish(b: MGBuf): Map[String, Long] = delegate.finish(b)
    override def bufferEncoder: Encoder[MGBuf] = Encoders.kryo[MGBuf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** The pre-fusion explode form of [[heavyShingles]]'s summary —
    * kept as the parity reference (SketchesSpec compares the two on
    * the same corpus in the exact regime). */
  private[graft] def shingleSummaryExploded(docs: DataFrame,
                                            textCol: String,
                                            shingleN: Int,
                                            capacity: Int): DataFrame =
    mgSummary(docs.select(explode(TextDedup.shingleArray(
      TextDedup.tokens(col(textCol)), shingleN)).as("shingle")),
      "shingle", capacity)

  /** Heavy-hitter POSITIONAL shingles of a corpus (candidate
    * boilerplate): top `k` by estimated count, count-desc / term-asc
    * ranked. Map-side: tokenize (a codegen projection), then the
    * FUSED shingle+MG partial per partition ([[MisraGriesShingles]] —
    * no per-shingle row ever materializes); only summaries shuffle. */
  def heavyShingles(docs: DataFrame, textCol: String, shingleN: Int,
                    capacity: Int, k: Int): DataFrame = {
    val toks = docs.select(TextDedup.tokens(col(textCol)).as("toks"))
      .as(ExpressionEncoder[Seq[String]]())
    val top = toks
      .select(new MisraGriesShingles(capacity, shingleN)
        .toColumn.name("mg"))
      .select(explode(col("mg")).as(Seq("term", "est")))
      .orderBy(col("est").desc, col("term"))
      .limit(k)
    top.select(
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("est").desc, col("term"))).cast("long").as("rnk"),
      col("term").as("shingle"), col("est").as("cnt"))
      .orderBy("rnk")
  }
}
