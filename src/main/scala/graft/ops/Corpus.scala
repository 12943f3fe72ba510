package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-lifecycle ops: snapshot-to-snapshot reconciliation. A corpus
  * that refreshes (recrawl, license takedown, re-extraction) needs a
  * DIFF between two snapshots — which documents appeared, vanished, or
  * changed content — both as the changelog a data card cites and as the
  * work-list an incremental pipeline (re-embed, re-index, re-dedup)
  * consumes instead of reprocessing 100 TB. The reference rebuilds its
  * SQLite tables wholesale (app/database.py); this is the operation it
  * would need the day the corpus stops fitting a rebuild.
  */
object Corpus {

  /** Diff two corpus snapshots on a stable document key: rows only for
    * `added` (in b, not a), `removed` (in a, not b) and `changed`
    * (both, different content) — the unchanged bulk, which at 100 TB is
    * ~all of the corpus, is filtered out BEFORE anything is collected
    * or written. `delta_chars` carries the size movement (signed;
    * removed docs count their full length negative).
    *
    * Scale shape: each side is projected map-side to
    * `(id, md5(text), length)` — ~50 bytes/row — before the single
    * full-outer hash join on the key, so the shuffle moves fingerprints,
    * never text. Content equality is md5 (the cross-engine deterministic
    * hash used corpus-wide, [[TextDedup.md5Hash60]]); both engines
    * compare the same 128-bit digest, and a collision would need 2^64
    * docs. One shuffle per side, co-partitioned on the join key.
    */
  def corpusDiff(a: DataFrame, b: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    def fp(d: DataFrame, tag: String): DataFrame =
      d.select(col(idCol),
        md5(col(textCol)).as(s"_h_$tag"),
        length(col(textCol)).cast("long").as(s"_len_$tag"))
    fp(a, "a").join(fp(b, "b"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("_h_a").isNull, lit("added"))
          .when(col("_h_b").isNull, lit("removed"))
          .when(col("_h_a") =!= col("_h_b"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col(idCol), col("status"),
        (coalesce(col("_len_b"), lit(0L)) -
          coalesce(col("_len_a"), lit(0L))).as("delta_chars"))
  }

  /** Incremental refresh of ANY per-document derived table (quality
    * metrics, fingerprints, language IDs, embeddings-by-proxy…): given
    * the old and new corpus snapshots and the derived table computed
    * from the old one, recompute `compute` ONLY for added/changed
    * documents and carry everything else over — the 100 TB refresh
    * story, where a 0.1% daily delta must not re-tokenize the corpus.
    *
    * Correctness contract (oracled, `pipe_incr_quality`): the result
    * is row-identical to `compute(newDocs)` run from scratch, for any
    * `compute` that is PER-DOCUMENT (row i's output depends only on
    * row i — corpus-level aggregates like df tables refresh through
    * their additive-partials paths instead, e.g.
    * [[Retrieval.appendToSearchIndex]]).
    *
    * Scale shape: the diff moves fingerprints (see [[corpusDiff]]);
    * the carry-over is one anti-join and the recompute one semi-join,
    * both co-partitioned on the id — derived rows and text move only
    * for the delta. */
  def incrementalRefresh(oldDocs: DataFrame, newDocs: DataFrame,
                         oldDerived: DataFrame, idCol: String,
                         textCol: String)
                        (compute: DataFrame => DataFrame): DataFrame = {
    val diff = corpusDiff(oldDocs, newDocs, idCol, textCol)
    // removed+changed leave the derived table; added+changed recompute
    val stale = diff.select(col(idCol))
    val touched = diff.filter(col("status") =!= "removed")
      .select(col(idCol))
    val carried = oldDerived.join(stale, Seq(idCol), "left_anti")
    val recomputed = compute(
      newDocs.join(touched, Seq(idCol), "left_semi"))
    carried.unionByName(recomputed)
  }

  /** One-row rollup of [[corpusDiff]] plus the unchanged count — the
    * changelog header. Computed from the same fingerprint join WITHOUT
    * the unchanged filter, as map-side-combinable conditional sums. */
  /** SCD Type-2 history maintenance: fold a new corpus snapshot into a
    * versioned history table — the lakehouse pattern for "what did
    * this document say when we trained the March model?". `history`
    * carries `(idCol, textCol, valid_from, valid_to, is_current)`;
    * applying `snapshot` at `version` closes the current rows of
    * changed/removed docs (`valid_to = version`, no longer current),
    * opens rows for added/changed docs (`valid_from = version`,
    * `valid_to` null), and carries everything else untouched —
    * re-applying the same snapshot is a no-op (the diff is empty), so
    * the fold is idempotent per version.
    *
    * Scale shape: the change detection is [[corpusDiff]]'s
    * fingerprint join (~50-byte rows, never text); the close/open
    * sets are delta-scale id lists applied by co-partitioned
    * semi/anti joins — history text moves only for rows actually
    * closing, snapshot text only for rows actually opening. Nothing
    * rewrites the unchanged bulk (pair with a partitioned history
    * layout so the carry-over is metadata, not IO).
    */
  def scd2Apply(history: DataFrame, snapshot: DataFrame, idCol: String,
                textCol: String, version: Long): DataFrame = {
    val outCols = Seq(col(idCol), col(textCol), col("valid_from"),
      col("valid_to"), col("is_current"))
    val cur = history.filter(col("is_current"))
    val diff = corpusDiff(cur.select(col(idCol), col(textCol)),
      snapshot.select(col(idCol), col(textCol)), idCol, textCol)
    val closeIds = diff.filter(col("status").isin("changed", "removed"))
      .select(col(idCol))
    val openIds = diff.filter(col("status").isin("added", "changed"))
      .select(col(idCol))
    val keepAsIs = history.filter(!col("is_current"))
      .select(outCols: _*)
      .union(cur.join(closeIds, Seq(idCol), "left_anti")
        .select(outCols: _*))
    val closed = cur.join(closeIds, Seq(idCol), "left_semi")
      .withColumn("valid_to", lit(version))
      .withColumn("is_current", lit(false))
      .select(outCols: _*)
    val opened = snapshot.join(openIds, Seq(idCol), "left_semi")
      .select(col(idCol), col(textCol),
        lit(version).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
    keepAsIs.select(outCols: _*).union(closed).union(opened)
  }

  /** Time-travel read over an [[scd2Apply]] history: the corpus
    * exactly as it stood at `version` — rows whose validity interval
    * covers it (`valid_from <= version < valid_to`, open rows
    * unbounded). Pure filter, no join: at 100 TB this is a scan the
    * history layout's partition/footer stats prune ("what did this
    * document say when we trained the March model?" costs the March
    * slice, not the history). */
  def scd2AsOf(history: DataFrame, idCol: String, textCol: String,
               version: Long): DataFrame =
    history.filter(col("valid_from") <= version &&
        (col("valid_to").isNull || col("valid_to") > version))
      .select(col(idCol), col(textCol))

  /** CDC merge (MERGE INTO / upsert-apply): fold a change log into a
    * snapshot. `changelog` carries `(idCol, seqCol, opCol, <the
    * snapshot's value columns>)` with op ∈ {"upsert", "delete"} and
    * `seqCol` a monotone change sequence (log offset, commit LSN) —
    * UNIQUE per (id, seq), which every real CDC source guarantees.
    * The result is the snapshot after applying, per id, only the
    * HIGHEST-seq change: upsert replaces-or-inserts the row, delete
    * removes it; ids absent from the log carry over untouched.
    * Replaying the same log twice is a no-op (last-writer-wins is
    * idempotent), which is what makes the op safe under at-least-once
    * delivery.
    *
    * Scale shape: the per-id latest change is ONE partial-aggregable
    * `max(struct(seq, …))` — map-side combine collapses each log
    * partition to one candidate per id before the only log shuffle
    * (the struct comparison is total even on malformed duplicate seqs,
    * so the fold is deterministic regardless). The base carries over
    * via one anti-join on the id — co-partitioned, delta-scale
    * (AQE broadcasts the changed-id list when the day's delta is
    * small, which at 100 TB it is). The unchanged bulk never moves;
    * pair with a partitioned base layout so the carry-over is
    * metadata, not IO. */
  def cdcApply(base: DataFrame, changelog: DataFrame, idCol: String,
               seqCol: String, opCol: String): DataFrame =
    applyCdcState(base,
      cdcLatest(changelog, idCol, seqCol, opCol), idCol, seqCol, opCol)

  /** The per-id HIGHEST-seq change of a log — [[cdcApply]]'s fold,
    * exposed because it is ASSOCIATIVE (max of struct): folding two
    * logs' cdcLatest outputs through cdcLatest again equals cdcLatest
    * over their concatenation, which is what lets a streaming sink
    * keep per-batch folded rows and defer the cross-batch fold to
    * serving ([[graft.streaming.Ingest.startCdcSink]]). Output: one
    * row per touched id, carrying seq, op and the log's value
    * columns. */
  def cdcLatest(changelog: DataFrame, idCol: String, seqCol: String,
                opCol: String): DataFrame = {
    val valueCols = changelog.columns
      .filterNot(c => c == idCol || c == seqCol || c == opCol).toSeq
    changelog
      .groupBy(col(idCol))
      .agg(max(struct((col(seqCol) +: col(opCol) +:
        valueCols.map(col)): _*)).as("_last"))
      .select(col(idCol) +: col(s"_last.$seqCol") +:
        col(s"_last.$opCol") +: valueCols.map(c => col(s"_last.$c")): _*)
  }

  /** Apply a [[cdcLatest]] state to a snapshot: anti-join carry for
    * untouched ids, upsert rows replace-or-insert, deletes drop. */
  def applyCdcState(base: DataFrame, latest: DataFrame, idCol: String,
                    seqCol: String, opCol: String): DataFrame = {
    val valueCols = base.columns.filter(_ != idCol).toSeq
    val carried = base.join(latest.select(col(idCol)),
      Seq(idCol), "left_anti")
    val applied = latest.filter(col(opCol) === "upsert")
      .select(col(idCol) +: valueCols.map(col): _*)
    carried.select(col(idCol) +: valueCols.map(col): _*)
      .unionByName(applied)
  }

  /** Order-independent content digest of a frame: the exact 38-digit
    * sum of each row's 60-bit md5 over a canonical serialization, plus
    * the row count. Two digests agree ⟺ contents agree (up to
    * engineered md5-sum collisions) regardless of engine, file layout,
    * partitioning, or row order — the replication / migration /
    * backup-restore check, one map-side hash and one scalar aggregate
    * per side (the two tables never meet, unlike a diff join; at
    * 100 TB each side is a scan). Columns are serialized as strings
    * with \u0001 between fields and \u0002 for null (null ≠ empty
    * string); pass integers/strings directly and pre-format doubles —
    * engine-default double rendering is not canonical. Field values
    * containing \u0001 can alias across column splits; reserve it. */
  def tableDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    val ser = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    df.select(graft.functions.Md5Hash60.md5hash60(ser).as("_h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("_h").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("digest"))
  }

  def corpusDiffSummary(a: DataFrame, b: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    def fp(d: DataFrame, tag: String): DataFrame =
      d.select(col(idCol), md5(col(textCol)).as(s"_h_$tag"))
    val j = fp(a, "a").join(fp(b, "b"), Seq(idCol), "full_outer")
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, lit(1L)).otherwise(lit(0L)))
    j.agg(
      cnt(col("_h_a").isNull).as("n_added"),
      cnt(col("_h_b").isNull).as("n_removed"),
      cnt(col("_h_a").isNotNull && col("_h_b").isNotNull &&
        col("_h_a") =!= col("_h_b")).as("n_changed"),
      cnt(col("_h_a").isNotNull && col("_h_b").isNotNull &&
        col("_h_a") === col("_h_b")).as("n_unchanged"))
  }
}
