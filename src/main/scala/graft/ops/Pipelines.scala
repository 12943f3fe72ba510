package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline composition — the recipe a corpus
  * team actually runs, wired from the library's oracled stages so a
  * user gets curation → dedup → export in one call instead of
  * re-deriving the stage order (which is load-bearing: dedup-before-
  * filter vs filter-before-dedup is output-identical ONLY because
  * curate dedups on exact content, see [[TextStats.curate]]; near-dup
  * removal AFTER quality filtering avoids LSH-ing docs that die
  * anyway; sharding LAST so positions are dense over the final
  * survivor set).
  *
  * Every stage keeps the library's scale shapes: curate's narrow
  * projections, banded LSH (never all-pairs), the one hash exchange of
  * the shard write. Nothing here collects to the driver.
  */
object Pipelines {

  /** Curate `docs` (language + quality + exact dedup), remove LSH
    * near-dups ([[TextDedup.dedupCorpus]]'s banded pipeline over the
    * survivors), and assign the deterministic training order
    * ([[Sampling.shuffleShards]]). Returns the export frame: surviving
    * (id, text, lang_pred, quality_score, n_tokens) + (ord, shard,
    * pos). Write it with [[Sampling.writeShuffledShards]]'s layout by
    * passing `outPath` — or leave None and materialize it yourself. */
  def curateToShards(docs: DataFrame, idCol: String, textCol: String,
                     keepLangs: Seq[String], minQuality: Double,
                     n: Int, k: Int, bands: Int, minJ: Double,
                     nShards: Int, seed: String,
                     outPath: Option[String] = None): DataFrame = {
    val curated = TextStats.curate(docs, idCol, textCol,
      keepLangs, minQuality)
    val curatedDocs = docs.select(col(idCol), col(textCol))
      .join(curated.select(col(idCol)), Seq(idCol), "left_semi")
    val survivors = TextDedup.dedupCorpus(curatedDocs, idCol, textCol,
      n, k, bands, minJ)
    val enriched = survivors.join(
      curated.select(col(idCol), col("lang_pred"),
        col("quality_score"), col("n_tokens")), Seq(idCol))
    val sharded = Sampling.shuffleShards(enriched, idCol, nShards, seed)
    outPath.foreach { p =>
      sharded.repartition(nShards, col("shard"))
        .sortWithinPartitions(col("shard"), col("ord"), col(idCol))
        .write.mode("overwrite").partitionBy("shard").parquet(p)
    }
    sharded
  }
}
