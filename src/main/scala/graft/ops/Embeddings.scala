package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.functions.array_to_vector

/** Similarity search over an embedding column (`Array[Float]`) — the
  * ANN surface a training-data pipeline needs: brute-force cosine top-k
  * as the correctness baseline, and an LSH-bucketed variant as the scale
  * path.
  *
  * Determinism contract: floats are quantized to BIGINT (floor(x*10^4))
  * before any arithmetic, so dot products and norms are EXACT integer
  * sums (order-independent, identical in any engine — this is what makes
  * the DuckDB oracle byte-exact). The final cosine is one double division
  * of exact integers. Quantization noise ~1e-4 is far below any ranking
  * that matters, and ties break on vec_id.
  *
  * Scale design: queries are broadcast (top-k search is "few probes vs
  * huge corpus"); the corpus side never shuffles for brute force. The
  * LSH path buckets the corpus by hyperplane-sign signature so each
  * probe only scans its bucket — the 1000-executor plan is a broadcast
  * join on (bucket) instead of a full scan per probe.
  */
object Embeddings {

  /** Quantize a float vector to exact BIGINTs: floor(x * 10^4). */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 10000).cast("long"))

  /** Exact integer dot product of two quantized vectors — fused custom
    * Catalyst expression (graft.functions.QDotProduct): one codegen loop,
    * no intermediate array, same exact-Long semantics as the
    * zip_with+aggregate formulation it replaces. */
  def qdot(a: Column, b: Column): Column = graft.functions.QDot.qdot(a, b)

  /** Cosine similarity of two quantized vectors as double (exact-integer
    * dot/norms, one final double division; 0 when either norm is 0). */
  def qcosine(a: Column, b: Column): Column = {
    val dot = qdot(a, b).cast("double")
    val na = sqrt(qdot(a, a).cast("double"))
    val nb = sqrt(qdot(b, b).cast("double"))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors (excluding itself). Queries are broadcast; the corpus
    * is scanned once; ranking is windowed per query with vec_id
    * tie-break. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      quantize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", qcosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane j,
    * dim i): md5-derived value mapped to [-1, 1). Computed ONCE on the
    * driver (same md5 → same value as the column-expression form, but
    * the row path multiplies against literals instead of running md5
    * per element per row). Reproducible in any engine — no RNG state. */
  private[ops] def planeComponent(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane:$j:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2000001L)
      .toDouble / 1000000.0 - 1.0
  }

  private def planeVector(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map(i => planeComponent(j, i))

  /** Sign-random-projection LSH signature: `nPlanes` hyperplanes, bit j =
    * 1 iff dot(v, plane_j) >= 0. Returns (id, bucket) where bucket packs
    * the signs into a BIGINT. Same-bucket vectors are ANN candidates.
    * `dim` is the embedding width (planes are driver-side literals). */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
                 nPlanes: Int, dim: Int): DataFrame = {
    val v = quantize(col(vecCol))
    // dot(v, plane_j) sign per plane, packed little-endian
    val bucket = (0 until nPlanes).map { j =>
      val dotJ = aggregate(
        zip_with(v, typedlit(planeVector(j, dim)),
          (x, p) => x.cast("double") * p),
        lit(0.0).cast("double"), (acc, x) => acc + x)
      when(dotJ >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(col(idCol), bucket.as("bucket"))
  }

  /** LSH-bucketed ANN: top-k per query restricted to the query's bucket.
    * Recall < 1 by construction (that's the trade); bucket size bounds the
    * per-probe work. At scale the corpus is written bucketed/partitioned
    * by `bucket` so a probe reads one partition. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, nPlanes: Int, dim: Int,
              k: Int): DataFrame = {
    val cb = corpus.join(lshBuckets(corpus, idCol, vecCol, nPlanes, dim), idCol)
      .select(col(idCol).as("corpus_id"), quantize(col(vecCol)).as("cv"),
        col("bucket"))
    val qb = queries.join(lshBuckets(queries, idCol, vecCol, nPlanes, dim), idCol)
      .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"),
        col("bucket"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", qcosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("rnk").cast("int").as("rnk"))
  }

  /** IVF (inverted-file) ANN index: a deterministic k-means coarse
    * quantizer partitions the corpus into `nLists` cells; a query scans
    * only its `nProbe` nearest cells. The scale path writes the corpus
    * bucketed by cell so a probe reads nProbe partitions of a 100 TB
    * corpus. Centroids come from MLlib KMeans with a FIXED seed —
    * reproducible, and the model is a tiny driver-side array that
    * broadcasts with the query side. */
  def ivfFit(corpus: DataFrame, idCol: String, vecCol: String,
             nLists: Int): org.apache.spark.ml.clustering.KMeansModel = {
    val asm = corpus.select(col(idCol),
      array_to_vector(col(vecCol)).as("features"))
    // An IVF coarse quantizer only needs cells that roughly partition the
    // space — recall comes from nProbe, not centroid optimality. Random
    // init skips k-means||'s extra full passes over the corpus (several
    // jobs each at cluster scale) and 10 iterations with a loose tol is
    // the standard budget for this use.
    new org.apache.spark.ml.clustering.KMeans()
      .setK(nLists).setSeed(42L).setMaxIter(10)
      .setInitMode("random").setTol(1e-3)
      .fit(asm)
  }

  /** Assign each vector to its IVF cell. */
  def ivfAssign(model: org.apache.spark.ml.clustering.KMeansModel,
                df: DataFrame, idCol: String, vecCol: String): DataFrame =
    model.transform(df.select(col(idCol),
        array_to_vector(col(vecCol)).as("features")))
      .select(col(idCol), col(model.getPredictionCol).as("cell"))

  /** IVF top-k: per query, brute-force cosine within the query's
    * `nProbe` nearest cells only. */
  def ivfTopK(model: org.apache.spark.ml.clustering.KMeansModel,
              corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, nProbe: Int, k: Int): DataFrame = {
    val centroids = model.clusterCenters.zipWithIndex
    val spark = corpus.sparkSession
    import spark.implicits._
    val cb = corpus.join(ivfAssign(model, corpus, idCol, vecCol), idCol)
      .select(col(idCol).as("corpus_id"), quantize(col(vecCol)).as("cv"),
        col("cell"))
    // query → its nProbe nearest cells (tiny driver-side math per query
    // is avoided: distances to all centroids computed as columns, then
    // the nProbe smallest kept — centroid count is small by design)
    val centDf = centroids.map { case (c, i) => (i, c.toArray) }
      .toSeq.toDF("cell", "centroid")
    val qCells = queries.select(col(idCol).as("query_id"),
        quantize(col(vecCol)).as("qv"), col(vecCol).as("_v"))
      .crossJoin(broadcast(centDf))
      .withColumn("dist2", aggregate(
        zip_with(col("_v"), col("centroid"),
          (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0).cast("double"), (acc, x) => acc + x))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("dist2"), col("cell"))))
      .filter(col("rnk") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val scored = cb.join(broadcast(qCells), Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", qcosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b), a < b, with
    * cosine >= minCos, generated through LSH buckets (scale path) and
    * exact-verified. For full recall at moderate n use nPlanes small
    * enough that near-dups collide; at 100 TB this is the standard
    * recall/cost dial. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         nPlanes: Int, dim: Int, minCos: Double): DataFrame = {
    val b = df.join(lshBuckets(df, idCol, vecCol, nPlanes, dim), idCol)
      .select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"),
        col("bucket"))
      .cache() // both sides of the self-join below
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .withColumn("cosine", qcosine(col("x.qv"), col("y.qv")))
      .filter(col("cosine") >= minCos)
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"), col("cosine"))
  }
}
