package graft

import graft.ops.Spectral
import org.apache.spark.sql.functions._

/** ops/Spectral — exact-integer PCA: planted-direction recovery, parity
  * with a double-precision reference iteration, determinism, and the
  * degenerate zero-covariance guards. */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Deterministic planted corpus: x_i = a_i·u + small structured
    * noise, with u the dominant axis by construction (spread of a_i
    * dwarfs the noise). */
  private def planted() = {
    val u = Array(0.6, 0.3, -0.5, 0.2, 0.0, -0.4, 0.1, 0.3)
    val un = { val n = math.sqrt(u.map(x => x * x).sum); u.map(_ / n) }
    val rows = (0 until 200).map { i =>
      val a = (i % 41).toDouble - 20.0 // spread -20..20 along u
      val vec = Array.tabulate(dim) { k =>
        (a * un(k) + 0.01 * math.sin(i * 37 + k * 13)).toFloat
      }
      (i.toLong, vec.toSeq)
    }
    (rows.toDF("vec_id", "embedding"), un)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / (na * nb)
  }

  test("planted dominant direction is recovered (|cos| > 0.99)") {
    val (df, u) = planted()
    val dir = Spectral.principalDirectionU6(df, "embedding", dim, 12)
      .map(_.toDouble)
    assert(math.abs(cosine(dir, u)) > 0.99)
  }

  test("integer iteration tracks a double-precision reference") {
    val (df, _) = planted()
    val (n, s, g) = Spectral.momentStats(df, "embedding", dim)
    val c = Spectral.covarianceN2(n, s, g)
    // double-precision power iteration on the same integer covariance
    val cd = c.map(_.map(_.toDouble))
    var v = Array.fill(dim)(1.0)
    for (_ <- 1 to 50) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cd(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      v = w.map(_ / m)
    }
    val vi = Spectral.powerIterU6(c, 12).map(_.toDouble)
    assert(math.abs(cosine(vi, v)) > 0.9999)
  }

  test("deterministic: two fits agree exactly") {
    val (df, _) = planted()
    val a = Spectral.principalDirectionU6(df, "embedding", dim, 12)
    val b = Spectral.principalDirectionU6(df, "embedding", dim, 12)
    assert(a.sameElements(b))
  }

  test("constant corpus: zero covariance collapses to the guard path") {
    val df = (0 until 20)
      .map(i => (i.toLong, Seq.fill(dim)(1.5f)))
      .toDF("vec_id", "embedding")
    val dir = Spectral.principalDirectionU6(df, "embedding", dim, 12)
    assert(dir.forall(_ == 0L))
    val v = Spectral.pcaVariance(df, "embedding", dim, 12).collect()(0)
    assert(v.getAs[Long]("n_vecs") == 20L)
    assert(v.getAs[Long]("trace_e8") == 0L)
    assert(v.getAs[Long]("lambda_e8") == 0L)
    assert(v.getAs[Long]("share_bp") == 0L)
  }

  test("projectU6 equals the zip_with+aggregate formulation") {
    val (df, _) = planted()
    val dir = Spectral.principalDirectionU6(df, "embedding", dim, 12)
    val viaKernel = Spectral.projectU6(df, "vec_id", "embedding", dir)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dl = typedLit(dir.toSeq)
    val viaBuiltins = df.select(col("vec_id"),
        aggregate(
          zip_with(graft.ops.Embeddings.quantize(col("embedding")), dl,
            (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("proj"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaKernel.sameElements(viaBuiltins))
  }

  test("pcaOutliers ranks by |projection| with id tie-break") {
    val (df, _) = planted()
    val out = Spectral.pcaOutliers(df, "vec_id", "embedding", dim, 12, 10)
      .collect()
    assert(out.length == 10)
    val mags = out.map(r => math.abs(r.getLong(1)))
    assert(mags.sameElements(mags.sortBy(-_)))
    // top row must carry the corpus-wide max |projection|
    val all = Spectral.projectU6(df, "vec_id", "embedding",
        Spectral.principalDirectionU6(df, "embedding", dim, 12))
      .agg(max(abs(col("proj")))).collect()(0).getLong(0)
    assert(mags.head == all)
  }

  test("streaming gram MV: served spectrum equals the batch fit at " +
    "every commit, and replaying a commit is idempotent") {
    val (df, _) = planted()
    val work = java.nio.file.Files.createTempDirectory("gram-mv").toString
    for (b <- 0 until 3) {
      graft.streaming.Ingest.commitGramBatch(
        df.filter(pmod(col("vec_id"), lit(3)) === b), work, b.toLong,
        "embedding")
      val served = graft.streaming.Ingest
        .readPcaVariance(spark, work, dim, 12).get.collect().toSeq
      val batchFit = Spectral.pcaVariance(
        df.filter(pmod(col("vec_id"), lit(3)) <= b), "embedding", dim, 12)
        .collect().toSeq
      assert(served == batchFit, s"batch $b")
    }
    // crash-replay: recommitting the last batch must not double-count
    graft.streaming.Ingest.commitGramBatch(
      df.filter(pmod(col("vec_id"), lit(3)) === 2), work, 2L, "embedding")
    val replayed = graft.streaming.Ingest
      .readPcaVariance(spark, work, dim, 12).get.collect().toSeq
    val full = Spectral.pcaVariance(df, "embedding", dim, 12)
      .collect().toSeq
    assert(replayed == full)
  }

  test("variance summary: dominant share is high on the planted corpus") {
    val (df, _) = planted()
    val v = Spectral.pcaVariance(df, "embedding", dim, 12).collect()(0)
    assert(v.getAs[Long]("n_vecs") == 200L)
    // the planted axis carries nearly all variance
    assert(v.getAs[Long]("share_bp") > 9500L)
    assert(v.getAs[Long]("lambda_e8") <= v.getAs[Long]("trace_e8") + 1)
  }
}
