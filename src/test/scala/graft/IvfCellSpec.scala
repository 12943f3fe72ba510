package graft

import graft.ops.Embeddings
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Value-parity pins for the fused IVF cell-assignment kernel
  * (round 18) against the declarative argmin it replaced — the
  * `array_min(array(struct(−2·qdot + ‖c‖², cell), …)).cell` form is
  * re-created HERE, verbatim from rounds 12-17, over random float
  * vectors (both signs, sub-1e-4 magnitudes that quantize to 0 and
  * -1) and already-quantized long vectors, including duplicate
  * centroids (tie → lowest cell) and duplicate points ON a
  * centroid. */
class IvfCellSpec extends SparkSpec {
  import spark.implicits._

  private def oldCellOfQuantized(model: Embeddings.IvfModel,
                                 qv: Column): Column = {
    val structs = model.centroids.toIndexedSeq.zipWithIndex.map {
      case (c, j) =>
        val n2 = c.map(v => v * v).sum
        struct(
          (lit(-2L) * graft.functions.QDot.qdot(qv,
            typedlit(c.toIndexedSeq)) + lit(n2)).as("d"),
          lit(j).as("cell"))
    }
    array_min(array(structs: _*)).getField("cell")
  }

  private def quantizeCol(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 10000).cast("long"))

  private val rng = new scala.util.Random(181818)
  private def randVec(dim: Int): Seq[Float] =
    Seq.fill(dim)((rng.nextDouble() * 2 - 1).toFloat match {
      case f if rng.nextInt(10) == 0 => f / 100000.0f // quantizes to 0/-1
      case f => f
    })

  private val dim = 24
  private val vecs = (1 to 300).map(i => (i.toLong, randVec(dim)))

  private def model: Embeddings.IvfModel = {
    val cents = (1 to 7).map(_ =>
      randVec(dim).map(f => math.floor(f.toDouble * 10000).toLong).toArray)
    // duplicate centroid: ties must break to the LOWEST cell
    Embeddings.IvfModel((cents :+ cents(2).clone()).toArray)
  }

  test("IvfCell(float) == verbatim declarative argmin over quantize()") {
    val m = model
    val df = vecs.toDF("id", "v")
    // a point exactly on the duplicated centroid forces the tie
    val onCentroid = Seq((9999L,
      m.centroids(2).map(q => (q.toDouble / 10000.0).toFloat).toSeq))
      .toDF("id", "v")
    val all = df.union(onCentroid)
    val bad = all.select(col("id"),
        graft.functions.IvfCell.cellCol(col("v"), m.centroids).as("a"),
        oldCellOfQuantized(m, quantizeCol(col("v"))).as("e"))
      .filter(not(col("a") <=> col("e"))).collect()
    assert(bad.isEmpty, s"float path mismatch: ${bad.take(5).mkString(";")}")
  }

  test("IvfCell(long) == verbatim declarative argmin on quantized input") {
    val m = model
    val df = vecs.toDF("id", "v")
      .select(col("id"), quantizeCol(col("v")).as("qv"))
    val bad = df.select(col("id"),
        graft.functions.IvfCell.cellCol(col("qv"), m.centroids).as("a"),
        oldCellOfQuantized(m, col("qv")).as("e"))
      .filter(not(col("a") <=> col("e"))).collect()
    assert(bad.isEmpty, s"long path mismatch: ${bad.take(5).mkString(";")}")
  }

  // ---- PqCodes: the verbatim pre-round-18 PQ encode composition ----

  private def oldPqCodes(model: Embeddings.PqModel, qv: Column): Column =
    array(model.codebooks.toIndexedSeq.zipWithIndex.map { case (b, j) =>
      val sub = slice(qv, lit(j * model.subDim + 1), lit(model.subDim))
      array_min(array(b.toIndexedSeq.zipWithIndex.map { case (c, k) =>
        struct(
          (lit(-2L) * graft.functions.QDot.qdot(sub,
            typedlit(c.toIndexedSeq)) +
            lit(c.map(x => x * x).sum)).as("d"),
          lit(k).as("code"))
      }: _*)).getField("code")
    }: _*)

  private def pqModel: Embeddings.PqModel = {
    val subDim = 6
    val m = dim / subDim // 24 / 6 = 4 subspaces
    val books = Array.tabulate(m) { _ =>
      val cents = (1 to 5).map(_ =>
        randVec(subDim).map(f => math.floor(f.toDouble * 10000).toLong)
          .toArray).toArray
      cents(3) = cents(1).clone() // duplicate centroid: tie -> lowest code
      cents
    }
    Embeddings.PqModel(subDim, books)
  }

  test("PqCodes(float) == verbatim declarative per-subspace argmin") {
    val m = pqModel
    val df = vecs.toDF("id", "v")
    val bad = df.select(col("id"),
        graft.functions.PqCodes.codesCol(col("v"), m.subDim, m.codebooks)
          .as("a"),
        oldPqCodes(m, quantizeCol(col("v"))).as("e"))
      .filter(not(col("a") <=> col("e"))).collect()
    assert(bad.isEmpty, s"pq float mismatch: ${bad.take(5).mkString(";")}")
  }

  test("PqCodes(long) == verbatim declarative argmin, incl. short vectors") {
    val m = pqModel
    // short vectors exercise the slice-past-end + qdot-min-length path
    val short = Seq((9000L, Seq(1234L, -5L)), (9001L, Seq.empty[Long]))
      .toDF("id", "qv")
    val df = vecs.toDF("id", "v")
      .select(col("id"), quantizeCol(col("v")).as("qv"))
      .union(short)
    val bad = df.select(col("id"),
        graft.functions.PqCodes.codesCol(col("qv"), m.subDim, m.codebooks)
          .as("a"),
        oldPqCodes(m, col("qv")).as("e"))
      .filter(not(col("a") <=> col("e"))).collect()
    assert(bad.isEmpty, s"pq long mismatch: ${bad.take(5).mkString(";")}")
  }

  test("null vector -> null cell; kernel runs inside codegen") {
    val m = model
    val withNull = Seq((1L, Some(randVec(dim))), (2L, None)).toDF("id", "v")
    val r = withNull.repartition(2)
      .select(col("id"),
        graft.functions.IvfCell.cellCol(col("v"), m.centroids).as("c"))
      .orderBy("id").collect()
    assert(!r(0).isNullAt(1) && r(1).isNullAt(1))
    val df = withNull.repartition(2)
      .select(graft.functions.IvfCell.cellCol(col("v"), m.centroids))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
