package graft

import graft.ops.{Percentiles, Synthetic, TextDedup, TimeBuckets, Totals, WindowStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** ScalaCheck properties from SURVEY §5: invariants that must hold for
  * ANY input, not just fixtures. Generators are kept small (Spark jobs
  * per case) with a reduced case count. */
class PropertiesSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Drive a ScalaCheck generator over fixed seeds (deterministic runs;
    * scalatestplus bridge is not in the offline cache). */
  private def forAll[A](g: Gen[A], cases: Int = 5)(body: A => Unit): Unit =
    (1 to cases).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val rowGen = Gen.listOfN(60, for {
    off <- Gen.choose(0L, 6L * 86400L)
    v <- Gen.choose(0, 500)
    k <- Gen.choose(1L, 4L)
  } yield (k, new Timestamp(1706745600000L + off * 1000L), v.toDouble))

  test("property: augmentRescale reproduces reference int-truncation arithmetic for any counts") {
    val gen = Gen.listOfN(40, for {
      total <- Gen.choose(0L, 300L)
      cars <- Gen.choose(0L, 200L)
      motos <- Gen.choose(0L, 200L)
      multC <- Gen.choose(0, 300)
    } yield (total, cars, motos, multC / 100.0))
    forAll(gen, cases = 3) { rows =>
      val df = rows.zipWithIndex
        .map { case ((t, c, m, mu), i) => (i.toLong, t, c, m, mu) }
        .toDF("id", "total", "cars", "motos", "mult")
      val out = Synthetic.augmentRescale(df, col("mult"), "total",
        Seq("cars", "motos")).orderBy("id").collect()
      rows.zip(out).foreach { case ((t, c, m, mu), r) =>
        val st = (t * mu).toLong // double product, truncated toward zero
        assert(r.getAs[Long]("scaled_total") == st)
        val tc = (c + m).toDouble
        val (ec, em) =
          if (tc > 0) (((st * c.toDouble) / tc).toLong,
            ((st * m.toDouble) / tc).toLong)
          else (c, m)
        assert(r.getAs[Long]("scaled_cars") == ec)
        assert(r.getAs[Long]("scaled_motos") == em)
        // truncation loss only ever shrinks: classes never exceed total
        if (tc > 0) assert(ec + em <= st)
      }
    }
  }

  test("property: nearDupClusters equals driver-side union-find on random graphs") {
    val gen = for {
      n <- Gen.choose(5, 18)
      m <- Gen.choose(0, 25)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(1, n); b <- Gen.choose(1, n)
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield (n, edges.filter(e => e._1 != e._2).distinct)
    forAll(gen, cases = 3) { case (n, edges) =>
      // reference: plain union-find with min-root labels
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (1 to n).map(i => i.toLong -> find(i).toLong).toMap
      val ids = (1L to n.toLong).toDF("doc_id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("a_id", "b_id")
        else edges.toDF("a_id", "b_id")
      // exact-convergence mode (rounds = 0): must handle cycles and
      // arbitrary diameters
      val got = graft.ops.TextDedup.nearDupClusters(ids, pairs, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"n=$n edges=$edges")
    }
  }

  test("property: bucket sums partition the total flux") {
    forAll(rowGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("user_id", "ts", "value")
        val total = df.agg(sum(col("value").cast("decimal(28,2)")))
          .collect().head.getDecimal(0)
        val bucketed = TimeBuckets.history(df, "ts", "value", 3600, "HH:mm")
          .agg(sum(col("total_value").cast("decimal(28,2)")))
          .collect().head.getDecimal(0)
        assert(bucketed.compareTo(total) == 0)
      }
    }
  }

  test("property: window stats are monotone in window size") {
    forAll(rowGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("user_id", "ts", "value")
        val r = WindowStats.multiWindow(df, "ts", "value",
          Seq("s" -> 3600L, "m" -> 86400L, "l" -> 7L * 86400L))
          .collect().head
        assert(r.getAs[Double]("total_s") <= r.getAs[Double]("total_m"))
        assert(r.getAs[Double]("total_m") <= r.getAs[Double]("total_l"))
        assert(r.getAs[Long]("n_s") <= r.getAs[Long]("n_m"))
      }
    }
  }

  test("property: exact dedup keep-set is a subset of ids and covers all content") {
    forAll(Gen.listOfN(30, for {
      id <- Gen.choose(1L, 1000L)
      t <- Gen.oneOf("aa bb", "cc dd", "ee ff", "gg hh")
    } yield (id, t))) { rows =>
      whenever(rows.nonEmpty) {
        val distinctRows = rows.distinctBy(_._1)
        val df = distinctRows.toDF("doc_id", "text")
        val out = TextDedup.exactDedup(df, "doc_id", "text").collect()
        val ids = distinctRows.map(_._1).toSet
        assert(out.forall(r => ids.contains(r.getAs[Long]("keep_id"))))
        assert(out.map(_.getAs[Long]("n_copies")).sum == distinctRows.size)
        assert(out.length == distinctRows.map(_._2).distinct.size)
      }
    }
  }

  test("property: percentile thresholds are ordered and bounded by max") {
    forAll(rowGen) { rows =>
      whenever(rows.map(r => (r._1, r._2.getTime / 3600000L)).distinct.size >= 2) {
        val df = rows.toDF("user_id", "ts", "value")
        Percentiles.thresholds(df, "user_id", "ts", "value").collect()
          .foreach { r =>
            assert(r.getAs[Double]("p50") <= r.getAs[Double]("p75") + 1e-9)
            assert(r.getAs[Double]("p75") <= r.getAs[Double]("p90") + 1e-9)
            assert(r.getAs[Double]("p90") <= r.getAs[Double]("max_volume") + 1e-9)
          }
      }
    }
  }

  test("property: per-key totals roll up to the global total") {
    forAll(rowGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("user_id", "ts", "value")
        val global = Totals.global(df, "value")
          .collect().head.getAs[Double]("total_value")
        val byKey = Totals.byKey(df, "user_id", "value")
          .agg(sum(col("total_value").cast("decimal(28,2)")).cast("double"))
          .collect().head.getDouble(0)
        assert(math.abs(global - byKey) < 1e-6)
      }
    }
  }

  // random 2-decimal doubles, mixed sign, with a null sprinkled in
  private val moneyGen = Gen.listOfN(80, for {
    k <- Gen.choose(1L, 3L)
    cents <- Gen.choose(-5000000L, 5000000L)
    isNull <- Gen.frequency(9 -> Gen.const(false), 1 -> Gen.const(true))
  } yield (k, if (isNull) None else Some(cents.toDouble / 100.0)))

  test("property: Exact split-word sum is bit-identical to the decimal(28,2) sum") {
    forAll(moneyGen) { rows =>
      val df = rows.toDF("k", "v")
      val both = df.groupBy("k").agg(
        graft.util.Exact.dsum2(col("v")).as("fast"),
        sum(col("v").cast("decimal(28,2)")).cast("double").as("ref"))
      both.collect().foreach { r =>
        val fast = Option(r.get(1)).map(_.asInstanceOf[Double])
        val ref = Option(r.get(2)).map(_.asInstanceOf[Double])
        assert(fast == ref, s"key ${r.get(0)}: $fast != $ref")
      }
    }
  }

  private val prodGen = Gen.listOfN(40, for {
    k <- Gen.choose(0, 3)
    x <- Gen.oneOf(Gen.choose(-1000000000000L, 1000000000000L),
      Gen.choose(-50L, 50L))
    y <- Gen.oneOf(Gen.choose(-1000000000000L, 1000000000000L),
      Gen.choose(-50L, 50L))
  } yield (k, x, y))

  test("property: Exact split-word PRODUCT sum is bit-identical to the" +
    " per-row decimal form, negatives and 1e12 magnitudes included") {
    forAll(prodGen) { rows =>
      val df = rows.toDF("k", "x", "y")
      val both = df.groupBy("k").agg(
        graft.util.Exact.lprodSum(col("x"), col("y")).as("fast"),
        sum(col("x").cast("decimal(19,0)") * col("y"))
          .cast("decimal(38,0)").as("ref"))
      both.collect().foreach { r =>
        assert(r.getDecimal(1) == r.getDecimal(2),
          s"key ${r.get(0)}: ${r.getDecimal(1)} != ${r.getDecimal(2)}")
      }
    }
  }

  private val docGen = Gen.listOfN(14, for {
    id <- Gen.choose(1L, 1000000L)
    words <- Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta"))
  } yield (id, words.mkString(" ")))

  test("property: prefix-filtered jaccardPairs equals the naive all-pairs result") {
    forAll(docGen, cases = 3) { docsRaw =>
      val docs = docsRaw.distinctBy(_._1)
      whenever(docs.size >= 2) {
        val df = docs.toDF("doc_id", "text")
        val got = TextDedup.jaccardPairs(df, "doc_id", "text", 3, 0.5)
          .select("a_id", "b_id", "jaccard").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        // naive: driver-side exact jaccard over 3-shingle sets
        def sh(t: String): Set[String] =
          t.split(" ").sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
        val naive = (for {
          a <- docs; b <- docs if a._1 < b._1
          sa = sh(a._2); sb = sh(b._2)
          if sa.nonEmpty && sb.nonEmpty
          inter = (sa intersect sb).size
          j = inter.toDouble / (sa.size + sb.size - inter).toDouble
          if j >= 0.5
        } yield (a._1, b._1, j)).toSet
        assert(got == naive, s"got $got\nexpected $naive")
      }
    }
  }

  test("property: unigramScore equals driver-side corpus arithmetic") {
    forAll(docGen, cases = 3) { docsRaw =>
      val docs = docsRaw.distinctBy(_._1)
      whenever(docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
        val got = graft.ops.TextStats.unigramScore(df, "doc_id", "text")
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
        val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
        val cnt = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
        val total = cnt.values.sum
        toks.foreach { case (id, ws) =>
          val (n, p) = got(id)
          assert(n == ws.size.toLong)
          val sumCnt = ws.map(cnt).sum
          // same IEEE arithmetic as the operator: one exact division
          assert(p == sumCnt.toDouble / (ws.size.toLong * total).toDouble)
        }
        assert(got.keySet == toks.map(_._1).toSet)
      }
    }
  }

  test("property: tfidfTopK equals driver-side ranking for any corpus") {
    forAll(docGen, cases = 3) { docsRaw =>
      val docs = docsRaw.distinctBy(_._1)
      whenever(docs.nonEmpty) {
        val k = 3
        val df = docs.toDF("doc_id", "text")
        val got = graft.ops.TextStats.tfidfTopK(df, "doc_id", "text", k)
          .collect()
          .map(r => (r.getLong(0), r.getInt(5)) ->
            (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
          .toMap
        val tf = docs.flatMap { case (id, t) =>
          t.split(" ").groupBy(identity).map { case (w, a) => (id, w, a.length.toLong) }
        }
        val dfreq = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val expect = tf.groupBy(_._1).flatMap { case (id, terms) =>
          terms.map { case (_, w, f) =>
            (w, f, dfreq(w), f.toDouble / dfreq(w).toDouble)
          }.sortBy { case (w, _, _, s) => (-s, w) }
            .take(k).zipWithIndex
            .map { case (row, i) => (id, i + 1) -> row }
        }
        assert(got == expect, s"got $got\nexpected $expect")
      }
    }
  }

  test("property: grid range join equals nested-loop range join on random points") {
    val ptsGen = Gen.listOfN(30, for {
      id <- Gen.choose(1L, 100000L)
      lat <- Gen.choose(-7000L, 7000L)
      lng <- Gen.choose(-7000L, 7000L)
    } yield (id, lat.toDouble / 100.0, lng.toDouble / 100.0))
    forAll(ptsGen, cases = 3) { ptsRaw =>
      val pts = ptsRaw.distinctBy(_._1)
      whenever(pts.size >= 2) {
        val zones = pts.take(pts.size / 2).toDF("zone_id", "z_lat", "z_lng")
        val points = pts.drop(pts.size / 2).toDF("point_id", "p_lat", "p_lng")
        val radius = 150000.0
        val bnl = graft.ops.Joins.withinRange(zones, "z_lat", "z_lng",
            points, "p_lat", "p_lng", radius)
          .select("zone_id", "point_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val grid = graft.ops.Joins.withinRangeGrid(zones, "z_lat", "z_lng",
            points, "p_lat", "p_lng", radius)
          .select("zone_id", "point_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(grid == bnl)
      }
    }
  }

  private val shortDocGen = Gen.listOfN(12, for {
    id <- Gen.choose(1L, 1000L)
    words <- Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
  } yield (id, words.mkString(" ")))

  test("property: stride==size chunking tiles every token back, any doc") {
    forAll(shortDocGen, cases = 3) { docsRaw =>
      val docs = docsRaw.distinctBy(_._1)
      whenever(docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
        val chunks = graft.ops.TextStats
          .chunkDocuments(df, "doc_id", "text", 4, 4)
          .orderBy("doc_id", "chunk_idx").collect()
        val rejoined = chunks.groupBy(_.getLong(0)).view
          .mapValues(_.sortBy(_.getLong(1)).map(_.getString(4)).mkString(" "))
          .toMap
        docs.foreach { case (id, text) =>
          val toks = text.split("\\s+").filter(_.nonEmpty).mkString(" ")
          assert(rejoined.getOrElse(id, "") == toks)
        }
        // every chunk's token count is consistent with its text
        chunks.foreach { r =>
          val n = r.getString(4).split(" ").count(_.nonEmpty)
          assert(r.getLong(3) == n && n <= 4)
          // start_token == chunk_idx * stride under this tiling
          assert(r.getLong(2) == r.getLong(1) * 4)
        }
      }
    }
  }

  test("property: dupSpanStats bounds and symmetry of shared shingles") {
    forAll(shortDocGen, cases = 3) { docsRaw =>
      val docs = docsRaw.distinctBy(_._1)
      whenever(docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
        val st = graft.ops.TextDedup.dupSpanStats(df, "doc_id", "text", 2)
          .collect()
        st.foreach { r =>
          assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1))
          assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
        }
        // exact duplicate texts must read fully duplicated (frac 1.0)
        val byText = docs.groupBy(_._2).filter { case (t, g) =>
          g.size >= 2 && t.split("\\s+").count(_.nonEmpty) >= 2 }
        val frac = st.map(r => r.getLong(0) -> r.getDouble(3)).toMap
        byText.values.flatten.foreach { case (id, _) =>
          assert(frac(id) == 1.0)
        }
      }
    }
  }

  test("autoQ invariants: always in [2,8] for ANY corpus; rarity floor " +
    "grows with corpus size on a fixed alphabet; losslessness never " +
    "depends on the derived value") {
    val strGen = Gen.listOfN(40, for {
      len <- Gen.choose(0, 24)
      cs <- Gen.listOfN(len, Gen.oneOf("abcdef0123456789".toSeq))
    } yield cs.mkString)
    forAll(strGen, cases = 4) { strs =>
      val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s")
      val q = graft.ops.FuzzyJoin.autoQ(df, "s", 2)
      assert(q >= 2 && q <= 8, s"autoQ out of range: $q")
    }
    // fixed hex alphabet: 100× the rows cannot DECREASE the derived q
    def hexCorpus(n: Int) = (0 until n).map { i =>
      (i.toLong, java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString)
    }.toDF("id", "s")
    val qSmall = graft.ops.FuzzyJoin.autoQ(hexCorpus(200), "s", 2)
    val qBig = graft.ops.FuzzyJoin.autoQ(hexCorpus(5000), "s", 2)
    assert(qBig >= qSmall, s"rarity floor shrank: $qSmall -> $qBig")
    assert(qSmall >= 2 && qBig <= 8)
  }
}
