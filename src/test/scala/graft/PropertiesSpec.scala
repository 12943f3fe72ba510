package graft

import graft.ops.{Percentiles, TextDedup, TimeBuckets, Totals, WindowStats}
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
}
