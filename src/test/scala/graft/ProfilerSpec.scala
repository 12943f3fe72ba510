package graft

import org.apache.spark.sql.functions._
import graft.ops.Profiler

/** The approx (default, single-scan HLL) profile vs the exact
  * (per-column-job) profile: identical schema, identical exact stats,
  * distincts within HLL tolerance. */
class ProfilerSpec extends SparkSpec {

  private lazy val events =
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("approx summary matches exact summary on everything but n_distinct") {
    val exact = Profiler.summary(events, exact = true)
      .orderBy("col_name").collect()
    val approx = Profiler.summary(events).orderBy("col_name").collect()
    assert(exact.map(_.getString(0)).toSeq ==
      approx.map(_.getString(0)).toSeq)
    // schema parity (names and types)
    assert(Profiler.summary(events).schema ==
      Profiler.summary(events, exact = true).schema)
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getLong(1) == a.getLong(1), s"n_rows ${e.getString(0)}")
      assert(e.getLong(2) == a.getLong(2), s"n_nonnull ${e.getString(0)}")
      // min/max/strs exact-equal
      (4 to 7).foreach { i =>
        assert(e.get(i) == a.get(i), s"col ${e.getString(0)} slot $i")
      }
      // HLL within 3x rsd of the exact distinct
      val ed = e.getLong(3).toDouble
      val ad = a.getLong(3).toDouble
      assert(math.abs(ad - ed) <= math.max(ed * 0.15, 2.0),
        s"n_distinct ${e.getString(0)}: exact=$ed approx=$ad")
    }
  }

  test("approx summary plans a single aggregation (no per-column jobs)") {
    // one wide agg: the physical plan contains no Expand and no Union
    val plan = Profiler.summary(events).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx path must not Expand")
    assert(!plan.contains("Union"), "approx path must be one aggregation")
  }

  test("exact summary plans two passes: no Expand, no per-column union") {
    // the two-pass exact shape: a wide non-distinct agg plus ONE
    // unpivot distinct job — a single distinct aggregate never plans
    // an Expand (that's the multi-count_distinct penalty), and the
    // per-column union of the old form is gone
    val plan = Profiler.summary(events, exact = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "exact path must not Expand")
    assert(!plan.contains("Union"), "exact path must not union per-column jobs")
  }

  test("drift: planted null injection and range expansion surface per column; identical sides are flat") {
    import spark.implicits._
    val a = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(30.0)),
      (4L, Some(40.0))).toDF("id", "v")
    val b = Seq((5L, Some(15.0)), (6L, None), (7L, None),
      (8L, Some(99.0))).toDF("id", "v")
    val d = graft.ops.Profiler.drift(a, b).orderBy("col_name").collect()
      .map(r => r.getString(0) -> r).toMap
    val v = d("v")
    assert(v.getAs[Double]("null_rate_a") == 0.0)
    assert(v.getAs[Double]("null_rate_b") == 0.5)
    assert(v.getAs[Double]("null_rate_shift") == 0.5)
    assert(v.getAs[Double]("max_num_b") == 99.0 &&
      v.getAs[Double]("max_num_a") == 40.0)
    // identical snapshots → zero shift everywhere
    val flat = graft.ops.Profiler.drift(a, a).collect()
    assert(flat.forall(_.getAs[Double]("null_rate_shift") == 0.0))
  }

  test("mergeable partials: exact stats survive any fold order, " +
    "estimates stay in-tolerance of the exact summary") {
    // three disjoint slices (plus an EMPTY one — a processing-time
    // trigger delivers empty batches) folded in two different orders
    val slices = Seq(
      events.filter(pmod(col("event_id"), lit(3)) === 0),
      events.filter(pmod(col("event_id"), lit(3)) === 1),
      events.filter(pmod(col("event_id"), lit(3)) === 2),
      events.limit(0))
    val parts = slices.map(Profiler.profilePartials)
    val leftFold = parts.reduceLeft(Profiler.mergeProfilePartials)
    val rightFold = parts.reduceRight(Profiler.mergeProfilePartials)
    // EVERY fold shape (left, right, single-shot) must agree exactly
    // on the exact stats; the sketch ESTIMATE may wobble with fold
    // structure (the union gadget's internal mode transitions and the
    // single-pass HIP estimator are not fold-invariant) but each
    // estimate independently carries the sketch's error bound — pin
    // all of them against the exact distincts.
    val exact = Profiler.summary(events, exact = true)
      .orderBy("col_name").collect()
    Seq("leftFold" -> leftFold, "rightFold" -> rightFold,
        "single" -> Profiler.profilePartials(events)).foreach {
      case (tag, partial) =>
        val merged = Profiler.profileFromPartials(partial)
          .orderBy("col_name").collect()
        exact.zip(merged).foreach { case (e, m) =>
          assert(e.getString(0) == m.getString(0))
          assert(e.getLong(1) == m.getLong(1),
            s"$tag n_rows ${e.getString(0)}")
          assert(e.getLong(2) == m.getLong(2),
            s"$tag n_nonnull ${e.getString(0)}")
          (4 to 7).foreach { i =>
            assert(e.get(i) == m.get(i),
              s"$tag col ${e.getString(0)} slot $i")
          }
          val ed = e.getLong(3).toDouble; val md = m.getLong(3).toDouble
          assert(math.abs(md - ed) <= math.max(ed * 0.15, 2.0),
            s"$tag n_distinct ${e.getString(0)}: exact=$ed sketch=$md")
        }
    }
  }

  test("driftFromProfiles over materialized profiles equals drift over " +
    "the frames") {
    val a = events.filter(pmod(col("event_id"), lit(2)) === 0)
    val b = events.filter(pmod(col("event_id"), lit(2)) === 1)
    val direct = Profiler.drift(a, b, exact = true)
      .orderBy("col_name").collect().map(_.toSeq).toSeq
    val composed = Profiler.driftFromProfiles(
        Profiler.summary(a, exact = true), Profiler.summary(b, exact = true))
      .orderBy("col_name").collect().map(_.toSeq).toSeq
    assert(direct == composed)
  }

  test("histogram: counts reconcile to n, bins are contiguous and" +
    " near-equal-height on a spread column; nulls excluded") {
    import spark.implicits._
    // 0..99 plus nulls: deciles land between 2dp values
    val df = ((0 until 100).map(i => Option(i / 1.0)) ++
      Seq(None, None)).toDF("v")
    val out = Profiler.histogram(df, "v", nBins = 10)
      .collect().map(r =>
        (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._4).sum == 100) // nulls never counted
    assert(out.length == 10)
    assert(out.forall(b => b._4 == 10)) // uniform data → exact equi-height
    // contiguous: each bin's hi is the next bin's lo
    out.sliding(2).foreach { case Array(a, b) => assert(a._3 == b._2) }
    assert(out.head._2 == 0.0 && out.last._3 == 99.0)
  }

  test("histogram: heavy skew — the hot value collapses edges; counts" +
    " still reconcile and bins stay ordered") {
    import spark.implicits._
    val df = (Seq.fill(95)(1.0) ++ Seq(2.0, 3.0, 4.0, 5.0, 100.0)).toDF("v")
    val out = Profiler.histogram(df, "v", nBins = 10)
      .collect().map(r =>
        (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._4).sum == 100)
    assert(out.map(_._1).toSeq == out.map(_._1).sorted.toSeq)
    // the 95%-hot value occupies the collapsed lower bins; the tail
    // values spread into the surviving upper bins
    assert(out.head._4 >= 95)
  }
}
