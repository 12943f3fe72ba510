package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference PageRank with the EXACT integer steps of the operator
    * (micro-units, truncating division) — the same arithmetic the
    * DuckDB oracle unrolls. */
  private def ref(edges: Seq[(Long, Long)], iters: Int,
                  seeds: Option[Set[Long]]): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val od = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(n => n -> (seeds match {
      case None => 1000000L
      case Some(ss) => if (ss(n)) 1000000L else 0L
    })).toMap
    for (_ <- 1 to iters) {
      val cs = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s0, d0) => cs(d0) += r(s0) / od(s0) }
      r = nodes.map(nd => nd -> (seeds match {
        case None => 150000L + 85L * cs(nd) / 100L
        case Some(ss) =>
          (if (ss(nd)) 150000L else 0L) + 85L * cs(nd) / 100L
      })).toMap
    }
    r
  }

  test("pageRankU6: hub-and-spoke — the hub out-ranks every spoke, " +
    "values match the integer reference exactly (across the lineage " +
    "cut at iteration 4)") {
    // 5 spokes all link to the hub; hub links back to spoke 0. The
    // hub<->spoke-1 2-cycle oscillates early (spoke 1 receives the
    // hub's ENTIRE rank each step), so the ordering assertion needs
    // enough iterations for the 0.7225-per-double-step decay to
    // settle — 21 also crosses several lineage cuts
    val edges = (1L to 5L).map(s => (s, 0L)) :+ (0L, 1L)
    val out = Graph.pageRankU6(edges.toDF("src", "dst"), "src", "dst",
        iters = 21)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == ref(edges, 21, None))
    assert((1L to 5L).forall(s => out(0L) > out(s)),
      s"hub must out-rank spokes: $out")
    // spoke 1 gets the hub's mass back — out-ranks the other spokes
    assert((2L to 5L).forall(s => out(1L) > out(s)), out.toString)
  }

  test("pageRankU6: a sink node leaks mass but still accumulates " +
    "rank from its in-links; multi-edges count per occurrence") {
    // 0 -> 1 twice, 0 -> 2 once; 1 and 2 are sinks
    val edges = Seq((0L, 1L), (0L, 1L), (0L, 2L))
    val out = Graph.pageRankU6(edges.toDF("src", "dst"), "src", "dst",
        iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == ref(edges, 4, None))
    assert(out(1L) > out(2L), s"double edge must rank higher: $out")
    assert(out(0L) == 150000L, s"no in-links -> teleport mass only: $out")
  }

  test("personalizedPageRankU6: teleport mass lands only on seeds; " +
    "nodes unreachable from the seed set rank zero") {
    // two disjoint chains: 0->1->2 and 10->11->12; seed = {0}
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 12L))
    val out = Graph.personalizedPageRankU6(edges.toDF("src", "dst"),
        "src", "dst", Seq(0L).toDF("id"), "id", iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == ref(edges, 8, Some(Set(0L))))
    assert(out(0L) > 0L && out(1L) > 0L && out(2L) > 0L)
    assert(out(10L) == 0L && out(11L) == 0L && out(12L) == 0L,
      s"unreachable component must rank zero: $out")
  }

  /** Reference k-core: symmetrize to a simple graph, peel `rounds`
    * times, report core members with in-core degree — the exact steps
    * of the operator and its oracle. */
  private def refKCore(edges: Seq[(Long, Long)], k: Int,
                       rounds: Int): Map[Long, Long] = {
    var und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    for (_ <- 1 to rounds) {
      val deg = und.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, v) => n -> v.size }
      val keep = deg.filter(_._2 >= k).keySet
      und = und.filter(e => keep(e._1) && keep(e._2))
    }
    val deg = und.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, v) => n -> v.size.toLong }
    deg.filter(_._2 >= k)
  }

  test("kCore: a planted clique survives, a dependent tail chain " +
    "peels over MULTIPLE rounds, a triangle vanishes at k=3... and " +
    "values match the peel reference exactly") {
    // 5-clique (degree 4 inside) + a chain 100-101-102 hanging off
    // node 0 (each link peels only after the previous round removed
    // its support) + an isolated triangle 200-201-202 (degree 2 < 3)
    val clique = for {
      i <- 0L to 4L; j <- 0L to 4L if i < j
    } yield (i, j)
    val chain = Seq((0L, 100L), (100L, 101L), (101L, 102L))
    val tri = Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val edges = clique ++ chain ++ tri
    val out = Graph.kCore(edges.toDF("src", "dst"), "src", "dst",
        k = 3, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == refKCore(edges, 3, 5))
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L), out.toString)
    assert(out.values.forall(_ >= 3L))
    // under-peeling is visible: 1 round is NOT enough to remove the
    // whole chain (102 goes first; 101 only after), and the reference
    // agrees round for round
    val r1 = Graph.kCore(edges.toDF("src", "dst"), "src", "dst",
        k = 3, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == refKCore(edges, 3, 1))
  }

  test("kCore: multi-edges and self-loops collapse before peeling " +
    "(simple-graph semantics); empty core at an unreachable k") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (1L, 3L))
    val out = Graph.kCore(edges.toDF("src", "dst"), "src", "dst",
        k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L)) // the triangle
    assert(Graph.kCore(edges.toDF("src", "dst"), "src", "dst",
      k = 5, rounds = 3).count() == 0L)
  }

  test("kCoreExact: converges on a dependent-removal chain DEEPER " +
    "than any fixed round count the oracle form would use — fixed " +
    "rounds=5 under-peels it, the fixpoint matches the converged " +
    "reference") {
    // 4-clique (the true 3-core) + a 30-link chain hanging off node 0:
    // each chain link's removal unblocks the next, so full peeling
    // needs ~30 rounds — far past the fixed-round oracle setting
    val clique = for {
      i <- 0L to 3L; j <- 0L to 3L if i < j
    } yield (i, j)
    val chain = (0 until 30).map(i =>
      (if (i == 0) 0L else 100L + i - 1, 100L + i))
    val edges = clique ++ chain
    val exact = Graph.kCoreExact(edges.toDF("src", "dst"), "src", "dst",
        k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // converged reference: iterate the same peel until stable
    val converged = refKCore(edges, 2, 1000)
    assert(exact == converged)
    assert(exact.keySet == Set(0L, 1L, 2L, 3L), exact.toString)
    // and the fixed-round form genuinely under-peels the same input
    val fixed = Graph.kCore(edges.toDF("src", "dst"), "src", "dst",
        k = 2, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed == refKCore(edges, 2, 5))
    assert(fixed.keySet.size > exact.keySet.size, fixed.toString)
    // maxRounds bound is honored (returns the partial peel, no hang)
    val bounded = Graph.kCoreExact(edges.toDF("src", "dst"), "src",
        "dst", k = 2, maxRounds = 3)
      .collect().map(r => r.getLong(0)).toSet
    assert(bounded == refKCore(edges, 2, 3).keySet)
  }

  test("kCoreExact: agrees with kCore when the fixed rounds already " +
    "reach the fixpoint; empty graph and unreachable k return empty") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val exact = Graph.kCoreExact(edges.toDF("src", "dst"), "src", "dst",
        k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = Graph.kCore(edges.toDF("src", "dst"), "src", "dst",
        k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact == fixed && exact.keySet == Set(1L, 2L, 3L))
    assert(Graph.kCoreExact(edges.toDF("src", "dst"), "src", "dst",
      k = 5).count() == 0L)
    assert(Graph.kCoreExact(Seq.empty[(Long, Long)].toDF("src", "dst"),
      "src", "dst", k = 2).count() == 0L)
  }

  test("pageRankU6 plan shape: per-iteration contribution is a hash " +
    "join + partial-aggregable sum, no nested loop") {
    val edges = (0L until 200L)
      .flatMap(i => Seq((i, (i * 7 + 1) % 200), (i, (i * 13 + 5) % 200)))
    val plan = Graph.pageRankU6(edges.toDF("src", "dst"), "src", "dst",
      iters = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("pre-partitioned edge layout: pageRankU6FromLayout reads the " +
    "edge side EXCHANGE-FREE across iterations (bucket scan satisfies " +
    "the join), and ranks are bit-identical to the unbucketed form") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val edges = (0L until 500L)
      .flatMap(i => Seq((i, (i * 7 + 1) % 500), (i, (i * 13 + 5) % 500)))
    Graph.writeEdgeLayout(edges.toDF("src", "dst"), "src", "dst",
      "pr_edges_bucketed", nBuckets = 8)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force SMJ + a static plan so the exchange-free claim is about
      // the bucketed layout, not about broadcast or AQE re-planning
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val q = Graph.pageRankU6FromLayout(spark, "pr_edges_bucketed",
        iters = 3)
      val plan = q.queryExecution.executedPlan
      // property: no shuffle ever re-partitions raw edge rows — every
      // exchange over a subtree containing the bucketed scan sits
      // above the partial contribution AGGREGATE (node-scale rows)
      def reachesScanWithoutAgg(p: SparkPlan): Boolean = p match {
        case _: FileSourceScanExec => true
        case a if a.nodeName.contains("Aggregate") => false
        case other => other.children.exists(reachesScanWithoutAgg)
      }
      val badExchanges = plan.collect {
        case ex: ShuffleExchangeExec if reachesScanWithoutAgg(ex.child) => ex
      }
      assert(badExchanges.isEmpty,
        s"edge-scale shuffle found:\n${badExchanges.mkString("\n")}")
      // the bucketed scan really is engaged (not a plain file read)
      val bucketedScans = plan.collect {
        case f: FileSourceScanExec if f.bucketedScan => f
      }
      assert(bucketedScans.nonEmpty, s"no bucketed scan in:\n$plan")
      // bit-identical ranks vs the unbucketed operator
      val fromLayout = q.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val plain = Graph.pageRankU6(edges.toDF("src", "dst"), "src",
          "dst", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fromLayout == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
      spark.sql("DROP TABLE IF EXISTS pr_edges_bucketed")
    }
  }
}
