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

  test("pageRankU6 plan shape: per-iteration contribution is a hash " +
    "join + partial-aggregable sum, no nested loop") {
    val edges = (0L until 200L)
      .flatMap(i => Seq((i, (i * 7 + 1) % 200), (i, (i * 13 + 5) % 200)))
    val plan = Graph.pageRankU6(edges.toDF("src", "dst"), "src", "dst",
      iters = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
