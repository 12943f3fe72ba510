package graft

import graft.ops.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def li = Seq(
    // orderkey, suppkey, price, discount, returnflag, shipdate
    (1L, 1L, 1000.00, 0.10, "N", ts("1998-02-01")),
    (1L, 2L, 500.00, 0.00, "R", ts("1998-02-03")),
    (2L, 1L, 800.00, 0.25, "N", ts("1997-12-01")), // ships BEFORE cutoff
    (3L, 2L, 400.00, 0.50, "R", ts("1998-03-01")))
    .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
      "l_returnflag", "l_shipdate")

  private def ord = Seq(
    (1L, 10L, ts("1997-06-01"), "1-URGENT"),
    (2L, 10L, ts("1997-07-01"), "2-HIGH"),
    (3L, 11L, ts("1998-06-01"), "3-MEDIUM")) // placed AFTER cutoff
    .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")

  private def cust = Seq(
    (10L, "alice", 1L, "BUILDING"),
    (11L, "bob", 2L, "BUILDING"))
    .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")

  private def supp = Seq((1L, 1L), (2L, 2L))
    .toDF("s_suppkey", "s_nationkey")
  private def nat = Seq((1L, "JAPAN", 1L), (2L, "CHINA", 1L))
    .toDF("n_nationkey", "n_name", "n_regionkey")
  private def reg = Seq((1L, "ASIA")).toDF("r_regionkey", "r_name")

  test("shippingPriority: only pre-cutoff orders with post-cutoff" +
    " shipping survive; revenue exact; top-k ordered") {
    val out = Warehouse.shippingPriority(li, ord, cust,
      "BUILDING", "1998-01-01").collect()
    // order 1 qualifies with both its post-cutoff lines:
    // 1000·0.9 + 500·1.0 = 1400; order 2's line shipped early; order 3
    // was placed after the cutoff
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getDouble(1) == 1400.0)
    assert(out.head.getString(3) == "1-URGENT")
  }

  test("localSupplierVolume: revenue counted only when customer and" +
    " supplier share the nation, region-filtered") {
    // cust 10 is nation 1 → only supplier 1's lines are "local"
    val out = Warehouse.localSupplierVolume(li, ord, cust, supp, nat,
      reg, "ASIA", "1997-01-01", "1998-01-01").collect()
    // order 1 line (supp 1, 1000·0.9=900) + order 2 line (supp 1,
    // 800·0.75=600) are local; supp-2 lines cross nations and drop
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("JAPAN", 1500.0)))
  }

  test("returnedItems: only flag-R lines in the window; per-customer" +
    " rollup with nation") {
    val out = Warehouse.returnedItems(li, ord, cust, nat,
      "1997-01-01", "1998-01-01").collect()
    // order 1's R line (500) — order 3 is outside the window
    assert(out.map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
      .toSeq == Seq((10L, "JAPAN", 500.0)))
  }

  test("q5 plan: dimensions broadcast, no cartesian/BNL, top-k path") {
    val plan = Warehouse.localSupplierVolume(li, ord, cust, supp, nat,
      reg, "ASIA", "1997-01-01", "1998-01-01")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val q3 = Warehouse.shippingPriority(li, ord, cust,
      "BUILDING", "1998-01-01")
      .queryExecution.executedPlan.toString
    assert(q3.contains("TakeOrderedAndProject"), q3.take(2000))
  }
}
