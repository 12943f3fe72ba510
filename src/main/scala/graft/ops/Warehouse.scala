package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classic star-join warehouse analytics over the TPC-H-shaped tables —
  * the multi-table join + selective-filter + top-k family (Q3/Q5/Q10
  * shapes) that exercises the engine behaviors the single-table ops
  * don't: join ORDER under selective filters, dimension broadcast, and
  * filter pushdown through a 6-table plan.
  *
  * Scale shapes, deliberately left to Catalyst/AQE where it is already
  * right: region/nation/customer/supplier are dimension-scale and
  * broadcast (plan-asserted — the fact table never shuffles for them);
  * date/segment predicates sit directly on the scan columns so they
  * reach the parquet reader as pushed filters + row-group pruning; the
  * only wide exchanges are the orderkey equi-join of the two fact
  * tables and the final group-by, and top-k output rides
  * TakeOrderedAndProject, never a global sort.
  *
  * Determinism: revenue is the corpus-wide exact product-sum kernel
  * [[graft.util.Exact.dsumProd2]] (split-word long partials over 1e-4
  * fixed-point units, one decimal reassembly per group, one final
  * double cast — order-independent at any parallelism, mirrored by the
  * oracle's decimal form); every top-k ties deterministically on the
  * group key. */
object Warehouse {

  /** Exact order-independent revenue: Σ price·(1−discount). */
  private def rev: Column =
    graft.util.Exact.dsumProd2(col("l_extendedprice"),
      lit(1.0) - col("l_discount")).as("revenue")

  /** Q3 shape — unshipped-revenue shipping priority: for orders of one
    * market segment placed before `cutoff` with lines still shipping
    * after it, the `k` orders with the highest outstanding revenue. */
  def shippingPriority(lineitem: DataFrame, orders: DataFrame,
                       customer: DataFrame, segment: String,
                       cutoff: String, k: Int = 10): DataFrame = {
    val cut = to_timestamp(lit(cutoff))
    lineitem.filter(col("l_shipdate") > cut)
      .join(orders.filter(col("o_orderdate") < cut),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.filter(col("c_mktsegment") === segment),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_epoch"),
        col("o_orderpriority"))
      .agg(rev)
      .select(col("l_orderkey"), col("revenue"),
        col("o_orderdate_epoch"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(k)
  }

  /** Q5 shape — local supplier volume: revenue per nation of one
    * region over one order-date year, counted only when the customer
    * and the supplier share the nation ("local" trade). */
  def localSupplierVolume(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          regionName: String, from: String,
                          until: String): DataFrame =
    lineitem
      .join(orders.filter(col("o_orderdate") >= to_timestamp(lit(from)) &&
          col("o_orderdate") < to_timestamp(lit(until))),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region.filter(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(rev)
      .orderBy(col("revenue").desc, col("n_name"))

  /** Q10 shape — returned-item reporting: the `k` customers who
    * returned the most revenue for orders placed in one quarter. */
  def returnedItems(lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, nation: DataFrame,
                    from: String, until: String, k: Int = 20): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .join(orders.filter(col("o_orderdate") >= to_timestamp(lit(from)) &&
          col("o_orderdate") < to_timestamp(lit(until))),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(rev)
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
}
