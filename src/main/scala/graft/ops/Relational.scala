package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Relational core: projection/filter (SURVEY.md §2.2), joins (§2.3),
  * multi-column aggregation (§2.4 A2), top-k (§2.5 W4).
  *
  * Every operator is a declarative DataFrame plan — Catalyst provides
  * predicate pushdown, column pruning and join-strategy selection
  * (broadcast-hash for the dimension sides, sort-merge for fact⋈fact),
  * which is precisely what the reference does by hand or misses
  * (reference api.py:23 pulls `SELECT *` then filters client-side in
  * pandas; here the filter reaches the parquet scan).
  */
object Relational {
  import Det._

  /** P1 — scan + projection + predicate (reference api.py:23,103-105).
    * Projection and `l_quantity > 30` both reach the parquet scan
    * (`PushedFilters`), so at 100 TB only the 5 referenced columns and
    * passing row groups are read.
    */
  def q01ScanProjectFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .filter(col("l_quantity") > 30)
      // (l_orderkey, l_linenumber) is NOT unique in the testdata — order
      // by every projected column so tie order can't differ cross-engine
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")

  /** J1 — inner equi-join, the reference's flagship query
    * (api.py:32-33: users INNER JOIN rides ON user_id). customer is the
    * dimension side — small enough to broadcast at any realistic scale
    * factor, so Catalyst plans a shuffle-free broadcast-hash join.
    */
  def q02InnerJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "inner")
      .select(c("c_custkey"), c("c_name"), c("c_mktsegment"),
        o("o_orderkey"), o("o_orderstatus"), o("o_totalprice"), o("o_orderdate"))
      .orderBy("o_orderkey")
  }

  /** J3 — 3-way star join (reference chains lookups at api.py:140-144).
    * customer and orders both join-reduce onto lineitem; Catalyst/AQE
    * reorder and broadcast the dimension sides.
    */
  def q02bJoin3Way(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .select(c("c_custkey"), c("c_mktsegment"),
        o("o_orderkey"), l("l_linenumber"), l("l_quantity"), l("l_extendedprice"))
      // (o_orderkey, l_linenumber) is not unique — total order needs all cols
      .orderBy("o_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "c_custkey")
  }

  /** J2 — join + build-side predicate (reference api.py:39-41 bakes the
    * gender filter into SQL). Catalyst pushes the segment filter below
    * the join and into the customer scan.
    */
  def q03JoinFilter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .filter(c("c_mktsegment") === "BUILDING")
      .select(c("c_custkey"), c("c_name"), o("o_orderkey"), o("o_totalprice"), o("o_orderdate"))
      .orderBy("o_orderkey")
  }

  /** A2 — multi-column aggregate, TPC-H Q1 shape (the reference's four
    * parallel sum/len averages, main.py:171, done natively). Partial
    * (map-side) + final hash aggregation — the shuffle carries one row
    * per (flag,status) group per partition, not the 100 TB of input.
    */
  def q04bMultiAgg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum4(col("l_quantity")).as("sum_qty"),
        dsum4(col("l_extendedprice")).as("sum_base_price"),
        dsum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum4((col("l_extendedprice") * (lit(1) - col("l_discount"))) * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg4(col("l_quantity")).as("avg_qty"),
        davg4(col("l_extendedprice")).as("avg_price"),
        davg4(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** P3 — range predicate (reference api.py:119 age BETWEEN). */
  def q11RangeFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .filter(col("c_acctbal").between(0, 5000))
      .orderBy("c_custkey")

  /** P2 — point lookup (reference api.py:65 ride_id equality). The
    * equality predicate is pushed to parquet, pruning row groups via
    * min/max statistics — a point lookup touches a handful of pages
    * even on a 100 TB table.
    */
  def q12PointLookup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") === 42)
      .orderBy("o_orderkey")

  /** J5 — delete-by-key as anti-join (reference api.py:185-188 DELETE;
    * also the ON CONFLICT DO NOTHING idempotent-insert primitive,
    * sql_wrapper.py:44). The delete-key set is derived, small relative
    * to the fact table, and hash-joined; Spark plans a broadcast
    * left-anti when the key side fits.
    */
  def q16DeleteAntijoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val delKeys = o.filter(col("o_orderkey") % 10 === 0).select("o_orderkey")
    o.join(delKeys, Seq("o_orderkey"), "left_anti")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** W4 — top-k (TakeOrderedAndProject): top-10 customers by revenue.
    * The limit is pushed into the sort: each partition keeps only its
    * local top-10, the driver merges k·p rows — no global sort of the
    * full aggregate ever materializes.
    */
  def q18TopK(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(dsum4(o("o_totalprice")).as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(10)
  }

  /** J7 — full outer join (absent in the reference; completes the join
    * vocabulary with q39's semi and q16's anti): BUILDING-segment
    * customers ⟗ per-customer stats of 'P'-status orders. Both null
    * directions occur — BUILDING customers with no 'P' orders, and 'P'
    * orders from other segments. Aggregating the fact side BEFORE the
    * join keeps the outer join key-unique on both sides (one shuffle
    * each, no row multiplication); the output key is
    * coalesce(c_custkey, o_custkey), total and unique.
    */
  def q44FullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val bld = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name")
    val stats = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "P")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum4(col("o_totalprice")).as("total_spent"))
    bld.join(stats, bld("c_custkey") === stats("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_orders"), col("total_spent"))
      .orderBy("custkey")
  }

  /** q69 — TPC-H Q3 shape (shipping priority): top-10 unshipped orders
    * by revenue for one market segment. The classic
    * dim-filter → fact-join → agg → top-k pipeline: the segment filter
    * prunes customer BEFORE the join (broadcast side), both date
    * filters reach the parquet scans, revenue accumulates in DECIMAL
    * (dsum4), and the top-10 keeps ranking deterministic with full
    * tie-breaks. At scale: one shuffle per fact join (or broadcast for
    * the pruned customer side), partial+final agg on l_orderkey.
    */
  def q69ShippingPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < expr("TIMESTAMP '1998-06-01 00:00:00'"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > expr("TIMESTAMP '1998-06-01 00:00:00'"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("o_orderdate"), col("l_orderkey"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .limit(10)

  /** q70 — TPC-H Q5 shape (local supplier volume): revenue per nation
    * where the supplier and the ordering customer share a nation, one
    * region, one order-year. The 6-way star join: region→nation→
    * supplier are broadcast dims in size order, customer⋈orders⋈
    * lineitem are the fact joins, and the extra c_nationkey =
    * s_nationkey equality is a join predicate, not a post-filter — it
    * prunes inside the join. One final partial+final agg on n_name.
    */
  def q70LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val localSuppliers = Tables.supplier(spark, dir)
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        col("o_orderdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(localSuppliers),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** q73 — TPC-H Q10 shape (returned-item reporting): top-20 customers
    * by revenue lost to returns in one half-year. High-cardinality
    * group-by (customer) after two fact joins — the shape where
    * partial aggregation carries the weight — with the nation dim
    * broadcast and the window/flag filters pushed to the scans.
    */
  def q73ReturnedItems(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        col("o_orderdate") < expr("TIMESTAMP '1996-07-01 00:00:00'"))
      .join(Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
      .limit(20)

  /** q75 — TPC-H Q14 shape (promotion effect): what share of one
    * month's revenue came from PROMO-type parts. Fact⋈dim join with a
    * conditional numerator — both sums accumulate in DECIMAL over the
    * SAME join pass (one scan, one agg), and the percentage divides the
    * two already-rounded doubles, so the quotient is bit-identical
    * cross-engine. The shipdate window is pushed to the lineitem scan;
    * part is the broadcast side.
    */
  def q75PromoRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-09-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP '1996-10-01 00:00:00'"))
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        dsum4(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)))
          .as("promo_revenue"),
        dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        roundD4(lit(100.0) * col("promo_revenue") / col("total_revenue")).as("promo_pct"))

  /** q76 — TPC-H Q19 shape (discounted revenue, disjunctive
    * predicates): an OR of three brand/size/quantity brackets spanning
    * BOTH join sides. The point is the PLAN: Catalyst still extracts
    * the `l_partkey = p_partkey` equi-condition (hash join, part
    * broadcast), evaluates the disjunction as the join's residual —
    * never a nested-loop over the OR — and pushes the per-side
    * implied bounds (`l_quantity <= 30`, derivable from the brackets)
    * into the scans. PlanQualitySpec pins the no-BNLJ shape.
    */
  def q76DisjunctivePredicates(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size"))
    val brackets =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#22" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#6" && col("p_size").between(1, 50) &&
        col("l_quantity").between(20, 30))
    l.join(p, col("l_partkey") === col("p_partkey") && brackets)
      .agg(
        dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** q77 — TPC-H Q18 shape (large-volume orders): orders whose total
    * quantity across line items exceeds 200, with their customers. The
    * HAVING-subquery becomes aggregate-then-join: lineitem aggregates
    * ONCE (partial+final on l_orderkey), the surviving keys — a tiny
    * fraction of orders — drive hash joins back to orders and customer.
    * No correlated re-scan of lineitem per order, which is what the
    * literal nested formulation would do.
    */
  def q77LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(dsum4(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 200.0)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("c_custkey") === col("o_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
      .orderBy("o_orderkey")
  }

  /** q78 — TPC-H Q22 shape (global sales opportunity): per segment,
    * count and balance of above-average-balance customers with no
    * order since 2000 (Q22's dormant-customer semantics — in this
    * synthetic data every customer has SOME order, as at any realistic
    * scale). Three plan ingredients: a one-row scalar aggregate
    * (the positive-balance average) broadcast into the filter — the
    * sanctioned single-row nested-loop, same as q15/q17/q53; a
    * LEFT ANTI hash join against orders for "no orders exist"; and a
    * final partial+final agg on segment. The anti-join shuffles only
    * `o_custkey` longs at scale.
    */
  def q78NoOrderCustomers(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("BUILDING", "AUTOMOBILE", "MACHINERY")
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment").isin(segs: _*))
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(davg4(col("c_acctbal")).as("avg_bal"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= expr("TIMESTAMP '2000-01-01 00:00:00'"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), dsum4(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** q74 — TPC-H Q12 shape (shipping-delay priority report): per order
    * priority, how many line items shipped more than 90 days after the
    * order date vs total. Conditional aggregation over one fact⋈fact
    * join — flags computed map-side, one partial+final agg on a 5-row
    * key. Timestamp interval arithmetic is exact and engine-identical.
    */
  def q74LateShipments(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L)
          .otherwise(0L)).as("late_lines"),
        count(lit(1)).as("total_lines"))
      .orderBy("o_orderpriority")

  /** q83 — TPC-H Q4 shape (order priority checking): orders per
    * priority that had at least one line item shipped more than 60
    * days after ordering. EXISTS becomes a LEFT SEMI hash join whose
    * equi-key is l_orderkey = o_orderkey and whose lateness predicate —
    * referencing BOTH sides — rides as the join residual; each order
    * row is emitted at most once regardless of how many line items
    * match, with no pair blow-up and no distinct afterwards. At scale:
    * one shuffle per side on the order key, then a 5-row agg.
    */
  def q83OrderPriorityExists(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** q84 — TPC-H Q13 shape (customer order-count distribution): how
    * many customers placed 0, 1, 2, … non-urgent orders. The LEFT
    * OUTER join keeps order-less customers (the 0 bucket — Q13's whole
    * point); `count(o_orderkey)` counts only matched rows. Two
    * aggregations: per-customer (high cardinality, partial+final) then
    * the tiny distribution. The priority filter prunes orders BEFORE
    * the join.
    */
  def q84OrderCountDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** q85 — TPC-H Q17 shape (small-quantity-order revenue): average
    * yearly revenue lost if small orders (quantity below half the
    * part's average) of one brand were not filled. The correlated
    * `l_quantity < 0.5 * (SELECT avg ...)` decorrelates into
    * aggregate-once-then-join: brand parts semi-reduce lineitem first
    * (broadcast — 2 000 parts → ~70 survive the brand filter), the
    * per-part average aggregates that already-reduced slice once, and
    * the filter join is against a part-count-sized relation. The
    * division by 7.0 divides two already-rounded doubles — IEEE-
    * identical cross-engine.
    */
  def q85SmallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#11").select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val avgQty = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg(davg4(col("l_quantity")).as("avg_qty"))
    li.join(broadcast(avgQty), col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(dsum4(col("l_extendedprice")).as("total_revenue"),
        count(lit(1)).as("n_lines"))
      .select(roundD4(col("total_revenue") / lit(7.0)).as("avg_yearly"),
        col("n_lines"))
  }

  /** q86 — TPC-H Q21 shape (suppliers who kept orders waiting): for
    * multi-supplier orders where EXACTLY ONE supplier shipped late
    * (>60 days after ordering), charge that supplier; rank suppliers
    * by how many orders they alone delayed. Q21's EXISTS/NOT-EXISTS
    * self-join pair decorrelates into ONE per-order aggregate: distinct
    * suppliers, distinct late suppliers, AND the culprit itself — when
    * exactly one supplier is late, `max(when(late, suppkey))` IS that
    * supplier, so no join back to the line items is needed at all. The
    * fact join is scanned ONCE (a naive guilty-rows⋈per-order-agg
    * formulation plans the lineitem⋈orders join twice — 5 scans vs 3);
    * the final count aggregates on supplier cardinality with a
    * broadcast name join.
    *
    * Lineitem is pre-aggregated per (l_orderkey, l_suppkey) BEFORE the
    * orders join: a supplier is late on an order iff its LATEST line
    * shipped late, so `max(l_shipdate)` per (order, supplier) loses
    * nothing — and because suppliers arrive already distinct per order,
    * the per-order aggregate needs plain `count`s instead of
    * `countDistinct`s. That removes the multi-distinct Expand (which
    * tripled every joined row through the exchange) and shrinks the
    * orders join to supplier-per-order cardinality. Measured at sf0.1:
    * 3.7 s → ~0.9 s, same 3 FileScans.
    */
  def q86SoleLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val late = col("max_ship") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("l_shipdate")).as("max_ship"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        count(when(late, lit(1))).as("n_late_supp"),
        max(when(late, col("l_suppkey"))).as("guilty"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
      .groupBy("guilty")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("guilty") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "numwait")
      .orderBy(desc("numwait"), col("s_suppkey"))
      .limit(20)
  }

  /** q87 — TPC-H Q15 shape (top supplier): the supplier(s) whose
    * quarter revenue equals the maximum. The view-plus-subquery
    * becomes revenue-agg → one-row max → broadcast equality filter
    * (the sanctioned single-row nested loop, same as q78's scalar
    * average). Equality compares two identically-rounded doubles, so
    * ties are exact; all suppliers at the max are returned, as in Q15.
    */
  def q87TopRevenueSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP '1996-04-01 00:00:00'"))
      .groupBy("l_suppkey")
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_rev"))
    val top = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_rev")
      .orderBy("s_suppkey")
  }

  /** q88 — TPC-H Q2 shape (cheapest supplier per part): for every
    * part traded, the supplier with the lowest average unit price
    * (argmin join-back). Q2's correlated `= (SELECT min ...)` becomes
    * one (part, supplier) aggregate and one min-STRUCT argmin per part
    * — struct comparison orders by (avg_unit, l_suppkey), so the min
    * and its deterministically tie-broken witness fall out of a single
    * partial-aggregable aggregate (no per-part sort, no window
    * exchange). The per-row unit price is floored at 6 dp BEFORE the
    * decimal mean (q71's discipline) so the aggregate is exact
    * cross-engine.
    */
  /** q96 — TPC-H Q6 shape (forecast revenue change): ONE filtered scan,
    * ONE global aggregate, NO join — the pushdown showcase. All three
    * predicates (date window, discount band, quantity cap) reach the
    * parquet scan as PushedFilters, so row groups outside any bound are
    * skipped on min/max statistics alone and the aggregate's input is
    * the surviving rows, not the table. At 100 TB this query reads the
    * 4 referenced columns of the qualifying row groups and nothing
    * else — PlanQualitySpec pins both the pushdown and the pruned
    * ReadSchema.
    */
  def q96FilteredGlobalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .agg(dsum4(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** q97 — TPC-H Q11 shape (important stock): per-part value of line
    * items shipped by a nation group's suppliers, keeping parts above
    * 1.5× the mean per-part value. Two aggregates over ONE joined
    * slice: per-part, and the one-row (total, n_parts) scalar as the
    * sanctioned broadcast (q78's pattern); the suppliers join-reduce
    * lineitem through a broadcast hash join before any aggregation.
    * Q11's fixed fraction is SF-dependent (0.0001/SF in the spec) —
    * the mean-relative threshold keeps the query scale-free instead.
    */
  def q97ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_8", "NATION_12", "NATION_15")
    val natSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val slice = Tables.lineitem(spark, dir)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .select("l_partkey", "l_extendedprice")
    val perPart = slice.groupBy("l_partkey")
      .agg(dsum4(col("l_extendedprice")).as("value"))
    val scalar = perPart.agg(dsum4w(col("value")).as("total_value"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(scalar))
      .filter(col("value") > lit(1.5) * col("total_value") / col("n_parts"))
      .select("l_partkey", "value")
      .orderBy(desc("value"), col("l_partkey"))
  }

  /** q98 — TPC-H Q16 shape (part/supplier relationship): how many
    * distinct suppliers ship each (brand, type, size) combination,
    * excluding one brand and a complaint denylist of suppliers. The
    * NOT IN subquery is a LEFT ANTI hash join (key side tiny, never a
    * nested loop — s_suppkey is non-null so anti-join and NOT IN
    * agree); the distinct count aggregates partial+final on the
    * attribute key.
    */
  def q98SupplierCountPerPart(spark: SparkSession, dir: String): DataFrame = {
    val denylist = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0).select("s_suppkey")
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_brand") =!= "Brand#11" &&
          col("p_size").isin(1, 3, 5, 7)),
        col("l_partkey") === col("p_partkey"))
      .join(denylist, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
  }

  /** q99 — TPC-H Q20 shape (potential part promotion): suppliers who
    * shipped a meaningful volume (> 50 units in one year) of any
    * 'small %' part. The nested EXISTS chain flattens bottom-up:
    * lineitem ⋈ broadcast(matching parts) → (supp, part) aggregate →
    * volume filter → distinct supplier keys → LEFT SEMI back to
    * supplier. Each level is an equi-join or partial+final agg; the
    * correlated double-EXISTS never re-scans lineitem.
    */
  def q99VolumeSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val volume = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(dsum4(col("l_quantity")).as("qty"))
      .filter(col("qty") > 50.0)
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(volume, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")
  }

  /** q101 — TPC-H Q7 shape (volume shipping): revenue between two
    * trading nations, both directions, by ship year. The two nation
    * dims broadcast into supplier and customer; the disjunctive
    * nation-pair predicate ((A,B) or (B,A)) is a post-join residual on
    * two broadcast-joined string columns, never a join explosion; one
    * partial+final agg on the tiny (nation, nation, year) key.
    */
  def q101VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_8", "NATION_12")
    val nations = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nations.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nations.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .select("c_custkey", "cust_nation")
    Tables.lineitem(spark, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === pair.head && col("cust_nation") === pair(1)) ||
        (col("supp_nation") === pair(1) && col("cust_nation") === pair.head))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** q102 — TPC-H Q8 shape (national market share): one nation's share
    * of supplier revenue among a region's customer orders, by year.
    * The share is a conditional-sum-over-total in ONE aggregation pass
    * (q75's promo-ratio discipline): both DECIMAL sums ride the same
    * join tree, and the quotient divides two already-rounded doubles.
    */
  def q102MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val regionNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cnk"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.customer(spark, dir)
      .join(broadcast(regionNations), col("c_nationkey") === col("cnk"))
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(
        dsum4(when(col("supp_nation") === "NATION_8", rev).otherwise(lit(0.0))).as("nation_revenue"),
        dsum4(rev).as("total_revenue"))
      .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
        roundD4(col("nation_revenue") / col("total_revenue")).as("mkt_share"))
      .orderBy("o_year")
  }

  /** q103 — TPC-H Q9 shape (product-type profit): per supplier nation
    * and ship year, profit on one product family — revenue minus a
    * retail-priced cost proxy (the testdata has no partsupp table;
    * 0.5·p_retailprice·l_quantity stands in for ps_supplycost·qty,
    * keeping Q9's all-fact-joins + amount-expression shape). The part
    * filter prunes the broadcast side before the fact join; one
    * partial+final agg on (nation, year).
    */
  def q103ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val widgets = Tables.part(spark, dir)
      .filter(col("p_name").contains("widget"))
      .select("p_partkey", "p_retailprice")
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey").as("snk"), col("n_name").as("nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "nation")
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.5) * col("p_retailprice") * col("l_quantity")
    Tables.lineitem(spark, dir)
      .join(broadcast(widgets), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(dsum4(amount).as("sum_profit"))
      .orderBy("nation", "l_year")
  }

  def q88CheapestSupplierPerPart(spark: SparkSession, dir: String): DataFrame = {
    val unit = floor(col("l_extendedprice") / col("l_quantity") * lit(1000000.0) + lit(0.5)) /
      lit(1000000.0)
    val bySupp = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), unit.as("unit"))
      .groupBy("l_partkey", "l_suppkey")
      // davg4's exact 4-dp decimal, kept in DECIMAL space (the double
      // cast happens after the argmin below): round-in-decimal is the
      // same value davg4 publishes, and distinct 4-dp decimals cast to
      // distinct doubles, so ordering on the decimal == ordering on
      // davg4's double
      .agg(round(Det.sumDec(col("unit")) / count(lit(1)), 4)
        .cast(org.apache.spark.sql.types.DecimalType(19, 4)).as("avg_dec"))
    // argmin via a DECIMAL(38,0) PACK, not min(struct): a struct-typed
    // aggregation buffer is not hash-aggregable (UnsafeRow mutable
    // types only), so the min-struct form planned as SortAggregate —
    // TWO corpus-sized Sorts (591k + 189k rows here) around the
    // l_partkey exchange (plans/r14/q88_..._before.txt). Packing
    // (avg·10⁴)·10¹⁸ + suppkey into one decimal keeps the same
    // lexicographic (avg_unit, l_suppkey) order — avg ≥ 0 and
    // integral·10⁴ by construction, suppkey ∈ [0, 10¹⁸) with ~10¹¹ of
    // slack over any real key space — and a decimal buffer IS mutable,
    // so both aggregates stay HashAggregate with map-side partials.
    val packBase = lit(new java.math.BigDecimal(1000000000000000000L)) // 10^18
    val packed = (col("avg_dec") * lit(10000L)).cast(org.apache.spark.sql.types.DecimalType(20, 0)) *
      packBase + col("l_suppkey")
    bySupp
      .groupBy("l_partkey")
      .agg(min(packed).as("pk"))
      .select(col("l_partkey").as("p_partkey"),
        pmod(col("pk"), packBase).cast(LongType).as("l_suppkey"),
        // unpack the exact 4-dp decimal, then one double cast — decimal
        // division by 10¹⁸ and 10⁴ is exact here (integral quotient,
        // then a value representable at the result scale)
        (((col("pk") - pmod(col("pk"), packBase)) / packBase) / lit(10000L))
          .cast(org.apache.spark.sql.types.DoubleType).as("avg_unit"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"), col("avg_unit"))
      .orderBy("p_partkey")
  }

  /** q191 — GROWTH ACCOUNTING: monthly revenue decomposed into NEW
    * customers (placing their first-ever order that month — all their
    * orders that month count as new, the standard cohort convention)
    * vs RETURNING — the one decomposition every revenue dashboard
    * leads with, and the input to q90's retention grid read in
    * dollars. Month index = year·12 + month (exact date parts, no
    * epoch arithmetic); per-customer first month is one map-combinable
    * min; the decomposition is conditional exact-decimal sums after a
    * customer-keyed equi-join. A month with no new (or no returning)
    * revenue reports NULL, identically on both engines.
    */
  def q191GrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast(LongType).as("mo"),
        col("o_totalprice").as("price"))
    val first = o.groupBy("c").agg(min(col("mo")).as("first_mo"))
    o.join(first, "c")
      .groupBy("mo")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(when(col("mo") === col("first_mo"), col("c"))).as("n_new_customers"),
        dsum4(when(col("mo") === col("first_mo"), col("price"))).as("revenue_new"),
        dsum4(when(col("mo") > col("first_mo"), col("price"))).as("revenue_returning"))
      .orderBy("mo")
  }

  /** q207 — SUPPLIER CONCENTRATION (HHI audit): per part brand, how
    * concentrated shipped quantity is across suppliers — the
    * supply-chain-risk read procurement runs before a brand's single
    * dominant supplier becomes a single point of failure (and the
    * market-concentration sibling of q174's join-skew audit: same
    * Σshare² lens, business axis instead of shuffle axis). Emits
    * supplier count, total quantity, the exact Herfindahl numerator
    * Σq_s², and `concentrated` ⟺ HHI > 0.25, cross-multiplied as
    * `4·Σq_s² > (Σq)²` — shares never materialize as floats (q40's
    * boundary trick). Σq² and the squared total live in DECIMAL(38,0)
    * (q197's second-moment discipline; DuckDB's HUGEINT is the same
    * 128-bit width), quantities are integral by TPC-H construction
    * and cast to exact longs.
    *
    * Shape: one (brand, supplier)-keyed partial-aggregating groupBy
    * over the lineitem→part FK join (broadcastable dimension), then a
    * brand-keyed rollup of the ≤|brands|·|suppliers| relation — both
    * map-combinable, nothing row-sized past the first aggregate.
    */
  def q207SupplierConcentration(spark: SparkSession, dir: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_suppkey"), col("l_quantity").cast(LongType).as("q"))
      .groupBy("p_brand", "l_suppkey").agg(sum(col("q")).as("qs"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("qs")).cast(LongType).as("total_qty"),
        sum(col("qs").cast(d38) * col("qs")).as("sum_sq_w"))
      // DECIMAL(38,0) stays INTERNAL (SURVEY §7.3: wide decimals never
      // reach a declared output — the driver's hash layer distinguishes
      // decimal from int64 even when values agree). Σq² fits BIGINT at
      // any tested sf: q ≤ 50·|lineitem per (brand,supplier)| < 2³¹, so
      // Σq² < |suppliers|·2⁶² / |suppliers| per brand. ANSI is off, so
      // an out-of-range decimal→long cast would be a SILENT NULL — the
      // guard below turns that into a loud plan-level failure instead
      // of a wrong row, making the BIGINT-range assumption enforced
      // rather than argued.
      .select(col("p_brand"), col("n_suppliers"), col("total_qty"),
        when(col("sum_sq_w") > lit(Long.MaxValue).cast(d38),
          raise_error(concat(lit("q207: sum_sq overflows BIGINT for brand "),
            col("p_brand"))))
          .otherwise(col("sum_sq_w").cast(LongType)).as("sum_sq"),
        (col("sum_sq_w") * 4L >
          col("total_qty").cast(d38) * col("total_qty")).as("concentrated"))
      .orderBy("p_brand")
  }

  /** q209 — FULFILLMENT LATENCY PROFILE: per order priority, the
    * distribution of ship lag (l_shipdate − o_orderdate in whole days)
    * — the SLA readout that tells whether 1-URGENT actually ships
    * faster than 5-LOW, and the business-side sibling of q189's
    * event-cadence profile (same exact order-statistics contract:
    * min/max as exact longs, p50/p90 as interpolated percentiles under
    * q38's percentile ↔ quantile_cont mapping, 4-dp-rounded). Lag is
    * exact integer floor-div of the µs difference ([[Det.floorDivExpr]];
    * negative dirty-data lags floor — the oracle mirrors with the
    * explicit pmod floor form, since DuckDB's integer `//` truncates
    * toward zero like Spark's `div`). One FK equi-join (orders side
    * broadcastable at dim scale, AQE picks at fact scale) + one
    * map-combinable aggregate per ≤5-value priority key.
    */
  def q209FulfillmentLatency(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), unix_micros(col("l_shipdate")).as("sus"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          unix_micros(col("o_orderdate")).as("ous")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days", expr(Det.floorDivExpr("sus - ous", 86400000000L)))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        min(col("lag_days")).as("min_days"),
        Det.roundD4(expr("percentile(lag_days, 0.5)")).as("med_days"),
        Det.roundD4(expr("percentile(lag_days, 0.9)")).as("p90_days"),
        max(col("lag_days")).as("max_days"))
      .orderBy("o_orderpriority")
}
