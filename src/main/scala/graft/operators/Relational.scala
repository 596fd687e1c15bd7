package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-style headline queries (SURVEY §2.2 #13-16).
  *
  * Determinism discipline for the DuckDB oracle hash-compare:
  *  - money sums go through `decimal(18,2/4)` so parallel summation
  *    order cannot perturb low bits; final cast back to double is the
  *    same IEEE value on both engines;
  *  - every result is totally ordered by its group keys.
  * The trailing sort is free in bench: Catalyst's EliminateSorts drops
  * it under the `count()` action.
  */
object Relational {

  /** Q1-style pricing summary: scan-heavy partial aggregation.
    * 100 TB notes: single shuffle on (returnflag, linestatus) — 6
    * groups, partial agg does virtually all the work map-side; scan
    * reads only the 7 referenced columns of lineitem.
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q3-style shipping priority: selective filters on both fact
    * tables, join, aggregate, top-k.
    * 100 TB notes: filters push to both scans; orders⨝customer keeps
    * only keys via semi-join shape; final top-10 is
    * TakeOrderedAndProject (no global sort).
    */
  def q3TopkJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1995-06-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1995-06-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5-style local-supplier volume: star join with broadcast dims.
    * 100 TB notes: region/nation/supplier/customer are dimension-sized
    * (star-schema ratios) → broadcast; the only shuffles are
    * lineitem⨝orders on orderkey and the final tiny groupBy.
    */
  def q5MultiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")

    val natInAsia = nation
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val custN = cust.join(broadcast(natInAsia), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_nationkey").as("cn_key"), col("n_name"))
    val suppN = supp.join(broadcast(natInAsia.select(col("n_nationkey").as("sn_key"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("sn_key"))

    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppN),
        col("l_suppkey") === col("s_suppkey") && col("cn_key") === col("sn_key"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Market-basket co-occurrence: the 20 part pairs appearing together
    * in the most orders. Fact-fact self-join on the order key — both
    * sides shuffle once on l_orderkey and the join is co-partitioned;
    * per-pair counts partial-aggregate map-side and the top-20 is
    * TakeOrderedAndProject. The distinct() keeps multi-quantity line
    * items from double-counting a pair within one order.
    */
  def copurchase(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    // adjacency-list spelling: one shuffle builds each order's sorted
    // part set, a nested higher-order transform emits the i<j pairs
    // in-partition (no self-join), then one pair-keyed shuffle counts.
    // vs the distinct+self-join plan this drops a whole exchange and
    // never re-reads lineitem; the quadratic pair fan-out happens
    // inside the row it belongs to (bounded by order size, ~4 parts),
    // which is the shape that survives 100 TB order volumes.
    // explicit width on the order-key exchange (r18 optimization
    // round): AQE's byte-based coalescing sees small adjacency rows
    // and shrinks this stage to a handful of tasks, but the pair
    // explode below multiplies WORK, not bytes — the fan-out stage
    // must keep full session parallelism at any scale
    val parts = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    parts
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))),
          y => struct(x.as("part_a"), y.as("part_b")))))).as("pr"))
      .select(col("pr.part_a"), col("pr.part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  /** Per-group top-n via window rank: 3 highest-value orders per
    * customer market segment.
    * 100 TB notes: one shuffle on the partition key; rank is computed
    * streaming within each sorted partition.
    */
  def windowTopn(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn").cast("long").as("rn"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** Per-group top-n as a MERGEABLE bounded aggregate
    * ([[graft.functions.TopKAggregate]]) instead of a window rank:
    * identical output to [[windowTopn]], but each map task reduces
    * its slice to ≤ n rows per group before the exchange, so the
    * shuffle carries ≤ n·groups·tasks rows instead of the whole fact
    * table — the difference between sorting 100 TB and merging
    * k-element heaps. PlanSpec pins the partial aggregation and the
    * absence of a Window/full sort.
    */
  def windowTopnAgg(spark: SparkSession, sfDir: String, n: Int = 3): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregate(n))
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("i", "row")))
      .select(col("c_mktsegment"), (col("i") + 1).cast("long").as("rn"),
        col("row._1").as("o_orderkey"), col("row._2").as("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** ROLLUP aggregation: per-(flag, status) totals, per-flag
    * subtotals, and the grand total in ONE pass — Spark's `rollup`
    * compiles to a single Expand + hash aggregate, so the data is
    * scanned once and shuffled once for all three grouping levels
    * (vs three scans for the UNION ALL spelling).
    * 100 TB notes: Expand multiplies rows 3× BEFORE the partial
    * aggregate, but the partials collapse to ≤ 3×|groups| rows
    * map-side (6 flag×status groups), so the exchange still carries
    * only group rows; grouping_id disambiguates NULL-as-subtotal from
    * a NULL key value.
    */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** Q6-style forecasting revenue change: pure scan + filter + global
    * sum, the canonical predicate-pushdown benchmark.
    * 100 TB notes: all three predicates reach the parquet scan
    * (PushedFilters), the scan reads 4 columns, and the aggregate is
    * a map-side partial + 1-row exchange — the cheapest full-table
    * query shape that exists.
    */
  def q6Revenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount"))
        .cast("decimal(18,4)")).cast("double").as("revenue"))

  /** Q4-style order-priority check, adapted to the available columns
    * (no commit/receipt dates in testdata): count orders per priority
    * that have at least one line item shipped after the order date.
    * 100 TB notes: the EXISTS compiles to a left-semi hash join on
    * orderkey — lineitem is deduplicated to order keys map-side
    * (semi-join skips non-matching build rows), then one 5-group
    * aggregate.
    */
  def q4OrderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    ord.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q14-style promotion effect: revenue share of PROMO parts in one
    * shipping year. 100 TB notes: the date filter pushes to the
    * lineitem scan; part joins on partkey — broadcast at bench scale,
    * and at cluster scale both sides bucket on partkey
    * ([[graft.sources.BucketedSink]]) for a zero-exchange join; the
    * conditional sum is one pass.
    */
  def q14PromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, sfDir).select("p_partkey", "p_type")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,4)")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"), rev)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double")
          .as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .select(
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6)
          .as("promo_pct"),
        col("promo_revenue"), col("total_revenue"))
  }

  /** Q18-style large-volume customers: orders whose total quantity
    * exceeds a threshold, with customer attribution, top 100 by
    * (totalprice desc, orderkey).
    * 100 TB notes: the HAVING filter runs on the aggregated (small)
    * side BEFORE the joins, so only qualifying orderkeys join back;
    * customer joins broadcast; final top-100 is TakeOrdered.
    */
  def q18BigOrders(spark: SparkSession, sfDir: String,
      minQty: Int = 300): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        .as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q19-style discounted revenue over disjunctive brand/size/quantity
    * predicates, adapted to available columns (no container or
    * shipinstruct in testdata). 100 TB notes: the OR-of-ANDs lives in
    * the JOIN condition referencing both sides, so Catalyst keeps the
    * per-side conjuncts it can extract (quantity bounds push to the
    * lineitem scan); part broadcasts.
    */
  def q19DiscountRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand", "p_size")
    val cond = col("l_partkey") === col("p_partkey") && (
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 30)))
    li.join(broadcast(part), cond)
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
  }

  /** Q7-style nation-pair trade flow: shipping revenue between two
    * chosen nations (both directions kept distinct) by ship year.
    * 100 TB notes: the two big facts join once on l_orderkey (the
    * only fact-fact exchange); supplier/customer pre-reduce to
    * (key, nation-name) maps filtered to the TWO nations of interest
    * — tiny, broadcast — so the nation-pair predicate prunes rows at
    * the broadcast probes, never in a shuffled join. Revenue
    * accumulates in decimal(18,4) (order-independent exact sums).
    */
  def q7NationTrade(spark: SparkSession, sfDir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val nat = Tables.nation(spark, sfDir)
      .filter(col("n_name") === nationA || col("n_name") === nationB)
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
    li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q10-style returned-item reporting: the 20 customers losing the
    * most revenue to returns in a quarter. 100 TB notes: the return
    * flag and date window prune both fact scans BEFORE their single
    * co-keyed exchange; customer and nation broadcast onto the
    * aggregated (small) result, and the top-20 is TakeOrdered with a
    * deterministic custkey tie-break.
    */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nat = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private def revenueDec: org.apache.spark.sql.Column =
    (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,4)")

  /** Q8-style national market share: one nation's share of a region's
    * revenue on one part type, by order year. 100 TB notes: part
    * (type-filtered), supplier→nation, and customer→nation→region are
    * all broadcast maps pruning at the probe; the only exchange is
    * the lineitem×orders fact-fact join on l_orderkey. The share is a
    * conditional decimal sum over the same aggregate — no second
    * pass, no self-join.
    */
  def q8MarketShare(spark: SparkSession, sfDir: String,
      nation: String = "NATION_5", region: String = "EUROPE",
      ptype: String = "PROMO"): DataFrame = {
    val part = Tables.part(spark, sfDir)
      .filter(col("p_type") === ptype).select("p_partkey")
    val nat = Tables.nation(spark, sfDir)
    val reg = Tables.region(spark, sfDir).filter(col("r_name") === region)
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(nat.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(when(col("supp_nation") === nation, revenueDec)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
        sum(revenueDec).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q9-style product-line profit by supplier nation × order year
    * (adapted: no partsupp table in the testdata, so profit is
    * revenue rather than revenue − supplycost·qty). 100 TB notes:
    * the name-filtered part and the supplier→nation map broadcast;
    * lineitem×orders is again the only shuffle, and the part filter
    * prunes lineitem BEFORE that exchange.
    */
  def q9ProductProfit(spark: SparkSession, sfDir: String,
      nameLike: String = "red%"): DataFrame = {
    val part = Tables.part(spark, sfDir)
      .filter(col("p_name").like(nameLike)).select("p_partkey")
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(revenueDec).cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q12-style late-shipment priority split (adapted: the testdata
    * has no shipmode/commitdate, so "late" is shipped >90 days after
    * the order date, grouped by linestatus). 100 TB notes: one
    * fact-fact exchange on the order key; the CASE split rides the
    * same partial aggregate (2 groups → map-side collapse).
    */
  def q12LatePriority(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_shipdate", "l_linestatus")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_linestatus").as("linestatus"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("linestatus"))
  }

  /** Q13-style customer order-count distribution: how many customers
    * placed N qualifying orders, including zero (the left join is the
    * point of the query). 100 TB notes: two inherent shuffles —
    * per-customer count keyed on custkey (orders pre-filtered before
    * the exchange), then the distribution keyed on the count (tiny
    * domain, partial agg collapses it map-side).
    */
  def q13CustDist(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select("o_custkey", "o_orderkey")
    Tables.customer(spark, sfDir).select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15-style top supplier: the supplier(s) with maximum quarterly
    * revenue. 100 TB notes: revenue is one suppkey-keyed partial agg
    * over the date-pruned scan; the max is a 1-row broadcast joined
    * back (no second pass over lineitem, no window over the agg);
    * equality on the double is safe because both sides derive it
    * from the same exact decimal sum.
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(revenueDec).cast("double").as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select("s_suppkey", "s_name")),
        col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q16-style supplier diversity per part attribute (adapted: the
    * part↔supplier relation is the distinct (l_partkey, l_suppkey)
    * pairs of lineitem — there is no partsupp table — and the
    * "complaints" exclusion is negative supplier balance). 100 TB
    * notes: the distinct-pair reduction is partkey-hash-keyed and
    * collapses the fact ~12× before anything joins; part filter and
    * the supplier exclusion both broadcast; countDistinct rides one
    * more (brand,type,size)-keyed exchange on the reduced frame.
    */
  def q16SupplierCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val sizes = Seq(1, 4, 9, 14, 19, 23, 36, 45)
    val ps = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct()
    val part = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= "Brand#5" &&
        col("p_size").isin(sizes.map(Integer.valueOf): _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val okSupp = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") >= 0).select("s_suppkey")
    ps.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(okSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Q17-style small-quantity revenue: average yearly revenue lost if
    * sub-20%-of-average-quantity orders stopped. The avg comparison
    * is exact integer/decimal arithmetic (5·qty·cnt < Σqty), never a
    * double divide. 100 TB notes: per-part moments and the probe both
    * key on l_partkey so the join back reuses one hash partitioning;
    * the brand/size filter broadcasts and prunes BEFORE the exchange.
    */
  def q17SmallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val partFilter = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#23" && col("p_size") < 5)
      .select("p_partkey")
    val agg = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sum_qty"),
           count(lit(1)).as("cnt"))
    li.join(broadcast(partFilter), col("l_partkey") === col("p_partkey"))
      .join(agg, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity").cast("decimal(18,4)") * 5 * col("cnt") <
        col("sum_qty"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double") / 7.0).as("avg_yearly"))
  }

  /** Q22-style dormant high-balance customers (adapted: every
    * customer has orders in this dataset, so "no orders" is no orders
    * since 2000): per nation, customers above the positive-balance
    * average with no recent orders. The average is an exact decimal
    * cross-multiply (bal·n > Σbal), not a double divide. 100 TB
    * notes: the balance stats are a 1-row broadcast; the anti-join
    * keys on custkey against the date-pruned orders scan — the only
    * exchange of fact scale; nation broadcasts onto the survivors.
    */
  def q22DormantCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val stats = cust.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast("decimal(18,4)")).as("s"),
           count(lit(1)).as("n"))
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey")
    cust.crossJoin(broadcast(stats))
      .filter(col("c_acctbal").cast("decimal(18,4)") * col("n") > col("s"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("cntry"))
      .agg(count(lit(1)).as("numcust"),
           sum(col("c_acctbal").cast("decimal(18,4)"))
             .cast("double").as("totacctbal"))
      .orderBy(col("cntry"))
  }

  /** Q2-style min-cost supplier per part (adapted: part↔supplier via
    * distinct lineitem pairs; "cost" is supplier account balance —
    * the testdata has no partsupp/supplycost). The per-part argmin is
    * a MERGEABLE `min(struct(bal, suppkey, …))` aggregate — ties
    * break on suppkey inside the struct ordering — so there is no
    * window sort over the candidates and partials collapse map-side.
    * 100 TB notes: filtered part and region-filtered supplier both
    * broadcast; the distinct-pair reduction and the argmin agg share
    * the partkey hash partitioning.
    */
  def q2MinBalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val ps = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct()
    val part = Tables.part(spark, sfDir)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 5)
      .select("p_partkey", "p_name")
    val eu = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_acctbal"), col("s_name"), col("n_name"))
    ps.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"))
      .agg(min(struct(col("s_acctbal"), col("s_suppkey"),
        col("s_name"), col("n_name"))).as("best"))
      .select(col("best.s_acctbal").as("s_acctbal"),
        col("best.s_name").as("s_name"), col("best.n_name").as("n_name"),
        col("p_partkey"), col("p_name"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** Q11-style important parts (adapted: "stock value" is the revenue
    * a nation's suppliers generated per part). The significance
    * threshold is an exact decimal cross-multiply (value·1000 >
    * total), never a double fraction. 100 TB notes: the nation's
    * supplier map broadcasts and prunes lineitem BEFORE its one
    * partkey-keyed exchange; the grand total is a 1-row broadcast
    * over the per-part aggregate.
    */
  def q11ImportantParts(spark: SparkSession, sfDir: String,
      nation: String = "NATION_3"): DataFrame = {
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .filter(col("n_name") === nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val v = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(revenueDec).as("value_dec"))
    val total = v.agg(sum(col("value_dec")).as("total"))
    v.crossJoin(broadcast(total))
      .filter(col("value_dec") * 1000 > col("total"))
      .select(col("l_partkey").as("p_partkey"),
        col("value_dec").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** Q20-style dominant-share suppliers (adapted: no availqty, so the
    * flag is "shipped more than half of a red part's 1995 volume").
    * The share test is an exact decimal cross-multiply (2·sq > tq).
    * 100 TB notes: the name-filtered part broadcasts and prunes the
    * date-windowed scan; per-(part,supplier) and per-part totals
    * share the partkey hash partitioning, so the join back is
    * co-keyed; supplier names broadcast onto the tiny survivor set.
    */
  def q20DominantSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val red = Tables.part(spark, sfDir)
      .filter(col("p_name").like("red%")).select("p_partkey")
    val q95 = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(red), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sq"))
    val tot = q95.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("sq")).as("tq"))
    q95.join(tot, col("l_partkey") === col("t_partkey"))
      .filter(col("sq") * 2 > col("tq"))
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name")).distinct()
      .orderBy(col("s_suppkey"))
  }

  /** Q21-style waiting-on-one-supplier analysis (adapted: no
    * commit/receipt dates, so the culprit is the SOLE supplier whose
    * shipment was the last on a multi-supplier completed order).
    * 100 TB notes: everything keys on l_orderkey until the final
    * tiny supplier-keyed count — the fact-fact join, the per-order
    * stats, and the at-max re-probe all reuse one hash partitioning;
    * supplier names broadcast at the end. Timestamp equality against
    * the per-order max is exact.
    */
  def q21WaitingCulprit(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === "F").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val stats = lo.groupBy(col("l_orderkey").as("ok"))
      .agg(max(col("l_shipdate")).as("mx"),
           countDistinct(col("l_suppkey")).as("ns"))
    val atMax = lo.join(stats, col("l_orderkey") === col("ok"))
      .filter(col("l_shipdate") === col("mx"))
      .groupBy(col("l_orderkey"), col("ns"))
      .agg(countDistinct(col("l_suppkey")).as("nmax"),
           min(col("l_suppkey")).as("culprit"))
    atMax.filter(col("ns") > 1 && col("nmax") === 1)
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select("s_suppkey", "s_name")),
        col("culprit") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }
}
