package graft.graph

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds the TPC-H property graph (SURVEY §3) from the testdata
  * parquet, mirroring the kind of graph the reference would read out
  * of Neo4j (README read example: `MATCH (n:User) RETURN id(n),
  * n.name, n.born`).
  *
  * Global node ids are label-offset + natural key, so edge lists can
  * be unioned across labels without collision. Everything is a lazy
  * view over the parquet scans: loading the graph costs nothing until
  * a query selects from it, and column pruning flows through.
  */
object GraphLoader {

  val OrderOffset    = 1000000000L
  val CustomerOffset = 2000000000L
  val NationOffset   = 3000000000L
  val RegionOffset   = 4000000000L
  val SupplierOffset = 5000000000L
  val PartOffset     = 6000000000L
  val EventOffset    = 7000000000L
  val UserOffset     = 8000000000L

  // memoized per (session, dir): the graph is a bundle of lazy
  // DataFrames (nothing persisted), but building it re-derives 14
  // scans plus windowed edge tables on every Cypher query — pure
  // plan-construction overhead at the bench's one-query-per-call
  // cadence.
  private val cache =
    new graft.Artifacts.Cache[(SparkSession, String), PropertyGraph](256)

  def tpch(spark: SparkSession, sfDir: String): PropertyGraph =
    cache.getOrCompute((spark, sfDir), spark) { build(spark, sfDir) }

  private val eventsCache =
    new graft.Artifacts.Cache[(SparkSession, String), PropertyGraph](256)

  /** The events property graph — (:User)-[:PERFORMED]->(:Event) over
    * events.parquet, KEPT SEPARATE from [[tpch]] so untyped scans /
    * labels() / whole-graph algorithms over the TPC-H graph are
    * unaffected. This is the temporal-query surface: Event carries a
    * real timestamp property (`ts`), the shape a user ports
    * time-bounded Cypher against.
    */
  def events(spark: SparkSession, sfDir: String): PropertyGraph =
    eventsCache.getOrCompute((spark, sfDir), spark) { buildEvents(spark, sfDir) }

  private def buildEvents(spark: SparkSession, sfDir: String): PropertyGraph = {
    val ev = Tables.events(spark, sfDir)
    val event = ev.select(
      (lit(EventOffset) + col("event_id")).as("__id"),
      col("event_id").as("eventId"), col("user_id").cast("long").as("userId"),
      col("ts"), col("event_type").as("eventType"), col("value"))
    val user = ev.select(col("user_id").cast("long").as("userId")).distinct()
      .select((lit(UserOffset) + col("userId")).as("__id"), col("userId"))
    val performed = ev.select(
      (lit(UserOffset) + col("user_id").cast("long")).as("__src"),
      (lit(EventOffset) + col("event_id")).as("__dst"))
    PropertyGraph(
      nodes = Map("Event" -> event, "User" -> user),
      rels = Map("PERFORMED" -> performed),
      relEndpoints = Map("PERFORMED" -> ("User", "Event")))
  }

  private def build(spark: SparkSession, sfDir: String): PropertyGraph = {
    def id(offset: Long, key: String) = (lit(offset) + col(key).cast("long")).as("__id")

    val customer = Tables.customer(spark, sfDir).select(
      id(CustomerOffset, "c_custkey"),
      col("c_custkey").as("custkey"), col("c_name").as("name"),
      col("c_nationkey").cast("long").as("nationkey"),
      col("c_acctbal").as("acctbal"), col("c_mktsegment").as("mktsegment"))

    val nation = Tables.nation(spark, sfDir).select(
      id(NationOffset, "n_nationkey"),
      col("n_nationkey").cast("long").as("nationkey"),
      col("n_name").as("name"), col("n_regionkey").cast("long").as("regionkey"))

    val region = Tables.region(spark, sfDir).select(
      id(RegionOffset, "r_regionkey"),
      col("r_regionkey").cast("long").as("regionkey"), col("r_name").as("name"))

    val order = Tables.orders(spark, sfDir).select(
      id(OrderOffset, "o_orderkey"),
      col("o_orderkey").as("orderkey"), col("o_custkey").as("custkey"),
      col("o_orderstatus").as("orderstatus"), col("o_totalprice").as("totalprice"),
      col("o_orderdate").as("orderdate"), col("o_orderpriority").as("orderpriority"))

    val supplier = Tables.supplier(spark, sfDir).select(
      id(SupplierOffset, "s_suppkey"),
      col("s_suppkey").as("suppkey"), col("s_name").as("name"),
      col("s_nationkey").cast("long").as("nationkey"), col("s_acctbal").as("acctbal"))

    val part = Tables.part(spark, sfDir).select(
      id(PartOffset, "p_partkey"),
      col("p_partkey").as("partkey"), col("p_name").as("name"),
      col("p_brand").as("brand"), col("p_type").as("type"),
      col("p_size").cast("long").as("size"), col("p_retailprice").as("retailprice"))

    def edge(df: DataFrame, srcOffset: Long, srcKey: String,
        dstOffset: Long, dstKey: String): DataFrame =
      df.select(
        (lit(srcOffset) + col(srcKey).cast("long")).as("__src"),
        (lit(dstOffset) + col(dstKey).cast("long")).as("__dst"))

    val placedBy = edge(Tables.orders(spark, sfDir),
      OrderOffset, "o_orderkey", CustomerOffset, "o_custkey")
    val fromNation = edge(Tables.customer(spark, sfDir),
      CustomerOffset, "c_custkey", NationOffset, "c_nationkey")
    val suppNation = edge(Tables.supplier(spark, sfDir),
      SupplierOffset, "s_suppkey", NationOffset, "s_nationkey")
    val inRegion = edge(Tables.nation(spark, sfDir),
      NationOffset, "n_nationkey", RegionOffset, "n_regionkey")
    // chain relationship (nation → next nation in the same region, by
    // key order): gives the graph genuinely recursive structure for
    // variable-length path queries
    val nextW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
    val nextInRegion = Tables.nation(spark, sfDir)
      .withColumn("nxt", org.apache.spark.sql.functions.lead(col("n_nationkey"), 1).over(nextW))
      .filter(col("nxt").isNotNull)
      .select(
        (lit(NationOffset) + col("n_nationkey").cast("long")).as("__src"),
        (lit(NationOffset) + col("nxt").cast("long")).as("__dst"))

    val supplies = Tables.lineitem(spark, sfDir)
      .select(
        (lit(SupplierOffset) + col("l_suppkey")).as("__src"),
        (lit(PartOffset) + col("l_partkey")).as("__dst"))
      .distinct()
    // relationship WITH properties (SURVEY §3: (:Order)-[:CONTAINS
    // {qty, price}]->(:Part)) — one edge per lineitem, properties ride
    // on the edge like Neo4j relationship properties
    val contains = Tables.lineitem(spark, sfDir)
      .select(
        (lit(OrderOffset) + col("l_orderkey")).as("__src"),
        (lit(PartOffset) + col("l_partkey")).as("__dst"),
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("price"))

    PropertyGraph(
      nodes = Map(
        "Customer" -> customer, "Nation" -> nation, "Region" -> region,
        "Order" -> order, "Supplier" -> supplier, "Part" -> part),
      rels = Map(
        "PLACED_BY" -> placedBy, "FROM_NATION" -> fromNation,
        "SUPP_NATION" -> suppNation, "IN_REGION" -> inRegion,
        "SUPPLIES" -> supplies, "NEXT_IN_REGION" -> nextInRegion,
        "CONTAINS" -> contains),
      relEndpoints = Map(
        "PLACED_BY" -> ("Order", "Customer"),
        "FROM_NATION" -> ("Customer", "Nation"),
        "SUPP_NATION" -> ("Supplier", "Nation"),
        "IN_REGION" -> ("Nation", "Region"),
        "SUPPLIES" -> ("Supplier", "Part"),
        "NEXT_IN_REGION" -> ("Nation", "Nation"),
        "CONTAINS" -> ("Order", "Part")))
  }
}
