package graft

import graft.operators.{Relational, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that decide 100 TB behavior —
  * filters reaching the parquet scan, column pruning, dimension
  * broadcasts, top-k as TakeOrderedAndProject — asserted on explain
  * output so a regression shows up as a test failure, not as a 10×
  * bench slowdown three rounds later.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // maxMetadataStringLength default (100) truncates longer PushedFilters
  // lists to "…", which would hide a filter from the assertions below
  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try df.queryExecution.executedPlan.toString
    finally spark.conf.unset("spark.sql.maxMetadataStringLength")
  }

  test("q1 scan prunes lineitem to the referenced columns") {
    val plan = planOf(Relational.q1Agg(spark, TestSpark.sf))
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_partkey"),
      s"unexpected columns in $readSchema")
  }

  test("q3 predicates push down to both fact scans") {
    val plan = planOf(Relational.q3TopkJoin(spark, TestSpark.sf))
    assert(plan.contains("PushedFilters"))
    assert("PushedFilters: \\[[^\\]]*GreaterThan\\(l_shipdate".r.findFirstIn(plan).isDefined,
      "l_shipdate filter not pushed to parquet")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(c_mktsegment,BUILDING".r
      .findFirstIn(plan).isDefined, "c_mktsegment filter not pushed")
  }

  test("q3 top-k is TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Relational.q3TopkJoin(spark, TestSpark.sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q6 pushes all three predicates to the lineitem scan and prunes columns") {
    val plan = planOf(Relational.q6Revenue(spark, TestSpark.sf))
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate".r
      .findFirstIn(plan).isDefined, "shipdate bound not pushed")
    assert("PushedFilters: \\[[^\\]]*LessThan\\(l_quantity".r
      .findFirstIn(plan).isDefined, "quantity bound not pushed")
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
  }

  test("q18 filters on the aggregate before joining and takes top-100 without a global sort") {
    val plan = planOf(Relational.q18BigOrders(spark, TestSpark.sf))
    assert(plan.contains("TakeOrderedAndProject"))
    // the HAVING runs between the aggregate and the orders join: a
    // Filter on sum_qty must appear (post-agg), not a filter-free
    // join of the full aggregate
    assert("Filter [^\\n]*sum_qty".r.findFirstIn(plan).isDefined ||
      plan.contains("(sum_qty"), "sum_qty HAVING filter missing")
  }

  test("q19 extracts the quantity conjunct to the lineitem scan") {
    val plan = planOf(Relational.q19DiscountRevenue(spark, TestSpark.sf))
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_quantity".r
      .findFirstIn(plan).isDefined, "quantity lower bound not pushed")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), "part side not broadcast")
  }

  test("q5 broadcasts the dimension side of every star join") {
    val plan = planOf(Relational.q5MultiJoin(spark, TestSpark.sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts")
    assert(!plan.contains("SortMergeJoin"),
      "star joins must not shuffle the fact table against dimensions")
  }

  test("cypher WHERE predicates reach the node-table scan") {
    val df = cypher.CypherQueries.matchFilter(spark, TestSpark.sf)
    val plan = planOf(df)
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(c_mktsegment,BUILDING".r
      .findFirstIn(plan).isDefined,
      "cypher property predicate did not push to parquet scan")
  }

  test("cypher temporal WHERE pushes a timestamp filter to the scan") {
    // datetime('…') must constant-fold so the instant comparison
    // reaches parquet as GreaterThanOrEqual(ts, …) — the row-group
    // pruning that makes time-bounded queries cheap at 100 TB
    val df = cypher.CypherQueries.temporal(spark, TestSpark.sf)
    val plan = planOf(df)
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts".r
      .findFirstIn(plan).isDefined,
      "temporal predicate did not push to parquet scan")
  }

  test("cypher ORDER BY + LIMIT compiles to TakeOrderedAndProject") {
    val plan = planOf(cypher.CypherQueries.orderLimit(spark, TestSpark.sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("cypher string predicates push to the parquet scan") {
    val plan = planOf(cypher.CypherQueries.stringPred(spark, TestSpark.sf))
    assert("PushedFilters: \\[[^\\]]*StringStartsWith\\(c_name,Customer#000000".r
      .findFirstIn(plan).isDefined, "STARTS WITH did not push to parquet")
    assert("StringContains\\(c_mktsegment,ING".r.findFirstIn(plan).isDefined,
      "CONTAINS did not push to parquet")
    assert("StringEndsWith\\(c_name,1".r.findFirstIn(plan).isDefined,
      "ENDS WITH did not push to parquet")
  }

  test("identity-only pattern endpoints elide their node-table scans") {
    // `(a)-[:IN_REGION]->(b)` returning only ids: the single scan is
    // the nation table the edges derive from — neither label-less
    // endpoint may pull in the 6-table node union
    val scan = "Scan parquet".r
    val p1 = planOf(cypher.CypherQueries.untypedScan(spark, TestSpark.sf))
    assert(scan.findAllIn(p1).size == 1, s"expected 1 scan:\n$p1")
    // (typeOf's scan count — elision + schema pruning combined — is
    // pinned in the schema-pruning test below)
    // a property access on the endpoint still forces the scan
    val p3 = planOf(cypher.CypherPlanner.run(spark,
      graph.GraphLoader.tpch(spark, TestSpark.sf),
      "MATCH (n:Nation)-[:IN_REGION]->(x) RETURN x.name AS rn ORDER BY rn"))
    assert("Scan parquet".r.findAllIn(p3).size > 1, s"x scan missing:\n$p3")
  }

  test("type-less relationship unions prune to schema-compatible types") {
    // `(n:Nation)-[r]->(x)`: only IN_REGION and NEXT_IN_REGION start
    // at a Nation, so the plan is nation + those two edge sources —
    // the order/customer/supplier/lineitem edge tables never appear
    val p = planOf(cypher.CypherQueries.typeOf(spark, TestSpark.sf))
    val n = "Scan parquet".r.findAllIn(p).size
    assert(n == 3, s"expected 3 scans (nation + 2 compatible edge tables), got $n:\n$p")
  }

  test("similarity queries broadcast the query side") {
    val plan = planOf(Similarity.topkBruteforce(spark, TestSpark.sf))
    assert(plan.contains("Broadcast"), "query vectors should broadcast")
  }

  test("dot product is the codegen'd expression, not interpreted HOFs") {
    val plan = planOf(Similarity.topkBruteforce(spark, TestSpark.sf))
    assert(plan.contains("dotproduct") || plan.contains("DotProduct"),
      s"expected DotProduct expression in plan")
  }

  test("rel-property query prunes lineitem to the used edge columns") {
    val plan = planOf(cypher.CypherQueries.relProps(spark, TestSpark.sf))
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).mkString("\n")
    // query touches qty but never price — pruning must flow through
    // the CONTAINS edge projection into the lineitem scan
    assert(readSchemas.contains("l_quantity"))
    assert(!readSchemas.contains("l_extendedprice"),
      s"unused edge property survived into the scan: $readSchemas")
  }

  test("corpus stats: only the exact-distinct count pays a keyed shuffle") {
    val plan = planOf(operators.Pipeline.corpusStats(spark, TestSpark.sf))
    val keyed = "hashpartitioning\\(([a-z0-9_()# ]+)".r.findAllIn(plan).toList
    // COUNT(DISTINCT md5) legitimately hash-partitions its 16-byte
    // hashes; the quality/token totals must stay map-side combined
    assert(keyed.size == 1, s"expected exactly one keyed exchange, got $keyed")
    assert(keyed.head.contains("md5"), s"unexpected keyed exchange: $keyed")
  }

  test("write-batch derivation has no single-partition funnel") {
    val plan = planOf(neo4j.CypherPayload.writeBatches(spark, TestSpark.sf))
    // the old global row_number() window forced every row through ONE
    // task (Exchange SinglePartition); key-range batching must keep
    // the plan fully parallel
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in write-batch plan")
    // the rowCap sub-split window is allowed ONLY partitioned by the
    // range id (thousands of concurrent ranges) — never global
    // (__tx_range is the shared CypherPayload.txBatch spelling)
    assert("windowspecdefinition\\(__tx_range".r.findFirstIn(plan).isDefined,
      "rowCap window must partition by the range id")
  }

  test("salted aggregation plans two partial phases, no hot-key funnel") {
    val plan = planOf(operators.Skew.saltedAgg(spark, TestSpark.sf))
    // phase 1 keys on (key, salt); phase 2 on key alone — both present
    assert("hashpartitioning\\([^\\n]*__salt".r.findFirstIn(plan).isDefined,
      "salted partial-aggregate exchange missing")
    assert(!plan.contains("SinglePartition"))
  }

  test("embedding near-dup blocks on LSH buckets, not a low-cardinality key") {
    val plan = planOf(operators.Similarity.embCosineDup(spark, TestSpark.sf))
    assert(plan.contains("bucket") || plan.contains("probe"),
      "bucket join missing from near-dup plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      "near-dup must never plan a cartesian product")
  }

  test("minhash banding join carries only ids and hashes, never text") {
    val plan = planOf(operators.Dedup.minhashLsh(spark, TestSpark.sf))
    // the candidate self-join happens above the signature map; the
    // text column must not appear in any exchange
    val exchanges = "Exchange [^\\n]*".r.findAllIn(plan).mkString("\n")
    assert(!exchanges.contains("text"), s"text column in a shuffle: $exchanges")
  }

  test("substring-dup exchanges carry selected grams, never documents") {
    val plan = planOf(operators.Dedup.substringDup(spark, TestSpark.sf))
    val exchanges = "Exchange [^\\n]*".r.findAllIn(plan).mkString("\n")
    assert(!exchanges.contains("text"), s"text column in a shuffle: $exchanges")
  }

  test("incremental dedup band join never shuffles text") {
    val plan = planOf(operators.Dedup.incrementalDedup(spark, TestSpark.sf))
    val exchanges = "Exchange [^\\n]*".r.findAllIn(plan).mkString("\n")
    assert(!exchanges.contains("text"), s"text column in a shuffle: $exchanges")
  }

  test("neighbor similarity pairs through the part side, no nested loop") {
    val plan = planOf(graph.Algorithms.neighborSimQuery(spark, TestSpark.sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"neighbor sim must stay an equi-join:\n$plan")
  }

  test("kmeans assignment is a broadcast map over the corpus, no keyed shuffle") {
    // Lloyd iterations are checkpointed away; the final plan is the
    // last assignment — a broadcast nested-loop against the one-row
    // centroid frame plus the presentation sort. A hashpartitioning
    // exchange here would mean the corpus shuffles per iteration.
    val plan = planOf(Similarity.kmeans(spark, TestSpark.sf))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "centroids must broadcast to the corpus")
    assert(!"Exchange hashpartitioning".r.findFirstIn(plan).isDefined,
      "kmeans assignment must not hash-shuffle the corpus")
  }

  test("sample_split is a pure map: no exchange except the presentation sort") {
    val plan = planOf(operators.Pipeline.trainSplit(spark, TestSpark.sf))
    assert(!plan.contains("Exchange hashpartitioning"),
      "split assignment must not shuffle")
    assert(!plan.contains("HashAggregate"),
      "split assignment must not aggregate")
  }

  test("pack chunks shuffles once on the shard key; windows stay per-shard") {
    val plan = planOf(operators.Pipeline.packChunks(spark, TestSpark.sf))
    val hashEx = "Exchange hashpartitioning\\(shard".r.findAllIn(plan).size
    assert(hashEx >= 1, s"expected a shard-keyed exchange:\n$plan")
    // no single-partition funnel: a global window would show
    // SinglePartition under Exchange
    assert(!plan.contains("Exchange SinglePartition"),
      "packing must not funnel through one partition")
  }

  test("top-k aggregate plans partial aggregation, no window sort") {
    val plan = planOf(operators.Relational.windowTopnAgg(spark, TestSpark.sf))
    assert(!plan.contains("Window"),
      s"aggregate top-k must not plan a window:\n$plan")
    // two-phase: partial_topkaggregate on the map side, merge after
    // the exchange — the property that bounds the shuffle at scale
    assert("partial_topkaggregate".r.findFirstIn(plan.toLowerCase).isDefined,
      s"expected a partial top-k aggregate phase:\n$plan")
  }

  test("as-of join is a keyed window, not a join") {
    val plan = planOf(operators.Events.asofJoin(spark, TestSpark.sf))
    // the union-tag spelling must plan ZERO join operators — the
    // point-in-time pick is a running `last` over per-user sorted runs
    assert(!plan.contains("Join"), s"asof join must not plan a join:\n$plan")
    assert(plan.contains("Window"), "expected the running-last window")
    assert("Exchange hashpartitioning\\(user_id".r.findFirstIn(plan).isDefined,
      "expected the user-keyed exchange")
  }

  test("range join is a banded equi-join, no nested loop") {
    val plan = planOf(operators.Events.rangeJoin(spark, TestSpark.sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded range join must stay an equi-join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      "expected a hash-keyed equi-join on (user_id, bucket)")
  }

  test("salted join keys on (user_id, salt) without broadcasting the replicated dim") {
    val plan = planOf(operators.Skew.saltedJoinQuery(spark, TestSpark.sf))
    assert(!plan.contains("BroadcastHashJoin"),
      "replicated dim must not broadcast — that would defeat the salting")
    assert(plan.contains("__salt"), "join must key on the salt column")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      "expected a shuffled join on the composite key")
  }

  test("q7 broadcasts both nation maps; only the fact-fact join shuffles") {
    val plan = planOf(Relational.q7NationTrade(spark, TestSpark.sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 2, s"supplier/customer maps must broadcast, got $broadcasts")
    // ship-date window reaches the lineitem scan
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined,
      "ship-date window not pushed to the lineitem scan")
  }

  test("q10 prunes both facts at the scan and takes top-20 without a global sort") {
    val plan = planOf(Relational.q10ReturnedItems(spark, TestSpark.sf))
    assert(plan.contains("TakeOrderedAndProject"), "top-20 must be TakeOrdered")
    assert("PushedFilters: \\[[^\\]]*l_returnflag".r.findFirstIn(plan).isDefined,
      "return-flag filter not pushed to the lineitem scan")
    assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(plan).isDefined,
      "order-date window not pushed to the orders scan")
  }

  test("q8 broadcasts part/supplier/customer maps; one fact-fact exchange") {
    val plan = planOf(Relational.q8MarketShare(spark, TestSpark.sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3,
      s"part, supplier and region-filtered customer must broadcast, got $broadcasts")
    assert("PushedFilters: \\[[^\\]]*p_type".r.findFirstIn(plan).isDefined,
      "part-type filter not pushed to the part scan")
    val factJoins = ("SortMergeJoin".r.findAllIn(plan).size
      + "ShuffledHashJoin".r.findAllIn(plan).size)
    assert(factJoins <= 1, s"only lineitem×orders may shuffle, got $factJoins")
  }

  test("q17 joins the per-part moments back on one partkey partitioning") {
    val plan = planOf(Relational.q17SmallQtyRevenue(spark, TestSpark.sf))
    assert("PushedFilters: \\[[^\\]]*p_brand".r.findFirstIn(plan).isDefined,
      "brand filter not pushed to the part scan")
    // part filter broadcasts; the moments join is the only shuffled join
    assert("BroadcastHashJoin".r.findAllIn(plan).nonEmpty,
      "brand/size part filter must broadcast")
    val shuffled = ("SortMergeJoin".r.findAllIn(plan).size
      + "ShuffledHashJoin".r.findAllIn(plan).size)
    assert(shuffled <= 1, s"only the moments join may shuffle, got $shuffled")
  }

  test("q22 anti-joins date-pruned orders and broadcasts the balance stats") {
    val plan = planOf(Relational.q22DormantCustomers(spark, TestSpark.sf))
    assert(plan.contains("LeftAnti"), "dormancy must be a left anti join")
    assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(plan).isDefined,
      "recency window not pushed to the orders scan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      "BroadcastExchange".r.findAllIn(plan).nonEmpty,
      "the 1-row balance stats must broadcast")
  }

  test("q2 argmin is a partial aggregate, not a window sort") {
    val plan = planOf(Relational.q2MinBalSupplier(spark, TestSpark.sf))
    assert(!plan.contains("Window"),
      "per-part argmin must be min(struct(..)), not a row_number window")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "filtered part and region-filtered supplier must broadcast")
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"),
      "expected a mergeable aggregate for the argmin")
  }

  test("q21 keeps every exchange on l_orderkey until the final supplier count") {
    val plan = planOf(Relational.q21WaitingCulprit(spark, TestSpark.sf))
    assert("PushedFilters: \\[[^\\]]*o_orderstatus".r.findFirstIn(plan).isDefined,
      "status filter not pushed to the orders scan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), "no nested-loop joins allowed")
  }

  test("q13 pre-filters orders before the left join and keeps the count small-domain") {
    val plan = planOf(Relational.q13CustDist(spark, TestSpark.sf))
    assert("PushedFilters: \\[[^\\]]*o_orderpriority".r.findFirstIn(plan).isDefined,
      "priority filter not pushed to the orders scan")
    assert(plan.contains("LeftOuter") || plan.contains("left_outer"),
      "zero-order customers must survive: expected a left outer join")
  }

  test("phash exchange carries only 8-byte fingerprints, never text") {
    val plan = planOf(operators.Multimodal.phashDup(spark, TestSpark.sf))
    val exchanges = "Exchange hashpartitioning\\([^\\n]*".r.findAllIn(plan).toList
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(e => !e.contains("text")),
      s"document text must not ride the phash exchange: $exchanges")
  }

  test("recall eval broadcasts the k-by-queries ANN side") {
    val plan = planOf(Similarity.recallEval(spark, TestSpark.sf))
    assert(plan.contains("BroadcastHashJoin"),
      "the ANN top-k side must broadcast into the exact side")
  }

  test("centroid outlier screen broadcasts the centroid table") {
    val plan = planOf(Similarity.centroidOutliers(spark, TestSpark.sf))
    assert(plan.contains("BroadcastHashJoin"),
      "the labels-by-dims centroid table must broadcast")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("engine-side MERGE plans no cartesian and an anti-join dedup") {
    val plan = planOf(cypher.CypherQueries.mergeRel(spark, TestSpark.sf))
    assert(plan.contains("LeftAnti"), "MERGE dedup must be an anti-join")
    assert(!plan.contains("CartesianProduct"),
      "the post-write read must not plan a cartesian")
  }

  test("cluster artifact memoizes: consumers reuse one materialized frame") {
    val a = operators.Dedup.clusterArtifact(spark, TestSpark.sf)
    val b = operators.Dedup.clusterArtifact(spark, TestSpark.sf)
    assert(a eq b, "repeated artifact calls must return the memoized frame")
    // the artifact is a materialized checkpoint: scan-shaped, no joins
    assert(!a.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("CEP negation plans one user-keyed exchange, no self-join") {
    val plan = planOf(operators.Events.cepNegation(spark, TestSpark.sf))
    assert(!plan.contains("Join"),
      "absence matching must be window state, never a self-join")
    assert("Exchange hashpartitioning\\(user_id".r.findFirstIn(plan).isDefined,
      "expected the single user-keyed exchange")
  }

  test("paragraph dedup: only segment hashes ride the dedup exchange") {
    val plan = planOf(operators.Dedup.paragraphDedup(spark, TestSpark.sf))
    // the first-occurrence window partitions on the md5 hash column,
    // and neither raw text nor segment strings ride that exchange
    val hashEx = "Exchange hashpartitioning\\(h#[^\\n]*".r.findAllIn(plan).toList
    assert(hashEx.nonEmpty, "expected the md5-keyed dedup exchange")
    assert(hashEx.forall(e => !e.contains("text") && !e.contains("seg#") &&
      !e.contains("segs")),
      s"segment text must not ride the dedup exchange: $hashEx")
    // drop decisions broadcast back onto the doc scan
    assert(plan.contains("BroadcastHashJoin"),
      "doc-cardinality drop lists must broadcast back")
  }

  test("bpe encode: the rewrite chain adds no exchange over the doc scan") {
    val df = operators.TextAnalysis.bpeEncode(spark, TestSpark.sf, rounds = 2)
    val plan = planOf(df)
    // every per-round rule joins as a broadcast 1-row frame; the only
    // sort/exchange allowed is the final ORDER BY doc_id
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "rule application must never shuffle the documents")
    val exchanges = "Exchange (hash|range)partitioning[^\\n]*".r
      .findAllIn(plan).toList
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"only the output ordering may exchange, got: $exchanges")
  }

  test("louvain2 contraction keeps phase-2 exchanges community-keyed") {
    val plan = planOf(graph.Algorithms.louvain2Query(spark, TestSpark.sf))
    // no cartesian anywhere; the only nested-loop joins are the
    // broadcast 1-row m cross joins (the repo-wide scalar pattern)
    assert(!plan.contains("CartesianProduct"),
      "louvain gain ranking must stay keyed, never all-pairs")
    val bnl = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(plan).toList
    assert(bnl.forall(_.contains("Cross")),
      s"only 1-row broadcast cross joins allowed, got: $bnl")
  }

  test("no declared query plans a CartesianProduct") {
    // the one all-pairs operator shape that cannot survive scale; a
    // broadcast 1-row cross join (the scalar pattern) plans as
    // BroadcastNestedLoopJoin and is allowed — an actual
    // CartesianProduct (both sides partitioned) is not
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, TestSpark.sf).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) Some(name) else None
        } catch { case _: Throwable => None } // plannability is ContractSpec's pin
    }
    assert(offenders.isEmpty,
      s"queries planning a CartesianProduct: ${offenders.mkString(", ")}")
  }

  test("no declared query plans an unpartitioned window over a corpus-scale frame") {
    // an empty-partition-spec WindowExec is a SINGLE-PARTITION sort —
    // the other operator shape (besides CartesianProduct) that cannot
    // survive 100×. Allowed only over provably collapsed frames: every
    // allowlisted query below must funnel the window's input through
    // an aggregation onto a bounded domain (histogram, top-m, score
    // buckets) before the window runs. Everything else must partition
    // its windows (or use HistogramNtile's broadcast-rank plan).
    val allow: Map[String, String] = Map(
      // HistogramNtile's rank-range cumsum over the (≤ buckets)-row
      // score histogram — the input is an Aggregate onto the bucket id
      "events_rfm" -> "histogram cumsum over an aggregated bucket domain",
      // the budget cumsum over the integer-score histogram (tens of
      // rows) — input is the groupBy(score) Aggregate
      "pipeline_budget_select" -> "cumsum over the bounded score histogram",
      // rank over the k=50 survivors of a TakeOrdered — input is a
      // GlobalLimit
      "sample_weighted" -> "rank over the k-row TakeOrdered survivors",
      // rank over the top-m=100 token frame — input is a GlobalLimit
      "text_zipf" -> "rank over the top-m TakeOrdered frame",
      // landmark ordinal over the distinct-lm aggregate (k ≤ 50 rows)
      "graph_centrality_tuning" ->
        "landmark rank over the distinct-lm aggregate")
    // the optimized LOGICAL plan, not executedPlan: AQE wraps the
    // physical tree in AdaptiveSparkPlanExec whose children collect()
    // cannot see
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
      GlobalLimit, Window => LWindow, WindowGroupLimit}
    def bareWindows(name: String) = try {
      SparkEntry.queries(name)(spark, TestSpark.sf)
        .queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w.child
          case w: WindowGroupLimit if w.partitionSpec.isEmpty => w.child
        }
    } catch { case _: Throwable => Nil } // plannability is ContractSpec's pin
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(allow.contains).filter(bareWindows(_).nonEmpty)
    assert(offenders.isEmpty,
      s"queries planning an unpartitioned window: ${offenders.mkString(", ")}")
    // the allowlist is VERIFIED, not trusted: every allowlisted bare
    // window's input must prove its collapse — an Aggregate (bounded
    // domain), a GlobalLimit (top-k), or a LogicalRDD leaf (a frame
    // deliberately materialized through Frames.leaf, which in this
    // codebase only happens where an operator has already COUNTED the
    // frame and size-adaptively chose the plain-window spelling for
    // it — HistogramNtile.withNtileAdaptive)
    import org.apache.spark.sql.execution.LogicalRDD
    allow.keys.foreach { name =>
      val children = bareWindows(name)
      assert(children.nonEmpty, s"$name: stale allowlist entry, drop it")
      children.foreach { c =>
        val collapsed = c.collectFirst {
          case a: Aggregate => a
          case l: GlobalLimit => l
          case l: LogicalRDD => l
        }.isDefined
        assert(collapsed,
          s"$name: bare window input is not provably collapsed:\n$c")
      }
    }
  }

  test("IVF cell assignment is a pure map: no vec_id-partitioned window") {
    // the coarse-quantizer assignment must be ivfCellRanking's in-row
    // argmin (broadcast one-row centroid array + array_sort), never a
    // corpus-cardinality row_number() OVER (PARTITION BY vec_id) after
    // a corpus × |cells| explode — that shape shuffles |cells| rows
    // per vector through a window sort where a map suffices. The only
    // windows allowed are the per-QUERY top-k rankings (q_id-keyed).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    Seq("sim_ann_ivf", "sim_ivf_tuning").foreach { name =>
      val vecIdWindows = SparkEntry.queries(name)(spark, TestSpark.sf)
        .queryExecution.optimizedPlan.collect {
          case w: LWindow
              if w.partitionSpec.exists(_.references.exists(_.name == "vec_id")) => w
        }
      assert(vecIdWindows.isEmpty,
        s"$name: cell assignment must not window over vec_id")
    }
  }

  test("temporal map-constructor bounds push to the events scan") {
    val plan = planOf(cypher.CypherQueries.temporalCtor(spark, TestSpark.sf))
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts".r
      .findFirstIn(plan).isDefined,
      s"make_timestamp bound did not fold into a pushable filter")
  }

  test("pre-bound var-length starts seed the first expansion step") {
    // the r14 var-expand seed: a bound start set must semi-join the
    // first step's edge base, so the expansion never materializes
    // walks the final start join would discard (30.9 -> 5.3 s at sf1
    // on the undirected CONTAINS 2-hop). A LeftSemi in the optimized
    // plan is the signature; without the seed none exists.
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val semis = cypher.CypherQueries.varRelList(spark, TestSpark.sf)
      .queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftSemi => j
      }
    assert(semis.nonEmpty,
      "seeded var-length expansion lost its start semi-join")
  }
}
