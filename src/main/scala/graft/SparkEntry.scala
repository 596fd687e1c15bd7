package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every implemented operator appears in `queries`; SQL-expressible
  * ones also in `oracleSql` (DuckDB dialect, same column names/order
  * semantics — the driver hash-compares after sorting columns by
  * name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    cypher.CypherQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 Cypher engine / graph
    "cypher_match_scan"     -> (cypher.CypherQueries.matchScan(_, _)),
    "cypher_match_filter"   -> (cypher.CypherQueries.matchFilter(_, _)),
    "cypher_expand"         -> (cypher.CypherQueries.expand(_, _)),
    "cypher_expand_2hop"    -> (cypher.CypherQueries.expand2Hop(_, _)),
    "cypher_aggregate"      -> (cypher.CypherQueries.aggregate(_, _)),
    "cypher_order_limit"    -> (cypher.CypherQueries.orderLimit(_, _)),
    "cypher_optional_match" -> (cypher.CypherQueries.optionalMatch(_, _)),
    "cypher_var_expand"     -> (cypher.CypherQueries.varExpand(_, _)),
    "cypher_quantified_path" -> (cypher.CypherQueries.quantifiedPath(_, _)),
    "cypher_qpp_group"      -> (cypher.CypherQueries.qppGroup(_, _)),
    "cypher_qpp_groupvar"   -> (cypher.CypherQueries.qppGroupVars(_, _)),
    "cypher_qpp_stepfilter" -> (cypher.CypherQueries.qppStepFilter(_, _)),
    "cypher_qpp_zero"       -> (cypher.CypherQueries.qppZero(_, _)),
    "cypher_qpp_multihop"   -> (cypher.CypherQueries.qppMultiHop(_, _)),
    "cypher_qpp_multihop4"  -> (cypher.CypherQueries.qppMultiHop4(_, _)),
    "cypher_qpp_multihop_in" -> (cypher.CypherQueries.qppMultiHopIn(_, _)),
    "cypher_qpp_multihop_untyped" -> (cypher.CypherQueries.qppMultiHopUntyped(_, _)),
    "cypher_qpp_multihop_where" -> (cypher.CypherQueries.qppMultiHopWhere(_, _)),
    "cypher_delete_node"    -> (cypher.CypherQueries.deleteNode(_, _)),
    "cypher_qpp_mh_where_outer" -> (cypher.CypherQueries.qppMultiHopWhereOuter(_, _)),
    "cypher_var_rel_list"   -> (cypher.CypherQueries.varRelList(_, _)),
    "cypher_var_rel_list_in" -> (cypher.CypherQueries.varRelListIn(_, _)),
    "cypher_qpp_rel_groupvar" -> (cypher.CypherQueries.qppRelGroupVar(_, _)),
    "cypher_qpp_where"      -> (cypher.CypherQueries.qppWhere(_, _)),
    "cypher_qpp_where_outer" -> (cypher.CypherQueries.qppWhereOuter(_, _)),
    "cypher_sp_where_outer" -> (cypher.CypherQueries.spWhereOuter(_, _)),
    "cypher_with_agg"       -> (cypher.CypherQueries.withAgg(_, _)),
    "cypher_collect_unwind" -> (cypher.CypherQueries.collectUnwind(_, _)),
    "cypher_multi_match"    -> (cypher.CypherQueries.multiMatch(_, _)),
    "cypher_rel_props"      -> (cypher.CypherQueries.relProps(_, _)),
    "cypher_arithmetic"     -> (cypher.CypherQueries.arithmetic(_, _)),
    "cypher_not_exists"     -> (cypher.CypherQueries.notExists(_, _)),
    "cypher_pattern_pred"   -> (cypher.CypherQueries.patternPred(_, _)),
    "cypher_count_subquery" -> (cypher.CypherQueries.countSubquery(_, _)),
    "cypher_call_topk"      -> (cypher.CypherQueries.callTopk(_, _)),
    "cypher_call_agg_topk"  -> (cypher.CypherQueries.callAggTopk(_, _)),
    "cypher_sub_topk"       -> (cypher.CypherQueries.subTopk(_, _)),
    "cypher_sub_limit_noorder" ->
      (cypher.CypherQueries.subLimitNoOrder(_, _)),
    "cypher_stat_agg"       -> (cypher.CypherQueries.statAgg(_, _)),
    "cypher_unwind_range"   -> (cypher.CypherQueries.unwindRange(_, _)),
    "cypher_list_comp"      -> (cypher.CypherQueries.listComp(_, _)),
    "cypher_with_top"       -> (cypher.CypherQueries.withTop(_, _)),
    "cypher_undirected"     -> (cypher.CypherQueries.undirected(_, _)),
    "cypher_in_list"        -> (cypher.CypherQueries.inList(_, _)),
    "cypher_agg_functions"  -> (cypher.CypherQueries.aggFunctions(_, _)),
    "cypher_string_fns"     -> (cypher.CypherQueries.stringFns(_, _)),
    "cypher_math_fns"       -> (cypher.CypherQueries.mathFns(_, _)),
    "cypher_math_fns2"      -> (cypher.CypherQueries.mathFns2(_, _)),
    "cypher_rel_endpoints"  -> (cypher.CypherQueries.relEndpoints(_, _)),
    "cypher_temporal"       -> (cypher.CypherQueries.temporal(_, _)),
    "cypher_temporal_trunc" -> (cypher.CypherQueries.temporalTrunc(_, _)),
    "cypher_temporal_ctor"  -> (cypher.CypherQueries.temporalCtor(_, _)),
    "cypher_point"          -> (cypher.CypherQueries.pointDistance(_, _)),
    "cypher_point_geo"      -> (cypher.CypherQueries.pointGeoDistance(_, _)),
    "cypher_point_bbox"     -> (cypher.CypherQueries.pointBBox(_, _)),
    "cypher_temporal_types" -> (cypher.CypherQueries.temporalTypes(_, _)),
    "cypher_weighted_path"  -> (cypher.CypherQueries.weightedPath(_, _)),
    "cypher_duration_ctor"  -> (cypher.CypherQueries.durationCtor(_, _)),
    "cypher_catalog"        -> (cypher.CypherQueries.catalog(_, _)),
    "cypher_catalog_keys"   -> (cypher.CypherQueries.catalogKeys(_, _)),
    "cypher_label_disjunction" -> (cypher.CypherQueries.labelDisjunction(_, _)),
    "cypher_label_pred"     -> (cypher.CypherQueries.labelPredicate(_, _)),
    "cypher_element_id"     -> (cypher.CypherQueries.elementIdQ(_, _)),
    "cypher_collect_subquery" -> (cypher.CypherQueries.collectSubquery(_, _)),
    "cypher_path_nodes"     -> (cypher.CypherQueries.pathNodes(_, _)),
    "cypher_path_rels"      -> (cypher.CypherQueries.pathRels(_, _)),
    "cypher_properties"     -> (cypher.CypherQueries.propertiesOf(_, _)),
    "cypher_rel_props_fn"   -> (cypher.CypherQueries.relPropertiesFn(_, _)),
    "cypher_rel_props_union" -> (cypher.CypherQueries.relPropsUnion(_, _)),
    "cypher_map_proj"       -> (cypher.CypherQueries.mapProjection(_, _)),
    "cypher_map_proj_star"  -> (cypher.CypherQueries.mapProjectionStar(_, _)),
    "cypher_list_index"     -> (cypher.CypherQueries.listIndex(_, _)),
    "cypher_temporal_arith" -> (cypher.CypherQueries.temporalArith(_, _)),
    "cypher_temporal_arith2" -> (cypher.CypherQueries.temporalArith2(_, _)),
    "cypher_exists_where"   -> (cypher.CypherQueries.existsWhere(_, _)),
    "cypher_count_where"    -> (cypher.CypherQueries.countWhere(_, _)),
    "cypher_pattern_comp"   -> (cypher.CypherQueries.patternComp(_, _)),
    "cypher_string_fns2"    -> (cypher.CypherQueries.stringFns2(_, _)),
    "cypher_list_pred"      -> (cypher.CypherQueries.listPred(_, _)),
    "cypher_keys"           -> (cypher.CypherQueries.keysOf(_, _)),
    "cypher_return_star"    -> (cypher.CypherQueries.returnStar(_, _)),
    "cypher_simple_case"    -> (cypher.CypherQueries.simpleCase(_, _)),
    "cypher_multi_type"     -> (cypher.CypherQueries.multiType(_, _)),
    "cypher_skip_limit"     -> (cypher.CypherQueries.skipLimit(_, _)),
    "cypher_count_expr"     -> (cypher.CypherQueries.countExpr(_, _)),
    "cypher_stat_disc"      -> (cypher.CypherQueries.statDisc(_, _)),
    "cypher_with_distinct"  -> (cypher.CypherQueries.withDistinct(_, _)),
    "cypher_collect_distinct" -> (cypher.CypherQueries.collectDistinct(_, _)),
    "cypher_node_return"    -> (cypher.CypherQueries.nodeReturn(_, _)),
    "cypher_whole_node"     -> (cypher.CypherQueries.wholeNode(_, _)),
    "cypher_untyped_scan"   -> (cypher.CypherQueries.untypedScan(_, _)),
    "cypher_untyped_rel"    -> (cypher.CypherQueries.untypedRel(_, _)),
    "cypher_rel_where"      -> (cypher.CypherQueries.relWhere(_, _)),
    "cypher_chain_uniq"     -> (cypher.CypherQueries.chainUniq(_, _)),
    "cypher_distinct_node"  -> (cypher.CypherQueries.distinctNode(_, _)),
    "cypher_string_pred"    -> (cypher.CypherQueries.stringPred(_, _)),
    "cypher_type_of"        -> (cypher.CypherQueries.typeOf(_, _)),
    "cypher_labels"         -> (cypher.CypherQueries.labelCounts(_, _)),
    "cypher_path_len"       -> (cypher.CypherQueries.pathLen(_, _)),
    "cypher_shortest_path"  -> (cypher.CypherQueries.shortestPath(_, _)),
    "cypher_sp_nodes"       -> (cypher.CypherQueries.spNodes(_, _)),
    "cypher_sp_rel_list"    -> (cypher.CypherQueries.spRelList(_, _)),
    "cypher_sp_group_nodes" -> (cypher.CypherQueries.spGroupNodes(_, _)),
    "cypher_inline_where"   -> (cypher.CypherQueries.inlineWhere(_, _)),
    "cypher_gql_shortest"   -> (cypher.CypherQueries.gqlShortest(_, _)),
    "cypher_sp_multihop_group" -> (cypher.CypherQueries.spMultihopGroup(_, _)),
    "cypher_label_expr"     -> (cypher.CypherQueries.labelExpr(_, _)),
    "cypher_weighted_nodes" -> (cypher.CypherQueries.weightedNodes(_, _)),
    "cypher_weighted_groupvar" -> (cypher.CypherQueries.weightedGroupvar(_, _)),
    "cypher_weighted_mh_group" -> (cypher.CypherQueries.weightedMultihopGroup(_, _)),
    "cypher_allsp_mh_group" -> (cypher.CypherQueries.allShortestMultihopGroup(_, _)),
    "cypher_catalog_schema" -> (cypher.CypherQueries.catalogSchema(_, _)),
    "cypher_catalog_rel_schema" -> (cypher.CypherQueries.catalogRelSchema(_, _)),
    "cypher_call_scoped"    -> (cypher.CypherQueries.callScoped(_, _)),
    "cypher_rel_type_neg"   -> (cypher.CypherQueries.relTypeNeg(_, _)),
    "cypher_fn_extras"      -> (cypher.CypherQueries.fnExtras(_, _)),
    "cypher_sp_outer_groupvar" -> (cypher.CypherQueries.spOuterGroupVar(_, _)),
    "cypher_exists_full"    -> (cypher.CypherQueries.existsFull(_, _)),
    "cypher_count_collect_sub" -> (cypher.CypherQueries.countCollectSub(_, _)),
    "cypher_in_list_expr"   -> (cypher.CypherQueries.inListExpr(_, _)),
    "cypher_all_shortest"   -> (cypher.CypherQueries.allShortest(_, _)),
    "cypher_allsp_walks"    -> (cypher.CypherQueries.allShortestWalks(_, _)),
    "cypher_allsp_groupvar" -> (cypher.CypherQueries.allShortestGroupVar(_, _)),
    "cypher_weighted_shortest_k" -> (cypher.CypherQueries.weightedKShortest(_, _)),
    "cypher_shortest_k"     -> (cypher.CypherQueries.kShortest(_, _)),
    "cypher_shortest_k_mh_group" ->
      (cypher.CypherQueries.kShortestMultihopGroup(_, _)),
    "cypher_weighted_allsp" ->
      (cypher.CypherQueries.weightedAllShortest(_, _)),
    "cypher_weighted_allsp_group" ->
      (cypher.CypherQueries.weightedAllShortestGroup(_, _)),
    "cypher_datetime_tz"    -> (cypher.CypherQueries.datetimeTz(_, _)),
    "cypher_datetime_tz_display" ->
      (cypher.CypherQueries.datetimeTzDisplay(_, _)),
    "cypher_datetime_tz_alias" ->
      (cypher.CypherQueries.datetimeTzAlias(_, _)),
    "cypher_case"           -> (cypher.CypherQueries.caseBand(_, _)),
    "cypher_coalesce_agg"   -> (cypher.CypherQueries.coalesceAgg(_, _)),
    "cypher_regex"          -> (cypher.CypherQueries.regexMatch(_, _)),
    "cypher_union"          -> (cypher.CypherQueries.unionNations(_, _)),
    "cypher_write_batches"  -> (neo4j.CypherPayload.writeBatches(_, _)),
    "cypher_write_merge"    -> (neo4j.CypherPayload.mergeBatches(_, _)),
    "cypher_merge_rel"      -> (cypher.CypherQueries.mergeRel(_, _)),
    "cypher_create_rel"     -> (cypher.CypherQueries.createRel(_, _)),
    "cypher_delete_rel"     -> (cypher.CypherQueries.deleteRel(_, _)),
    "cypher_create_node"    -> (cypher.CypherQueries.createNode(_, _)),
    "cypher_set_prop"       -> (cypher.CypherQueries.setProp(_, _)),
    "cypher_merge_on"       -> (cypher.CypherQueries.mergeOn(_, _)),
    "cypher_merge_rel_on"   -> (cypher.CypherQueries.mergeRelOn(_, _)),
    "cypher_remove"         -> (cypher.CypherQueries.removeProp(_, _)),
    "cypher_detach_delete"  -> (cypher.CypherQueries.detachDelete(_, _)),
    "cypher_foreach"        -> (cypher.CypherQueries.foreachWrite(_, _)),
    "cypher_set_map"        -> (cypher.CypherQueries.setMap(_, _)),
    "cypher_set_label"      -> (cypher.CypherQueries.setLabel(_, _)),
    "cypher_multi_label"    -> (cypher.CypherQueries.multiLabel(_, _)),
    "cypher_call_in_tx"     -> (cypher.CypherQueries.callInTx(_, _)),
    "graph_degrees"         -> (graph.Algorithms.degreesQuery(_, _)),
    "graph_degree_dist"     -> (graph.Algorithms.degreeDistQuery(_, _)),
    "graph_connected_components" -> (graph.Algorithms.connectedComponentsQuery(_, _)),
    "graph_pagerank"        -> (graph.Algorithms.pageRankQuery(_, _)),
    "graph_ppr"             -> (graph.Algorithms.pprQuery(_, _)),
    "graph_hits"            -> (graph.Algorithms.hitsQuery(_, _)),
    "graph_bfs"             -> (graph.Algorithms.bfsQuery(_, _)),
    "graph_triangle_count"  -> (graph.Algorithms.triangleCountQuery(_, _)),
    "graph_kcore"           -> (graph.Algorithms.kcoreQuery(_, _)),
    "graph_label_prop"      -> (graph.Algorithms.labelPropQuery(_, _)),
    "graph_label_prop_async" -> (graph.Algorithms.labelPropAsyncQuery(_, _)),
    "graph_ktruss"          -> (graph.Algorithms.ktrussQuery(_, _)),
    "graph_modularity"      -> (graph.Algorithms.modularityQuery(_, _)),
    "graph_louvain"         -> (graph.Algorithms.louvainQuery(_, _)),
    "graph_louvain2"        -> (graph.Algorithms.louvain2Query(_, _)),
    "graph_louvain3"        -> (graph.Algorithms.louvain3Query(_, _)),
    "graph_assortativity"   -> (graph.Algorithms.assortativityQuery(_, _)),
    "graph_eccentricity"    -> (graph.Algorithms.eccentricityQuery(_, _)),
    "graph_component_sizes" -> (graph.Algorithms.componentSizesQuery(_, _)),
    "graph_clustering_coeff" -> (graph.Algorithms.clusteringCoeffQuery(_, _)),
    "graph_sssp_weighted"   -> (graph.Algorithms.ssspQuery(_, _)),
    "graph_allshortest_weighted" -> (graph.Algorithms.waspQuery(_, _)),
    "graph_closeness"       -> (graph.Algorithms.closenessQuery(_, _)),
    "graph_betweenness"     -> (graph.Algorithms.betweennessQuery(_, _)),
    "graph_centrality_tuning" -> (graph.Algorithms.centralityTuningQuery(_, _)),
    "graph_centrality_depth" -> (graph.Algorithms.centralityDepthTuningQuery(_, _)),
    "graph_neighbor_sim"    -> (graph.Algorithms.neighborSimQuery(_, _)),
    "graph_neighbor_sim_approx" -> (graph.Algorithms.neighborSimApproxQuery(_, _)),
    "graph_scc"             -> (graph.Algorithms.sccQuery(_, _)),
    "graph_adamic_adar"     -> (graph.Algorithms.adamicAdarQuery(_, _)),
    "graph_random_walk"     -> (graph.Algorithms.randomWalkQuery(_, _)),
    "graph_biased_walk"     -> (graph.Algorithms.biasedWalkQuery(_, _)),
    "graph_walk_skipgrams"  -> (graph.Algorithms.walkSkipgramsQuery(_, _)),
    // §2.2 relational / events
    "q1_agg"            -> (Relational.q1Agg(_, _)),
    "q3_topk_join"      -> (Relational.q3TopkJoin(_, _)),
    "q5_multi_join"     -> (Relational.q5MultiJoin(_, _)),
    "window_topn"       -> (Relational.windowTopn(_, _)),
    "q_rollup_agg"      -> (Relational.rollupAgg(_, _)),
    "q6_filter_sum"     -> (Relational.q6Revenue(_, _)),
    "q4_priority_exists" -> (Relational.q4OrderPriority(_, _)),
    "q14_promo_share"   -> (Relational.q14PromoShare(_, _)),
    "q18_big_orders"    -> (Relational.q18BigOrders(_, _)),
    "q19_disjunct_join" -> (Relational.q19DiscountRevenue(_, _)),
    "q7_nation_trade"   -> (Relational.q7NationTrade(_, _)),
    "q8_market_share"   -> (Relational.q8MarketShare(_, _)),
    "q9_product_profit" -> (Relational.q9ProductProfit(_, _)),
    "q10_returned_items" -> (Relational.q10ReturnedItems(_, _)),
    "q12_late_priority" -> (Relational.q12LatePriority(_, _)),
    "q13_cust_dist"     -> (Relational.q13CustDist(_, _)),
    "q2_min_bal_supplier" -> (Relational.q2MinBalSupplier(_, _)),
    "q11_important_parts" -> (Relational.q11ImportantParts(_, _)),
    "q15_top_supplier"  -> (Relational.q15TopSupplier(_, _)),
    "q20_dominant_supplier" -> (Relational.q20DominantSupplier(_, _)),
    "q21_waiting_culprit" -> (Relational.q21WaitingCulprit(_, _)),
    "q16_supplier_counts" -> (Relational.q16SupplierCounts(_, _)),
    "q17_small_qty_revenue" -> (Relational.q17SmallQtyRevenue(_, _)),
    "q22_dormant_customers" -> (Relational.q22DormantCustomers(_, _)),
    "window_topn_agg"   -> (Relational.windowTopnAgg(_, _)),
    "copurchase_topk"   -> (Relational.copurchase(_, _)),
    "events_window_agg" -> (Events.windowAgg(_, _)),
    "skew_salted_agg"   -> (Skew.saltedAgg(_, _)),
    "skew_salted_join"  -> (Skew.saltedJoinQuery(_, _)),
    "events_sessionize" -> (Events.sessionize(_, _)),
    "events_sessionize_native" -> (Events.sessionizeNative(_, _)),
    "events_funnel"     -> (Events.funnel(_, _)),
    "events_retention"  -> (Events.retention(_, _)),
    "events_anomaly"    -> (Events.anomaly(_, _)),
    "events_asof_join"  -> (Events.asofJoin(_, _)),
    "events_rolling_avg" -> (Events.rollingAvg(_, _)),
    "pipeline_length_quantiles" -> (Pipeline.lengthQuantiles(_, _)),
    "pipeline_curate"   -> (Pipeline.curate(_, _)),
    "pipeline_quality_funnel" -> (Pipeline.qualityFunnel(_, _)),
    "pipeline_chunk"    -> (Pipeline.chunkDocs(_, _)),
    "events_range_join" -> (Events.rangeJoin(_, _)),
    "events_sequence_detect" -> (Events.sequenceDetect(_, _)),
    "events_cep_negation" -> (Events.cepNegation(_, _)),
    "events_session_paths" -> (Events.sessionPaths(_, _)),
    "events_markov"        -> (Events.markovTransitions(_, _)),
    "events_windowed_topk" -> (Events.windowedTopk(_, _)),
    "events_rfm"        -> (Events.rfm(_, _)),
    "events_attribution" -> (Events.attribution(_, _)),
    // §2.3 LLM pipeline
    "dedup_exact"         -> (Dedup.exact(_, _)),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard(_, _)),
    "dedup_containment"   -> (Dedup.ngramContainment(_, _)),
    "dedup_substring"     -> (Dedup.substringDup(_, _)),
    "dedup_incremental"   -> (Dedup.incrementalDedup(_, _)),
    "dedup_bloom"         -> (Dedup.bloomIncremental(_, _)),
    "dedup_clusters"      -> (Dedup.dedupClusters(_, _)),
    "dedup_cluster_stats" -> (Dedup.clusterStats(_, _)),
    "dedup_source_rates"  -> (Dedup.sourceRates(_, _)),
    "dedup_source_matrix" -> (Dedup.sourceOverlapMatrix(_, _)),
    "pipeline_corpus_stats" -> (Pipeline.corpusStats(_, _)),
    "dedup_minhash_lsh"   -> (Dedup.minhashLsh(_, _)),
    "dedup_lsh_tuning"    -> (Dedup.lshTuningCurve(_, _)),
    "dedup_guard_stats"   -> (Dedup.guardTelemetry(_, _)),
    "sketch_kmv_distinct" -> (Sketches.kmvDistinct(_, _)),
    "sketch_source_overlap" -> (Sketches.kmvOverlap(_, _)),
    "sketch_hll_distinct" -> (Sketches.hllDistinct(_, _)),
    "sketch_cms_topk"     -> (Sketches.cmsTopk(_, _)),
    "dedup_simhash"       -> (Dedup.simhashNearDup(_, _)),
    "dedup_url"           -> (Dedup.urlDedup(_, _)),
    "dedup_paragraph"     -> (Dedup.paragraphDedup(_, _)),
    "dedup_cdc"           -> (Dedup.cdcDedup(_, _)),
    "embed_cosine_dup"    -> (Similarity.embCosineDup(_, _)),
    "sim_topk_bruteforce" -> (Similarity.topkBruteforce(_, _)),
    "sim_topk_agg"        -> (Similarity.topkAgg(_, _)),
    "sim_ann_lsh"         -> (Similarity.annLsh(_, _)),
    "sim_recall_eval"     -> (Similarity.recallEval(_, _)),
    "sim_ann_tuning"      -> (Similarity.annTuning(_, _)),
    "sim_ivf_tuning"      -> (Similarity.ivfTuning(_, _)),
    "sim_dim_recall"      -> (Similarity.dimRecall(_, _)),
    "embed_binary_recall" -> (Similarity.binaryRecall(_, _)),
    "sim_hamming_topk"    -> (Similarity.hammingTopk(_, _)),
    "sim_hamming_tuning"  -> (Similarity.hammingTuning(_, _)),
    "embed_cos_hist"      -> (Similarity.cosHist(_, _)),
    "embed_outliers"      -> (Similarity.centroidOutliers(_, _)),
    "multimodal_frames"   -> (Multimodal.frameIndex(_, _)),
    "sim_label_centroid"  -> (Similarity.labelCentroids(_, _)),
    "sim_ann_ivf"         -> (Similarity.annIvf(_, _)),
    "sim_ann_ivfpq"       -> (Similarity.annIvfPq(_, _)),
    "embed_kmeans"        -> (Similarity.kmeans(_, _)),
    "embed_pq"            -> (Similarity.pq(_, _)),
    "sim_semantic_dedup"  -> (Similarity.semanticDedup(_, _)),
    "embed_dim_stats"     -> (Similarity.dimStats(_, _)),
    "embed_pca_power"     -> (Similarity.pcaPower(_, _)),
    "text_quality"        -> (TextAnalysis.quality(_, _)),
    "text_quality_model"  -> (TextAnalysis.qualityModel(_, _)),
    "text_gopher"         -> (TextAnalysis.gopherRules(_, _)),
    "text_unigram_lm"     -> (TextAnalysis.unigramLogprob(_, _)),
    "text_bigram_lm"      -> (TextAnalysis.bigramLogprob(_, _)),
    "text_zipf"           -> (TextAnalysis.zipfSlope(_, _)),
    "text_langid"         -> (TextAnalysis.langId(_, _)),
    "text_tokens"         -> (TextAnalysis.tokens(_, _)),
    "text_bpe_train"      -> (TextAnalysis.bpeTrain(_, _)),
    "text_bpe_encode"     -> (TextAnalysis.bpeEncode(_, _)),
    "text_fingerprint"    -> (TextAnalysis.fingerprint(_, _)),
    "text_top_tokens"     -> (TextAnalysis.topTokens(_, _)),
    "text_length_hist"    -> (TextAnalysis.lengthHistogram(_, _)),
    "multimodal_meta"     -> (Multimodal.meta(_, _)),
    "multimodal_prep"     -> (Multimodal.prep(_, _)),
    "multimodal_phash"    -> (Multimodal.phashDup(_, _)),
    "multimodal_frame_dedup" -> (Multimodal.frameDedup(_, _)),
    "multimodal_decoded"  -> (Multimodal.decodedMeta(_, _)),
    "sample_stratified"   -> (Pipeline.stratifiedSample(_, _)),
    "contamination_ngram" -> (Pipeline.contamination(_, _)),
    "contamination_embedding" -> (Similarity.contaminationEmbedding(_, _)),
    "text_redact"         -> (TextAnalysis.redact(_, _)),
    "text_domains"        -> (TextAnalysis.domains(_, _)),
    "text_entropy"        -> (TextAnalysis.entropy(_, _)),
    "text_repetition"     -> (TextAnalysis.repetition(_, _)),
    "text_tfidf"          -> (TextAnalysis.tfidf(_, _)),
    "text_novelty"        -> (TextAnalysis.novelty(_, _)),
    "er_fuzzy_names"      -> (Search.fuzzyNames(_, _)),
    "er_name_clusters"    -> (Search.nameClusters(_, _)),
    "text_boilerplate"    -> (TextAnalysis.boilerplate(_, _)),
    "sample_split"        -> (Pipeline.trainSplit(_, _)),
    "sample_weighted"     -> (Pipeline.sampleWeighted(_, _)),
    "pipeline_shuffle"    -> (Pipeline.globalShuffle(_, _)),
    "pipeline_budget_select" -> (Pipeline.budgetSelect(_, _)),
    "sample_importance"   -> (Pipeline.importanceSample(_, _)),
    "events_pivot"        -> (Events.pivotDaily(_, _)),
    "events_value_hist"   -> (Events.valueHistogram(_, _)),
    "events_hopping_window" -> (Events.hoppingWindow(_, _)),
    "embed_quantize_int8" -> (Similarity.quantizeInt8(_, _)),
    "text_ppl_buckets"    -> (TextAnalysis.pplBuckets(_, _)),
    "pipeline_mix"        -> (Pipeline.mixWeights(_, _)),
    "pipeline_pack"       -> ((s, d) => Pipeline.packChunks(s, d, shards = 32)),
    "search_bm25_topk"    -> (Search.bm25TopK(_, _)))

  /** DuckDB oracle SQL per query key (omitted keys → rows-only check).
    * The generated entries (OracleSql) cover operators whose Spark
    * implementation is a JVM loop or an iterative program — they
    * re-derive identical values via the shared OracleHash family.
    */
  /** The Gopher metrics/verdicts SELECT (no ORDER BY) shared by the
    * text_gopher oracle and the pipeline_quality_funnel wrapper.
    */
  private lazy val gopherOracleBase: String = {
      val hits = operators.TextAnalysis.stopwords("en").sorted.take(8)
        .map(w => s"(CASE WHEN regexp_matches(text, '(?i)(^|\\s)$w(\\s|$$)') " +
          "THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CASE WHEN len(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END AS nw,
         |    len(regexp_replace(text, '\\s', '', 'g')) AS non_ws,
         |    len(text) - len(replace(text, '#', '')) AS n_hash,
         |    (len(text) - len(replace(text, '...', ''))) // 3 AS n_ell,
         |    CASE WHEN len(trim(text)) = 0 THEN 0 ELSE
         |      len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |          w -> regexp_matches(w, '[a-z]'))) END AS alpha_words,
         |    $hits AS sh
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
         |    round(CAST(non_ws AS DOUBLE) / greatest(nw, 1), 6) AS mean_word_len,
         |    round(CAST(n_hash + n_ell AS DOUBLE) / greatest(nw, 1), 6) AS symbol_ratio,
         |    round(CAST(alpha_words AS DOUBLE) / greatest(nw, 1), 6) AS alpha_frac,
         |    CAST(sh AS BIGINT) AS stop_hits
         |  FROM m)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
         |  CAST(n_words BETWEEN 50 AND 100000 AS INT) AS r_word_count,
         |  CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS INT) AS r_mean_len,
         |  CAST(symbol_ratio <= 0.1 AS INT) AS r_symbol,
         |  CAST(alpha_frac >= 0.8 AS INT) AS r_alpha,
         |  CAST(stop_hits >= 2 AS INT) AS r_stops,
         |  CAST(n_words BETWEEN 50 AND 100000
         |    AND mean_word_len BETWEEN 3.0 AND 10.0
         |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
         |    AND stop_hits >= 2 AS INT) AS keep
         |FROM r""".stripMargin
  }

  /** Neo4j zoned-display rendering replayed in DuckDB — shared by
    * the nested (`cypher_datetime_tz_display`) and aliased
    * (`cypher_datetime_tz_alias`) spellings, whose expected strings
    * are identical.
    */
  private val TzDisplayOracle: String = """WITH z AS (
        |  SELECT 'ny_summer' AS k, 'America/New_York' AS zone,
        |    make_timestamptz(2024,6,1,12,0,0,'America/New_York') AS ts
        |  UNION ALL SELECT 'ny_winter', 'America/New_York',
        |    make_timestamptz(2024,1,15,12,0,0,'America/New_York')
        |  UNION ALL SELECT 'tokyo', 'Asia/Tokyo',
        |    make_timestamptz(2024,6,1,12,30,45,'Asia/Tokyo')
        |  UNION ALL SELECT 'utc', 'UTC',
        |    make_timestamptz(2024,6,1,12,0,0,'UTC')),
        |w AS (
        |  SELECT k, zone, CAST(ts AT TIME ZONE zone AS TIMESTAMP) AS wall,
        |    CAST(epoch(CAST(ts AT TIME ZONE zone AS TIMESTAMP)) - epoch(ts)
        |      AS BIGINT) AS off
        |  FROM z),
        |r AS (
        |  SELECT k,
        |    strftime(wall, '%Y-%m-%dT%H:%M') ||
        |    CASE WHEN extract(second FROM wall) > 0
        |      THEN ':' || lpad(CAST(CAST(extract(second FROM wall) AS BIGINT)
        |        AS VARCHAR), 2, '0') ELSE '' END ||
        |    CASE WHEN off = 0 THEN 'Z' ELSE
        |      (CASE WHEN off < 0 THEN '-' ELSE '+' END) ||
        |      lpad(CAST(abs(off) // 3600 AS VARCHAR), 2, '0') || ':' ||
        |      lpad(CAST((abs(off) % 3600) // 60 AS VARCHAR), 2, '0') END ||
        |    '[' || zone || ']' AS s
        |  FROM w)
        |SELECT
        |  max(CASE WHEN k = 'ny_summer' THEN s END) AS ny_summer,
        |  max(CASE WHEN k = 'ny_winter' THEN s END) AS ny_winter,
        |  max(CASE WHEN k = 'tokyo' THEN s END) AS tokyo,
        |  max(CASE WHEN k = 'utc' THEN s END) AS utc
        |FROM r""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "dedup_clusters"    -> OracleSql.dedupClusters(),
    "dedup_cluster_stats" -> OracleSql.clusterStats(),
    "dedup_source_rates"  -> OracleSql.sourceRates(),
    "dedup_source_matrix" -> OracleSql.sourceOverlapMatrix(),
    "pipeline_curate"   -> OracleSql.curate(),
    "graph_kcore"       -> OracleSql.kcorePeel(),
    "graph_label_prop"  -> OracleSql.labelProp(),
    "graph_label_prop_async" -> OracleSql.labelPropAsync(),
    "graph_ktruss"      -> OracleSql.ktruss(),
    "graph_degree_dist" -> OracleSql.degreeDist,
    "graph_modularity"  -> OracleSql.modularity(),
    "graph_louvain"     -> OracleSql.louvain(),
    "graph_louvain2"    -> OracleSql.louvain2(),
    "graph_louvain3"    -> OracleSql.louvain3(),
    "graph_assortativity" ->
      """WITH nb AS (
        |  SELECT c_custkey AS src,
        |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
        |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2
        |  FROM customer),
        |e AS (SELECT src, dst FROM (
        |  SELECT src, d1 AS dst FROM nb UNION ALL SELECT src, d2 AS dst FROM nb)
        |  WHERE dst IS NOT NULL),
        |s0 AS (SELECT src, dst FROM e
        |  UNION ALL SELECT dst AS src, src AS dst FROM e),
        |deg AS (SELECT src AS id, COUNT(*) AS deg FROM s0 GROUP BY 1),
        |j AS (
        |  SELECT a.deg AS dx, b.deg AS dy
        |  FROM s0 JOIN deg a ON s0.src = a.id JOIN deg b ON s0.dst = b.id),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(dx * dy) AS BIGINT) AS sum_xy,
        |    CAST(SUM(dx) AS BIGINT) AS sum_x,
        |    CAST(SUM(dx * dx) AS BIGINT) AS sum_x2
        |  FROM j)
        |SELECT m, sum_xy, sum_x, sum_x2,
        |  round(CAST(m * sum_xy - sum_x * sum_x AS DOUBLE) /
        |        CAST(m * sum_x2 - sum_x * sum_x AS DOUBLE), 9) + 0.0 AS r
        |FROM agg""".stripMargin,
    "graph_clustering_coeff" -> OracleSql.clusteringCoeff,
    "graph_sssp_weighted" -> OracleSql.ssspWeighted(),
    "graph_allshortest_weighted" -> OracleSql.wasp(),
    "graph_betweenness"   -> OracleSql.betweenness(),
    "graph_centrality_tuning" -> OracleSql.centralityTuning(),
    "graph_centrality_depth" -> OracleSql.centralityDepthTuning(),
    "graph_closeness" ->
      """WITH RECURSIVE nb AS (
        |  SELECT c_custkey AS src,
        |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
        |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2,
        |    lead(c_custkey, 8) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d8
        |  FROM customer),
        |edges AS MATERIALIZED (
        |  SELECT src, d1 AS dst FROM nb WHERE d1 IS NOT NULL
        |  UNION ALL SELECT src, d2 FROM nb WHERE d2 IS NOT NULL
        |  UNION ALL SELECT src, d8 FROM nb WHERE d8 IS NOT NULL),
        |lms AS (
        |  SELECT c_custkey AS lm FROM (
        |    SELECT c_custkey,
        |      row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
        |    FROM customer) WHERE rn IN (1, 10)),
        |walk AS (
        |  SELECT lm, lm AS id, 0 AS depth FROM lms
        |  UNION
        |  SELECT w.lm, e.dst AS id, w.depth + 1 AS depth
        |  FROM walk w JOIN edges e ON e.src = w.id WHERE w.depth < 16),
        |best AS (SELECT lm, id, MIN(depth) AS d FROM walk GROUP BY 1, 2)
        |SELECT c.c_custkey AS id,
        |  CAST(COUNT(b.lm) AS BIGINT) AS reached,
        |  CAST(SUM(b.d) AS BIGINT) AS dist_sum
        |FROM customer c LEFT JOIN best b ON b.id = c.c_custkey
        |GROUP BY 1 ORDER BY id""".stripMargin,
    "graph_eccentricity" ->
      """WITH RECURSIVE nb AS (
        |  SELECT c_custkey AS src,
        |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
        |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2,
        |    lead(c_custkey, 8) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d8
        |  FROM customer),
        |edges AS MATERIALIZED (
        |  SELECT src, d1 AS dst FROM nb WHERE d1 IS NOT NULL
        |  UNION ALL SELECT src, d2 FROM nb WHERE d2 IS NOT NULL
        |  UNION ALL SELECT src, d8 FROM nb WHERE d8 IS NOT NULL),
        |lms AS (
        |  SELECT c_custkey AS lm FROM (
        |    SELECT c_custkey,
        |      row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
        |    FROM customer) WHERE rn IN (1, 10)),
        |walk AS (
        |  SELECT lm, lm AS id, 0 AS depth FROM lms
        |  UNION
        |  SELECT w.lm, e.dst AS id, w.depth + 1 AS depth
        |  FROM walk w JOIN edges e ON e.src = w.id WHERE w.depth < 16),
        |best AS (SELECT lm, id, MIN(depth) AS d FROM walk GROUP BY 1, 2),
        |perlm AS (
        |  SELECT lm, CAST(MAX(d) AS BIGINT) AS ecc,
        |    CAST(COUNT(*) AS BIGINT) AS n_reached
        |  FROM best GROUP BY 1),
        |diam AS (SELECT CAST(MAX(ecc) AS BIGINT) AS diam_lb FROM perlm)
        |SELECT p.lm, p.ecc, p.n_reached, d.diam_lb
        |FROM perlm p CROSS JOIN diam d ORDER BY lm""".stripMargin,
    "sketch_kmv_distinct" -> OracleSql.kmvSketch(),
    "sketch_source_overlap" -> OracleSql.kmvOverlap(),
    "text_quality_model"  -> OracleSql.qualityModel(),
    "text_bpe_train"      -> OracleSql.bpeTrain(),
    "text_novelty"        -> OracleSql.novelty(),
    "pipeline_budget_select" -> OracleSql.budgetSelect(),
    "er_name_clusters"    -> OracleSql.nameClusters(),
    "er_fuzzy_names" ->
      """WITH names AS (
        |  SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts
        |  FROM part GROUP BY 1),
        |vr AS (
        |  SELECT name, unnest(list_distinct(list_append(
        |    list_transform(range(1, len(name) + 1),
        |      i -> substr(name, 1, CAST(i - 1 AS BIGINT)) ||
        |           substr(name, CAST(i + 1 AS BIGINT), len(name))),
        |    name))) AS v
        |  FROM names),
        |vh AS (SELECT DISTINCT name, md5(v) AS h FROM vr),
        |cand AS (
        |  SELECT DISTINCT a.name AS a_name, b.name AS b_name
        |  FROM vh a JOIN vh b ON a.h = b.h AND a.name < b.name),
        |ver AS (
        |  SELECT a_name, b_name,
        |    CAST(levenshtein(a_name, b_name) AS BIGINT) AS dist
        |  FROM cand WHERE levenshtein(a_name, b_name) <= 1)
        |SELECT v.a_name, v.b_name, v.dist,
        |  na.n_parts AS a_parts, nb.n_parts AS b_parts
        |FROM ver v JOIN names na ON v.a_name = na.name
        |JOIN names nb ON v.b_name = nb.name
        |ORDER BY a_name, b_name""".stripMargin,
    "text_bpe_encode"     -> OracleSql.bpeEncode(),
    "embed_pca_power"     -> OracleSql.pcaPower(),
    "sketch_hll_distinct" -> OracleSql.hllSketch(),
    "sketch_cms_topk"     -> OracleSql.cmsTopk(),
    "pipeline_corpus_stats" ->
      """SELECT
        |(SELECT COUNT(*) FROM documents) AS n_docs,
        |(SELECT COUNT(*) FROM documents
        | WHERE (CASE WHEN length(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END) BETWEEN 5 AND 100000
        | AND CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |   / greatest(length(text), 1) < 0.2) AS n_kept,
        |(SELECT COUNT(DISTINCT md5(text)) FROM documents) AS n_unique,
        |(SELECT CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT)
        | FROM documents) AS ws_tokens_total,
        |(SELECT CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
        | FROM documents) AS bpe_tokens_total""".stripMargin,
    "sample_stratified" ->
      """WITH counts AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang AS lang FROM documents d JOIN counts USING (lang)
        |WHERE n_lang <= 40
        |   OR ((2654435761 * (doc_id % 1000000007) + 3266489917) % 1000000007)
        |      * n_lang < 40 * 1000000007::BIGINT
        |ORDER BY doc_id""".stripMargin,
    "contamination_ngram" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(ws) - 2, 0) + 1),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        |  FROM w),
        |b AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        |c AS (SELECT doc_id, len(s) AS n_sh FROM sh WHERE doc_id % 97 <> 0),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0),
        |hit AS (
        |  SELECT ex.doc_id, count(*) AS n_hit
        |  FROM ex JOIN b USING (g) GROUP BY ex.doc_id)
        |SELECT c.doc_id AS doc_id, c.n_sh AS n_shingles,
        |  coalesce(n_hit, 0) AS n_overlap,
        |  CASE WHEN c.n_sh = 0 THEN 0.0::DOUBLE
        |       ELSE round(coalesce(n_hit, 0)::DOUBLE / c.n_sh, 6) END AS contamination,
        |  CAST(c.n_sh > 0 AND coalesce(n_hit, 0)::DOUBLE / c.n_sh >= 0.05::DOUBLE
        |    AS BIGINT) AS contaminated
        |FROM c LEFT JOIN hit ON c.doc_id = hit.doc_id
        |ORDER BY doc_id""".stripMargin,
    "graph_scc" ->
      """WITH rmin AS (
        |  SELECT n_regionkey, MIN(n_nationkey) AS mn
        |  FROM nation GROUP BY n_regionkey),
        |nodes AS (
        |  SELECT 1000000000 + o_orderkey AS id,
        |         1000000000 + o_orderkey AS scc FROM orders
        |  UNION ALL
        |  SELECT 2000000000 + c_custkey, 2000000000 + c_custkey FROM customer
        |  UNION ALL
        |  SELECT 3000000000 + n_nationkey, 3000000000 + mn
        |  FROM nation JOIN rmin USING (n_regionkey))
        |SELECT id, scc FROM nodes ORDER BY id""".stripMargin,
    "graph_biased_walk" -> OracleSql.biasedWalk(),
    "graph_random_walk" -> OracleSql.randomWalk(),
    "graph_walk_skipgrams" -> OracleSql.walkSkipgrams(),
    "graph_adamic_adar" ->
      """WITH e AS (
        |  SELECT DISTINCT 5000000000 + l_suppkey AS supp, 6000000000 + l_partkey AS part
        |  FROM lineitem),
        |pd AS (SELECT part, COUNT(*) AS pdeg FROM e GROUP BY part),
        |w AS (
        |  SELECT e.supp, e.part, CAST(round(1.0e9 / ln(pdeg), 0) AS BIGINT) AS w9
        |  FROM e JOIN pd USING (part) WHERE pdeg BETWEEN 2 AND 500),
        |p AS (
        |  SELECT a.supp AS supp_a, b.supp AS supp_b,
        |    SUM(a.w9) AS aa9, COUNT(*) AS common
        |  FROM w a JOIN w b ON a.part = b.part AND a.supp < b.supp
        |  GROUP BY 1, 2)
        |SELECT supp_a, supp_b,
        |  round(CAST(aa9 AS DOUBLE) / 1.0e9, 6) + 0.0 AS aa_score, common
        |FROM p ORDER BY aa_score DESC, supp_a, supp_b LIMIT 20""".stripMargin,
    "graph_neighbor_sim_approx" ->
      """WITH e AS (
        |  SELECT DISTINCT 5000000000 + l_suppkey AS supp, 6000000000 + l_partkey AS part
        |  FROM lineitem),
        |sig AS (
        |  SELECT supp,
        |    MIN(((part % 1000000007)*654435747 + 266489896) % 1000000007) AS s0,
        |    MIN(((part % 1000000007)*953445008 + 172972768) % 1000000007) AS s1,
        |    MIN(((part % 1000000007)*666121539 + 632483670) % 1000000007) AS s2,
        |    MIN(((part % 1000000007)*916718432 + 260144778) % 1000000007) AS s3,
        |    MIN(((part % 1000000007)*635055555 + 348881410) % 1000000007) AS s4,
        |    MIN(((part % 1000000007)*613703214 + 16419770) % 1000000007) AS s5,
        |    MIN(((part % 1000000007)*478985632 + 769014006) % 1000000007) AS s6,
        |    MIN(((part % 1000000007)*685929885 + 46942149) % 1000000007) AS s7,
        |    MIN(((part % 1000000007)*537319864 + 317459248) % 1000000007) AS s8,
        |    MIN(((part % 1000000007)*113289140 + 391560441) % 1000000007) AS s9,
        |    MIN(((part % 1000000007)*443904346 + 469375836) % 1000000007) AS s10,
        |    MIN(((part % 1000000007)*237508372 + 844965644) % 1000000007) AS s11,
        |    MIN(((part % 1000000007)*760536115 + 16909389) % 1000000007) AS s12,
        |    MIN(((part % 1000000007)*56448786 + 284490277) % 1000000007) AS s13,
        |    MIN(((part % 1000000007)*174558421 + 800044711) % 1000000007) AS s14,
        |    MIN(((part % 1000000007)*842614604 + 337313246) % 1000000007) AS s15
        |  FROM e GROUP BY supp),
        |b AS (
        |  SELECT 0 AS band, ((s0)*31+s1) % 1000000007 AS bh, supp FROM sig
        |  UNION ALL
        |  SELECT 1 AS band, ((s2)*31+s3) % 1000000007 AS bh, supp FROM sig
        |  UNION ALL
        |  SELECT 2 AS band, ((s4)*31+s5) % 1000000007 AS bh, supp FROM sig
        |  UNION ALL
        |  SELECT 3 AS band, ((s6)*31+s7) % 1000000007 AS bh, supp FROM sig
        |  UNION ALL
        |  SELECT 4 AS band, ((s8)*31+s9) % 1000000007 AS bh, supp FROM sig
        |  UNION ALL
        |  SELECT 5 AS band, ((s10)*31+s11) % 1000000007 AS bh, supp FROM sig
        |  UNION ALL
        |  SELECT 6 AS band, ((s12)*31+s13) % 1000000007 AS bh, supp FROM sig
        |  UNION ALL
        |  SELECT 7 AS band, ((s14)*31+s15) % 1000000007 AS bh, supp FROM sig),
        |cnt AS (SELECT band, bh, COUNT(*) AS n FROM b GROUP BY 1, 2),
        |kept AS (SELECT b.band, b.bh, b.supp FROM b JOIN cnt USING (band, bh) WHERE n <= 200),
        |cand AS (
        |  SELECT DISTINCT ka.supp AS supp_a, kb.supp AS supp_b
        |  FROM kept ka JOIN kept kb
        |    ON ka.band = kb.band AND ka.bh = kb.bh AND ka.supp < kb.supp),
        |scored AS (
        |  SELECT c.supp_a, c.supp_b,
        |    (CASE WHEN sa.s0=sb.s0 THEN 1 ELSE 0 END + CASE WHEN sa.s1=sb.s1 THEN 1 ELSE 0 END + CASE WHEN sa.s2=sb.s2 THEN 1 ELSE 0 END + CASE WHEN sa.s3=sb.s3 THEN 1 ELSE 0 END + CASE WHEN sa.s4=sb.s4 THEN 1 ELSE 0 END + CASE WHEN sa.s5=sb.s5 THEN 1 ELSE 0 END + CASE WHEN sa.s6=sb.s6 THEN 1 ELSE 0 END + CASE WHEN sa.s7=sb.s7 THEN 1 ELSE 0 END + CASE WHEN sa.s8=sb.s8 THEN 1 ELSE 0 END + CASE WHEN sa.s9=sb.s9 THEN 1 ELSE 0 END + CASE WHEN sa.s10=sb.s10 THEN 1 ELSE 0 END + CASE WHEN sa.s11=sb.s11 THEN 1 ELSE 0 END + CASE WHEN sa.s12=sb.s12 THEN 1 ELSE 0 END + CASE WHEN sa.s13=sb.s13 THEN 1 ELSE 0 END + CASE WHEN sa.s14=sb.s14 THEN 1 ELSE 0 END + CASE WHEN sa.s15=sb.s15 THEN 1 ELSE 0 END) AS agree
        |  FROM cand c JOIN sig sa ON c.supp_a = sa.supp JOIN sig sb ON c.supp_b = sb.supp)
        |SELECT supp_a, supp_b, CAST(agree AS DOUBLE) / 16 AS est_jaccard,
        |  CAST(agree AS BIGINT) AS agree
        |FROM scored
        |ORDER BY est_jaccard DESC, supp_a, supp_b LIMIT 20""".stripMargin,
    "graph_neighbor_sim" ->
      """WITH e AS (
        |  SELECT DISTINCT 5000000000 + l_suppkey AS supp, 6000000000 + l_partkey AS part
        |  FROM lineitem),
        |pruned AS (
        |  SELECT supp, part FROM e
        |  WHERE part IN (SELECT part FROM e GROUP BY part HAVING COUNT(*) <= 500)),
        |deg AS (SELECT supp, COUNT(*) AS deg FROM e GROUP BY supp),
        |p AS (
        |  SELECT a.supp AS supp_a, b.supp AS supp_b, COUNT(*) AS inter
        |  FROM pruned a JOIN pruned b ON a.part = b.part AND a.supp < b.supp
        |  GROUP BY 1, 2)
        |SELECT supp_a, supp_b,
        |  round(CAST(inter AS DOUBLE) / (da.deg + db.deg - inter), 6) AS jaccard,
        |  inter
        |FROM p JOIN deg da ON p.supp_a = da.supp JOIN deg db ON p.supp_b = db.supp
        |ORDER BY jaccard DESC, supp_a, supp_b LIMIT 20""".stripMargin,
    "text_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, string_split(text, '') AS cs, len(text) AS n
        |  FROM documents),
        |e AS (SELECT doc_id, n, list_sort(list_distinct(cs)) AS ds, cs FROM c)
        |SELECT doc_id,
        |  CASE WHEN n IS NULL OR n = 0 THEN 0.0::DOUBLE ELSE
        |    round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(ds, d -> (len(list_filter(cs, x -> x = d))::DOUBLE / n)
        |        * ln(len(list_filter(cs, x -> x = d))::DOUBLE / n))),
        |      (a, x) -> a + x), 6) + 0.0 END AS char_entropy,
        |  CAST(COALESCE(n, 0) AS BIGINT) AS n_chars
        |FROM e ORDER BY doc_id""".stripMargin,
    "text_domains" ->
      """WITH aug AS (
        |  SELECT doc_id, text || ' see https://site' || (doc_id % 20)
        |    || '.example.com/p/' || doc_id
        |    || ' and http://mirror' || (doc_id % 7) || '.example.org' AS text
        |  FROM documents),
        |ex AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
        |  FROM aug)
        |SELECT domain, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_mentions
        |FROM ex GROUP BY domain ORDER BY domain""".stripMargin,
    "text_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    text || ' contact user' || doc_id || '@example.com or call 555-01'
        |      || doc_id || '.',
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9][0-9-]{4,}[0-9]', '<PHONE>', 'g') AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_boilerplate" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(ws) - 2, 0) + 1),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        |  FROM w WHERE len(ws) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |df AS (SELECT g, COUNT(*) AS df FROM ex GROUP BY g),
        |st AS (
        |  SELECT ex.doc_id, COUNT(*) AS n_grams,
        |    SUM(CASE WHEN df.df > 5 THEN 1 ELSE 0 END) AS n_boiler
        |  FROM ex JOIN df USING (g) GROUP BY ex.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(st.n_grams, 0) AS n_grams,
        |  CAST(COALESCE(st.n_boiler, 0) AS BIGINT) AS n_boiler,
        |  CASE WHEN COALESCE(st.n_grams, 0) > 0
        |    THEN round(CAST(st.n_boiler AS DOUBLE) / st.n_grams, 6)
        |    ELSE 0.0 END AS boiler_frac,
        |  CASE
        |    WHEN COALESCE(st.n_boiler, 0)*100 >= COALESCE(st.n_grams, 0)*8
        |      AND COALESCE(st.n_grams, 0) > 0 THEN 'drop'
        |    WHEN COALESCE(st.n_boiler, 0)*100 >= COALESCE(st.n_grams, 0)*2
        |      AND COALESCE(st.n_boiler, 0) > 0 THEN 'clean'
        |    ELSE 'keep' END AS action
        |FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_repetition" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |r AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    round(1.0::DOUBLE - len(list_distinct(ws))::DOUBLE / len(ws), 6)
        |      AS dup_word_frac,
        |    round(list_max(list_transform(list_distinct(ws),
        |      w -> len(list_filter(ws, x -> x = w))))::DOUBLE / len(ws), 6)
        |      AS top_word_frac,
        |    CASE WHEN len(ws) < 2 THEN 0.0::DOUBLE
        |      ELSE round(1.0::DOUBLE
        |        - len(list_distinct(list_transform(range(1, len(ws)),
        |            i -> ws[i] || ' ' || ws[i+1])))::DOUBLE
        |        / (len(ws) - 1), 6) END AS dup_2gram_frac
        |  FROM d)
        |SELECT *,
        |  CAST(top_word_frac > 0.2::DOUBLE OR dup_2gram_frac > 0.5::DOUBLE AS INT)
        |    AS repetitive
        |FROM r ORDER BY doc_id""".stripMargin,
    "events_retention" ->
      """WITH f AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT date_trunc('week', cohort_day) AS cohort_week, e.user_id,
        |    date_diff('day', cohort_day, CAST(ts AS DATE)) // 7 AS week_offset
        |  FROM events e JOIN f USING (user_id))
        |SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
        |  COUNT(*) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "search_bm25_topk" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, len(ws) AS dl,
        |    len(list_filter(ws, x -> x = 'spark')) AS tf1,
        |    len(list_filter(ws, x -> x = 'join')) AS tf2,
        |    len(list_filter(ws, x -> x = 'vector')) AS tf3
        |  FROM d),
        |g AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl,
        |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
        |    sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
        |  FROM t)
        |SELECT doc_id,
        |  round(
        |    ln((n - df1 + 0.5::DOUBLE) / (df1 + 0.5::DOUBLE) + 1)
        |      * (tf1 * 2.2::DOUBLE / (tf1 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)))
        |  + ln((n - df2 + 0.5::DOUBLE) / (df2 + 0.5::DOUBLE) + 1)
        |      * (tf2 * 2.2::DOUBLE / (tf2 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)))
        |  + ln((n - df3 + 0.5::DOUBLE) / (df3 + 0.5::DOUBLE) + 1)
        |      * (tf3 * 2.2::DOUBLE / (tf3 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl))), 6)
        |    AS score
        |FROM t, g
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "dedup_minhash_lsh" -> OracleSql.minhashLsh(),
    "dedup_lsh_tuning"  -> OracleSql.lshTuningCurve(),
    "dedup_guard_stats" -> OracleSql.guardTelemetry(),
    "dedup_substring"   -> OracleSql.substringDup(),
    "dedup_incremental" -> OracleSql.incrementalDedup(),
    // bloom prefilter is a pure pruning layer (no false negatives;
    // the band join removes false positives) => same oracle as the
    // unfiltered incremental dedup
    "dedup_bloom" -> OracleSql.incrementalDedup(),
    "embed_kmeans"      -> OracleSql.kmeans(),
    "embed_pq"          -> OracleSql.pq(),
    "sim_semantic_dedup" -> OracleSql.semanticDedup(),
    "embed_dim_stats" ->
      """WITH e AS (
        |  SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
        |         generate_subscripts(embedding, 1) - 1 AS d
        |  FROM embeddings),
        |m AS (
        |  SELECT d,
        |    round(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6) + 0.0 AS mean,
        |    round(CAST(SUM(CAST(x*x AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6) AS m2,
        |    min(x) AS min_x, max(x) AS max_x
        |  FROM e GROUP BY d)
        |SELECT CAST(d AS BIGINT) AS d, mean,
        |  round(m2 - mean*mean, 6) + 0.0 AS variance, min_x, max_x
        |FROM m ORDER BY d""".stripMargin,
    "dedup_simhash"     -> OracleSql.simhash(),
    "dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |    'Site' || CAST(doc_id % 40 AS VARCHAR) ||
        |    '.Example.COM/Articles/' || CAST(doc_id % 120 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&utm_medium=rss'
        |          WHEN doc_id % 7 = 0 THEN '?utm_campaign=x&gclid=abc123'
        |          ELSE '' END) AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, url,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      lower(url),
        |      '^https?://', ''), '^www\.', ''),
        |      '[?&](utm_[a-z]+|gclid|fbclid|ref)=[^&#]*', '', 'g'),
        |      '/$', '') AS canon_url
        |  FROM u)
        |SELECT canon_url, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT url) AS n_variants, MIN(doc_id) AS keep_id
        |FROM c GROUP BY 1 ORDER BY canon_url""".stripMargin,
    "dedup_paragraph" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |b AS (
        |  SELECT doc_id, ws,
        |    GREATEST((len(ws) + 9) // 10, 1) AS nseg FROM d),
        |segs AS (
        |  SELECT doc_id, CAST(t.i AS BIGINT) AS seg_idx,
        |    array_to_string(ws[CAST(t.i*10+1 AS BIGINT) :
        |      CAST(t.i*10+10 AS BIGINT)], ' ') AS seg
        |  FROM b, UNNEST(range(nseg)) AS t(i)),
        |rn AS (
        |  SELECT doc_id, seg_idx, seg, row_number() OVER (
        |    PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) AS rn
        |  FROM segs)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
        |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  md5(COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
        |    FILTER (WHERE rn = 1), '')) AS clean_md5
        |FROM rn GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_cdc"         -> OracleSql.cdcDedup(),
    "text_fingerprint"  -> OracleSql.fingerprint(),
    "text_langid"       -> OracleSql.langid,
    "graph_pagerank"    -> OracleSql.pagerank(),
    "graph_ppr"         -> OracleSql.ppr(),
    "graph_hits"        -> OracleSql.hits(),
    "sim_ann_lsh"       -> OracleSql.annLsh(),
    "sim_recall_eval"   -> OracleSql.annRecall(),
    "sim_ann_tuning"    -> OracleSql.annTuning(),
    "sim_ivf_tuning"    -> OracleSql.ivfTuning(),
    "embed_cos_hist" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT round(CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0
        |    ELSE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) END, 6) AS cos
        |  FROM n a JOIN n b ON b.vec_id = a.vec_id + 1)
        |SELECT CAST(floor(cos * 10) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_pairs
        |FROM p GROUP BY 1 ORDER BY bucket""".stripMargin,
    "sim_hamming_tuning" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM n
        |      WHERE vec_id < 5),
        |d AS (SELECT vec_id, v, nrm FROM n WHERE vec_id >= 5),
        |s AS (
        |  SELECT q.q_id, d.vec_id,
        |  round(CASE WHEN d.nrm = 0 OR q.q_nrm = 0 THEN 0
        |    ELSE list_dot_product(d.v, q.q_v) / (d.nrm * q.q_nrm) END, 6)
        |    + 0.0 AS score
        |  FROM d CROSS JOIN q),
        |exact AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM s)
        |  WHERE rank <= 10),
        |e2 AS (
        |  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |         generate_subscripts(embedding, 1) - 1 AS d
        |  FROM embeddings),
        |wd AS (
        |  SELECT vec_id, d // 32 AS wi,
        |    CAST(SUM(CASE WHEN x >= 0
        |      THEN (1::BIGINT << (d % 32)) ELSE 0 END) AS BIGINT) AS w
        |  FROM e2 GROUP BY 1, 2),
        |codes AS (SELECT vec_id, list(w ORDER BY wi) AS words
        |          FROM wd GROUP BY vec_id),
        |cq AS (SELECT vec_id AS q_id, words AS q_words FROM codes
        |       WHERE vec_id < 5),
        |cd AS (SELECT vec_id, words FROM codes WHERE vec_id >= 5),
        |h AS (
        |  SELECT cq.q_id, cd.vec_id,
        |    list_reduce(list_transform(range(1, len(cd.words) + 1),
        |      i -> CAST(bit_count(xor(cd.words[CAST(i AS INT)],
        |                              cq.q_words[CAST(i AS INT)])) AS BIGINT)),
        |      (a, b) -> a + b) AS hamming,
        |    CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END AS ex
        |  FROM cd CROSS JOIN cq
        |  LEFT JOIN exact e ON e.q_id = cq.q_id AND e.vec_id = cd.vec_id)
        |SELECT CAST(r.radius AS BIGINT) AS radius,
        |  CAST(SUM(CASE WHEN h.hamming <= r.radius THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_candidates,
        |  CAST(SUM(CASE WHEN h.hamming <= r.radius THEN h.ex ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  round(CAST(SUM(CASE WHEN h.hamming <= r.radius THEN h.ex ELSE 0 END)
        |    AS DOUBLE) / 50, 6) + 0.0 AS mean_recall
        |FROM h CROSS JOIN (VALUES (8), (12), (16), (20), (24)) r(radius)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_hamming_topk" ->
      """WITH e AS (
        |  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |         generate_subscripts(embedding, 1) - 1 AS d
        |  FROM embeddings),
        |wd AS (
        |  SELECT vec_id, d // 32 AS wi,
        |    CAST(SUM(CASE WHEN x >= 0
        |      THEN (1::BIGINT << (d % 32)) ELSE 0 END) AS BIGINT) AS w
        |  FROM e GROUP BY 1, 2),
        |codes AS (SELECT vec_id, list(w ORDER BY wi) AS words
        |          FROM wd GROUP BY vec_id),
        |q AS (SELECT vec_id AS q_id, words AS q_words FROM codes
        |      WHERE vec_id < 5),
        |c AS (SELECT vec_id, words FROM codes WHERE vec_id >= 5),
        |h AS (
        |  SELECT q.q_id, c.vec_id,
        |    list_reduce(list_transform(range(1, len(c.words) + 1),
        |      i -> CAST(bit_count(xor(c.words[CAST(i AS INT)],
        |                              q.q_words[CAST(i AS INT)])) AS BIGINT)),
        |      (a, b) -> a + b) AS hamming
        |  FROM c CROSS JOIN q)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, hamming FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY hamming, vec_id) AS rank FROM h)
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "embed_binary_recall" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END) AS b
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM n
        |      WHERE vec_id < 5),
        |d AS (SELECT vec_id, v, nrm FROM n WHERE vec_id >= 5),
        |s AS (
        |  SELECT q.q_id, d.vec_id,
        |  round(CASE WHEN d.nrm = 0 OR q.q_nrm = 0 THEN 0
        |    ELSE list_dot_product(d.v, q.q_v) / (d.nrm * q.q_nrm) END, 6)
        |    + 0.0 AS score
        |  FROM d CROSS JOIN q),
        |exact AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM s)
        |  WHERE rank <= 10),
        |bq AS (SELECT vec_id AS q_id, b AS q_b FROM n WHERE vec_id < 5),
        |bd AS (SELECT vec_id, b FROM n WHERE vec_id >= 5),
        |hs AS (
        |  SELECT bq.q_id, bd.vec_id, list_dot_product(bd.b, bq.q_b) AS score
        |  FROM bd CROSS JOIN bq),
        |ham AS (
        |  SELECT q_id, vec_id, 1 AS hit FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM hs)
        |  WHERE rank <= 10),
        |nd AS (SELECT CAST(MAX(len(embedding)) AS BIGINT) AS n_dims FROM embeddings)
        |SELECT e.q_id, nd.n_dims, COUNT(h.hit) AS n_hit,
        |  round(COUNT(h.hit) / 10.0, 6) + 0.0 AS recall_at_k
        |FROM exact e LEFT JOIN ham h ON e.q_id = h.q_id AND e.vec_id = h.vec_id
        |CROSS JOIN nd
        |GROUP BY e.q_id, nd.n_dims ORDER BY e.q_id""".stripMargin,
    "sim_dim_recall" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM n
        |      WHERE vec_id < 5),
        |d AS (SELECT vec_id, v, nrm FROM n WHERE vec_id >= 5),
        |s AS (
        |  SELECT q.q_id, d.vec_id,
        |  round(CASE WHEN d.nrm = 0 OR q.q_nrm = 0 THEN 0
        |    ELSE list_dot_product(d.v, q.q_v) / (d.nrm * q.q_nrm) END, 6)
        |    + 0.0 AS score
        |  FROM d CROSS JOIN q),
        |exact AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM s)
        |  WHERE rank <= 10),
        |t AS (
        |  SELECT vec_id, v[1:16] AS v,
        |    sqrt(list_dot_product(v[1:16], v[1:16])) AS nrm
        |  FROM n),
        |tq AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM t
        |       WHERE vec_id < 5),
        |td AS (SELECT vec_id, v, nrm FROM t WHERE vec_id >= 5),
        |ts AS (
        |  SELECT tq.q_id, td.vec_id,
        |  round(CASE WHEN td.nrm = 0 OR tq.q_nrm = 0 THEN 0
        |    ELSE list_dot_product(td.v, tq.q_v) / (td.nrm * tq.q_nrm) END, 6)
        |    + 0.0 AS score
        |  FROM td CROSS JOIN tq),
        |trunc AS (
        |  SELECT q_id, vec_id, 1 AS hit FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM ts)
        |  WHERE rank <= 10)
        |SELECT e.q_id, CAST(16 AS BIGINT) AS kept_dims,
        |  CAST(COUNT(t.hit) AS BIGINT) AS n_hit,
        |  round(CAST(COUNT(t.hit) AS DOUBLE) / 10, 6) + 0.0 AS recall_at_k
        |FROM exact e LEFT JOIN trunc t
        |  ON e.q_id = t.q_id AND e.vec_id = t.vec_id
        |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk_join" ->
      """SELECT l_orderkey, o_orderdate,
        |CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem, orders, customer
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |AND c_mktsegment = 'BUILDING'
        |AND o_orderdate < TIMESTAMP '1995-06-15'
        |AND l_shipdate > TIMESTAMP '1995-06-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multi_join" ->
      """SELECT n_name,
        |CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem, orders, customer, supplier, nation, region
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |AND l_suppkey = s_suppkey AND c_nationkey = n_nationkey
        |AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |AND r_name = 'ASIA'
        |AND o_orderdate >= TIMESTAMP '1994-01-01'
        |AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "window_topn_agg" ->
      """WITH j AS (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY c_mktsegment
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM j)
        |SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
        |FROM r WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "window_topn" ->
      """WITH j AS (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY c_mktsegment
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM j)
        |SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
        |FROM r WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q_rollup_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |COUNT(*) AS n_rows,
        |CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q6_filter_sum" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,4)))
        |  AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |AND l_shipdate < TIMESTAMP '1997-01-01'
        |AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q14_promo_share" ->
      """WITH j AS (
        |  SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        |      THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
        |    CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |      AS DOUBLE) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01')
        |SELECT round(100.0 * promo_revenue / total_revenue, 6) AS promo_pct,
        |  promo_revenue, total_revenue FROM j""".stripMargin,
    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_disjunct_join" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*(1-l_discount)
        |  AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity >= 1 AND l_quantity <= 30 AND (
        |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11) OR
        |  (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |    AND l_quantity BETWEEN 10 AND 20) OR
        |  (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |    AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "q7_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |  AND c_custkey = o_custkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND n1.n_name IN ('NATION_1', 'NATION_2')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, revenue, c_acctbal, n_name FROM (
        |  SELECT c_custkey, c_name,
        |    CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |      AS DOUBLE) AS revenue,
        |    c_acctbal, n_name
        |  FROM customer, orders, lineitem, nation
        |  WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |    AND o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1995-07-01'
        |    AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |  GROUP BY c_custkey, c_name, c_acctbal, n_name)
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
        |      THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |        AS DOUBLE) AS mkt_share
        |FROM part, lineitem, orders, customer, nation n1, region,
        |     supplier, nation n2
        |WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        |  AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  AND s_suppkey = l_suppkey AND s_nationkey = n2.n_nationkey
        |  AND p_type = 'PROMO'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS profit
        |FROM lineitem, part, supplier, nation, orders
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE 'red%'
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,
    "q12_late_priority" ->
      """SELECT l_linestatus AS linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_cust_dist" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q2_min_bal_supplier" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |  eu AS (SELECT s_suppkey, s_acctbal, s_name, n_name
        |    FROM supplier, nation, region
        |    WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |      AND r_name = 'EUROPE'),
        |  cand AS (SELECT p_partkey, p_name, s_acctbal, s_name, n_name,
        |    ROW_NUMBER() OVER (PARTITION BY p_partkey
        |      ORDER BY s_acctbal, s_suppkey) AS rk
        |    FROM part, ps, eu WHERE p_partkey = l_partkey
        |      AND l_suppkey = s_suppkey
        |      AND p_type = 'STANDARD' AND p_size <= 5)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM cand WHERE rk = 1
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q11_important_parts" ->
      """WITH v AS (SELECT l_partkey,
        |    SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS value
        |  FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_3'
        |  GROUP BY 1),
        | t AS (SELECT SUM(value) AS total FROM v)
        |SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS value
        |FROM v, t WHERE value * 1000 > total
        |ORDER BY value DESC, p_partkey""".stripMargin,
    "q20_dominant_supplier" ->
      """WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
        | q95 AS (SELECT l_partkey, l_suppkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq
        |   FROM lineitem, red WHERE l_partkey = p_partkey
        |     AND l_shipdate >= TIMESTAMP '1995-01-01'
        |     AND l_shipdate < TIMESTAMP '1996-01-01'
        |   GROUP BY 1, 2),
        | tot AS (SELECT l_partkey AS t_partkey, SUM(sq) AS tq
        |   FROM q95 GROUP BY 1)
        |SELECT DISTINCT s_suppkey, s_name
        |FROM q95, tot, supplier
        |WHERE l_partkey = t_partkey AND l_suppkey = s_suppkey
        |  AND sq * 2 > tq
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_culprit" ->
      """WITH lo AS (SELECT l_orderkey, l_suppkey, l_shipdate
        |    FROM lineitem, orders
        |    WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F'),
        | stats AS (SELECT l_orderkey AS ok, max(l_shipdate) AS mx,
        |     COUNT(DISTINCT l_suppkey) AS ns FROM lo GROUP BY 1),
        | atmax AS (SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS nmax,
        |     min(l_suppkey) AS culprit
        |   FROM lo, stats WHERE l_orderkey = ok AND l_shipdate = mx
        |   GROUP BY 1)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM atmax, stats, supplier
        |WHERE l_orderkey = ok AND ns > 1 AND nmax = 1
        |  AND culprit = s_suppkey
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey AS supplier_no,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier, rev WHERE s_suppkey = supplier_no
        |  AND total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps,
        |     part, supplier
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_brand <> 'Brand#5' AND p_size IN (1,4,9,14,19,23,36,45)
        |  AND s_acctbal >= 0
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH agg AS (SELECT l_partkey AS a_partkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
        |  AS DOUBLE)/7.0 AS DOUBLE) AS avg_yearly
        |FROM lineitem, part, agg
        |WHERE p_partkey = l_partkey AND a_partkey = l_partkey
        |  AND p_brand = 'Brand#23' AND p_size < 5
        |  AND CAST(l_quantity AS DECIMAL(18,4)) * 5 * cnt < sum_qty""".stripMargin,
    "q22_dormant_customers" ->
      """WITH stats AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s,
        |    COUNT(*) AS n FROM customer WHERE c_acctbal > 0.0)
        |SELECT n_name AS cntry, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM customer, nation, stats
        |WHERE c_nationkey = n_nationkey
        |  AND CAST(c_acctbal AS DECIMAL(18,4)) * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "copurchase_topk" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
        |FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,
    "skew_salted_agg" ->
      """SELECT event_type AS key,
        |CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY key""".stripMargin,
    "skew_salted_join" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1)
        |SELECT e.event_id, e.user_id, f.first_ts,
        |  CAST(e.ts = f.first_ts AS INTEGER) AS is_first
        |FROM events e JOIN f USING (user_id)
        |ORDER BY e.event_id""".stripMargin,
    "events_windowed_topk" ->
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS window_start, event_type,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY window_start
        |    ORDER BY n_events DESC, event_type) AS BIGINT) AS rank
        |  FROM c)
        |SELECT window_start, event_type, n_events, rank
        |FROM r WHERE rank <= 3 ORDER BY window_start, rank""".stripMargin,
    "events_window_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |COUNT(*) AS n_events,
        |CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_anomaly" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS window_start, event_type,
        |         COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type,
        |    CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_n,
        |    sqrt((CAST(SUM(n_events * n_events) AS DOUBLE)
        |        - CAST(SUM(n_events) AS DOUBLE) * SUM(n_events) / COUNT(*))
        |      / (COUNT(*) - 1)) AS sd_n
        |  FROM h GROUP BY 1)
        |SELECT window_start, h.event_type, n_events,
        |  round(mean_n, 6) AS mean_n,
        |  round((n_events - mean_n) / sd_n, 6) + 0.0 AS z,
        |  CAST(abs(n_events - mean_n) / sd_n > 3.0::DOUBLE AS INT) AS anomalous
        |FROM h JOIN m ON h.event_type = m.event_type
        |ORDER BY window_start, h.event_type""".stripMargin,
    "events_rolling_avg" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
        |SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_1h,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w, 6) + 0.0 AS avg_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "pipeline_chunk" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents WHERE length(trim(text)) > 0),
        |c AS (
        |  SELECT doc_id, toks, n_tok,
        |    unnest(range(0, 1 + CASE WHEN n_tok <= 64 THEN 0
        |      ELSE (n_tok - 64 + 47) // 48 END)) AS chunk_idx
        |  FROM d)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(chunk_idx * 48 AS BIGINT) AS tok_start,
        |  CAST(least(chunk_idx * 48 + 64, n_tok) AS BIGINT) AS tok_end,
        |  array_to_string(list_slice(toks, chunk_idx * 48 + 1,
        |    least(chunk_idx * 48 + 64, n_tok)), ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "pipeline_length_quantiles" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |      AS n_tok
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  round(quantile_cont(n_tok, 0.25), 6) AS p25,
        |  round(quantile_cont(n_tok, 0.5), 6) AS p50,
        |  round(quantile_cont(n_tok, 0.75), 6) AS p75,
        |  round(quantile_cont(n_tok, 0.95), 6) AS p95,
        |  max(n_tok) AS max_tok
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "events_asof_join" ->
      """WITH v AS (
        |  SELECT user_id, ts, max(event_id) AS view_id,
        |    arg_max(value, event_id) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
        |  v.view_id, v.ts AS view_ts,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us,
        |  v.view_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY purchase_id""".stripMargin,
    "events_range_join" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS p_ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT purchase_id, p.user_id AS user_id, COUNT(*) AS n_events_30m,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value_30m
        |FROM p JOIN events e ON p.user_id = e.user_id
        |  AND e.ts >= p.p_ts - INTERVAL 30 MINUTE AND e.ts <= p.p_ts
        |  AND e.event_id <> p.purchase_id
        |GROUP BY 1, 2 ORDER BY purchase_id""".stripMargin,
    "events_cep_negation" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    max(CASE WHEN event_type = 'view' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view,
        |    max(CASE WHEN event_type = 'click' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
        |  FROM events),
        |p AS (
        |  SELECT user_id,
        |    CASE WHEN last_view IS NOT NULL
        |      AND epoch_us(ts) - epoch_us(last_view) <= 3600000000
        |      AND (last_click IS NULL OR last_click <= last_view)
        |      THEN 1 ELSE 0 END AS direct
        |  FROM w WHERE event_type = 'purchase')
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(direct) AS BIGINT) AS n_direct
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_sequence_detect" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS t
        |  FROM events),
        |s AS (
        |  SELECT user_id, string_agg(t, '' ORDER BY ts, event_id) AS seq,
        |    COUNT(*) AS n_events
        |  FROM ev GROUP BY 1)
        |SELECT user_id, n_events,
        |  CAST(len(regexp_extract_all(seq, 'vcp')) AS BIGINT) AS n_vcp,
        |  CAST(regexp_matches(seq, 'v.*c.*p') AS INT) AS converted,
        |  CAST(len(regexp_extract_all(seq, 'e+')) AS BIGINT) AS n_error_bursts
        |FROM s ORDER BY user_id""".stripMargin,
    "events_session_paths" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM x),
        |z AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM y),
        |tri AS (
        |  SELECT event_type || '>' ||
        |    lead(event_type, 1) OVER w || '>' ||
        |    lead(event_type, 2) OVER w AS path,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM z
        |  WINDOW w AS (PARTITION BY user_id, session_seq
        |               ORDER BY ts, event_id))
        |SELECT path, COUNT(*) AS n FROM tri WHERE e3 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "events_markov" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM x),
        |z AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM y),
        |tr AS (
        |  SELECT event_type AS src_type,
        |    lead(event_type, 1) OVER (
        |      PARTITION BY user_id, session_seq
        |      ORDER BY ts, event_id) AS dst_type
        |  FROM z),
        |cnt AS (
        |  SELECT src_type, dst_type, COUNT(*) AS n FROM tr
        |  WHERE dst_type IS NOT NULL GROUP BY 1, 2)
        |SELECT src_type, dst_type, n,
        |  round(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (
        |    PARTITION BY src_type) AS DOUBLE), 6) + 0.0 AS p
        |FROM cnt ORDER BY src_type, dst_type""".stripMargin,
    "events_attribution" ->
      """WITH f AS (
        |  SELECT user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rf,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rl
        |  FROM events),
        |u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN rf = 1 THEN event_type END) AS first_touch,
        |    MAX(CASE WHEN rl = 1 THEN event_type END) AS last_touch,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM f GROUP BY user_id)
        |SELECT first_touch, last_touch, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(v) AS DOUBLE) AS total_value
        |FROM u GROUP BY 1, 2 ORDER BY first_touch, last_touch""".stripMargin,
    "events_rfm" ->
      """WITH gm AS (SELECT MAX(ts) AS global_max FROM events),
        |per AS (
        |  SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS monetary
        |  FROM events GROUP BY user_id),
        |x AS (
        |  SELECT p.*, date_diff('day', CAST(last_ts AS DATE),
        |    CAST(gm.global_max AS DATE)) AS recency_days
        |  FROM per p CROSS JOIN gm),
        |t AS (
        |  SELECT user_id, recency_days, frequency, monetary,
        |    CAST(ntile(3) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r,
        |    CAST(ntile(3) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f,
        |    CAST(ntile(3) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m
        |  FROM x)
        |SELECT user_id, recency_days, frequency, monetary, r, f, m,
        |  r * 100 + f * 10 + m AS segment
        |FROM t ORDER BY user_id""".stripMargin,
    "events_sessionize_native" ->
      // `> 1800` is exact at the boundary: session_window MERGES
      // sessions that touch at a point (an event exactly gap seconds
      // after the previous one joins its session) — verified by
      // EventsSpec's boundary pin, so both sessionize spellings share
      // this oracle shape.
      """WITH x AS (
        |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM x),
        |z AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM y)
        |SELECT user_id,
        |MIN(ts) AS session_start, MAX(ts) AS session_end,
        |COUNT(*) AS n_events,
        |CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM z GROUP BY user_id, session_seq
        |ORDER BY user_id, session_start""".stripMargin,
    "events_sessionize" ->
      """WITH x AS (
        |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM x),
        |z AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM y)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |MIN(ts) AS session_start, MAX(ts) AS session_end,
        |COUNT(*) AS n_events,
        |CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM z GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "events_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= t1.t1 GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= t2.t2 GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM t1) AS n_view,
        |  (SELECT COUNT(*) FROM t2) AS n_view_click,
        |  (SELECT COUNT(*) FROM t3) AS n_funnel""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id,
        |COUNT(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(ws) - 2, 0) + 1),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        |  FROM w WHERE len(ws) >= 3),
        |ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS g FROM sh),
        |p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.n_sh AS a_n, b.n_sh AS b_n, COUNT(*) AS inter
        |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT a_id, b_id,
        |round(CAST(inter AS DOUBLE) / (a_n + b_n - inter), 6) AS jaccard
        |FROM p WHERE round(CAST(inter AS DOUBLE) / (a_n + b_n - inter), 6) >= 0.6
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_containment" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(ws) - 2, 0) + 1),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        |  FROM w WHERE len(ws) >= 3),
        |ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS g FROM sh),
        |p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.n_sh AS a_n, b.n_sh AS b_n, COUNT(*) AS inter
        |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT a_id, b_id,
        |round(CAST(inter AS DOUBLE) / least(a_n, b_n), 6) AS containment
        |FROM p WHERE round(CAST(inter AS DOUBLE) / least(a_n, b_n), 6) >= 0.9
        |ORDER BY a_id, b_id""".stripMargin,
    "embed_cosine_dup" -> OracleSql.embCosineDup(),
    "sim_topk_bruteforce" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM n WHERE vec_id < 5),
        |d AS (SELECT vec_id, v, nrm FROM n WHERE vec_id >= 5),
        |s AS (
        |  SELECT q.q_id, d.vec_id,
        |  round(CASE WHEN d.nrm = 0 OR q.q_nrm = 0 THEN 0
        |    ELSE list_dot_product(d.v, q.q_v) / (d.nrm * q.q_nrm) END, 6) + 0.0 AS score
        |  FROM d CROSS JOIN q),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM s)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, score
        |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "sim_topk_agg" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM n WHERE vec_id < 5),
        |d AS (SELECT vec_id, v, nrm FROM n WHERE vec_id >= 5),
        |s AS (
        |  SELECT q.q_id, d.vec_id,
        |  round(CASE WHEN d.nrm = 0 OR q.q_nrm = 0 THEN 0
        |    ELSE list_dot_product(d.v, q.q_v) / (d.nrm * q.q_nrm) END, 6) + 0.0 AS score
        |  FROM d CROSS JOIN q),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM s)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, score
        |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "sim_label_centroid" ->
      """WITH ex AS (
        |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS d
        |  FROM embeddings)
        |SELECT label, CAST(d - 1 AS BIGINT) AS d,
        |round(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6) + 0.0 AS centroid
        |FROM ex GROUP BY label, d ORDER BY label, d""".stripMargin,
    "embed_outliers" ->
      """WITH ex AS (
        |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS d
        |  FROM embeddings),
        |cd AS (
        |  SELECT label, d,
        |    round(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6) AS c
        |  FROM ex GROUP BY label, d),
        |cent AS (SELECT label, list(c ORDER BY d) AS cvec FROM cd GROUP BY label),
        |n AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |s AS (
        |  SELECT n.vec_id, CAST(n.label AS BIGINT) AS label,
        |    round(CASE WHEN n.nrm = 0
        |        OR sqrt(list_dot_product(c.cvec, c.cvec)) = 0 THEN 0
        |      ELSE list_dot_product(n.v, c.cvec)
        |        / (n.nrm * sqrt(list_dot_product(c.cvec, c.cvec))) END, 6)
        |      + 0.0 AS cos_centroid
        |  FROM n JOIN cent c ON n.label = c.label)
        |SELECT vec_id, label, cos_centroid,
        |  CAST(CASE WHEN cos_centroid < 0.2 THEN 1 ELSE 0 END AS INTEGER)
        |    AS is_outlier
        |FROM s ORDER BY vec_id""".stripMargin,
    "sim_ann_ivfpq" -> OracleSql.annIvfPq(),
    "sim_ann_ivf" ->
      """WITH ex AS (
        |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS d
        |  FROM embeddings),
        |cd AS (
        |  SELECT label, d,
        |    round(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*), 6) AS c
        |  FROM ex GROUP BY label, d),
        |cent AS (SELECT label AS cell, list(c ORDER BY d) AS cvec FROM cd GROUP BY label),
        |n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |assign AS (
        |  SELECT vec_id, v, nrm, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY
        |      list_dot_product(v, v) - 2.0*list_dot_product(v, cvec)
        |        + list_dot_product(cvec, cvec), cell) AS rk
        |  FROM n CROSS JOIN cent),
        |d AS (SELECT cell, vec_id, v, nrm FROM assign WHERE rk = 1 AND vec_id >= 5),
        |q AS (SELECT cell, vec_id AS q_id, v AS q_v, nrm AS q_nrm
        |      FROM assign WHERE rk <= 2 AND vec_id < 5),
        |s AS (
        |  SELECT q.q_id, d.vec_id,
        |    round(CASE WHEN d.nrm = 0 OR q.q_nrm = 0 THEN 0
        |      ELSE list_dot_product(d.v, q.q_v) / (d.nrm * q.q_nrm) END, 6) + 0.0 AS score
        |  FROM d JOIN q USING (cell)),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM s)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, score
        |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "text_unigram_lm" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE len(trim(text)) > 0),
        |t AS (SELECT doc_id,
        |        unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |      FROM d),
        |t2 AS (SELECT doc_id, token FROM t WHERE len(token) > 0),
        |c AS (SELECT token, COUNT(*) AS cnt FROM t2 GROUP BY 1),
        |n AS (SELECT SUM(cnt) AS n_total FROM c),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n,
        |    CAST(SUM(CAST(round(ln(CAST(cnt AS DOUBLE) / n_total), 6)
        |      AS DECIMAL(28,12))) * 1000000000000 AS BIGINT) AS s12
        |  FROM t2 JOIN c USING (token) CROSS JOIN n GROUP BY doc_id)
        |SELECT doc_id, n AS n_tok,
        |  CAST(CASE WHEN s12 < 0
        |    THEN -((-s12 + n * 500000) // (n * 1000000))
        |    ELSE (s12 + n * 500000) // (n * 1000000) END AS DOUBLE)
        |    / 1000000.0 + 0.0 AS mean_logprob
        |FROM agg ORDER BY doc_id""".stripMargin,
    "text_bigram_lm" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE len(trim(text)) > 0),
        |t AS (SELECT doc_id,
        |        list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                    x -> len(x) > 0) AS toks
        |      FROM d),
        |tok AS (SELECT doc_id, unnest(toks) AS w1 FROM t),
        |u AS (SELECT w1, COUNT(*) AS cu FROM tok GROUP BY 1),
        |v AS (SELECT COUNT(*) AS v FROM u),
        |bi0 AS (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks) - 1)) AS i
        |        FROM t),
        |bi AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 FROM bi0),
        |bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bi GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n,
        |    CAST(SUM(CAST(round(ln(CAST(cb + 1 AS DOUBLE) / (cu + v)), 6)
        |      AS DECIMAL(28,12))) * 1000000000000 AS BIGINT) AS s12
        |  FROM bi JOIN bc USING (w1, w2) JOIN u USING (w1) CROSS JOIN v
        |  GROUP BY doc_id)
        |SELECT doc_id, n AS n_bigrams,
        |  CAST(CASE WHEN s12 < 0
        |    THEN -((-s12 + n * 500000) // (n * 1000000))
        |    ELSE (s12 + n * 500000) // (n * 1000000) END AS DOUBLE)
        |    / 1000000.0 + 0.0 AS mean_logprob
        |FROM agg ORDER BY doc_id""".stripMargin,
    "text_zipf" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE len(trim(text)) > 0),
        |t AS (SELECT doc_id,
        |        unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |      FROM d),
        |t2 AS (SELECT token FROM t WHERE len(token) > 0),
        |c AS (SELECT token, COUNT(*) AS cnt FROM t2 GROUP BY 1),
        |top AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank
        |        FROM c ORDER BY cnt DESC, token LIMIT 100),
        |r AS (SELECT round(ln(CAST(rank AS DOUBLE)), 12) AS x,
        |             round(ln(CAST(cnt AS DOUBLE)), 12) AS y FROM top),
        |s AS (SELECT COUNT(*) AS n,
        |        CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
        |        CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        |        CAST(SUM(CAST(round(x * y, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
        |        CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxx
        |      FROM r)
        |SELECT n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS slope,
        |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
        |    + 0.0 AS intercept
        |FROM s""".stripMargin,
    "contamination_embedding" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |b AS (SELECT vec_id AS b_id, v AS b_v, nrm AS b_nrm FROM e
        |      WHERE vec_id % 29 = 0),
        |c AS (SELECT * FROM e WHERE vec_id % 29 <> 0),
        |p AS (
        |  SELECT c.vec_id, b.b_id,
        |    round(CASE WHEN c.nrm = 0 OR b.b_nrm = 0 THEN 0
        |      ELSE list_dot_product(c.v, b.b_v) / (c.nrm * b.b_nrm) END, 6) AS cos
        |  FROM c CROSS JOIN b),
        |q AS (SELECT * FROM p WHERE cos >= 0.35),
        |agg AS (
        |  SELECT vec_id, COUNT(*) AS n_hits FROM q GROUP BY 1),
        |best AS (
        |  SELECT vec_id, cos AS max_cos, b_id AS bench_id FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cos DESC, b_id) AS rk FROM q)
        |  WHERE rk = 1)
        |SELECT a.vec_id, a.n_hits, best.max_cos + 0.0 AS max_cos, best.bench_id
        |FROM agg a JOIN best USING (vec_id) ORDER BY a.vec_id""".stripMargin,
    "text_gopher" -> (gopherOracleBase + "\nORDER BY doc_id"),
    "pipeline_quality_funnel" ->
      s"""WITH g AS ($gopherOracleBase)
         |SELECT COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(r_word_count AS BIGINT)) AS BIGINT) AS p_word_count,
         |  CAST(SUM(CAST(r_mean_len AS BIGINT)) AS BIGINT) AS p_mean_len,
         |  CAST(SUM(CAST(r_symbol AS BIGINT)) AS BIGINT) AS p_symbol,
         |  CAST(SUM(CAST(r_alpha AS BIGINT)) AS BIGINT) AS p_alpha,
         |  CAST(SUM(CAST(r_stops AS BIGINT)) AS BIGINT) AS p_stops,
         |  CAST(SUM(CAST(r_word_count AS BIGINT)) AS BIGINT) AS c_word_count,
         |  CAST(SUM(CAST(r_word_count * r_mean_len AS BIGINT)) AS BIGINT) AS c_mean_len,
         |  CAST(SUM(CAST(r_word_count * r_mean_len * r_symbol AS BIGINT)) AS BIGINT) AS c_symbol,
         |  CAST(SUM(CAST(r_word_count * r_mean_len * r_symbol * r_alpha AS BIGINT)) AS BIGINT) AS c_alpha,
         |  CAST(SUM(CAST(keep AS BIGINT)) AS BIGINT) AS n_keep
         |FROM g""".stripMargin,
    "text_quality" ->
      ("""SELECT doc_id,
        |CAST(length(text) AS BIGINT) AS n_chars_m,
        |CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_words,
        |CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
        |round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |  / greatest(length(text), 1), 6) AS punct_ratio,
        |round(CAST(length(text) AS DOUBLE) / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
        |  ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1), 6) AS mean_word_len,
        |CAST(""" + TextAnalysis.stopwords("en").map(w =>
          s"(CASE WHEN regexp_matches(text, '(?i)(^|\\s)$w(\\s|$$)') THEN 1 ELSE 0 END)")
          .mkString(" + ") + """ AS BIGINT) AS en_stopword_hits,
        |CAST(CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END) BETWEEN 5 AND 100000
        |  AND CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |    / greatest(length(text), 1) < 0.2
        |  THEN 1 ELSE 0 END AS INT) AS keep
        |FROM documents ORDER BY doc_id""").stripMargin,
    "text_top_tokens" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |  FROM documents)
        |WHERE len(token) > 0
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "text_length_hist" ->
      """SELECT length(text) // 256 AS bucket, COUNT(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "pipeline_mix" ->
      """WITH s AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT)
        |      AS tokens
        |  FROM documents GROUP BY source),
        |z AS (SELECT round(SUM(pow(tokens::DOUBLE, 0.5::DOUBLE)), 6) AS z FROM s)
        |SELECT source, n_docs, tokens,
        |  round(round(pow(tokens::DOUBLE, 0.5::DOUBLE), 6) / z, 6) AS weight
        |FROM s CROSS JOIN z ORDER BY source""".stripMargin,
    "sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ((2654435761 * (doc_id % 1000000007) + 3266489917)
        |          % 1000000007) % 100 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "pipeline_shuffle" ->
      s"""WITH k AS (
        |  SELECT doc_id,
        |    (${graft.OracleHash.a(1)} * (doc_id % 1000000007) + ${graft.OracleHash.b(1)})
        |      % 1000000007 AS k1,
        |    (${graft.OracleHash.a(2)} * (doc_id % 1000000007) + ${graft.OracleHash.b(2)})
        |      % 1000000007 AS k2
        |  FROM documents),
        |s AS (SELECT doc_id, k1, k2,
        |        k1 % 8 AS shard_e1, k2 % 8 AS shard_e2 FROM k)
        |SELECT doc_id, shard_e1,
        |  row_number() OVER (PARTITION BY shard_e1 ORDER BY k1, doc_id)
        |    AS pos_e1,
        |  shard_e2,
        |  row_number() OVER (PARTITION BY shard_e2 ORDER BY k2, doc_id)
        |    AS pos_e2
        |FROM s ORDER BY doc_id""".stripMargin,
    "sample_weighted" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(greatest(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1)
        |      AS BIGINT) AS weight
        |  FROM documents),
        |kk AS (
        |  SELECT doc_id, weight,
        |    CAST(floor(
        |      ((2654435761 * (doc_id % 1000000007) + 3266489917)
        |        % 1000000007) / CAST(weight AS DOUBLE)) AS BIGINT) AS key
        |  FROM d),
        |t AS (SELECT * FROM kk ORDER BY key, doc_id LIMIT 50)
        |SELECT CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT)
        |    AS rank,
        |  doc_id, weight, key
        |FROM t ORDER BY rank""".stripMargin,
    "sample_importance"   -> OracleSql.importanceSample(),
    "events_value_hist" ->
      """SELECT event_type,
        |  CAST(floor(value / 20.0) + 1 AS BIGINT) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    "events_hopping_window" ->
      """WITH w AS (
        |  SELECT make_timestamp(
        |      ((CAST(floor(epoch(ts) / 900) AS BIGINT) - o.o) * 900)
        |        * 1000000) AS window_start,
        |    event_type, value
        |  FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS o(o))
        |SELECT window_start, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "embed_quantize_int8" ->
      """WITH e AS (
        |  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |         generate_subscripts(embedding, 1) - 1 AS d
        |  FROM embeddings),
        |s AS (SELECT d, max(abs(x)) AS scale FROM e GROUP BY d),
        |c AS (
        |  SELECT e.vec_id,
        |    CASE WHEN s.scale = 0 THEN 0
        |         ELSE CAST(floor(x * 127 / s.scale + 0.5) AS INT) END AS code
        |  FROM e JOIN s USING (d))
        |SELECT vec_id, COUNT(*) AS n_dims,
        |  CAST(SUM(code) AS BIGINT) AS code_sum,
        |  MIN(code) AS code_min, MAX(code) AS code_max,
        |  CAST(SUM(CASE WHEN abs(code) = 127 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sat
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_ppl_buckets" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE length(trim(text)) > 0),
        |toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)),
        |    '\s+')) AS token
        |  FROM docs),
        |t2 AS (SELECT doc_id, token FROM toks WHERE len(token) > 0),
        |counts AS (SELECT token, COUNT(*) AS cnt FROM t2 GROUP BY token),
        |total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM counts),
        |agg AS (
        |  SELECT t2.doc_id, COUNT(*) AS n,
        |    CAST(SUM(CAST(round(ln(CAST(cnt AS DOUBLE) / n_total), 6)
        |      AS DECIMAL(28,12))) * 1000000000000 AS BIGINT) AS s12
        |  FROM t2 JOIN counts USING (token) CROSS JOIN total
        |  GROUP BY t2.doc_id),
        |scored AS (
        |  SELECT doc_id, n AS n_tok,
        |    CAST(CASE WHEN s12 < 0
        |      THEN -((-s12 + n * 500000) // (n * 1000000))
        |      ELSE (s12 + n * 500000) // (n * 1000000) END AS DOUBLE)
        |      / 1000000.0 + 0.0 AS mean_logprob
        |  FROM agg)
        |SELECT s.doc_id, d.lang, s.mean_logprob,
        |  CAST(ntile(3) OVER (PARTITION BY d.lang
        |    ORDER BY s.mean_logprob DESC, s.doc_id) AS BIGINT) AS tercile,
        |  CASE ntile(3) OVER (PARTITION BY d.lang
        |    ORDER BY s.mean_logprob DESC, s.doc_id)
        |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |    ELSE 'tail' END AS bucket
        |FROM scored s JOIN docs d USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin,
    "events_pivot" ->
      """SELECT CAST(ts AS DATE) AS d,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY d""".stripMargin,
    "pipeline_pack" ->
      """SELECT doc_id, shard, n_tok, start_off,
        |  CAST(floor(start_off / 2048.0) AS BIGINT) AS chunk
        |FROM (
        |  SELECT doc_id, doc_id % 32 AS shard, n_tok,
        |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY doc_id % 32 ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_off
        |  FROM (SELECT doc_id,
        |          CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |            END AS BIGINT) AS n_tok
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE length(trim(text)) > 0),
        |tok AS (SELECT doc_id,
        |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |        FROM d),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
        |       WHERE len(token) > 0 GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM d)
        |SELECT doc_id, rank, token, score FROM (
        |  SELECT tf.doc_id, tf.token,
        |    round(tf.tf * ln((n.n_docs + 1)::DOUBLE / (df.df + 1)), 6) AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY round(tf.tf * ln((n.n_docs + 1)::DOUBLE / (df.df + 1)), 6)
        |        DESC, tf.token) AS rank
        |  FROM tf JOIN df USING (token) CROSS JOIN n)
        |WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS ws_tokens,
        |CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frame_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    CAST((len(text) + 63) // 64 AS BIGINT) AS nf
        |  FROM documents WHERE len(text) > 0),
        |f AS (
        |  SELECT doc_id,
        |    substr(text, CAST(t.i * 64 + 1 AS BIGINT), 64) AS w
        |  FROM d, UNNEST(range(nf)) AS t(i)),
        |c AS (
        |  SELECT doc_id,
        |    list_transform(string_split(w, ''), ch -> ord(ch)) AS codes
        |  FROM f),
        |m AS (
        |  SELECT doc_id, codes,
        |    CAST(floor(CAST(list_sum(codes) AS DOUBLE)
        |      / greatest(len(codes), 1)) AS BIGINT) AS mean_code
        |  FROM c),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(1, least(len(codes), 62) + 1),
        |      i -> CASE WHEN codes[i] > mean_code
        |        THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END))
        |      AS BIGINT) AS fhash
        |  FROM m),
        |hd AS (SELECT DISTINCT doc_id, fhash FROM h),
        |keep AS (
        |  SELECT fhash FROM hd GROUP BY fhash
        |  HAVING COUNT(*) BETWEEN 2 AND 20)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM hd a JOIN hd b ON a.fhash = b.fhash AND a.doc_id < b.doc_id
        |JOIN keep k ON a.fhash = k.fhash
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY a_id, b_id""".stripMargin,
    "multimodal_phash" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    list_transform(string_split(substr(text, 1, 64), ''), ch -> ord(ch)) AS codes
        |  FROM documents WHERE len(text) > 0),
        |m AS (
        |  SELECT doc_id, codes,
        |    CAST(floor(CAST(list_sum(codes) AS DOUBLE)
        |      / greatest(len(codes), 1)) AS BIGINT) AS mean_code
        |  FROM c),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(1, least(len(codes), 62) + 1),
        |      i -> CASE WHEN codes[i] > mean_code
        |        THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END))
        |      AS BIGINT) AS phash
        |  FROM m)
        |SELECT phash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
        |FROM h GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY phash""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |CAST(256 + (octet_length(encode(text)) % 64) * 16 AS BIGINT) AS width,
        |CAST(256 + ((octet_length(encode(text)) // 64) % 64) * 16 AS BIGINT) AS height,
        |CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |  ELSE 'wav' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_decoded" ->
      """SELECT doc_id,
        |CAST(256 + (octet_length(encode(text)) % 64) * 16 AS BIGINT) AS width,
        |CAST(256 + ((octet_length(encode(text)) // 64) % 64) * 16 AS BIGINT) AS height,
        |CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |  ELSE 'wav' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CAST(256 + (octet_length(encode(text)) % 64) * 16 AS BIGINT) AS width,
        |    CAST(256 + ((octet_length(encode(text)) // 64) % 64) * 16 AS BIGINT) AS height
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    greatest(1, width * 224 // greatest(width, height)) AS target_w,
        |    greatest(1, height * 224 // greatest(width, height)) AS target_h,
        |    n_bytes // 1024 + 1 AS n_frames
        |  FROM m),
        |x AS (
        |  SELECT doc_id, target_w, target_h,
        |    unnest(range(0, n_frames, greatest(1, n_frames // 8))) AS frame_no
        |  FROM p)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY frame_no) - 1
        |    AS BIGINT) AS sample_idx,
        |  CAST(frame_no AS BIGINT) AS frame_no, target_w, target_h
        |FROM x ORDER BY doc_id, sample_idx""".stripMargin,
    "multimodal_prep" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CAST(256 + (octet_length(encode(text)) % 64) * 16 AS BIGINT) AS width,
        |    CAST(256 + ((octet_length(encode(text)) // 64) % 64) * 16 AS BIGINT) AS height
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    greatest(1, width * 224 // greatest(width, height)) AS target_w,
        |    greatest(1, height * 224 // greatest(width, height)) AS target_h,
        |    n_bytes // 1024 + 1 AS n_frames
        |  FROM m)
        |SELECT doc_id, target_w, target_h, n_frames,
        |  greatest(1, n_frames // 8) AS stride,
        |  (n_frames - 1) // greatest(1, n_frames // 8) + 1 AS n_samples
        |FROM p ORDER BY doc_id""".stripMargin,
    "cypher_match_scan" ->
      """SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal
        |FROM customer ORDER BY id""".stripMargin,
    "cypher_match_filter" ->
      """SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal
        |FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
        |ORDER BY id""".stripMargin,
    "cypher_expand" ->
      """SELECT c_name AS cust, n_name AS nation
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY cust, nation""".stripMargin,
    "cypher_expand_2hop" ->
      """SELECT c_name AS cust, n_name AS nation, r_name AS region
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY cust, nation, region""".stripMargin,
    "cypher_aggregate" ->
      """SELECT n_name AS nation, COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY nation""".stripMargin,
    "cypher_with_agg" ->
      """SELECT n_name AS nation, COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name HAVING COUNT(*) > 59 ORDER BY nation""".stripMargin,
    "cypher_collect_unwind" ->
      """SELECT n_name AS nation FROM nation ORDER BY nation""".stripMargin,
    "cypher_rel_props" ->
      """SELECT p_brand AS brand,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
        |COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY brand""".stripMargin,
    "cypher_arithmetic" ->
      """SELECT p_brand AS brand,
        |CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS volume
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity >= 25.0
        |GROUP BY p_brand ORDER BY brand""".stripMargin,
    "cypher_string_fns" ->
      """SELECT lower(n_name) AS name_lc, CAST(length(n_name) AS BIGINT) AS name_len
        |FROM nation ORDER BY name_lc""".stripMargin,
    "cypher_with_distinct" ->
      """SELECT r_name AS region FROM region
        |WHERE r_regionkey IN (
        |  SELECT DISTINCT n_regionkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey)
        |ORDER BY region""".stripMargin,
    "cypher_stat_disc" ->
      """SELECT c_mktsegment AS segment,
        |  quantile_disc(c_acctbal, 0.5) AS median_bal,
        |  quantile_disc(c_acctbal, 0.9) AS p90_bal,
        |  COUNT(*) AS n
        |FROM customer GROUP BY 1 ORDER BY segment""".stripMargin,
    "cypher_count_expr" ->
      """WITH cc AS (SELECT c_nationkey AS nk, COUNT(*) AS n FROM customer
        |           GROUP BY 1),
        |sc AS (SELECT s_nationkey AS nk, COUNT(*) AS n FROM supplier GROUP BY 1)
        |SELECT n_name AS nation,
        |  CAST(COALESCE(sc.n, 0) * 10 AS BIGINT) AS supp_x10
        |FROM nation
        |JOIN cc ON cc.nk = n_nationkey AND cc.n >= 60
        |LEFT JOIN sc ON sc.nk = n_nationkey
        |ORDER BY nation""".stripMargin,
    "cypher_skip_limit" ->
      """SELECT c_custkey AS id, c_name AS name FROM customer
        |ORDER BY id LIMIT 5 OFFSET 10""".stripMargin,
    "cypher_multi_type" ->
      """SELECT n_name AS nation, rel_type, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk, 'FROM_NATION' AS rel_type FROM customer
        |  UNION ALL
        |  SELECT s_nationkey, 'SUPP_NATION' FROM supplier)
        |JOIN nation ON nk = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, rel_type""".stripMargin,
    "cypher_simple_case" ->
      """SELECT CASE c_mktsegment WHEN 'BUILDING' THEN 'b2b'
        |  WHEN 'MACHINERY' THEN 'b2b' ELSE 'other' END AS channel,
        |COUNT(*) AS n
        |FROM customer GROUP BY 1 ORDER BY channel""".stripMargin,
    "cypher_return_star" ->
      """SELECT CAST(r_regionkey * 10 AS BIGINT) AS k10, r_name AS "r.name",
        |CAST(r_regionkey AS BIGINT) AS "r.regionkey"
        |FROM region ORDER BY k10""".stripMargin,
    "cypher_keys" ->
      """SELECT n_name AS nation, key FROM nation
        |CROSS JOIN (SELECT unnest(['name', 'nationkey', 'regionkey']) AS key)
        |WHERE n_nationkey < 3 ORDER BY nation, key""".stripMargin,
    "cypher_collect_distinct" ->
      """SELECT n_name AS nation,
        |  COUNT(DISTINCT c_mktsegment) AS n_segments,
        |  min(c_mktsegment) AS first_seg
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cypher_temporal" ->
      """SELECT CAST(ts AS DATE) AS d,
        |  CAST(year(ts) AS BIGINT) AS y,
        |  CAST(month(ts) AS BIGINT) AS m,
        |  CAST(isodow(ts) AS BIGINT) AS dow,
        |  COUNT(*) AS n,
        |  CAST(hour(ts) AS BIGINT) AS h
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND hour(ts) >= 6
        |GROUP BY 1, 2, 3, 4, 6 ORDER BY d, h""".stripMargin,
    "cypher_collect_subquery" ->
      """SELECT r_name AS region,
        |  CAST(COUNT(n_nationkey) AS BIGINT) AS n_nations,
        |  CAST(MIN(n_nationkey) AS BIGINT) AS first_key,
        |  CAST(COALESCE(SUM(CASE WHEN n_nationkey > 2
        |    THEN n_nationkey END), 0) AS BIGINT) AS key_sum
        |FROM region LEFT JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY region""".stripMargin,
    "cypher_catalog" ->
      """SELECT 'label' AS kind, name FROM (VALUES
        |  ('Customer'), ('Nation'), ('Order'), ('Part'), ('Region'),
        |  ('Supplier')) AS l(name)
        |UNION ALL
        |SELECT 'relationshipType' AS kind, name FROM (VALUES
        |  ('CONTAINS'), ('FROM_NATION'), ('IN_REGION'),
        |  ('NEXT_IN_REGION'), ('PLACED_BY'), ('SUPPLIES'),
        |  ('SUPP_NATION')) AS r(name)""".stripMargin,
    // label disjunction: the union of exactly the two label tables
    "cypher_label_disjunction" ->
      """SELECT kind, name, acctbal FROM (
        |  SELECT 'Customer' AS kind, c_name AS name, c_acctbal AS acctbal
        |  FROM customer WHERE c_acctbal > 9900.0
        |  UNION ALL
        |  SELECT 'Supplier', s_name, s_acctbal
        |  FROM supplier WHERE s_acctbal > 9900.0)
        |ORDER BY kind, name""".stripMargin,
    // label predicates over the untyped scan: region-2 nations plus
    // the region-2 region row
    "cypher_label_pred" ->
      """SELECT name, is_nation FROM (
        |  SELECT n_name AS name, TRUE AS is_nation FROM nation
        |  WHERE n_regionkey = 2
        |  UNION ALL
        |  SELECT r_name, FALSE FROM region WHERE r_regionkey = 2)
        |ORDER BY name""".stripMargin,
    // elementId = the engine id, stringified
    "cypher_element_id" ->
      """SELECT CAST(c_custkey + 2000000000 AS VARCHAR) AS eid,
        |  c_name AS name
        |FROM customer WHERE c_custkey < 5 ORDER BY name""".stripMargin,
    // the engine-wide property-key catalog: every node/rel property
    // column, deduplicated — schema facts, mirrored literally
    "cypher_catalog_keys" ->
      """SELECT name AS propertyKey FROM (VALUES
        |  ('acctbal'), ('brand'), ('custkey'), ('mktsegment'),
        |  ('name'), ('nationkey'), ('orderdate'), ('orderkey'),
        |  ('orderpriority'), ('orderstatus'), ('partkey'), ('price'),
        |  ('qty'), ('regionkey'), ('retailprice'), ('size'),
        |  ('suppkey'), ('totalprice'), ('type')) AS k(name)
        |ORDER BY propertyKey""".stripMargin,
    "cypher_temporal_ctor" ->
      """SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
        |  CAST(MIN(hour(ts)) AS BIGINT) AS h_min,
        |  CAST(MAX(hour(ts)) AS BIGINT) AS h_max
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-15 12:00:00'
        |GROUP BY 1 ORDER BY d""".stripMargin,
    "cypher_point" ->
      """WITH p AS (
        |  SELECT c_custkey AS id,
        |    CAST(c_custkey % 100 AS DOUBLE) AS x,
        |    CAST(c_nationkey * 3 AS DOUBLE) AS y
        |  FROM customer),
        |d AS (
        |  SELECT id, round(sqrt((x - 50.0) * (x - 50.0) +
        |    (y - 36.0) * (y - 36.0)), 6) AS dist
        |  FROM p)
        |SELECT CASE WHEN dist < 20.0 THEN 'near'
        |            WHEN dist < 45.0 THEN 'mid'
        |            ELSE 'far' END AS band,
        |  COUNT(*) AS n, MIN(dist) AS d_min, MAX(dist) AS d_max
        |FROM d GROUP BY 1 ORDER BY band""".stripMargin,
    "cypher_duration_ctor" ->
      // duration({weeks:1, days:2}) = 9 days back from Jan 31 -> Jan 22;
      // duration({days:1, hours:36}) forward from Jan 22 -> Jan 24 12:00
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(MIN(day(ts)) AS BIGINT) AS d_min,
        |  CAST(MAX(day(ts)) AS BIGINT) AS d_max
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-22 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-24 12:00:00'
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "cypher_temporal_types" ->
      """WITH b AS (
        |  SELECT ts,
        |    TIMESTAMP '1970-01-01 00:00:00'
        |      + (ts - date_trunc('day', ts)) AS lt
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-10 00:00:00')
        |SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
        |  MIN(lt) AS t_min, MAX(lt) AS t_max,
        |  CAST(MIN(hour(lt)) AS BIGINT) AS h_min,
        |  CAST(MAX(hour(lt)) AS BIGINT) AS h_max
        |FROM b
        |WHERE lt >= TIMESTAMP '1970-01-01 06:00:00'
        |  AND lt < TIMESTAMP '1970-01-01 18:30:00'
        |GROUP BY 1 ORDER BY d""".stripMargin,
    "cypher_point_bbox" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nk, COUNT(*) AS n
        |FROM customer
        |WHERE CAST(c_custkey % 120 - 60 AS DOUBLE) BETWEEN -30.0 AND 45.0
        |  AND CAST(c_nationkey * 13 - 170 AS DOUBLE) BETWEEN -100.0 AND 60.0
        |GROUP BY 1 ORDER BY nk""".stripMargin,
    "cypher_point_geo" ->
      """WITH p AS (
        |  SELECT c_custkey AS id,
        |    CAST(c_custkey % 120 - 60 AS DOUBLE) AS lat,
        |    CAST(c_nationkey * 13 - 170 AS DOUBLE) AS lon
        |  FROM customer),
        |d AS (
        |  SELECT id, round(2.0 * 6371000.0 * asin(sqrt(
        |    sin(radians(20.0 - lat) / 2) * sin(radians(20.0 - lat) / 2)
        |    + cos(radians(lat)) * cos(radians(20.0))
        |      * (sin(radians(5.0 - lon) / 2) * sin(radians(5.0 - lon) / 2))
        |    )), 1) AS dist
        |  FROM p)
        |SELECT CASE WHEN dist < 6000000.0 THEN 'near'
        |            WHEN dist < 12000000.0 THEN 'mid'
        |            ELSE 'far' END AS band,
        |  COUNT(*) AS n, MIN(dist) AS d_min, MAX(dist) AS d_max
        |FROM d GROUP BY 1 ORDER BY band""".stripMargin,
    "cypher_temporal_trunc" ->
      """SELECT date_trunc('week', ts) AS wk,
        |  CAST(date_trunc('month', ts) AS DATE) AS mo,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        |GROUP BY 1, 2 ORDER BY wk, mo""".stripMargin,
    "cypher_properties" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS id, key AS k,
        |  CASE key WHEN 'name' THEN r_name
        |           ELSE CAST(CAST(r_regionkey AS BIGINT) AS VARCHAR) END AS v
        |FROM region CROSS JOIN (SELECT unnest(['name', 'regionkey']) AS key)
        |ORDER BY id, k""".stripMargin,
    // rel-property introspection: two stringified props per CONTAINS
    // row (price, qty — key-sorted), keys() size a constant 2
    // multi-type named fixed hop: qty null-fills on :SUPPLIES steps,
    // keys(r) is the branch type's own key set
    "cypher_rel_props_union" ->
      """SELECT t, pk, qty, nk FROM (
        |  SELECT 'CONTAINS' AS t, CAST(l_partkey AS BIGINT) AS pk,
        |    l_quantity AS qty, CAST(2 AS BIGINT) AS nk
        |  FROM lineitem WHERE l_partkey < 2
        |  UNION ALL
        |  SELECT 'SUPPLIES', CAST(p AS BIGINT), NULL, CAST(0 AS BIGINT)
        |  FROM (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
        |        FROM lineitem WHERE l_partkey < 2))
        |ORDER BY t, pk, qty""".stripMargin,
    "cypher_rel_props_fn" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS ok,
        |  CAST(l_partkey AS BIGINT) AS pk, key AS k,
        |  CASE key WHEN 'price' THEN CAST(l_extendedprice AS VARCHAR)
        |           ELSE CAST(l_quantity AS VARCHAR) END AS v,
        |  CAST(2 AS BIGINT) AS nk
        |FROM lineitem CROSS JOIN (SELECT unnest(['price', 'qty']) AS key)
        |WHERE l_orderkey < 8
        |ORDER BY ok, pk, k, v""".stripMargin,
    "cypher_map_proj" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
        |  c_mktsegment AS segment
        |FROM customer WHERE c_custkey <= 10 ORDER BY id""".stripMargin,
    // `.*` enumerates every Customer property; the explicit `name:`
    // computed entry overrides the star's selector
    "cypher_map_proj_star" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id, upper(c_name) AS name,
        |  c_acctbal AS acctbal, c_mktsegment AS segment,
        |  CAST(c_nationkey AS BIGINT) AS nk
        |FROM customer WHERE c_custkey <= 10 ORDER BY id""".stripMargin,
    "cypher_pattern_comp" ->
      """SELECT n_name AS nation,
        |  CAST((SELECT COUNT(*) FROM customer c
        |        WHERE c.c_nationkey = n.n_nationkey
        |          AND c.c_acctbal > 9000.0) AS BIGINT) AS n_rich,
        |  CAST(COALESCE((SELECT SUM(c_custkey) FROM customer c
        |        WHERE c.c_nationkey = n.n_nationkey
        |          AND c.c_acctbal > 9000.0), 0) AS BIGINT) AS key_sum
        |FROM nation n ORDER BY nation""".stripMargin,
    "cypher_exists_where" ->
      """SELECT n_name AS nation FROM nation n
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_nationkey = n.n_nationkey
        |                AND c.c_acctbal > 9950.0)
        |ORDER BY nation""".stripMargin,
    "cypher_count_where" ->
      """SELECT n_name AS nation,
        |  (SELECT COUNT(*) FROM customer c
        |   WHERE c.c_nationkey = n.n_nationkey
        |     AND c.c_mktsegment = 'BUILDING') AS n_building
        |FROM nation n ORDER BY nation""".stripMargin,
    "cypher_temporal_arith" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(min(day(ts)) AS BIGINT) AS d_min,
        |  CAST(max(day(ts)) AS BIGINT) AS d_max
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-30 23:59:59' - INTERVAL 7 DAY
        |  AND ts < TIMESTAMP '2024-01-24 00:00:00' + INTERVAL 36 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cypher_temporal_arith2" ->
      """SELECT event_id AS id,
        |  CAST(floor(epoch(ts)) - epoch(TIMESTAMP '2023-12-31 00:00:00') AS BIGINT) AS age_secs,
        |  CAST(CAST(floor(epoch(ts)) - epoch(TIMESTAMP '2023-12-31 00:00:00') AS BIGINT) // 86400 AS BIGINT) AS age_days
        |FROM events
        |WHERE floor(epoch(ts)) - epoch(TIMESTAMP '2024-01-01 00:00:00') < 172800
        |ORDER BY id""".stripMargin,
    "cypher_list_index" ->
      """WITH p AS (SELECT n_name AS nation, string_split(n_name, '_') AS parts
        |           FROM nation)
        |SELECT nation, parts[1] AS p0, parts[-1] AS plast,
        |  CAST(len(parts[1:1]) AS BIGINT) AS n_first,
        |  CAST(len(parts[6:len(parts)]) AS BIGINT) AS n_tail
        |FROM p ORDER BY nation""".stripMargin,
    "cypher_math_fns" ->
      """SELECT c_custkey AS id,
        |  abs(c_acctbal) AS abs_bal,
        |  round(c_acctbal / 100.0, 6) AS bal_h,
        |  CAST(sign(c_acctbal) AS BIGINT) AS sgn,
        |  CAST(trunc(sqrt(CAST(c_custkey AS DOUBLE)) * 100.0) AS BIGINT) AS sqrt100,
        |  c_custkey % 7 AS m7,
        |  floor(c_acctbal / 1000.0) AS k_floor,
        |  ceil(c_acctbal / 1000.0) AS k_ceil,
        |  power(2.0, 10) AS p2
        |FROM customer WHERE c_custkey <= 50 ORDER BY id""".stripMargin,
    "cypher_math_fns2" ->
      """SELECT c_custkey AS id,
        |  round(exp(c_acctbal / 10000.0), 6) AS k_exp,
        |  round(ln(abs(c_acctbal) + 1.0), 6) AS k_ln,
        |  round(log10(abs(c_acctbal) + 1.0), 6) AS k_log10,
        |  round(sin(c_acctbal / 1000.0), 6) AS k_sin,
        |  round(cos(c_acctbal / 1000.0), 6) AS k_cos,
        |  round(tan(c_acctbal / 10000.0), 6) AS k_tan,
        |  round(atan(c_acctbal / 1000.0), 6) AS k_atan,
        |  round(atan2(c_acctbal, 1000.0), 6) AS k_atan2,
        |  round(degrees(asin(c_acctbal / 10000.0)), 6) AS k_deg,
        |  round(radians(c_acctbal / 100.0), 6) AS k_rad,
        |  round(acos(c_acctbal / 10000.0), 6) AS k_acos,
        |  round(pi(), 6) AS k_pi,
        |  round(exp(1.0), 6) AS k_e,
        |  (length(trim(c_name)) = 0) AS k_empty,
        |  (length(replace(c_name, c_name, '')) = 0) AS k_empty2
        |FROM customer WHERE c_custkey <= 50 ORDER BY id""".stripMargin,
    "cypher_rel_endpoints" ->
      """SELECT 1000000000 + l_orderkey AS start_id,
        |  6000000000 + l_partkey AS end_id,
        |  1000000000 + l_orderkey AS o_id,
        |  l_quantity AS qty
        |FROM lineitem WHERE l_partkey <= 3
        |ORDER BY start_id, end_id, qty""".stripMargin,
    "cypher_string_fns2" ->
      """SELECT n_name AS nation,
        |  substr(n_name, 1, 3) AS pre,
        |  replace(n_name, 'A', '@') AS repl,
        |  reverse(n_name) AS rev,
        |  left(n_name, 4) AS l4,
        |  right(n_name, 2) AS r2,
        |  CAST(len(string_split(n_name, '_')) AS BIGINT) AS n_parts,
        |  CAST(n_nationkey AS VARCHAR) AS key_str,
        |  ltrim('  pad') AS lt, rtrim('pad  ') AS rt,
        |  CAST('TRUE' AS BOOLEAN) AS tb
        |FROM nation ORDER BY nation""".stripMargin,
    "cypher_list_pred" ->
      """WITH b AS (
        |  SELECT n_name AS nation, c_acctbal AS bal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT nation,
        |  bool_or(bal < 0.0) AS has_neg,
        |  bool_and(bal > -999.99) AS all_above,
        |  NOT bool_or(bal > 9999.0) AS none_big,
        |  count(*) FILTER (WHERE bal > 9995.0) = 1 AS one_top,
        |  min(bal) AS min_bal,
        |  max(bal) AS max_bal,
        |  count(*) - 1 AS n_rest
        |FROM b GROUP BY nation ORDER BY nation""".stripMargin,
    "cypher_node_return" ->
      """SELECT 2000000000 + c_custkey AS node_id, c_name AS name, c_acctbal AS acctbal
        |FROM customer ORDER BY node_id""".stripMargin,
    "cypher_whole_node" ->
      """SELECT n_name AS "n.name", CAST(n_nationkey AS BIGINT) AS "n.nationkey",
        |CAST(n_regionkey AS BIGINT) AS "n.regionkey"
        |FROM nation ORDER BY 2""".stripMargin,
    "cypher_untyped_scan" ->
      """SELECT 3000000000 + n_nationkey AS src_id, 4000000000 + n_regionkey AS dst_id
        |FROM nation ORDER BY src_id""".stripMargin,
    "cypher_untyped_rel" ->
      """WITH nx AS (
        |  SELECT n_nationkey AS k,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS nk
        |  FROM nation),
        |e AS (
        |  SELECT 3000000000 + n_nationkey AS src, 4000000000 + n_regionkey AS dst
        |  FROM nation
        |  UNION ALL
        |  SELECT 3000000000 + k, 3000000000 + nk FROM nx WHERE nk IS NOT NULL)
        |SELECT src AS a_id, dst AS b_id FROM e ORDER BY a_id, b_id""".stripMargin,
    "cypher_rel_where" ->
      """SELECT p_brand AS brand, COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity > 45.0
        |GROUP BY p_brand ORDER BY brand""".stripMargin,
    "cypher_chain_uniq" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |u AS (
        |  SELECT src, dst, src AS osrc, dst AS odst FROM e2
        |  UNION ALL
        |  SELECT dst AS src, src AS dst, src AS osrc, dst AS odst FROM e2)
        |SELECT na.n_name AS a_name, nb.n_name AS b_name, nc.n_name AS c_name
        |FROM u x JOIN u y ON x.dst = y.src
        |  AND NOT (x.osrc = y.osrc AND x.odst = y.odst)
        |JOIN nation na ON x.src = na.n_nationkey
        |JOIN nation nb ON x.dst = nb.n_nationkey
        |JOIN nation nc ON y.dst = nc.n_nationkey
        |ORDER BY a_name, b_name, c_name""".stripMargin,
    "cypher_distinct_node" ->
      """SELECT DISTINCT n_name AS "n.name", CAST(n_nationkey AS BIGINT) AS "n.nationkey",
        |CAST(n_regionkey AS BIGINT) AS "n.regionkey"
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        |ORDER BY 2""".stripMargin,
    "cypher_string_pred" ->
      """SELECT c_custkey AS id, c_name AS name
        |FROM customer
        |WHERE c_name LIKE 'Customer#000000%'
        |  AND c_mktsegment LIKE '%ING%'
        |  AND c_name LIKE '%1'
        |ORDER BY id""".stripMargin,
    "cypher_type_of" ->
      """WITH nx AS (
        |  SELECT n_nationkey AS k,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS nk
        |  FROM nation),
        |r AS (
        |  SELECT 'IN_REGION' AS rel_type FROM nation
        |  UNION ALL
        |  SELECT 'NEXT_IN_REGION' FROM nx WHERE nk IS NOT NULL)
        |SELECT rel_type, COUNT(*) AS n_rels FROM r
        |GROUP BY rel_type ORDER BY rel_type""".stripMargin,
    "cypher_labels" ->
      """SELECT label, COUNT(*) AS n_nodes FROM (
        |  SELECT 'Customer' AS label FROM customer
        |  UNION ALL SELECT 'Nation' FROM nation
        |  UNION ALL SELECT 'Order' FROM orders
        |  UNION ALL SELECT 'Part' FROM part
        |  UNION ALL SELECT 'Region' FROM region
        |  UNION ALL SELECT 'Supplier' FROM supplier)
        |GROUP BY label ORDER BY label""".stripMargin,
    "cypher_label_expr" ->
      """WITH counts AS (
        |  SELECT
        |    (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM nation)
        |      + (SELECT COUNT(*) FROM region) + (SELECT COUNT(*) FROM orders)
        |      + (SELECT COUNT(*) FROM supplier) + (SELECT COUNT(*) FROM part)
        |      AS all_nodes,
        |    (SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region)
        |      + (SELECT COUNT(*) FROM supplier) AS small3)
        |SELECT c.all_nodes AS all_nodes, c.small3 AS small3,
        |  (SELECT COUNT(*) FROM supplier s
        |   JOIN nation n ON s.s_nationkey = n.n_nationkey
        |   WHERE n.n_regionkey = 1) AS sup_r1
        |FROM counts c""".stripMargin,
    "cypher_in_list_expr" ->
      """WITH bn AS (
        |  SELECT DISTINCT c_nationkey AS nk FROM customer
        |  WHERE c_mktsegment = 'BUILDING')
        |SELECT n.n_name AS nation, COUNT(*) AS n_cust
        |FROM nation n JOIN bn ON bn.nk = n.n_nationkey
        |JOIN customer c2 ON c2.c_nationkey = n.n_nationkey
        |WHERE c2.c_custkey <= 200 AND c2.c_custkey % 2 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cypher_count_collect_sub" ->
      """WITH ps AS (
        |  SELECT s.s_nationkey AS nk, COUNT(DISTINCT l.l_partkey) AS c
        |  FROM supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_acctbal > 5000.0 GROUP BY 1),
        |rs AS (
        |  SELECT s_nationkey AS nk, COUNT(*) AS n_rich,
        |    MIN(s_name) AS first_rich
        |  FROM supplier WHERE s_acctbal > 8000.0 GROUP BY 1)
        |SELECT n.n_name AS nation, COALESCE(ps.c, 0) AS big_sup_parts,
        |  COALESCE(rs.n_rich, 0) AS n_rich, rs.first_rich AS first_rich
        |FROM nation n
        |LEFT JOIN ps ON ps.nk = n.n_nationkey
        |LEFT JOIN rs ON rs.nk = n.n_nationkey
        |WHERE n.n_regionkey = 3
        |ORDER BY nation""".stripMargin,
    "cypher_exists_full" ->
      """SELECT DISTINCT n.n_name AS nation
        |FROM nation n
        |JOIN supplier s ON s.s_nationkey = n.n_nationkey
        |  AND s.s_acctbal > 9000.0
        |JOIN lineitem l ON l.l_suppkey = s.s_suppkey
        |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_size > 40
        |ORDER BY nation""".stripMargin,
    "cypher_sp_outer_groupvar" ->
      """WITH nr AS (
        |  SELECT n_nationkey AS nk, n_name AS nm, n_regionkey AS rk,
        |    row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS pos,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS nxt
        |  FROM nation)
        |SELECT a.nm AS sn, b.nm AS tn, CAST(b.pos - a.pos AS BIGINT) AS nb,
        |  CAST(3000000000 + a.nxt AS BIGINT) AS first_b,
        |  CAST(b.pos - a.pos AS BIGINT) AS hops
        |FROM nr a JOIN nr b ON a.rk = b.rk AND b.pos > a.pos
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM nr m
        |  WHERE m.rk = a.rk AND m.pos > a.pos AND m.pos <= b.pos
        |    AND m.nm <= a.nm)
        |ORDER BY sn, tn""".stripMargin,
    "cypher_fn_extras" ->
      """SELECT c_custkey AS k, CAST(length(c_name) AS BIGINT) AS len,
        |  CAST(NULL AS BIGINT) AS not_int, c_custkey AS as_int,
        |  true AS nan_flag, false AS not_nan, 0.0 AS hav0,
        |  CAST(c_custkey + 1 AS BIGINT) AS ep_day,
        |  CAST(c_custkey + 1 AS BIGINT) AS ep_day2
        |FROM customer WHERE c_custkey <= 5 ORDER BY k""".stripMargin,
    "cypher_call_scoped" ->
      """SELECT n.n_name AS nation, COUNT(*) AS nc,
        |  round(AVG(c.c_acctbal), 4) AS avg_bal
        |FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        |WHERE n.n_regionkey = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cypher_rel_type_neg" ->
      """SELECT rt, COUNT(*) AS n FROM (
        |  SELECT 'SUPP_NATION' AS rt FROM supplier
        |  UNION ALL
        |  SELECT 'NEXT_IN_REGION' FROM (
        |    SELECT lead(n_nationkey) OVER (
        |      PARTITION BY n_regionkey ORDER BY n_nationkey) AS nxt
        |    FROM nation) WHERE nxt IS NOT NULL)
        |GROUP BY rt ORDER BY rt""".stripMargin,
    // static TPC-H schema truth: the engine COMPUTES mandatory via a
    // per-table null-count pass; these generated tables carry no nulls
    "cypher_catalog_schema" ->
      """SELECT * FROM (VALUES
        |  (':`Customer`', 'acctbal', 'Double', true),
        |  (':`Customer`', 'custkey', 'Long', true),
        |  (':`Customer`', 'mktsegment', 'String', true),
        |  (':`Customer`', 'name', 'String', true),
        |  (':`Customer`', 'nationkey', 'Long', true),
        |  (':`Nation`', 'name', 'String', true),
        |  (':`Nation`', 'nationkey', 'Long', true),
        |  (':`Nation`', 'regionkey', 'Long', true),
        |  (':`Order`', 'custkey', 'Long', true),
        |  (':`Order`', 'orderdate', 'LocalDateTime', true),
        |  (':`Order`', 'orderkey', 'Long', true),
        |  (':`Order`', 'orderpriority', 'String', true),
        |  (':`Order`', 'orderstatus', 'String', true),
        |  (':`Order`', 'totalprice', 'Double', true),
        |  (':`Part`', 'brand', 'String', true),
        |  (':`Part`', 'name', 'String', true),
        |  (':`Part`', 'partkey', 'Long', true),
        |  (':`Part`', 'retailprice', 'Double', true),
        |  (':`Part`', 'size', 'Long', true),
        |  (':`Part`', 'type', 'String', true),
        |  (':`Region`', 'name', 'String', true),
        |  (':`Region`', 'regionkey', 'Long', true),
        |  (':`Supplier`', 'acctbal', 'Double', true),
        |  (':`Supplier`', 'name', 'String', true),
        |  (':`Supplier`', 'nationkey', 'Long', true),
        |  (':`Supplier`', 'suppkey', 'Long', true)
        |) AS t(nodeType, propertyName, ptype, mandatory)
        |ORDER BY nodeType, propertyName""".stripMargin,
    // relationship schema: CONTAINS carries qty/price (never null in
    // TPC-H lineitem → mandatory), every other type is property-less
    // and emits Neo4j's null frame
    "cypher_catalog_rel_schema" ->
      """SELECT * FROM (VALUES
        |  (':`CONTAINS`', 'price', 'Double', true),
        |  (':`CONTAINS`', 'qty', 'Double', true),
        |  (':`FROM_NATION`', NULL, NULL, false),
        |  (':`IN_REGION`', NULL, NULL, false),
        |  (':`NEXT_IN_REGION`', NULL, NULL, false),
        |  (':`PLACED_BY`', NULL, NULL, false),
        |  (':`SUPP_NATION`', NULL, NULL, false),
        |  (':`SUPPLIES`', NULL, NULL, false)
        |) AS t(relType, propertyName, ptype, mandatory)
        |ORDER BY relType, propertyName""".stripMargin,
    // price weights make every pair's cheapest walk unique on this
    // data (checked at sf0.01/sf0.1: zero min-cost ties), so the
    // engine's deterministic recorded walk IS the enumerated minimum
    "cypher_weighted_nodes" ->
      """WITH RECURSIVE eo AS MATERIALIZED (
        |  SELECT 1000000000 + l_orderkey AS o, 6000000000 + l_partkey AS p,
        |    MIN(l_extendedprice) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |ed AS MATERIALIZED (
        |  SELECT o AS s, p AS d, w FROM eo
        |  UNION ALL
        |  SELECT p AS s, o AS d, w FROM eo),
        |walk AS (
        |  SELECT s AS src, d AS node, w AS cost, 1 AS hops, [s, d] AS path
        |  FROM ed WHERE s >= 6000000000 AND s < 6000000040
        |  UNION ALL
        |  SELECT walk.src, ed.d, walk.cost + ed.w, walk.hops + 1,
        |    list_append(walk.path, ed.d)
        |  FROM walk JOIN ed ON ed.s = walk.node
        |  WHERE walk.hops < 4 AND NOT list_contains(walk.path, ed.d)),
        |pairs AS (
        |  SELECT src AS pa, node AS pb, cost, hops, path FROM walk
        |  WHERE node >= 6000000000 AND node < 6000000040 AND src < node),
        |best AS (SELECT pa, pb, MIN(cost) AS c FROM pairs GROUP BY 1, 2),
        |pick AS (
        |  SELECT p.pa, p.pb, MIN(p.hops) AS hops, MIN(p.cost) AS cost,
        |    MIN(p.path) AS path
        |  FROM pairs p JOIN best b ON p.pa = b.pa AND p.pb = b.pb AND p.cost = b.c
        |  GROUP BY 1, 2)
        |SELECT CAST(pa - 6000000000 AS BIGINT) AS pa,
        |  CAST(pb - 6000000000 AS BIGINT) AS pb,
        |  CAST(hops AS BIGINT) AS hops, round(cost, 4) AS cost,
        |  '/' || array_to_string(path, '/') AS path_nodes,
        |  round(cost, 4) AS psum
        |FROM pick ORDER BY pa, pb""".stripMargin,
    // weighted multi-hop group: the same unique cheapest walks as
    // cypher_weighted_nodes (bipartite CONTAINS ⇒ all part-part walks
    // are even-length, so the 2-hop-group reachability is identical);
    // rep_ends slices the walk at positions 3, 5, … (each
    // repetition's end node)
    "cypher_weighted_mh_group" ->
      """WITH RECURSIVE eo AS MATERIALIZED (
        |  SELECT 1000000000 + l_orderkey AS o, 6000000000 + l_partkey AS p,
        |    MIN(l_extendedprice) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |ed AS MATERIALIZED (
        |  SELECT o AS s, p AS d, w FROM eo
        |  UNION ALL
        |  SELECT p AS s, o AS d, w FROM eo),
        |walk AS (
        |  SELECT s AS src, d AS node, w AS cost, 1 AS hops, [s, d] AS path
        |  FROM ed WHERE s >= 6000000000 AND s < 6000000040
        |  UNION ALL
        |  SELECT walk.src, ed.d, walk.cost + ed.w, walk.hops + 1,
        |    list_append(walk.path, ed.d)
        |  FROM walk JOIN ed ON ed.s = walk.node
        |  WHERE walk.hops < 4 AND NOT list_contains(walk.path, ed.d)),
        |pairs AS (
        |  SELECT src AS pa, node AS pb, cost, hops, path FROM walk
        |  WHERE node >= 6000000000 AND node < 6000000040 AND src < node),
        |best AS (SELECT pa, pb, MIN(cost) AS c FROM pairs GROUP BY 1, 2),
        |pick AS (
        |  SELECT p.pa, p.pb, MIN(p.hops) AS hops, MIN(p.cost) AS cost,
        |    MIN(p.path) AS path
        |  FROM pairs p JOIN best b ON p.pa = b.pa AND p.pb = b.pb AND p.cost = b.c
        |  GROUP BY 1, 2)
        |SELECT CAST(pa - 6000000000 AS BIGINT) AS pa,
        |  CAST(pb - 6000000000 AS BIGINT) AS pb,
        |  CAST(hops AS BIGINT) AS hops, round(cost, 4) AS cost,
        |  '/' || array_to_string(
        |    list_transform(range(3, len(path) + 1, 2),
        |      i -> path[CAST(i AS INT)]), '/') AS rep_ends
        |FROM pick ORDER BY pa, pb""".stripMargin,
    // group variable under weighted shortestPath: same unique
    // cheapest walks as cypher_weighted_nodes, step-end slice
    "cypher_weighted_groupvar" ->
      """WITH RECURSIVE eo AS MATERIALIZED (
        |  SELECT 1000000000 + l_orderkey AS o, 6000000000 + l_partkey AS p,
        |    MIN(l_extendedprice) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |ed AS MATERIALIZED (
        |  SELECT o AS s, p AS d, w FROM eo
        |  UNION ALL
        |  SELECT p AS s, o AS d, w FROM eo),
        |walk AS (
        |  SELECT s AS src, d AS node, w AS cost, 1 AS hops, [s, d] AS path
        |  FROM ed WHERE s >= 6000000000 AND s < 6000000040
        |  UNION ALL
        |  SELECT walk.src, ed.d, walk.cost + ed.w, walk.hops + 1,
        |    list_append(walk.path, ed.d)
        |  FROM walk JOIN ed ON ed.s = walk.node
        |  WHERE walk.hops < 4 AND NOT list_contains(walk.path, ed.d)),
        |pairs AS (
        |  SELECT src AS pa, node AS pb, cost, hops, path FROM walk
        |  WHERE node >= 6000000000 AND node < 6000000040 AND src < node),
        |best AS (SELECT pa, pb, MIN(cost) AS c FROM pairs GROUP BY 1, 2),
        |pick AS (
        |  SELECT p.pa, p.pb, MIN(p.hops) AS hops, MIN(p.cost) AS cost,
        |    MIN(p.path) AS path
        |  FROM pairs p JOIN best b ON p.pa = b.pa AND p.pb = b.pb AND p.cost = b.c
        |  GROUP BY 1, 2)
        |SELECT CAST(pa - 6000000000 AS BIGINT) AS pa,
        |  CAST(pb - 6000000000 AS BIGINT) AS pb,
        |  CAST(hops AS BIGINT) AS hops, round(cost, 4) AS cost,
        |  '/' || array_to_string(path[2:], '/') AS step_ends
        |FROM pick ORDER BY pa, pb""".stripMargin,
    "cypher_inline_where" ->
      """WITH hi AS (
        |  SELECT n.n_nationkey AS nk, n.n_name AS nm, COUNT(*) AS hi_cust
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE c.c_acctbal > 9000.0 AND n.n_regionkey = 2
        |  GROUP BY 1, 2),
        |sup AS (
        |  SELECT s_nationkey AS nk, COUNT(*) AS hi_supp
        |  FROM supplier WHERE s_acctbal > 5000.0 GROUP BY 1)
        |SELECT hi.nm AS nation, hi.hi_cust AS hi_cust, sup.hi_supp AS hi_supp
        |FROM hi JOIN sup ON hi.nk = sup.nk
        |ORDER BY nation""".stripMargin,
    "cypher_gql_shortest" ->
      """WITH nr AS (
        |  SELECT n_nationkey AS nk, n_name AS nm, n_regionkey AS rk,
        |    row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS pos
        |  FROM nation)
        |SELECT 'any' AS kind, a.nm AS a_name, b.nm AS b_name,
        |  CAST(b.pos - a.pos AS BIGINT) AS hops
        |FROM nr a JOIN nr b ON a.rk = b.rk AND b.pos > a.pos
        |WHERE a.rk = 3
        |UNION ALL
        |SELECT 'k1' AS kind, a.nm AS a_name, b.nm AS b_name,
        |  CAST(b.pos - a.pos AS BIGINT) AS hops
        |FROM nr a JOIN nr b ON a.rk = b.rk AND b.pos > a.pos
        |  AND b.pos - a.pos <= 3
        |WHERE a.rk = 4""".stripMargin,
    // allShortestPaths over the 2-hop group: the linear chains have
    // exactly one repetition chain per first-reach pair (np = 1)
    "cypher_allsp_mh_group" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |h2 AS (SELECT a.src AS s, b.dst AS t FROM e2 a
        |       JOIN e2 b ON a.dst = b.src),
        |h4 AS (SELECT a.src AS s, d.dst AS t FROM e2 a
        |       JOIN e2 b ON a.dst = b.src
        |       JOIN e2 c ON b.dst = c.src
        |       JOIN e2 d ON c.dst = d.src),
        |u AS (SELECT s, t, 2 AS hops FROM h2
        |      UNION ALL SELECT s, t, 4 FROM h4),
        |m AS (SELECT s, t, MIN(hops) AS hops FROM u WHERE s <> t
        |      GROUP BY 1, 2)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(m.hops AS BIGINT) AS hops, CAST(1 AS BIGINT) AS np
        |FROM m JOIN nation ns ON m.s = ns.n_nationkey
        |JOIN nation nt ON m.t = nt.n_nationkey
        |ORDER BY s_name, t_name""".stripMargin,
    // shortestPath over a 2-hop quantified group: per pair, the
    // minimum over the h·k union arms (k=1 → 2 hops, k=2 → 4)
    "cypher_sp_multihop_group" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |h2 AS (SELECT a.src AS s, b.dst AS t FROM e2 a
        |       JOIN e2 b ON a.dst = b.src),
        |h4 AS (SELECT a.src AS s, d.dst AS t FROM e2 a
        |       JOIN e2 b ON a.dst = b.src
        |       JOIN e2 c ON b.dst = c.src
        |       JOIN e2 d ON c.dst = d.src),
        |u AS (SELECT s, t, 2 AS hops FROM h2
        |      UNION ALL SELECT s, t, 4 FROM h4),
        |m AS (SELECT s, t, MIN(hops) AS hops FROM u WHERE s <> t
        |      GROUP BY 1, 2)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(m.hops AS BIGINT) AS hops
        |FROM m JOIN nation ns ON m.s = ns.n_nationkey
        |JOIN nation nt ON m.t = nt.n_nationkey
        |ORDER BY s_name, t_name""".stripMargin,
    // the NEXT_IN_REGION chain is a unique-successor function, so
    // each pair's shortest path is UNIQUE — the engine's deterministic
    // min-walk and the oracle's positional reconstruction must agree
    "cypher_sp_nodes" ->
      """WITH nr AS (
        |  SELECT n_nationkey AS nk, n_name AS nm, n_regionkey AS rk,
        |    row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS pos
        |  FROM nation)
        |SELECT a.nm AS a_name, b.nm AS b_name,
        |  CAST(b.pos - a.pos AS BIGINT) AS hops,
        |  '/' || string_agg(CAST(3000000000 + m.nk AS VARCHAR), '/' ORDER BY m.pos) AS path_nodes
        |FROM nr a JOIN nr b ON a.rk = b.rk AND b.pos > a.pos
        |JOIN nr m ON m.rk = a.rk AND m.pos BETWEEN a.pos AND b.pos
        |GROUP BY a.nm, b.nm, a.pos, b.pos
        |ORDER BY a_name, b_name""".stripMargin,
    "cypher_sp_rel_list" ->
      """WITH nr AS (
        |  SELECT n_nationkey AS nk, n_name AS nm, n_regionkey AS rk,
        |    row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS pos
        |  FROM nation)
        |SELECT a.nm AS a_name, b.nm AS b_name,
        |  CAST(b.pos - a.pos AS BIGINT) AS n_rels,
        |  CAST(b.nk - a.nk AS BIGINT) AS span,
        |  CAST(b.nk - a.nk AS BIGINT) AS span2
        |FROM nr a JOIN nr b ON a.rk = b.rk AND b.pos > a.pos
        |WHERE a.rk = 1
        |ORDER BY a_name, b_name""".stripMargin,
    "cypher_sp_group_nodes" ->
      """WITH nr AS (
        |  SELECT n_nationkey AS nk, n_name AS nm, n_regionkey AS rk,
        |    row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS pos,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS nxt
        |  FROM nation)
        |SELECT a.nm AS s_name, b.nm AS t_name,
        |  CAST(b.pos - a.pos AS BIGINT) AS hops,
        |  CAST(b.pos - a.pos AS BIGINT) AS n_steps,
        |  CAST(3000000000 + a.nxt AS BIGINT) AS first_step
        |FROM nr a JOIN nr b ON a.rk = b.rk AND b.pos > a.pos
        |WHERE a.rk = 2
        |ORDER BY s_name, t_name""".stripMargin,
    "cypher_shortest_path" ->
      """WITH RECURSIVE e AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT n_nationkey AS src,
        |      lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |    FROM nation)
        |  WHERE dst IS NOT NULL),
        |p AS (
        |  SELECT src, dst, 1 AS hops FROM e
        |  UNION ALL
        |  SELECT p.src, e.dst, p.hops + 1 FROM p JOIN e ON p.dst = e.src
        |  WHERE p.hops < 10),
        |m AS (SELECT src, dst, MIN(hops) AS hops FROM p GROUP BY src, dst)
        |SELECT na.n_name AS a_name, nb.n_name AS b_name, m.hops AS hops
        |FROM m JOIN nation na ON m.src = na.n_nationkey
        |JOIN nation nb ON m.dst = nb.n_nationkey
        |ORDER BY a_name, b_name""".stripMargin,
    "cypher_weighted_path" ->
      // undirected CONTAINS graph in (part >= 0, order < 0) id space;
      // parallel edges collapse to MIN qty first (the engine does the
      // same before relaxing); walks up to 4 hops from the seed parts,
      // then min cost per pair with ties to fewer hops. Cost folds
      // cost + w per step in both engines — identical IEEE sequences,
      // so the equality join on the min cost is exact.
      """WITH RECURSIVE eo AS MATERIALIZED (
        |  SELECT l_orderkey AS o, l_partkey AS p, MIN(l_quantity) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |ed AS MATERIALIZED (
        |  SELECT -o AS s, p AS d, w FROM eo
        |  UNION ALL
        |  SELECT p AS s, -o AS d, w FROM eo),
        |walk AS (
        |  SELECT s AS src, d AS node, w AS cost, 1 AS hops FROM ed
        |  WHERE s >= 0 AND s < 10
        |  UNION ALL
        |  SELECT walk.src, ed.d, walk.cost + ed.w, walk.hops + 1
        |  FROM walk JOIN ed ON ed.s = walk.node
        |  WHERE walk.hops < 4 AND ed.d <> walk.src),
        |pairs AS (
        |  SELECT src AS pa, node AS pb, cost, hops FROM walk
        |  WHERE node >= 0 AND node < 10 AND src < node),
        |best AS (SELECT pa, pb, MIN(cost) AS cost FROM pairs GROUP BY 1, 2)
        |SELECT p.pa, p.pb, CAST(MIN(p.hops) AS BIGINT) AS hops,
        |  round(b.cost, 6) AS cost
        |FROM pairs p JOIN best b
        |  ON p.pa = b.pa AND p.pb = b.pb AND p.cost = b.cost
        |GROUP BY 1, 2, b.cost ORDER BY p.pa, p.pb""".stripMargin,
    "cypher_all_shortest" ->
      // CONTAINS is bipartite (Order-Part), so part-part shortest
      // distance is exactly 2 and the multiplicity is the closed form
      // sigma_2 = SUM over shared orders of w(o,a)*w(o,b), where w
      // counts parallel CONTAINS edges (one per lineitem)
      """WITH ce AS (
        |  SELECT l_orderkey AS o, l_partkey AS p, COUNT(*) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |pp AS (
        |  SELECT a.p AS pa, b.p AS pb, CAST(SUM(a.w * b.w) AS BIGINT) AS n_paths
        |  FROM ce a JOIN ce b ON a.o = b.o AND a.p < b.p
        |  WHERE a.p < 40 AND b.p < 40
        |  GROUP BY 1, 2)
        |SELECT pa, pb, CAST(2 AS BIGINT) AS hops, n_paths
        |FROM pp ORDER BY pa, pb""".stripMargin,
    // zone-aware display: the rendered string re-derived from
    // DuckDB's own tzdb (wall clock AT TIME ZONE + computed offset),
    // so DST arithmetic and the java.time-style formatting both pin
    "cypher_datetime_tz_display" -> TzDisplayOracle,
    // the ALIASED zoned-display spelling shares the nested form's
    // oracle verbatim — identical expected strings, reached through a
    // WITH horizon's zone carry (r18)
    "cypher_datetime_tz_alias" -> TzDisplayOracle,
    // zoned construction compared as epoch seconds — zone-free
    // integers, tzdb-real on both engines (DST pinned by the NY pair)
    "cypher_datetime_tz" ->
      """SELECT
        |  CAST(epoch(make_timestamptz(2024, 6, 1, 12, 0, 0, 'America/New_York')) AS BIGINT) AS ny_summer,
        |  CAST(epoch(make_timestamptz(2024, 1, 15, 12, 0, 0, 'America/New_York')) AS BIGINT) AS ny_winter,
        |  CAST(epoch(make_timestamptz(2024, 6, 1, 12, 30, 0, 'Asia/Tokyo')) AS BIGINT) AS tokyo,
        |  CAST(epoch(make_timestamptz(2024, 6, 1, 12, 0, 0, 'UTC')) AS BIGINT) AS utc,
        |  CAST(epoch(make_timestamptz(2024, 6, 1, 12, 0, 0, 'UTC')) AS BIGINT) AS plain_utc""".stripMargin,
    // SHORTEST 2 on the bipartite CONTAINS graph: every part-part
    // trail is exactly 2 hops, so the per-pair answer is the closed
    // form (min(2, multiplicity), 2, 2)
    "cypher_shortest_k" ->
      """WITH ce AS (
        |  SELECT l_partkey AS p, l_orderkey AS o, COUNT(*) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |pp AS (
        |  SELECT a.p AS pa, b.p AS pb, SUM(a.w * b.w) AS m
        |  FROM ce a JOIN ce b ON a.o = b.o AND a.p < b.p
        |  WHERE a.p < 30 AND b.p < 30
        |  GROUP BY 1, 2)
        |SELECT pa, pb,
        |  CAST(CASE WHEN m >= 2 THEN 2 ELSE m END AS BIGINT) AS n_paths,
        |  CAST(2 AS BIGINT) AS h1, CAST(2 AS BIGINT) AS h2
        |FROM pp ORDER BY pa, pb""".stripMargin,
    // weighted allShortestPaths on the bipartite CONTAINS graph:
    // every part-part walk is 2 hops (two distinct lineitem edges
    // through a shared order — distinct automatically since the
    // endpoints differ); minimal qty-sum per pair, np = exact tie
    // count (qty integral, so the DOUBLE tie compare is exact)
    "cypher_weighted_allsp" ->
      """WITH w AS (
        |  SELECT x.l_partkey AS pa, y.l_partkey AS pb,
        |    CAST(x.l_quantity + y.l_quantity AS DOUBLE) AS cost
        |  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
        |  WHERE x.l_partkey < 25 AND y.l_partkey < 25
        |    AND x.l_partkey < y.l_partkey),
        |mc AS (SELECT pa, pb, MIN(cost) AS c FROM w GROUP BY 1, 2)
        |SELECT w.pa, w.pb, CAST(2 AS BIGINT) AS h1, CAST(2 AS BIGINT) AS h2,
        |  CAST(3 AS BIGINT) AS n_nodes, round(mc.c, 2) AS cost,
        |  COUNT(*) AS np
        |FROM w JOIN mc ON w.pa = mc.pa AND w.pb = mc.pb AND w.cost = mc.c
        |GROUP BY 1, 2, 6 ORDER BY w.pa, w.pb, cost""".stripMargin,
    // weighted allShortestPaths over the 2-hop group: per-pair
    // minimal qty-sum over 1- and 2-repetition trails (a cheap
    // 2-repetition walk can undercut every 1-repetition one), exact
    // tie counts at the minimum; cross-repetition edge distinctness
    // spelled as the four identity inequalities, self-loop
    // repetitions and returns-to-source excluded (the engine's BFS
    // family rules)
    "cypher_weighted_allsp_group" ->
      """WITH e AS (
        |  SELECT l_orderkey AS o, l_partkey AS p,
        |    CAST(l_quantity AS DOUBLE) AS q,
        |    row_number() OVER (PARTITION BY l_orderkey, l_partkey
        |                       ORDER BY l_linenumber) AS k
        |  FROM lineitem),
        |rep AS (
        |  SELECT x.p AS u, y.p AS v, x.o AS o, x.k AS k1, y.k AS k2,
        |    x.q + y.q AS c
        |  FROM e x JOIN e y ON x.o = y.o
        |  WHERE NOT (x.p = y.p AND x.k = y.k) AND x.p <> y.p),
        |t2 AS (
        |  SELECT u AS pa, v AS pb, c AS cost, 2 AS hops FROM rep
        |  WHERE u < 15 AND v < 15 AND u < v),
        |t4 AS (
        |  SELECT r1.u AS pa, r2.v AS pb, r1.c + r2.c AS cost, 4 AS hops
        |  FROM rep r1 JOIN rep r2 ON r1.v = r2.u
        |  WHERE r1.u < 15 AND r2.v < 15 AND r1.u < r2.v
        |    AND NOT (r1.o = r2.o AND r1.u = r2.u AND r1.k1 = r2.k1)
        |    AND NOT (r1.o = r2.o AND r1.k2 = r2.k1)
        |    AND NOT (r1.o = r2.o AND r1.v = r2.v AND r1.k2 = r2.k2)
        |    AND NOT (r1.o = r2.o AND r1.u = r2.v AND r1.k1 = r2.k2)),
        |alltr AS (SELECT * FROM t2 UNION ALL SELECT * FROM t4),
        |mc AS (SELECT pa, pb, MIN(cost) AS c FROM alltr GROUP BY 1, 2)
        |SELECT a.pa, a.pb, round(mc.c, 2) AS cost, COUNT(*) AS np,
        |  CAST(MIN(a.hops) AS BIGINT) AS h1, CAST(MAX(a.hops) AS BIGINT) AS h2
        |FROM alltr a JOIN mc ON a.pa = mc.pa AND a.pb = mc.pb AND a.cost = mc.c
        |GROUP BY 1, 2, 3 ORDER BY a.pa, a.pb""".stripMargin,
    // SHORTEST 2 over the 2-hop quantified group: trails enumerate
    // from lineitem edges (identity = per-(order,part) line rank);
    // one repetition = part–order–part over two distinct edges, two
    // repetitions chain with the four cross-repetition identity
    // inequalities; per-pair top-2 window by hops mirrors the
    // engine's k-best rank
    "cypher_shortest_k_mh_group" ->
      """WITH e AS (
        |  SELECT l_orderkey AS o, l_partkey AS p,
        |    row_number() OVER (PARTITION BY l_orderkey, l_partkey
        |                       ORDER BY l_linenumber) AS k
        |  FROM lineitem),
        |rep AS (
        |  SELECT x.p AS u, y.p AS v, x.o AS o, x.k AS k1, y.k AS k2
        |  FROM e x JOIN e y ON x.o = y.o
        |  WHERE NOT (x.p = y.p AND x.k = y.k)),
        |t2 AS (
        |  SELECT u AS pa, v AS pb, 2 AS hops FROM rep
        |  WHERE u < 30 AND v < 30 AND u < v),
        |t4 AS (
        |  SELECT r1.u AS pa, r2.v AS pb, 4 AS hops
        |  FROM rep r1 JOIN rep r2 ON r1.v = r2.u
        |  WHERE r1.u < 30 AND r2.v < 30 AND r1.u < r2.v
        |    AND NOT (r1.o = r2.o AND r1.u = r2.u AND r1.k1 = r2.k1)
        |    AND NOT (r1.o = r2.o AND r1.k2 = r2.k1)
        |    AND NOT (r1.o = r2.o AND r1.v = r2.v AND r1.k2 = r2.k2)
        |    AND NOT (r1.o = r2.o AND r1.u = r2.v AND r1.k1 = r2.k2)),
        |rk AS (
        |  SELECT pa, pb, hops, row_number() OVER (
        |    PARTITION BY pa, pb ORDER BY hops) AS r
        |  FROM (SELECT * FROM t2 UNION ALL SELECT * FROM t4))
        |SELECT pa, pb, COUNT(*) AS n_paths,
        |  CAST(MIN(hops) AS BIGINT) AS h1, CAST(MAX(hops) AS BIGINT) AS h2
        |FROM rk WHERE r <= 2 GROUP BY 1, 2 ORDER BY pa, pb""".stripMargin,
    // enumerated all-shortest walks, re-aggregated per pair: σ =
    // parallel CONTAINS multiplicity, per-walk qty reduce sums to the
    // pair's lineitem quantity total (2-hop arm empty: no edges
    // leave :Part)
    // weighted SHORTEST 2: every part-part trail is a 2-hop
    // shared-order lineitem pair; per-pair top-2 by cost, then the
    // tie-order-independent (count, min, max) cost multiset
    "cypher_weighted_shortest_k" ->
      """WITH e AS (
        |  SELECT l_orderkey AS o, l_partkey AS p,
        |    CAST(l_quantity AS DOUBLE) AS q
        |  FROM lineitem),
        |t AS (
        |  SELECT x.p AS pa, y.p AS pb, x.q + y.q AS cost
        |  FROM e x JOIN e y ON x.o = y.o
        |  WHERE x.p < 15 AND y.p < 15 AND x.p < y.p),
        |r AS (
        |  SELECT pa, pb, cost,
        |    row_number() OVER (PARTITION BY pa, pb ORDER BY cost) AS rn
        |  FROM t)
        |SELECT pa, pb, COUNT(*) AS k, round(MIN(cost), 2) AS c1,
        |  round(MAX(cost), 2) AS c2
        |FROM r WHERE rn <= 2 GROUP BY 1, 2 ORDER BY pa, pb""".stripMargin,
    // group variables under unweighted allShortestPaths: every
    // part–part shortest walk is 2 repetitions through a shared
    // order (bipartite graph), so walks per (pair, order) are the
    // lineitem (edge, edge) combinations — the join counts parallel
    // edges naturally; x[1]/y[0] are both the walk's order node id
    "cypher_allsp_groupvar" ->
      """WITH w AS (
        |  SELECT x.l_partkey AS pa, y.l_partkey AS pb, x.l_orderkey AS o
        |  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
        |  WHERE x.l_partkey < 25 AND y.l_partkey < 25
        |    AND x.l_partkey < y.l_partkey)
        |SELECT pa, pb, CAST(2 AS BIGINT) AS hops, CAST(2 AS BIGINT) AS nx,
        |  1000000000 + o AS mid, 1000000000 + o AS mid2,
        |  COUNT(*) AS np
        |FROM w GROUP BY 1, 2, 5 ORDER BY pa, pb, mid""".stripMargin,
    "cypher_allsp_walks" ->
      """SELECT l_orderkey AS ok, l_partkey AS pk,
        |  CAST(1 AS BIGINT) AS hops, CAST(2 AS BIGINT) AS n_nodes,
        |  CAST(COUNT(*) AS BIGINT) AS np,
        |  round(SUM(l_quantity), 2) AS qty_sum
        |FROM lineitem WHERE l_orderkey < 100
        |GROUP BY 1, 2 ORDER BY ok, pk""".stripMargin,
    "cypher_path_len" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |p AS (
        |  SELECT 1 AS hops FROM e2
        |  UNION ALL
        |  SELECT 2 FROM e2 a JOIN e2 b ON a.dst = b.src
        |  UNION ALL
        |  SELECT 3 FROM e2 a JOIN e2 b ON a.dst = b.src JOIN e2 c ON b.dst = c.src)
        |SELECT CAST(hops AS BIGINT) AS hops, COUNT(*) AS n_paths FROM p
        |GROUP BY hops ORDER BY hops""".stripMargin,
    "cypher_path_nodes" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |p AS (
        |  SELECT [3000000000 + src, 3000000000 + dst] AS ns FROM e2
        |  UNION ALL
        |  SELECT [3000000000 + a.src, 3000000000 + a.dst, 3000000000 + b.dst]
        |  FROM e2 a JOIN e2 b ON a.dst = b.src)
        |SELECT CAST(nid AS BIGINT) AS node_id, COUNT(*) AS n_paths
        |FROM (SELECT unnest(ns) AS nid FROM p)
        |GROUP BY 1 ORDER BY node_id""".stripMargin,
    "cypher_path_rels" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |p AS (
        |  SELECT [[src, dst]] AS rs FROM e2
        |  UNION ALL
        |  SELECT [[a.src, a.dst], [b.src, b.dst]]
        |  FROM e2 a JOIN e2 b ON a.dst = b.src)
        |SELECT CAST(3000000000 + rr[1] AS BIGINT) AS src_id,
        |  CAST(3000000000 + rr[2] AS BIGINT) AS dst_id,
        |  COUNT(*) AS n_paths
        |FROM (SELECT unnest(rs) AS rr FROM p)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "cypher_case" ->
      """SELECT CASE WHEN c_acctbal < 0.0 THEN 'neg'
        |            WHEN c_acctbal < 5000.0 THEN 'mid'
        |            ELSE 'high' END AS band,
        |  COUNT(*) AS n
        |FROM customer GROUP BY band ORDER BY band""".stripMargin,
    "cypher_coalesce_agg" ->
      """SELECT n_name AS nation,
        |CAST(SUM(CAST(coalesce(c_acctbal, 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
        |FROM nation LEFT JOIN customer
        |  ON c_nationkey = n_nationkey AND c_acctbal > 9900.0
        |GROUP BY n_name ORDER BY nation""".stripMargin,
    "cypher_regex" ->
      """SELECT s_suppkey AS id, s_name AS name FROM supplier
        |WHERE regexp_full_match(s_name, 'Supplier#0+[0-9]{2}')
        |ORDER BY id""".stripMargin,
    "cypher_union" ->
      """SELECT n_name AS nation FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 9900.0
        |UNION
        |SELECT n_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey""".stripMargin,
    "cypher_merge_rel" ->
      """WITH newe AS (
        |  SELECT CAST(2000000000 + c_custkey AS BIGINT) AS src_id,
        |         CAST(4000000000 + n_regionkey AS BIGINT) AS dst_id
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE c_custkey <= 100),
        |olde AS (
        |  SELECT CAST(3000000000 + n_nationkey AS BIGINT) AS src_id,
        |         CAST(4000000000 + n_regionkey AS BIGINT) AS dst_id
        |  FROM nation),
        |m AS (SELECT src_id, dst_id FROM olde
        |      UNION SELECT src_id, dst_id FROM newe),
        |w AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_writes FROM newe)
        |SELECT m.src_id, m.dst_id, w.n_writes
        |FROM m CROSS JOIN w ORDER BY src_id, dst_id""".stripMargin,
    "cypher_create_rel" ->
      """WITH newe AS (
        |  SELECT CAST(1000000000 + l_orderkey AS BIGINT) AS src_id,
        |         CAST(6000000000 + l_partkey AS BIGINT) AS dst_id
        |  FROM lineitem WHERE l_partkey <= 5),
        |w AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_writes FROM newe)
        |SELECT newe.src_id, newe.dst_id, w.n_writes
        |FROM newe CROSS JOIN w ORDER BY src_id, dst_id""".stripMargin,
    "cypher_create_node" ->
      """WITH g AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name,
        |    r_name AS region
        |  FROM nation JOIN region ON n_regionkey = r_regionkey),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_created FROM g)
        |SELECT g.id, g.name, g.region, c.n_created
        |FROM g CROSS JOIN c ORDER BY id""".stripMargin,
    "cypher_delete_rel" ->
      """WITH del AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_deleted
        |  FROM lineitem WHERE l_quantity <= 10.0),
        |kept AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_left
        |  FROM lineitem WHERE l_quantity > 10.0)
        |SELECT kept.n_left, del.n_deleted
        |FROM kept CROSS JOIN del""".stripMargin,
    "cypher_merge_on" ->
      """WITH h1 AS (
        |  SELECT DISTINCT CAST(r_regionkey AS BIGINT) AS hub_id,
        |    CAST(1 AS BIGINT) AS src FROM region),
        |c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM region),
        |nk AS (SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS hub_id
        |       FROM nation),
        |merged AS (
        |  SELECT h1.hub_id,
        |    CASE WHEN nk.hub_id IS NOT NULL THEN CAST(2 AS BIGINT)
        |         ELSE h1.src END AS src
        |  FROM h1 LEFT JOIN nk ON h1.hub_id = nk.hub_id
        |  UNION ALL
        |  SELECT nk.hub_id, CAST(10 AS BIGINT) AS src FROM nk
        |  WHERE nk.hub_id NOT IN (SELECT hub_id FROM h1)),
        |c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM nation)
        |SELECT m.hub_id, m.src, c1.n1, c2.n2
        |FROM merged m CROSS JOIN c1 CROSS JOIN c2
        |ORDER BY hub_id""".stripMargin,
    "cypher_merge_rel_on" ->
      """WITH base AS (
        |  SELECT CAST(3000000000 + n_nationkey AS BIGINT) AS src_id,
        |         CAST(4000000000 + n_regionkey AS BIGINT) AS dst_id,
        |         n_nationkey
        |  FROM nation),
        |e1 AS (
        |  SELECT src_id, dst_id,
        |    CASE WHEN n_nationkey <= 10 THEN CAST(1 AS BIGINT) END AS seen
        |  FROM base),
        |c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1
        |       FROM nation WHERE n_nationkey <= 10),
        |newe AS (
        |  SELECT DISTINCT CAST(2000000000 + c_custkey AS BIGINT) AS src_id,
        |         CAST(4000000000 + n_regionkey AS BIGINT) AS dst_id
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE c_custkey <= 50),
        |merged AS (
        |  SELECT src_id, dst_id, seen FROM e1
        |  UNION ALL
        |  SELECT src_id, dst_id, CAST(2 AS BIGINT) AS seen FROM newe),
        |c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2
        |       FROM customer WHERE c_custkey <= 50)
        |SELECT m.src_id, m.dst_id, m.seen, c1.n1, c2.n2
        |FROM merged m CROSS JOIN c1 CROSS JOIN c2
        |ORDER BY src_id, dst_id""".stripMargin,
    "cypher_remove" ->
      """WITH f AS (
        |  SELECT CASE WHEN c_acctbal < 0.0 THEN NULL
        |              ELSE c_mktsegment END AS segment
        |  FROM customer),
        |r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_removed
        |      FROM customer WHERE c_acctbal < 0.0)
        |SELECT f.segment, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(r.n_removed) AS n_removed
        |FROM f CROSS JOIN r GROUP BY f.segment
        |ORDER BY segment""".stripMargin,
    "cypher_detach_delete" ->
      """WITH del AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_deleted
        |  FROM part WHERE p_size > 40),
        |e AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 40)
        |SELECT e.n_edges, del.n_deleted
        |FROM e CROSS JOIN del""".stripMargin,
    // per-repetition rel lists: span folds each repetition's 2nd-hop
    // key gap — one row per (s,t,k) composition of the 2-hop unit
    "cypher_qpp_rel_groupvar" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |h2 AS (SELECT a.src AS s, b.dst AS t, b.dst - b.src AS span
        |       FROM e2 a JOIN e2 b ON a.dst = b.src),
        |p AS (
        |  SELECT s, t, 1 AS n_reps, span FROM h2
        |  UNION ALL
        |  SELECT r1.s, r2.t, 2, r1.span + r2.span
        |  FROM h2 r1 JOIN h2 r2 ON r1.t = r2.s)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(p.n_reps AS BIGINT) AS n_reps, CAST(p.span AS BIGINT) AS span
        |FROM p JOIN nation ns ON p.s = ns.n_nationkey
        |JOIN nation nt ON p.t = nt.n_nationkey
        |ORDER BY s_name, t_name, n_reps""".stripMargin,
    // relationship list over the 2-hop undirected part-order-part
    // walk: same edge-identity ranks as the planner (row_number per
    // (order, part) ordered by the remaining columns sorted:
    // price, qty), same not-same-edge uniqueness
    "cypher_var_rel_list" ->
      """WITH e AS (
        |  SELECT l_orderkey AS o, l_partkey AS p, l_quantity AS qty,
        |    row_number() OVER (PARTITION BY l_orderkey, l_partkey
        |      ORDER BY l_extendedprice, l_quantity) AS k
        |  FROM lineitem),
        |w AS (
        |  SELECT a.p AS pa, b.p AS pb, a.qty + b.qty AS tq
        |  FROM e a JOIN e b ON a.o = b.o
        |    AND NOT (a.p = b.p AND a.k = b.k)
        |  WHERE a.p < 3)
        |SELECT CAST(pa AS BIGINT) AS pa,
        |  CAST(pb + 6000000000 AS BIGINT) AS pb_id,
        |  CAST(2 AS BIGINT) AS n_rels, round(tq, 6) AS total_qty
        |FROM w ORDER BY pa, pb_id, total_qty""".stripMargin,
    // the In-spelled pre-bound walk: one CONTAINS step per qualifying
    // lineitem row (the *1..2 upper arm is empty — nothing points
    // INTO :Order)
    "cypher_var_rel_list_in" ->
      """SELECT CAST(l_partkey AS BIGINT) AS pb,
        |  CAST(l_orderkey + 1000000000 AS BIGINT) AS o_id,
        |  CAST(1 AS BIGINT) AS n_rels, round(l_quantity, 6) AS total_qty
        |FROM lineitem WHERE l_partkey < 3
        |ORDER BY pb, o_id, total_qty""".stripMargin,
    // plain DELETE after in-query edge removal: parts above the size
    // cut lose SUPPLIES + CONTAINS edges, then the node rows
    "cypher_delete_node" ->
      """WITH del AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_deleted
        |  FROM part WHERE p_size > 44),
        |kept AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts_left
        |  FROM part WHERE p_size <= 44)
        |SELECT kept.n_parts_left, del.n_deleted
        |FROM kept CROSS JOIN del""".stripMargin,
    "cypher_set_prop" ->
      """WITH f AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_nationkey <= 4 THEN CAST(1 AS BIGINT) END AS flagged
        |  FROM customer)
        |SELECT flagged, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM f GROUP BY 1 ORDER BY flagged""".stripMargin,
    "cypher_foreach" ->
      """SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN c_acctbal > 5000.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_vip
        |FROM customer GROUP BY 1 ORDER BY segment""".stripMargin,
    "cypher_set_map" ->
      """SELECT s_suppkey AS suppkey,
        |  CASE WHEN s_acctbal < 0.0 THEN 'low' END AS tier,
        |  CASE WHEN s_acctbal < 0.0 THEN NULL ELSE s_acctbal END AS bal
        |FROM supplier ORDER BY suppkey""".stripMargin,
    "cypher_set_label" ->
      """SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(c_acctbal) AS min_bal
        |FROM customer WHERE c_acctbal > 7500.0
        |GROUP BY 1 ORDER BY segment""".stripMargin,
    "cypher_multi_label" ->
      """SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(['Customer', 'Premium']) AS label
        |  FROM customer WHERE c_acctbal > 7500.0)
        |GROUP BY label ORDER BY label""".stripMargin,
    "cypher_call_in_tx" ->
      """WITH rows AS (
        |  SELECT 1000000000 + l_orderkey AS k, l_orderkey AS okey
        |  FROM lineitem WHERE l_orderkey < 4000),
        |b AS (
        |  SELECT okey, CAST(k // 50 AS BIGINT) AS range_id,
        |    CAST((ROW_NUMBER() OVER (PARTITION BY k // 50 ORDER BY k) - 1) // 50
        |      AS BIGINT) AS sub_id
        |  FROM rows)
        |SELECT CAST(range_id AS VARCHAR) || '-' || CAST(sub_id AS VARCHAR) AS tx_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders,
        |  MIN(okey) AS lo_key, MAX(okey) AS hi_key
        |FROM b GROUP BY range_id, sub_id ORDER BY lo_key, tx_id""".stripMargin,
    "cypher_agg_functions" ->
      """SELECT COUNT(DISTINCT c_nationkey) AS n_nations,
        |MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
        |FROM customer""".stripMargin,
    "cypher_in_list" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal > 0.0
        |GROUP BY c_mktsegment ORDER BY segment""".stripMargin,
    "cypher_not_exists" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderkey NOT IN (
        |  SELECT l_orderkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13')
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin,
    "cypher_unwind_range" ->
      """SELECT k, k * k AS sq FROM generate_series(0, 24, 2) t(k)
        |ORDER BY k""".stripMargin,
    "cypher_list_comp" ->
      """SELECT n_name AS nation,
        |  CAST(COUNT(CASE WHEN c_acctbal > 5000.0::DOUBLE THEN 1 END) AS BIGINT)
        |    AS n_rich
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cypher_stat_agg" ->
      """SELECT c_mktsegment AS segment,
        |  round(sqrt((CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,4))
        |        * CAST(c_acctbal AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS DOUBLE)
        |      - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |        * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |        / COUNT(c_acctbal))
        |    / (COUNT(c_acctbal) - 1)), 6) AS sd_bal,
        |  round(quantile_cont(c_acctbal, 0.5), 6) AS median_bal
        |FROM customer GROUP BY 1 ORDER BY segment""".stripMargin,
    "cypher_count_subquery" ->
      """SELECT n_name AS nation,
        |  CAST(COALESCE(c.cnt, 0) AS BIGINT) AS n_customers,
        |  CAST(COALESCE(s.cnt, 0) AS BIGINT) AS n_suppliers
        |FROM nation
        |LEFT JOIN (SELECT c_nationkey, COUNT(*) AS cnt FROM customer
        |           GROUP BY 1) c ON n_nationkey = c.c_nationkey
        |LEFT JOIN (SELECT s_nationkey, COUNT(*) AS cnt FROM supplier
        |           GROUP BY 1) s ON n_nationkey = s.s_nationkey
        |ORDER BY nation""".stripMargin,
    // per-binding LIMIT without ORDER BY: the engine's documented
    // deterministic tie-break is the RETURN items ascending in item
    // order (cname, bal), so the kept rows are the 3 name-least
    // customers per nation — assertable exactly
    "cypher_sub_limit_noorder" ->
      """SELECT nation, cname, bal FROM (
        |  SELECT n_name AS nation, c_name AS cname, c_acctbal AS bal,
        |    ROW_NUMBER() OVER (PARTITION BY n_nationkey
        |      ORDER BY c_name, c_acctbal) AS rk
        |  FROM customer, nation
        |  WHERE c_nationkey = n_nationkey AND n_regionkey = 1)
        |WHERE rk <= 3 ORDER BY nation, cname""".stripMargin,
    "cypher_call_topk" ->
      """SELECT nation, top_cust, bal FROM (
        |  SELECT n_name AS nation, c_name AS top_cust, c_acctbal AS bal,
        |    ROW_NUMBER() OVER (PARTITION BY n_nationkey
        |      ORDER BY c_acctbal DESC, c_name) AS rk
        |  FROM customer, nation WHERE c_nationkey = n_nationkey)
        |WHERE rk <= 3 ORDER BY nation, bal DESC, top_cust""".stripMargin,
    // aggregates + ORDER BY/LIMIT in a CALL RETURN: per-customer
    // most-frequent status via a post-aggregation window
    "cypher_call_agg_topk" ->
      """SELECT custkey, st, n_orders FROM (
        |  SELECT o_custkey AS custkey, o_orderstatus AS st,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY COUNT(*) DESC, o_orderstatus) AS rk
        |  FROM orders WHERE o_custkey <= 200
        |  GROUP BY o_custkey, o_orderstatus)
        |WHERE rk = 1 ORDER BY custkey""".stripMargin,
    // per-binding LIMIT inside a COUNT body: each nation's 2 richest
    // suppliers' distinct-part fanout, zero for supplier-less nations
    "cypher_sub_topk" ->
      """WITH top2 AS (
        |  SELECT s_suppkey, s_nationkey FROM (
        |    SELECT s_suppkey, s_nationkey,
        |      ROW_NUMBER() OVER (PARTITION BY s_nationkey
        |        ORDER BY s_acctbal DESC, s_suppkey) AS rk
        |    FROM supplier) WHERE rk <= 2),
        |cnt AS (
        |  SELECT t.s_nationkey, COUNT(*) AS c
        |  FROM top2 t JOIN (SELECT DISTINCT l_suppkey, l_partkey
        |                    FROM lineitem) sp
        |    ON t.s_suppkey = sp.l_suppkey
        |  GROUP BY 1)
        |SELECT n_name AS nation,
        |  CAST(COALESCE(c.c, 0) AS BIGINT) AS top2_parts
        |FROM nation n LEFT JOIN cnt c ON n.n_nationkey = c.s_nationkey
        |ORDER BY nation""".stripMargin,
    "cypher_pattern_pred" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13')
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin,
    "cypher_with_top" ->
      """WITH top5 AS (
        |  SELECT n_nationkey, n_name AS nation, n_regionkey,
        |         COUNT(*) AS n_customers
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2, 3
        |  ORDER BY n_customers DESC, nation LIMIT 5)
        |SELECT t.nation, t.n_customers, r.r_name AS region
        |FROM top5 t JOIN region r ON t.n_regionkey = r.r_regionkey
        |WHERE t.nation >= 'NATION_11'
        |ORDER BY t.nation""".stripMargin,
    "cypher_undirected" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |u AS (SELECT src, dst FROM e2 UNION ALL SELECT dst AS src, src AS dst FROM e2)
        |SELECT na.n_name AS a_name, nb.n_name AS b_name
        |FROM u
        |JOIN nation na ON u.src = na.n_nationkey
        |JOIN nation nb ON u.dst = nb.n_nationkey
        |ORDER BY a_name, b_name""".stripMargin,
    "cypher_multi_match" ->
      """SELECT n_name AS nation, COUNT(*) AS pairs
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN supplier ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY nation""".stripMargin,
    "cypher_order_limit" ->
      """SELECT c_name AS name, c_acctbal AS acctbal
        |FROM customer ORDER BY acctbal DESC, name LIMIT 10""".stripMargin,
    "cypher_optional_match" ->
      """SELECT c.c_name AS cust, o.o_orderkey AS orderkey
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |ORDER BY cust, orderkey NULLS FIRST""".stripMargin,
    "cypher_var_expand" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |p AS (
        |  SELECT src, dst FROM e2
        |  UNION ALL
        |  SELECT a.src, b.dst FROM e2 a JOIN e2 b ON a.dst = b.src
        |  UNION ALL
        |  SELECT a.src, c.dst FROM e2 a JOIN e2 b ON a.dst = b.src
        |    JOIN e2 c ON b.dst = c.src)
        |SELECT na.n_name AS a_name, nb.n_name AS b_name
        |FROM p JOIN nation na ON p.src = na.n_nationkey
        |JOIN nation nb ON p.dst = nb.n_nationkey
        |ORDER BY a_name, b_name""".stripMargin,
    "cypher_quantified_path" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |p AS (
        |  SELECT a.src, b.dst FROM e2 a JOIN e2 b ON a.dst = b.src
        |  UNION ALL
        |  SELECT a.src, c.dst FROM e2 a JOIN e2 b ON a.dst = b.src
        |    JOIN e2 c ON b.dst = c.src
        |  UNION ALL
        |  SELECT a.src, d.dst FROM e2 a JOIN e2 b ON a.dst = b.src
        |    JOIN e2 c ON b.dst = c.src JOIN e2 d ON c.dst = d.src)
        |SELECT na.n_name AS a_name, nb.n_name AS b_name
        |FROM p JOIN nation na ON p.src = na.n_nationkey
        |JOIN nation nb ON p.dst = nb.n_nationkey
        |ORDER BY a_name, b_name""".stripMargin,
    "cypher_qpp_group" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |p AS (
        |  SELECT a.src, b.dst FROM e2 a JOIN e2 b ON a.dst = b.src
        |  UNION ALL
        |  SELECT a.src, c.dst FROM e2 a JOIN e2 b ON a.dst = b.src
        |    JOIN e2 c ON b.dst = c.src)
        |SELECT na.n_name AS a_name, nb.n_name AS b_name
        |FROM p JOIN nation na ON p.src = na.n_nationkey
        |JOIN nation nb ON p.dst = nb.n_nationkey
        |ORDER BY a_name, b_name""".stripMargin,
    "cypher_qpp_groupvar" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |p2 AS (SELECT a.src AS s, a.dst AS m1, b.dst AS t
        |       FROM e2 a JOIN e2 b ON a.dst = b.src),
        |p3 AS (SELECT a.src AS s, a.dst AS m1, b.dst AS m2, c.dst AS t
        |       FROM e2 a JOIN e2 b ON a.dst = b.src
        |       JOIN e2 c ON b.dst = c.src),
        |rws AS (
        |  SELECT s, t, 2 AS n_steps, m1 AS step FROM p2
        |  UNION ALL SELECT s, t, 2, t FROM p2
        |  UNION ALL SELECT s, t, 3, m1 FROM p3
        |  UNION ALL SELECT s, t, 3, m2 FROM p3
        |  UNION ALL SELECT s, t, 3, t FROM p3)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(n_steps AS BIGINT) AS n_steps,
        |  CAST(3000000000 + step AS BIGINT) AS step_node
        |FROM rws JOIN nation ns ON rws.s = ns.n_nationkey
        |JOIN nation nt ON rws.t = nt.n_nationkey
        |ORDER BY s_name, t_name, n_steps, step_node""".stripMargin,
    // hop-count union with the per-step source predicate applied to
    // every hop's source explicitly (the oracle spells the per-step
    // semantics out; the engine plans it as one edge pre-filter)
    "cypher_qpp_stepfilter" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |se AS (
        |  SELECT e.src, e.dst FROM e
        |  JOIN nation a ON a.n_nationkey = e.src AND a.n_regionkey = 2
        |  WHERE e.dst IS NOT NULL),
        |p AS (
        |  SELECT src, dst, 1 AS n FROM se
        |  UNION ALL
        |  SELECT a.src, b.dst, 2 FROM se a JOIN se b ON a.dst = b.src
        |  UNION ALL
        |  SELECT a.src, c.dst, 3 FROM se a JOIN se b ON a.dst = b.src
        |    JOIN se c ON b.dst = c.src)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(p.n AS BIGINT) AS n_steps
        |FROM p JOIN nation ns ON p.src = ns.n_nationkey
        |JOIN nation nt ON p.dst = nt.n_nationkey
        |ORDER BY s_name, t_name, n_steps""".stripMargin,
    // per-step WHERE = one filter on the edge list (name-increasing
    // steps), then the 1..3-hop chain unions over the FILTERED edges
    "cypher_qpp_where" ->
      """WITH e0 AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e AS (
        |  SELECT a.src, a.dst FROM e0 a
        |  JOIN nation ns ON a.src = ns.n_nationkey
        |  JOIN nation nd ON a.dst = nd.n_nationkey
        |  WHERE a.dst IS NOT NULL AND ns.n_name < nd.n_name),
        |p AS (
        |  SELECT src AS s, dst AS t, 1 AS hops FROM e
        |  UNION ALL
        |  SELECT a.src, b.dst, 2 FROM e a JOIN e b ON a.dst = b.src
        |  UNION ALL
        |  SELECT a.src, c.dst, 3 FROM e a
        |  JOIN e b ON a.dst = b.src JOIN e c ON b.dst = c.src)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(p.hops AS BIGINT) AS hops
        |FROM p JOIN nation ns ON p.s = ns.n_nationkey
        |JOIN nation nt ON p.t = nt.n_nationkey
        |ORDER BY s_name, t_name, hops""".stripMargin,
    // k repetitions of the 4-HOP unit (r15, cap lifted): only k = 1
    // fits the 5-node region chains — the k = 2 (8-edge) arm unions
    // empty, mirrored here for semantic fidelity
    "cypher_qpp_multihop4" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |h4 AS (SELECT a.src AS s, d.dst AS t FROM e2 a
        |       JOIN e2 b ON a.dst = b.src
        |       JOIN e2 c ON b.dst = c.src
        |       JOIN e2 d ON c.dst = d.src),
        |p AS (
        |  SELECT s, t, 4 AS hops, 1 AS n_reps FROM h4
        |  UNION ALL
        |  SELECT r1.s, r2.t, 8, 2 FROM h4 r1 JOIN h4 r2 ON r1.t = r2.s)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(p.hops AS BIGINT) AS hops, CAST(p.n_reps AS BIGINT) AS n_reps
        |FROM p JOIN nation ns ON p.s = ns.n_nationkey
        |JOIN nation nt ON p.t = nt.n_nationkey
        |ORDER BY s_name, t_name""".stripMargin,
    // k repetitions of the 2-hop unit = 2k-edge walks: the 2- and
    // 4-hop compositions with repetition counts
    "cypher_qpp_multihop" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |h2 AS (SELECT a.src AS s, b.dst AS t FROM e2 a
        |       JOIN e2 b ON a.dst = b.src),
        |h4 AS (SELECT a.src AS s, d.dst AS t FROM e2 a
        |       JOIN e2 b ON a.dst = b.src
        |       JOIN e2 c ON b.dst = c.src
        |       JOIN e2 d ON c.dst = d.src),
        |p AS (
        |  SELECT s, t, 2 AS hops, 1 AS n_reps FROM h2
        |  UNION ALL
        |  SELECT s, t, 4, 2 FROM h4)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(p.hops AS BIGINT) AS hops, CAST(p.n_reps AS BIGINT) AS n_reps
        |FROM p JOIN nation ns ON p.s = ns.n_nationkey
        |JOIN nation nt ON p.t = nt.n_nationkey
        |ORDER BY s_name, t_name""".stripMargin,
    // multi-hop + outer-ref WHERE: each repetition's end name exceeds
    // the WALK start's name (rep1 end = the juncture mid, rep2 end =
    // the walk end; both compare against the k=2 walk's first src)
    "cypher_qpp_mh_where_outer" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |nm AS (SELECT n_nationkey AS id, n_name AS name FROM nation),
        |rep AS (SELECT a.src AS s, b.dst AS t FROM e2 a
        |        JOIN e2 b ON a.dst = b.src),
        |p AS (
        |  SELECT r.s, r.t, 2 AS hops FROM rep r
        |  JOIN nm x ON r.s = x.id JOIN nm y ON r.t = y.id
        |  WHERE y.name > x.name
        |  UNION ALL
        |  SELECT r1.s, r2.t, 4 FROM rep r1 JOIN rep r2 ON r1.t = r2.s
        |  JOIN nm x ON r1.s = x.id JOIN nm m ON r1.t = m.id
        |  JOIN nm y ON r2.t = y.id
        |  WHERE m.name > x.name AND y.name > x.name)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(p.hops AS BIGINT) AS hops
        |FROM p JOIN nation ns ON p.s = ns.n_nationkey
        |JOIN nation nt ON p.t = nt.n_nationkey
        |ORDER BY s_name, t_name, hops""".stripMargin,
    // multi-hop repetition WHERE: a repetition is a 2-hop segment
    // whose END name exceeds its START name; k=2 chains two
    // qualifying segments (edge-disjoint on the linear region chain)
    "cypher_qpp_multihop_where" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |nm AS (SELECT n_nationkey AS id, n_name AS name FROM nation),
        |rep AS (
        |  SELECT a.src AS s, b.dst AS t FROM e2 a
        |  JOIN e2 b ON a.dst = b.src
        |  JOIN nm x ON a.src = x.id JOIN nm y ON b.dst = y.id
        |  WHERE x.name < y.name),
        |p AS (
        |  SELECT s, t, 2 AS hops FROM rep
        |  UNION ALL
        |  SELECT r1.s, r2.t, 4 FROM rep r1 JOIN rep r2 ON r1.t = r2.s)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(p.hops AS BIGINT) AS hops
        |FROM p JOIN nation ns ON p.s = ns.n_nationkey
        |JOIN nation nt ON p.t = nt.n_nationkey
        |ORDER BY s_name, t_name, hops""".stripMargin,
    // outer-ref per-step WHERE: every step's dst name exceeds the
    // WALK START's name — the start value parameterizes each union arm
    "cypher_qpp_where_outer" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |nm AS (SELECT n_nationkey AS id, n_name AS name FROM nation),
        |p AS (
        |  SELECT a.src AS s, a.dst AS t, 1 AS hops FROM e2 a
        |    JOIN nm s0 ON a.src = s0.id JOIN nm d1 ON a.dst = d1.id
        |    WHERE d1.name > s0.name
        |  UNION ALL
        |  SELECT a.src, b.dst, 2 FROM e2 a JOIN e2 b ON a.dst = b.src
        |    JOIN nm s0 ON a.src = s0.id JOIN nm d1 ON a.dst = d1.id
        |    JOIN nm d2 ON b.dst = d2.id
        |    WHERE d1.name > s0.name AND d2.name > s0.name
        |  UNION ALL
        |  SELECT a.src, c.dst, 3 FROM e2 a JOIN e2 b ON a.dst = b.src
        |    JOIN e2 c ON b.dst = c.src
        |    JOIN nm s0 ON a.src = s0.id JOIN nm d1 ON a.dst = d1.id
        |    JOIN nm d2 ON b.dst = d2.id JOIN nm d3 ON c.dst = d3.id
        |    WHERE d1.name > s0.name AND d2.name > s0.name
        |      AND d3.name > s0.name)
        |SELECT s0.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(p.hops AS BIGINT) AS hops
        |FROM p JOIN nation s0 ON p.s = s0.n_nationkey
        |JOIN nation nt ON p.t = nt.n_nationkey
        |ORDER BY s_name, t_name, hops""".stripMargin,
    // the SHORTEST variant of the outer-WHERE walks: identical
    // per-start-parameterized unions, collapsed to min(hops) per
    // (s, t) pair — the BFS first-reach semantics
    "cypher_sp_where_outer" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |nm AS (SELECT n_nationkey AS id, n_name AS name FROM nation),
        |p AS (
        |  SELECT a.src AS s, a.dst AS t, 1 AS hops FROM e2 a
        |    JOIN nm s0 ON a.src = s0.id JOIN nm d1 ON a.dst = d1.id
        |    WHERE d1.name > s0.name
        |  UNION ALL
        |  SELECT a.src, b.dst, 2 FROM e2 a JOIN e2 b ON a.dst = b.src
        |    JOIN nm s0 ON a.src = s0.id JOIN nm d1 ON a.dst = d1.id
        |    JOIN nm d2 ON b.dst = d2.id
        |    WHERE d1.name > s0.name AND d2.name > s0.name
        |  UNION ALL
        |  SELECT a.src, c.dst, 3 FROM e2 a JOIN e2 b ON a.dst = b.src
        |    JOIN e2 c ON b.dst = c.src
        |    JOIN nm s0 ON a.src = s0.id JOIN nm d1 ON a.dst = d1.id
        |    JOIN nm d2 ON b.dst = d2.id JOIN nm d3 ON c.dst = d3.id
        |    WHERE d1.name > s0.name AND d2.name > s0.name
        |      AND d3.name > s0.name)
        |SELECT s0.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(MIN(p.hops) AS BIGINT) AS hops
        |FROM p JOIN nation s0 ON p.s = s0.n_nationkey
        |JOIN nation nt ON p.t = nt.n_nationkey
        |GROUP BY s0.n_name, nt.n_name
        |ORDER BY s_name, t_name""".stripMargin,
    // In-direction inner hops walk the chain BACKWARD: reverse the
    // edge list, then compose 2- and 4-hop reverse walks
    "cypher_qpp_multihop_in" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |r AS (SELECT dst AS src, src AS dst FROM e2),
        |h2 AS (SELECT a.src AS s, b.dst AS t FROM r a
        |       JOIN r b ON a.dst = b.src),
        |h4 AS (SELECT a.src AS s, d.dst AS t FROM r a
        |       JOIN r b ON a.dst = b.src
        |       JOIN r c ON b.dst = c.src
        |       JOIN r d ON c.dst = d.src),
        |p AS (
        |  SELECT s, t, 2 AS hops FROM h2
        |  UNION ALL
        |  SELECT s, t, 4 FROM h4)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(p.hops AS BIGINT) AS hops
        |FROM p JOIN nation ns ON p.s = ns.n_nationkey
        |JOIN nation nt ON p.t = nt.n_nationkey
        |ORDER BY s_name, t_name, hops""".stripMargin,
    // the typeless second hop unions Nation-sourced edge types
    // (IN_REGION + NEXT_IN_REGION); the :Region juncture keeps only
    // the IN_REGION ends → customer → nation → region, 2 hops
    "cypher_qpp_multihop_untyped" ->
      """SELECT c.c_name AS s_name, r.r_name AS t_name,
        |  CAST(2 AS BIGINT) AS hops
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY s_name, t_name""".stripMargin,
    // zero-length branch = one self-pair per nation at 0 hops,
    // union'd with the 1- and 2-hop expansions
    "cypher_qpp_zero" ->
      """WITH e AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |p AS (
        |  SELECT n_nationkey AS src, n_nationkey AS dst, 0 AS n FROM nation
        |  UNION ALL
        |  SELECT src, dst, 1 FROM e2
        |  UNION ALL
        |  SELECT a.src, b.dst, 2 FROM e2 a JOIN e2 b ON a.dst = b.src)
        |SELECT ns.n_name AS s_name, nt.n_name AS t_name,
        |  CAST(p.n AS BIGINT) AS hops
        |FROM p JOIN nation ns ON p.src = ns.n_nationkey
        |JOIN nation nt ON p.dst = nt.n_nationkey
        |ORDER BY s_name, t_name, hops""".stripMargin,
    "graph_component_sizes" ->
      """WITH nodes AS (
        |  SELECT 2000000000 + c_custkey AS id, n_regionkey AS rk
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT 3000000000 + n_nationkey AS id, n_regionkey AS rk FROM nation
        |  UNION ALL
        |  SELECT 4000000000 + r_regionkey AS id, r_regionkey AS rk FROM region),
        |c AS (SELECT rk, COUNT(*) AS sz FROM nodes GROUP BY rk)
        |SELECT sz AS component_size, CAST(COUNT(*) AS BIGINT) AS n_components,
        |  CAST(SUM(sz) AS BIGINT) AS n_nodes
        |FROM c GROUP BY sz ORDER BY component_size""".stripMargin,
    "graph_connected_components" ->
      """WITH nodes AS (
        |  SELECT 2000000000 + c_custkey AS id, n_regionkey AS rk
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT 3000000000 + n_nationkey AS id, n_regionkey AS rk FROM nation
        |  UNION ALL
        |  SELECT 4000000000 + r_regionkey AS id, r_regionkey AS rk FROM region)
        |SELECT id, min(id) OVER (PARTITION BY rk) AS comp
        |FROM nodes ORDER BY id""".stripMargin,
    "cypher_write_batches" ->
      """WITH b AS (
        |  SELECT o_orderkey, CAST(o_orderkey // 400 AS BIGINT) AS range_id,
        |    CAST((ROW_NUMBER() OVER (PARTITION BY o_orderkey // 400 ORDER BY o_orderkey) - 1) // 100 AS BIGINT) AS sub_id,
        |    '{"orderkey":' || o_orderkey || ',"status":"' || o_orderstatus || '"}' AS elem
        |  FROM orders)
        |SELECT range_id, sub_id, COUNT(*) AS n_rows,
        |'{"statements" : [ {"statement" : "UNWIND $inserts AS i CREATE (o:Order {orderkey:i.orderkey, status:i.status})", "parameters" : {"inserts" : ['
        |  || string_agg(elem, ',' ORDER BY o_orderkey) || ']} }]}' AS payload
        |FROM b GROUP BY range_id, sub_id ORDER BY range_id, sub_id""".stripMargin,
    "cypher_write_merge" ->
      """WITH b AS (
        |  SELECT o_orderkey, CAST(o_orderkey // 400 AS BIGINT) AS range_id,
        |    CAST((ROW_NUMBER() OVER (PARTITION BY o_orderkey // 400 ORDER BY o_orderkey) - 1) // 100 AS BIGINT) AS sub_id,
        |    '{"orderkey":' || o_orderkey || ',"status":"' || o_orderstatus || '"}' AS elem
        |  FROM orders)
        |SELECT range_id, sub_id, COUNT(*) AS n_rows,
        |'{"statements" : [ {"statement" : "UNWIND $rows AS r MERGE (o:Order {orderkey:r.orderkey}) SET o.status = r.status", "parameters" : {"rows" : ['
        |  || string_agg(elem, ',' ORDER BY o_orderkey) || ']} }]}' AS payload
        |FROM b GROUP BY range_id, sub_id ORDER BY range_id, sub_id""".stripMargin,
    "graph_bfs" ->
      """WITH RECURSIVE edges AS MATERIALIZED (
        |  SELECT 2000000000 + o_custkey AS src, 1000000000 + o_orderkey AS dst
        |  FROM orders
        |  UNION ALL
        |  SELECT 3000000000 + c_nationkey AS src, 2000000000 + c_custkey AS dst
        |  FROM customer
        |  UNION ALL
        |  SELECT 4000000000 + n_regionkey AS src, 3000000000 + n_nationkey AS dst
        |  FROM nation),
        |walk AS (
        |  SELECT 4000000000 + r_regionkey AS id, 0 AS depth FROM region
        |  UNION
        |  SELECT e.dst AS id, w.depth + 1 AS depth
        |  FROM walk w JOIN edges e ON e.src = w.id)
        |SELECT id, CAST(MIN(depth) AS BIGINT) AS depth
        |FROM walk GROUP BY id ORDER BY id""".stripMargin,
    "graph_triangle_count" ->
      """WITH nb AS (
        |  SELECT c_custkey AS src,
        |    lead(c_custkey, 1) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d1,
        |    lead(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS d2
        |  FROM customer),
        |e AS (
        |  SELECT src AS u, d1 AS v FROM nb WHERE d1 IS NOT NULL
        |  UNION
        |  SELECT src AS u, d2 AS v FROM nb WHERE d2 IS NOT NULL),
        |t AS (
        |  SELECT e1.u AS x
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT n_name AS nation, COUNT(*) AS n_triangles
        |FROM t JOIN customer ON x = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY nation""".stripMargin,
    "graph_degrees" ->
      """WITH edges AS (
        |  SELECT 1000000000 + o_orderkey AS src, 2000000000 + o_custkey AS dst
        |  FROM orders
        |  UNION ALL
        |  SELECT 2000000000 + c_custkey AS src, 3000000000 + c_nationkey AS dst
        |  FROM customer
        |  UNION ALL
        |  SELECT 3000000000 + n_nationkey AS src, 4000000000 + n_regionkey AS dst
        |  FROM nation)
        |SELECT id, CAST(SUM(out_d) AS BIGINT) AS out_degree,
        |  CAST(SUM(in_d) AS BIGINT) AS in_degree
        |FROM (
        |  SELECT src AS id, 1 AS out_d, 0 AS in_d FROM edges
        |  UNION ALL
        |  SELECT dst AS id, 0 AS out_d, 1 AS in_d FROM edges)
        |GROUP BY id ORDER BY id""".stripMargin)
}
