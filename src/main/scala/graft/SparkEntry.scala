package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * north-star operators) is exposed as a named batch query over the
  * TESTDATA.md parquet fixtures, with equivalent DuckDB-runnable ANSI SQL
  * in [[oracleSql]] where the semantics are SQL-expressible.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The end-to-end pipeline exercises every engine layer: validation,
    * quality scoring, dedup, aggregation, and the partitioned sink. */
  def entry(spark: SparkSession): DataFrame =
    PipelineE2E.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> Relational.pricingSummary _,
    "q3_shipping_priority" -> Relational.shippingPriority _,
    "q_window_topk" -> Relational.topOrdersPerCustomer _,
    "q_rollup" -> Relational.orderRollup _,
    "q_cube" -> Relational.orderCube _,
    "q_partition_transforms" -> ParityQueries.partitionTransforms _,
    "q_scalar_fns" -> ParityQueries.scalarFunctions _,
    "q_transform_bucket" -> ParityQueries.bucketTransform _,
    "q_serde_json" -> ParityQueries.serdeJsonRoundtrip _,
    "q_validate_split" -> ParityQueries.validateSplit _,
    "q_enrich" -> ParityQueries.enrichMetadata _,
    "q_coercion" -> ParityQueries.coercion _,
    "q_blob_roundtrip" -> ParityQueries.blobRoundtrip _,
    "q_sink_roundtrip" -> ParityQueries.sinkRoundtrip _,
    "q_stream_window" -> StreamPipeline.streamWindowQuery _,
    "q_stream_stateful" -> StreamPipeline.statefulUserCounts _,
    "q_session_windows" -> StreamPipeline.sessionWindows _,
    "q_semi_anti_join" -> Relational.semiAntiJoin _,
    "q_outer_join_stats" -> Relational.outerJoinStats _,
    "q_setops" -> Relational.setOps _,
    "q_pipeline_e2e" -> PipelineE2E.run _,
    "q5_local_revenue" -> Relational.localSupplierRevenue _,
    "q6_forecast_revenue" -> Relational.forecastRevenue _,
    "q_sketches" -> Sketches.eventSketches _,
    "q_sketch_bounds" -> Sketches.sketchBounds _,
    "sim_ivf_full" -> PipelineQueries.simIvfFull _,
    "q10_returned_revenue" -> Relational.returnedItemRevenue _,
    "q12_ship_priority" -> Relational.shipModePriority _,
    "dedup_exact" -> PipelineQueries.dedupExact _,
    "dedup_ngram_jaccard" -> PipelineQueries.dedupNgram _,
    "dedup_minhash" -> PipelineQueries.dedupMinhash _,
    "dedup_simhash" -> PipelineQueries.dedupSimhash _,
    "dedup_embedding" -> PipelineQueries.dedupEmbedding _,
    "dedup_embedding_lsh" -> PipelineQueries.dedupEmbeddingLsh _,
    "sim_topk" -> PipelineQueries.simTopK _,
    "sim_ann_lsh" -> PipelineQueries.simAnnLsh _,
    "sim_ivf" -> PipelineQueries.simIvf _,
    "text_stats" -> PipelineQueries.textStats _,
    "text_langid" -> PipelineQueries.textLangId _,
    "text_quality" -> PipelineQueries.textQuality _,
    "text_fingerprint" -> PipelineQueries.textFingerprint _,
    "multimodal_features" -> Multimodal.featuresQuery _,
    "multimodal_frames" -> Multimodal.framesQuery _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Relational.pricingSummarySql,
    "q3_shipping_priority" -> Relational.shippingPrioritySql,
    "q_window_topk" -> Relational.topOrdersPerCustomerSql,
    "q_rollup" -> Relational.orderRollupSql,
    "q_cube" -> Relational.orderCubeSql,
    "q_partition_transforms" -> ParityQueries.partitionTransformsSql,
    "q_scalar_fns" -> ParityQueries.scalarFunctionsSql,
    "q_serde_json" -> ParityQueries.serdeJsonRoundtripSql,
    "q_validate_split" -> ParityQueries.validateSplitSql,
    "q_enrich" -> ParityQueries.enrichMetadataSql,
    "q_coercion" -> ParityQueries.coercionSql,
    "q_blob_roundtrip" -> ParityQueries.blobRoundtripSql,
    "q_sink_roundtrip" -> ParityQueries.sinkRoundtripSql,
    "q_stream_window" -> StreamPipeline.streamWindowSql,
    "q_stream_stateful" -> StreamPipeline.statefulUserCountsSql,
    "q_session_windows" -> StreamPipeline.sessionWindowsSql,
    "q_semi_anti_join" -> Relational.semiAntiJoinSql,
    "q_outer_join_stats" -> Relational.outerJoinStatsSql,
    "q_setops" -> Relational.setOpsSql,
    "q_pipeline_e2e" -> PipelineE2E.sql,
    "q5_local_revenue" -> Relational.localSupplierRevenueSql,
    "q6_forecast_revenue" -> Relational.forecastRevenueSql,
    "q10_returned_revenue" -> Relational.returnedItemRevenueSql,
    "q12_ship_priority" -> Relational.shipModePrioritySql,
    "dedup_exact" -> PipelineQueries.dedupExactSql,
    "dedup_ngram_jaccard" -> PipelineQueries.dedupNgramSql,
    "dedup_minhash" -> OracleSql.dedupMinhashSql,
    "dedup_simhash" -> OracleSql.dedupSimhashSql,
    "dedup_embedding" -> PipelineQueries.dedupEmbeddingSql,
    "dedup_embedding_lsh" -> OracleSql.dedupEmbeddingLshSql,
    "q_transform_bucket" -> OracleSql.bucketTransformSql,
    "q_sketch_bounds" -> Sketches.sketchBoundsSql,
    "sim_topk" -> PipelineQueries.simTopKSql,
    "sim_ann_lsh" -> OracleSql.simAnnLshSql,
    "sim_ivf_full" -> PipelineQueries.simTopKSql,
    "text_stats" -> PipelineQueries.textStatsSql,
    "text_langid" -> PipelineQueries.textLangIdSql,
    "text_quality" -> PipelineQueries.textQualitySql,
    "text_fingerprint" -> PipelineQueries.textFingerprintSql,
    "multimodal_features" -> Multimodal.featuresSql,
    "multimodal_frames" -> Multimodal.framesSql,
  )
}
