package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` has a matching `oracleSql` entry (DuckDB SQL over
  * the same parquet fixtures, table names = file basenames) unless noted;
  * column names and types are aligned between the two sides because the
  * driver's compare sorts columns by name before hashing values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Knn.knnTopkCosine(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2B. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_knn_topk_cosine"    -> ((s, dir) => Knn.knnTopkCosine(s, dir)),
    "q02_knn_top1_filtered"  -> ((s, dir) => Knn.knnTop1Filtered(s, dir)),
    "q03_upsert_latest"      -> ((s, dir) => Upsert.upsertLatest(s, dir)),
    "q04_vocab_build_minfreq" -> ((s, dir) => TextPipeline.vocabBuild(s, dir)),
    "q05_tokenize_pad"       -> ((s, dir) => TextPipeline.tokenizePadDeclared(s, dir)),
    "q06_split_train_val"    -> ((s, dir) => TextPipeline.splitTrainVal(s, dir)),
    "q07_maxlen_by_lang"     -> ((s, dir) => TextPipeline.maxlenByLang(s, dir)),
    "q08_instruction_parse"  -> ((s, dir) => TextPipeline.instructionParse(s, dir)),
    "q09_base64_payload"     -> ((s, dir) => Payload.base64Payload(s, dir)),
    "q10_near_dup_pairs"     -> ((s, dir) => Dedup.nearDupPairs(s, dir)),
    "q11_label_centroids"    -> ((s, dir) => Analytics.labelCentroids(s, dir)),
    "q12_payload_enrich_join" -> ((s, dir) => Payload.payloadEnrichJoin(s, dir)),
    "q13_event_window_stats" -> ((s, dir) => Analytics.eventWindowStats(s, dir)),
    "q14_text_stats"         -> ((s, dir) => TextPipeline.textStats(s, dir)),
    "q15_exact_dedup"        -> ((s, dir) => TextAnalysis.exactDedup(s, dir)),
    "q16_minhash_lsh_dedup"  -> ((s, dir) => DedupExtras.minhashLshDedup(s, dir)),
    "q17_simhash_fingerprint" -> ((s, dir) => DedupExtras.simhashFingerprint(s, dir)),
    "q18_ngram_jaccard"      -> ((s, dir) => DedupExtras.ngramJaccard(s, dir)),
    "q19_lang_id"            -> ((s, dir) => TextAnalysis.langId(s, dir)),
    "q20_quality_score"      -> ((s, dir) => TextAnalysis.qualityScore(s, dir)),
    "q21_token_count"        -> ((s, dir) => TextAnalysis.tokenCount(s, dir)),
    "q22_doc_fingerprint"    -> ((s, dir) => TextAnalysis.docFingerprint(s, dir)),
    "q23_normalize_embeddings" -> ((s, dir) => Ann.normalizeEmbeddings(s, dir)),
    "q24_ann_ivf_topk"       -> ((s, dir) => Ann.annIvfTopK(s, dir)),
    "q25_multimodal_decode"  -> ((s, dir) => Multimodal.multimodalDecode(s, dir)),
    "q26_pricing_summary"    -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "q27_top_customers"      -> ((s, dir) => Relational.topCustomers(s, dir)),
    "q28_sessionize"         -> ((s, dir) => Relational.sessionize(s, dir)),
    "q29_json_payload_stats" -> ((s, dir) => Payload.jsonPayloadStats(s, dir)),
    "q30_event_rollup"       -> ((s, dir) => Relational.eventRollup(s, dir)),
    "q31_asof_join"          -> ((s, dir) => Relational.asofJoin(s, dir)),
    "q32_chunk_documents"    -> ((s, dir) => TextPipeline.chunkDocuments(s, dir)),
    "q33_padding_mask"       -> ((s, dir) => TensorOps.paddingMask(s, dir)),
    "q34_softmax_relu"       -> ((s, dir) => TensorOps.softmaxRelu(s, dir)),
    "q35_event_type_pivot"   -> ((s, dir) => Relational.eventTypePivot(s, dir)),
    "q36_value_quantiles"    -> ((s, dir) => Relational.valueQuantiles(s, dir)),
    "q37_set_ops_split"      -> ((s, dir) => TextPipeline.setOpsSplit(s, dir)),
    "q38_ivf_index_probe"    -> ((s, dir) => IvfIndex.ivfIndexProbe(s, dir)),
    "q39_frame_sample"       -> ((s, dir) => Multimodal.frameSampleDeclared(s, dir)),
    "q40_resize"             -> ((s, dir) => Multimodal.resizeDeclared(s, dir)),
    "q41_embed_text"         -> ((s, dir) => Embed.embedTextDeclared(s, dir)),
    "q42_decode_step"        -> ((s, dir) => TensorOps.decodeStep(s, dir)),
    "q43_layernorm"          -> ((s, dir) => TensorOps.layerNorm(s, dir)),
    "q44_event_cube"         -> ((s, dir) => Relational.eventCube(s, dir)),
    "q45_dedup_purge"        -> ((s, dir) => TextAnalysis.dedupPurge(s, dir)),
    "q46_range_tier_join"    -> ((s, dir) => Relational.rangeTierJoin(s, dir)),
    "q47_detokenize"         -> ((s, dir) => TextPipeline.detokenize(s, dir)),
    "q48_filtered_index_probe" -> ((s, dir) => IvfIndex.filteredIndexProbe(s, dir)),
    "q49_quantize_int8"      -> ((s, dir) => Quantize.quantizeInt8(s, dir)),
    "q50_tfidf_top_terms"    -> ((s, dir) => TextAnalysis.tfidfTopTerms(s, dir)),
    "q51_repetition_stats"   -> ((s, dir) => TextAnalysis.repetitionStats(s, dir)),
    "q52_pii_redact"         -> ((s, dir) => TextAnalysis.piiRedact(s, dir)),
    "q53_multiprobe_index"   -> ((s, dir) => IvfIndex.multiprobeIndexProbe(s, dir)),
    "q54_encode_persisted_vocab" -> ((s, dir) => TextPipeline.encodePersistedVocab(s, dir)),
    "q55_graph_ann_probe"    -> ((s, dir) => GraphAnn.graphAnnProbe(s, dir)),
  )

  /** DuckDB-runnable oracle SQL per query key. */
  def oracleSql: Map[String, String] = Map(
    "q01_knn_topk_cosine"    -> Knn.q01OracleSql,
    "q02_knn_top1_filtered"  -> Knn.q02OracleSql,
    "q03_upsert_latest"      -> Upsert.q03OracleSql,
    "q04_vocab_build_minfreq" -> TextPipeline.q04OracleSql,
    "q05_tokenize_pad"       -> TextPipeline.q05OracleSql,
    "q06_split_train_val"    -> TextPipeline.q06OracleSql,
    "q07_maxlen_by_lang"     -> TextPipeline.q07OracleSql,
    "q08_instruction_parse"  -> TextPipeline.q08OracleSql,
    "q09_base64_payload"     -> Payload.q09OracleSql,
    "q10_near_dup_pairs"     -> Dedup.q10OracleSql,
    "q11_label_centroids"    -> Analytics.q11OracleSql,
    "q12_payload_enrich_join" -> Payload.q12OracleSql,
    "q13_event_window_stats" -> Analytics.q13OracleSql,
    "q14_text_stats"         -> TextPipeline.q14OracleSql,
    "q15_exact_dedup"        -> TextAnalysis.q15OracleSql,
    "q16_minhash_lsh_dedup"  -> DedupExtras.q16OracleSql,
    "q17_simhash_fingerprint" -> DedupExtras.q17OracleSql,
    "q18_ngram_jaccard"      -> DedupExtras.q18OracleSql,
    "q19_lang_id"            -> TextAnalysis.q19OracleSql,
    "q20_quality_score"      -> TextAnalysis.q20OracleSql,
    "q21_token_count"        -> TextAnalysis.q21OracleSql,
    "q22_doc_fingerprint"    -> TextAnalysis.q22OracleSql,
    "q23_normalize_embeddings" -> Ann.q23OracleSql,
    "q24_ann_ivf_topk"       -> Ann.q24OracleSql,
    "q25_multimodal_decode"  -> Multimodal.q25OracleSql,
    "q26_pricing_summary"    -> Relational.q26OracleSql,
    "q27_top_customers"      -> Relational.q27OracleSql,
    "q28_sessionize"         -> Relational.q28OracleSql,
    "q29_json_payload_stats" -> Payload.q29OracleSql,
    "q30_event_rollup"       -> Relational.q30OracleSql,
    "q31_asof_join"          -> Relational.q31OracleSql,
    "q32_chunk_documents"    -> TextPipeline.q32OracleSql,
    "q33_padding_mask"       -> TensorOps.q33OracleSql,
    "q34_softmax_relu"       -> TensorOps.q34OracleSql,
    "q35_event_type_pivot"   -> Relational.q35OracleSql,
    "q36_value_quantiles"    -> Relational.q36OracleSql,
    "q37_set_ops_split"      -> TextPipeline.q37OracleSql,
    "q38_ivf_index_probe"    -> IvfIndex.q38OracleSql,
    "q39_frame_sample"       -> Multimodal.q39OracleSql,
    "q40_resize"             -> Multimodal.q40OracleSql,
    "q41_embed_text"         -> Embed.q41OracleSql,
    "q42_decode_step"        -> TensorOps.q42OracleSql,
    "q43_layernorm"          -> TensorOps.q43OracleSql,
    "q44_event_cube"         -> Relational.q44OracleSql,
    "q45_dedup_purge"        -> TextAnalysis.q45OracleSql,
    "q46_range_tier_join"    -> Relational.q46OracleSql,
    "q47_detokenize"         -> TextPipeline.q47OracleSql,
    "q48_filtered_index_probe" -> IvfIndex.q48OracleSql,
    "q49_quantize_int8"      -> Quantize.q49OracleSql,
    "q50_tfidf_top_terms"    -> TextAnalysis.q50OracleSql,
    "q51_repetition_stats"   -> TextAnalysis.q51OracleSql,
    "q52_pii_redact"         -> TextAnalysis.q52OracleSql,
    "q53_multiprobe_index"   -> IvfIndex.q53OracleSql,
    "q54_encode_persisted_vocab" -> TextPipeline.q54OracleSql,
    "q55_graph_ann_probe"    -> GraphAnn.q55OracleSql,
  )
}
