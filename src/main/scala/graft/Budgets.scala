package graft

/** Per-query wall-time budgets: 2.5x the slower of two round-8 clean-box
  * full-bench samples (the 131-query and 136-query sf0.1 runs recorded in
  * BASELINE.md), floored at 1.5 s. [[Bench]] multiplies each budget by the
  * run's calibration factor (see [[CalibRef]]) and emits the breach list in
  * its headline JSON, so a broken plan (a lost broadcast, a shuffle gone
  * quadratic — the class that took `dedup_embed_cos_lsh` to 13 s in r3)
  * turns up in the round's BENCH file instead of waiting for a human diff
  * against BASELINE.md — whose snapshot section mirrors these values.
  *
  * Why 2.5x of FULL-BENCH samples (not isolated runs): position effects are
  * real — a query late in a 136-query pass can pay GC/heap pressure its
  * isolated run never sees (eval_pq_recall 0.9/3.2 across the two runs,
  * 1.5 isolated) — and the budget must cover both positions. Machine SPEED
  * is handled separately by the calibration factor, so these numbers stay
  * sized to a clean box instead of the slowest observed one (the r6 advice
  * item). A query missing here (newly added, not yet measured twice) is
  * simply unbudgeted for that round. */
object Budgets {
  /** Wall time of [[Bench]]'s calibration workload (min of two timed runs
    * after one warm-up) on the box that produced the budget samples, in
    * its clean state. The workload has two legs since round 8: the 40M-row
    * hash+shuffle aggregate AND a ~100 MB localCheckpoint write + re-read,
    * so a box with slow block-manager/disk IO raises the factor the way a
    * slow CPU always did (the r7 verdict: the CPU-only factor was blind to
    * exactly the checkpoint-heavy class that breached). Observed
    * 0.82/0.88/0.89/1.01 across the round-8 re-pin runs; pinned to the
    * fast end so mild local noise reads as a small factor (intended
    * headroom) and a genuinely loaded or slower machine raises the
    * envelope via its own calibration. Bench clamps the factor to [1, 3]. */
  val CalibRef: Double = 0.85
  val perQuery: Map[String, Double] = Map(
    "agg_price_quantiles" -> 1.5, // r8 samples 0.20/0.23
    "agg_skew_salted" -> 1.5, // r8 samples 0.16/0.17
    "clean_boilerplate" -> 1.5, // r8 samples 0.31/0.28
    "clean_contamination" -> 1.9, // r8 samples 0.75/0.70
    "clean_normalize" -> 1.5, // r8 samples 0.10/0.08
    "clean_pii_redact" -> 1.5, // r8 samples 0.11/0.08
    "clean_repetition" -> 1.5, // r8 samples 0.12/0.09
    "dedup_clusters" -> 18.1, // r8 samples 7.20/3.97
    "dedup_clusters_star" -> 7.0, // r8 samples 2.78/2.12
    "dedup_embed_cos_lsh" -> 4.7, // r8 samples 1.85/1.77
    "dedup_embed_cos_pairs" -> 4.6, // r8 samples 1.76/1.81
    "dedup_exact" -> 1.5, // r8 samples 0.14/0.16
    "dedup_jaccard_incremental" -> 5.0, // r8 samples 1.99/1.85
    "dedup_jaccard_incremental_indexed" -> 4.6, // r8 samples 1.83/1.69
    "dedup_jaccard_index_build" -> 10.5, // r8 samples 4.17/2.58
    "dedup_jaccard_pairs" -> 8.1, // r8 samples 3.21/2.08
    "dedup_minhash_lsh" -> 4.5, // r8 samples 1.77/1.72
    "dedup_semantic" -> 3.1, // r8 samples 1.22/1.09
    "dedup_simhash" -> 1.5, // r8 samples 0.17/0.12
    "dedup_simhash_pairs" -> 4.1, // r8 samples 1.61/1.55
    "dedup_span_clean" -> 1.5, // r8 samples 0.32/0.14
    "dedup_span_incremental" -> 1.5, // r8 samples 0.29/0.27
    "dedup_span_index_append" -> 4.5, // r8 sample 1.60 (one full-bench run; added late in r8)
    "dedup_span_index_compact" -> 1.8, // r8 sample 0.69 (one full-bench run)
    "dedup_span_index_build" -> 4.5, // r8 samples 1.78/1.23
    "dedup_span_stats" -> 1.5, // r8 samples 0.15/0.12
    "embed_hash_tf" -> 4.8, // r8 samples 1.61/1.89
    "embed_knn_docs" -> 2.1, // r8 samples 0.83/0.75
    "embed_label_centroids" -> 1.5, // r8 samples 0.50/0.47
    "embed_project_jl" -> 1.5, // r8 samples 0.12/0.10
    "embed_quantize_int8" -> 1.5, // r8 samples 0.22/0.21
    "embed_tfidf" -> 3.1, // r8 samples 1.21/1.07
    "eval_ann_recall" -> 2.1, // r8 samples 0.80/0.70
    "eval_best_sim" -> 2.6, // r8 samples 1.00/0.99
    "eval_best_sim_summary" -> 2.2, // r8 samples 0.85/0.69
    "eval_dedup_lsh" -> 10.6, // r8 samples 4.05/4.22
    "eval_int8_recall" -> 4.6, // r8 samples 0.63/1.80
    "eval_pq_recall" -> 8.0, // r8 samples 0.90/3.16
    "eval_rank_metrics" -> 4.1, // r8 samples 0.83/1.61
    "eval_rank_summary" -> 1.5, // r8 samples 0.57/0.50
    "eval_recall_summary" -> 1.5, // r8 samples 0.40/0.39
    "events_attribution" -> 1.5, // r8 samples 0.30/0.23
    "events_enriched" -> 1.5, // r8 samples 0.23/0.18
    "events_json_stats" -> 1.5, // r8 samples 0.31/0.18
    "events_session_stats" -> 1.5, // r8 samples 0.06/0.48
    "events_sessionized" -> 1.5, // r8 samples 0.06/0.10
    "hybrid_bm25_rrf" -> 4.0, // r9 sample 1.19 after the leg moved to the producer
    "hybrid_bm25_topk" -> 9.4, // r9 sample 3.75 — now the BM25-leg producer (Caches-shared)
    "hybrid_rrf_stopdrop" -> 4.0, // r8 samples 1.57/1.16
    "hybrid_rrf_topk" -> 3.4, // r8 samples 1.33/1.05
    "io_jsonl_roundtrip" -> 1.5, // r8 samples 0.33/0.27
    "io_npy_shard_roundtrip" -> 1.5, // r8 samples 0.53/0.43
    "ivf_ann_topk" -> 1.7, // r8 samples 0.66/0.57
    "ivf_drift_summary" -> 1.5, // r8 samples 0.45 (one sample)
    "ivf_kmeans_recall" -> 4.5, // r8 samples 1.80/1.55
    "ivf_probe_all_exact" -> 1.5, // r8 samples 0.52/0.52
    "ivf_recall_summary" -> 1.5, // r8 samples 0.44/0.44
    "ivfpq_ann_topk" -> 3.3, // r8 samples 1.24/1.28
    "ivfpq_appended_topk" -> 4.7, // r8 samples 1.87 (one sample)
    "ivfpq_kmeans_recall" -> 16.8, // r8 samples 6.71/6.36
    "ivfpq_stored_topk" -> 1.7, // r8 samples 0.65/0.53
    "join_anti_unshipped_parts" -> 1.5, // r8 samples 0.29/0.32
    "join_asof_purchase_click" -> 1.5, // r8 samples 0.16/0.14
    "join_bloom_pruned" -> 1.8, // r8 samples 0.71/0.55
    "join_bucketed_build" -> 10.4, // r8 samples 2.88/4.14
    "join_bucketed_colocated" -> 1.5, // r8 samples 0.57/0.56
    "join_outer_nation_counts" -> 1.5, // r8 samples 0.36/0.30
    "join_range_followup_orders" -> 1.5, // r8 samples 0.45/0.37
    "join_semi_urgent_customers" -> 1.5, // r8 samples 0.23/0.29
    "join_skew_salted" -> 1.8, // r8 samples 0.69/0.53
    "knn_cosine_topk" -> 1.5, // r8 samples 0.37/0.35
    "knn_dedup_label_topk" -> 1.5, // r8 samples 0.46/0.57
    "knn_filtered_topk" -> 1.5, // r8 samples 0.28/0.24
    "knn_int8_adc" -> 1.5, // r8 samples 0.53/0.34
    "knn_ip_topk" -> 1.5, // r8 samples 0.36/0.28
    "knn_l2_topk" -> 1.5, // r8 samples 0.33/0.36
    "knn_mmr_lambda1" -> 7.2, // r8 samples 2.88/2.57 (k greedy rounds over the bounded pool)
    "knn_mmr_diverse" -> 8.5, // r8 samples 3.39/3.26 (MMR + the pairwise-spread assertion)
    "knn_mrl_topk" -> 1.5, // r8 sample 0.38 (one full-bench run)
    "eval_mrl_recall" -> 1.5, // r8 sample 0.38 (one full-bench run)
    "sample_token_budget" -> 1.7, // r8 sample 0.68 (one full-bench run)
    "knn_radius_cosine" -> 1.5, // r8 samples 0.22/0.17
    "layout_zorder" -> 1.5, // r8 samples 0.59/0.53
    "lsh_ann_appended_topk" -> 2.8, // r8 samples 1.11 (one sample)
    "lsh_ann_stored_topk" -> 1.6, // r8 samples 0.63/0.51
    "lsh_ann_topk" -> 2.0, // r8 samples 0.76/0.58
    "lsh_index_append" -> 1.5, // r8 samples 0.14 (one sample)
    "lsh_index_build" -> 3.8, // r8 samples 0.76/1.48
    "media_audio_features" -> 1.5, // r8 samples 0.21/0.17
    "media_frame_sample" -> 1.5, // r8 samples 0.17/0.17
    "media_image_features" -> 1.5, // r8 samples 0.13/0.11
    "media_meta" -> 1.5, // r8 samples 0.11/0.09
    "media_resize" -> 1.5, // r8 samples 0.09/0.08
    "media_video_meta" -> 1.5, // r8 samples 0.17/0.15
    "merge_delete_docs" -> 1.5, // r8 samples 0.18/0.13
    "merge_scd2_history" -> 1.6, // r8 sample 0.62 (one full-bench run)
    "merge_upsert_docs" -> 1.5, // r8 samples 0.32/0.24
    "pipeline_dsir_select" -> 16.5, // r8 samples 6.57/6.56
    "pipeline_skills_for_jobs" -> 22.0, // bimodal: 5.5-5.6 typical/isolated, 14.7 once under end-of-run heap pressure; 1.5x the pressured sample
    "pipeline_training_data" -> 15.3, // r8 samples 6.10/4.18
    "pq_ann_stored_topk" -> 2.0, // r8 samples 0.80/0.67
    "pq_ann_topk" -> 3.2, // r8 samples 1.19/1.26
    "pq_index_append" -> 1.5, // r8 samples 0.08 (one sample)
    "pq_index_compact" -> 1.5, // r8 sample 0.51 (one full-bench run)
    "lsh_index_compact" -> 1.5, // r8 sample 0.50 (one full-bench run)
    "pq_index_build" -> 3.1, // r8 samples 1.20/1.19
    "pq_kmeans_recall" -> 2.3, // r8 samples 0.90/0.67
    "pq_refine_topk" -> 3.5, // r8 samples 1.39/1.10
    "pq_drift_summary" -> 1.5, // r8 sample 0.27 (one full-bench run)
    "sample_docs_curriculum" -> 1.5, // r8 sample 0.09 (one full-bench run)
    "sample_epoch_plan" -> 1.5, // r8 sample 0.58 (one full-bench run)
    "dedup_keep_best" -> 15.0, // r8 sample 6.0 on a 1.5x-calib run (re-runs propagation behind the cached pair build)
    "clean_quality_floor" -> 1.5, // r8 sample 0.57 (one full-bench run)
    "profile_embedding_dims" -> 1.5, // r8 sample 0.21 (one full-bench run)
    "profile_lineitem_numeric" -> 1.5, // r8 samples 0.19/0.14
    "profile_sketch_gate" -> 1.5, // r8 samples 0.27/0.22
    "rel_cube_flags" -> 1.5, // r8 samples 0.54/0.35
    "rel_events_hourly" -> 1.5, // r8 samples 0.24/0.20
    "rel_nations_both" -> 1.5, // r8 samples 0.50/0.35
    "rel_part_name_edits" -> 1.5, // r8 samples 0.18/0.20
    "rel_pricing_summary" -> 1.5, // r8 samples 0.27/0.24
    "rel_priority_stats" -> 1.5, // r8 samples 0.13/0.11
    "rel_region_revenue" -> 1.5, // r8 samples 0.49/0.37
    "rel_rollup_flags" -> 1.5, // r8 samples 0.33/0.28
    "rel_running_revenue" -> 1.5, // r8 samples 0.11/0.09
    "rel_top20_parts" -> 1.5, // r8 samples 0.14/0.10
    "rel_top_orders_per_cust" -> 1.5, // r8 samples 0.51/0.34
    "rel_urgent_only_customers" -> 1.5, // r8 samples 0.55/0.37
    "report_job_skills_pivot" -> 1.5, // r8 samples 0.59/0.60
    "report_source_quality" -> 1.5, // r8 samples 0.18/0.13
    "sample_docs_hash" -> 1.5, // r8 samples 0.18/0.10
    "sample_docs_shuffle" -> 1.5, // r8 samples 0.10/0.09
    "sample_docs_split" -> 1.5, // r8 samples 0.10/0.07
    "sample_docs_stratified" -> 1.5, // r8 samples 0.26/0.16
    "sample_docs_weighted" -> 1.5, // r8 samples 0.31/0.22
    "sample_mixture_temperature" -> 1.6, // r8 samples 0.63/0.44
    "select_dsir_sample" -> 10.0, // r8 samples 3.84/3.99
    "select_dsir_weights" -> 1.5, // r8 samples 0.23/0.27
    "sql_knn_topk" -> 1.5, // r8 samples 0.58/0.40
    "sql_text_pipeline" -> 1.5, // r8 samples 0.21/0.13
    "text_bigram_logprob" -> 3.8, // r8 samples 1.49/1.16
    "text_chunk_windows" -> 1.5, // r8 samples 0.25/0.17
    "text_fingerprint" -> 1.5, // r8 samples 0.10/0.09
    "text_lang_id" -> 1.5, // r8 samples 0.11/0.09
    "text_pack_shards" -> 1.5, // r8 samples 0.11/0.08
    "text_quality" -> 1.5, // r8 samples 0.14/0.08
    "text_stats" -> 1.5, // r8 samples 0.12/0.08
    "text_top_ngrams" -> 1.9, // r8 samples 0.73/0.55
    "text_unigram_logprob" -> 1.9, // r8 samples 0.73/0.61
    "text_vocab_coverage" -> 1.5, // r8 samples 0.36/0.26
    "vec_scalar_pairs" -> 1.5, // r8 samples 0.20/0.14
    "vec_text_roundtrip" -> 1.5, // r8 samples 0.20/0.08
    // ---- round-9 additions (two r9 full-bench samples each) ----------------
    "clean_gopher_rules" -> 1.5, // r9 samples 0.12/0.15
    "clean_c4_lines" -> 1.5, // r9 samples 0.10/0.10
    "dedup_cdc_chunks" -> 1.5, // r9 samples 0.40/0.43
    "dedup_cdc_stats" -> 1.5, // r9 samples 0.30/0.33
    "events_decayed_value" -> 2.0, // r9 samples 0.80/0.41
    "events_funnel" -> 1.5, // r9 samples 0.54/0.23
    "events_funnel_timing" -> 1.5, // r9 sample 0.16
    "events_retention" -> 3.7, // r9 samples 1.48/0.49
    "hybrid_borda_topk" -> 1.8, // r9 sample 0.70 (legs producer-attributed)
    "io_orc_roundtrip" -> 1.5, // r9 sample 0.25
    "rel_order_deciles" -> 1.5, // r9 sample 0.48
    "rel_unpivot_measures" -> 1.5, // r9 sample 0.36
    "sample_length_buckets" -> 1.5, // r9 samples 0.31/0.27
    "select_nb_confusion" -> 1.5, // r9 samples 0.23/0.22
    "text_keywords_tfidf" -> 5.0, // r9 samples 1.33/2.01
    // earlier-session queries first sampled in the r9 full benches
    "embed_quantize_binary" -> 1.5, // r9 samples 0.10/0.09
    "eval_binary_recall" -> 1.5, // r9 samples 0.38/0.53
    "eval_multiprobe_recall" -> 1.5, // r9 samples 0.43/0.44
    "ivf_probe_curve" -> 1.9, // r9 samples 0.75/0.64
    "knn_hamming_refine" -> 1.5, // r9 samples 0.41/0.38
    "knn_hamming_topk" -> 1.5, // r9 samples 0.31/0.28
    "lsh_multiprobe_topk" -> 2.2, // r9 samples 0.77/0.90
    "mine_hard_negatives" -> 1.5, // r9 samples 0.55/0.47
    "profile_corpus_drift" -> 1.5, // r9 samples 0.43/0.38
    "profile_drift_tokens" -> 1.5, // r9 samples 0.50/0.45
    "select_nb_quality" -> 1.5, // r9 samples 0.19/0.17
    "clean_c4_line_dedup" -> 1.5, // r9 sample 0.27
    "dedup_cdc_incremental" -> 4.9, // r9 sample 1.94 (absorbs the base store build — family producer by alphabetical order)
    "dedup_cdc_index_append" -> 4.4, // r9 sample 1.75 (builds its own append-twin layout)
    "dedup_cdc_index_build" -> 1.5, // r9 sample 0.05 (store already built by the incremental row)
    "embed_pca_project" -> 2.5, // r9 full-bench sample 0.71 after the mapPartitions census rewrite (one run; was 8.4 with the HOF pair expansion); absorbs the one-time census + axis
    "eval_pca_recall" -> 1.5, // r9 sample 0.47
    "profile_embedding_cov" -> 1.5, // r9 sample 0.12
    "rank_knn_degree_hist" -> 20.3, // r9 sample 8.11 (absorbs the one-time edge build for the rank_knn_* family)
    "rank_knn_graph_summary" -> 1.5, // r9 sample 0.41
    "rank_knn_pagerank" -> 6.4, // r9 sample 2.54 (edge build memo-shared)
    "events_session_windows" -> 1.5, // r9 sample 0.57
    "pipeline_crawl_ingest" -> 3.2, // r9 sample 1.25 (store pre-built by the dedup_cdc_* producers)
    "text_zipf_slope" -> 1.5, // r9 sample 0.30
    "embed_whiten_checksum" -> 1.5, // r9 sample 0.35
    "events_anomaly_days" -> 1.5, // r9 sample 0.58
    "rel_basket_pairs" -> 5.1, // r9 sample 2.05
    "rank_knn_triangles" -> 2.8, // r10 full-bench samples 1.09/1.11 (calibration-normalized)
    "text_bpe_merges" -> 2.7, // r10 full-bench samples 1.09/1.0 (calibration-normalized)
    "text_bpe_encode" -> 1.5, // r10 full-bench samples 0.45/0.46 (calibration-normalized)
    "clean_ccnet_buckets" -> 4.1, // r10 full-bench samples 1.31/1.64 (calibration-normalized)
    "clean_domain_cap" -> 1.6, // r10 full-bench samples 0.53/0.66 (calibration-normalized)
    "events_sliding_windows" -> 1.5, // r10 full-bench samples 0.33/0.33 (calibration-normalized)
    "agg_distinct_sketch" -> 1.5, // r10 full-bench samples 0.24/0.38 (calibration-normalized)
    "rel_winsorized_prices" -> 1.5, // r10 full-bench samples 0.18/0.22 (calibration-normalized)
    "events_transition_matrix" -> 1.5, // r10 full-bench samples 0.51/0.51 (calibration-normalized)
    "events_rfm_segments" -> 1.5, // r10 full-bench samples 0.49/0.51 (calibration-normalized)
    "pipeline_tokenizer_train" -> 1.5, // r10 full-bench samples 0.38/0.43 (calibration-normalized)
    "text_cms_heavyhitters" -> 1.8, // r10 full-bench samples 0.6/0.72 (calibration-normalized)
    "agg_quantile_sketch" -> 1.7, // r10 full-bench samples 0.56/0.69 (calibration-normalized)
    "eval_graph_recall" -> 17.9, // r10 full-bench samples 7.16/6.57 (calibration-normalized)
    "knn_graph_topk" -> 1.5, // r10 full-bench samples 0.3/0.32 (calibration-normalized)
    "events_top_paths" -> 2.0, // r10 full-bench samples 0.73/0.78 (calibration-normalized)
    "graph_index_append" -> 15.6, // r10 full-bench samples 5.52/6.24 (calibration-normalized)
    "knn_graph_stored_topk" -> 11.8, // r10 full-bench samples 4.03/4.71 (calibration-normalized)
    "graph_index_compact" -> 1.5, // r10 full-bench samples 0.36/0.48 (calibration-normalized)
    "profile_orders_histogram" -> 1.5, // r10 full-bench samples 0.53/0.59 (calibration-normalized)
    "text_lang_confusion" -> 1.5, // r10 full-bench samples 0.61/0.56 (calibration-normalized)
    "eval_graph_hops_curve" -> 18.9, // r10 full-bench samples 7.15/7.56 (calibration-normalized)
    "sample_split_dedup_aware" -> 1.5, // r10 sample 0.46 (pairs+clusters memo-shared; dedup_clusters absorbs)
    "rel_grouping_sets" -> 1.6, // r10 sample 0.63
    "events_dau_wau" -> 2.4, // r10 sample 0.95
    "eval_split_leakage_naive" -> 1.5, // r10 sample 0.60 (pairs memo-shared)
    "pipeline_eval_set" -> 2.9, // r10 sample 1.16 (shingle/pair/cluster caches shared with the dedup family)
    "text_fertility_by_lang" -> 1.5, // r10 sample 0.35
  )
}
