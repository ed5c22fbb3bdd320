package graft

/** Per-query wall-time budgets: 2.5x the SLOWEST of the two round-14
  * closing full-board sf0.1 bench samples (same code, same box, clean
  * calibration — the 287.8 s / 318.5 s pair at factors 1.058/1.049,
  * zero breaches in both; a 313.8 s run between them was DISCARDED as a
  * sample because its calibration spiked to 2.092 on a transiently
  * loaded box, which would have normalized the samples artificially
  * tight) AND the driver's landed BENCH_r10 per-query record (278.399 s,
  * factor 1.027, zero breaches — the r9 verdict's budget item: the
  * driver box's own shape belongs in the sample base, so driver-sized
  * times can't read as provisional breaches that then need rerun
  * adjudication), all calibration-normalized and floored at 3 s.
  * Round 16 folded the driver's BENCH_r11 record in as a third sample
  * under the same max-ratchet rule (259.849 s over 300 queries at
  * calibration factor exactly 1.000 — the cleanest driver sample yet,
  * zero breaches, empty `isolated_reruns`): every entry cites its
  * `driver r11` time, and the seven entries the r11 sample GOVERNS (its
  * 2.5x exceeded the prior budget — dedup_clusters, dedup_clusters_star,
  * dedup_containment_pairs, dedup_jaccard_incremental, hybrid_rerank_topk,
  * and the two graph-iterative rows rank_knn_kcore / rank_knn_label_prop
  * the r11 verdict flagged as its box-noise watch item) say so inline;
  * nothing was lowered. Where
  * the driver's measured pass was itself driver-adjudicated a load
  * artifact (BENCH_r10 `isolated_reruns`), the isolated-rerun time is
  * the driver sample — budgets stay sized to a clean box. Round 17
  * added the delete-family and r16 filtered-tier entries from its own
  * closing clean pair (327.3 s at factor 1.286 / 302.5 s at 1.041, both
  * breach-free over the full 310-query board) and recorded the
  * graph-iterative adjudication inline on the two watch rows. Every
  * entry cites all samples — the r7 verdict's budget-policy item:
  * single-sample budgets were where both breach rounds came from.
  * Round 13 (builder) folded the driver's BENCH_r12 record under the same
  * max ratchet WITH the r12 verdict's exclusions ("next round" #3 —
  * applied by tools/fold_r12.py, kept for audit): the record's mid-run
  * window carried severe alphabetically-clustered box load (ten rows
  * rerun-dismissed at 2-100x; the run's own drift median read 0.904, so
  * the factor could not see it), therefore (a) the ten driver-dismissed
  * rows fold their ISOLATED-RERUN time, not the loaded measured time;
  * (b) the four producer breaches are excluded outright — unadjudicable
  * under the then-current producer-skip rule, judge-verified cold at
  * r11-or-better times on unchanged code (each row says so inline);
  * (c) any other r12 sample exceeding 2x EVERY prior cited sample is
  * excluded as a load-window artifact (each row says so inline — the
  * r14 discarded-2.092-factor-sample precedent); (d) the first 53
  * alphabetical rows carry no r12 sample (the driver record's stdout
  * tail truncated them). Sixteen rows ratcheted on in-bounds r12
  * samples; nothing was lowered. [[Bench]]
  * multiplies each budget by the run's calibration factor (see
  * [[CalibRef]]) and emits the breach list in its headline JSON, so a
  * broken plan (a lost broadcast, a shuffle gone quadratic) turns up in
  * the round's BENCH file instead of waiting for a human diff against
  * BASELINE.md.
  *
  * Why the 3 s floor (r8 verdict, "next round" #1a — it was 1.5 s through
  * round 13): a query whose samples are 0.2-0.8 s is dominated by
  * scheduler/GC/IO noise at driver scale — a transient stall 3-7x-es a
  * 0.2 s query without any plan change, and three of the four r8 driver
  * breaches were exactly this class (plans audited healthy). Below the
  * floor the budget measures the OS, not the plan; a plan regression on a
  * sub-second query still trips the floor long before it matters at
  * 100 TB, where that query class is nowhere near the critical path.
  *
  * Why 2.5x of FULL-BENCH samples (not isolated runs): position effects
  * are real — a query late in a 232-query pass can pay GC/heap pressure
  * its isolated run never sees — and the budget must cover both
  * positions. Machine SPEED is handled by the calibration factor plus
  * [[Bench]]'s measured-drift fallback (the run's own like-for-like
  * median ratio vs these samples, used when it exceeds the synthetic
  * factor — the r8 driver box ran 1.15-1.3x slower than the samples
  * while the synthetic factor read 1.058), so these numbers stay sized
  * to a clean box instead of the slowest observed one. A query missing
  * here (newly added, not yet measured) is simply unbudgeted for that
  * round.
  *
  * [[sampleSec]] (the slower normalized sample, budget/2.5) is what the
  * drift fallback compares against; entries AT the floor are excluded
  * there because their budget no longer encodes the sample. */
object Budgets {
  /** Wall time of [[Bench]]'s calibration workload (min of two timed runs
    * after one warm-up) on the box that produced the budget samples, in
    * its clean state. The workload has two legs since round 8: the 40M-row
    * hash+shuffle aggregate AND a ~100 MB localCheckpoint write + re-read,
    * so a box with slow block-manager/disk IO raises the factor the way a
    * slow CPU always did (the r7 verdict: the CPU-only factor was blind to
    * exactly the checkpoint-heavy class that breached). Observed
    * 0.72-1.01 across the round-8 runs; pinned to the fast end so mild
    * local noise reads as a small factor (intended headroom) and a
    * genuinely loaded or slower machine raises the envelope via its own
    * calibration. Bench clamps the factor to [1, 3]. */
  val CalibRef: Double = 0.85

  /** The metrology floor (sec): no budget below this, whatever the
    * samples said (scaladoc above). tools/budgets.py applies the same
    * constant when regenerating the table. */
  val Floor: Double = 3.0

  /** The slower calibration-normalized sample behind each UNFLOORED
    * budget (= budget / 2.5) — what [[Bench]]'s measured-drift fallback
    * compares the run's own times against. Floored entries are excluded:
    * their budget no longer encodes the sample, so a ratio against
    * budget/2.5 would understate drift exactly where noise dominates.
    * A budget landing EXACTLY on the floor (raw sample exactly 1.2 s) is
    * conservatively treated as floored — it carries a valid sample, but
    * the value alone can't distinguish it from a raised one, and losing
    * a boundary entry from a ~68-strong median costs nothing. */
  lazy val sampleSec: Map[String, Double] =
    perQuery.collect { case (q, b) if b > Floor => q -> b / 2.5 }

  val perQuery: Map[String, Double] = Map(
  // factors: a=1.058 b=1.049
    "agg_distinct_sketch" -> 3.0, // r14f samples 0.29/0.28 + driver r10 0.23 + driver r11 0.22 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "agg_incremental_merge" -> 3.0, // r14f samples 0.99/1.08 + driver r10 0.87 + driver r11 0.83 (all calibration-normalized) [raw 2.5x budget 2.7, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "agg_price_quantiles" -> 3.0, // r14f samples 0.14/0.14 + driver r10 0.12 + driver r11 0.11 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "agg_quantile_sketch" -> 3.0, // r14f samples 0.71/0.66 + driver r10 0.50 + driver r11 0.46 (all calibration-normalized) [raw 2.5x budget 1.8, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "agg_skew_salted" -> 3.0, // r14f samples 0.19/0.17 + driver r10 0.15 + driver r11 0.14 (all calibration-normalized) [raw 2.5x budget 0.5, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_boilerplate" -> 3.0, // r14f samples 0.35/0.35 + driver r10 0.28 + driver r11 0.26 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_c4_line_dedup" -> 3.0, // r14f samples 0.26/0.28 + driver r10 0.25 + driver r11 0.20 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_c4_lines" -> 3.0, // r14f samples 0.13/0.14 + driver r10 0.11 + driver r11 0.10 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_ccnet_buckets" -> 3.8, // r14f samples 1.44/1.48 + driver r10 1.21 + driver r11 1.09 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "clean_contamination" -> 3.0, // r14f samples 0.90/1.01 + driver r10 0.84 + driver r11 0.79 (all calibration-normalized) [raw 2.5x budget 2.6, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_domain_cap" -> 3.0, // r14f samples 0.54/0.60 + driver r10 0.51 + driver r11 0.48 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_gopher_rules" -> 3.0, // r14f samples 0.10/0.12 + driver r10 0.09 + driver r11 0.10 (all calibration-normalized) [raw 2.5x budget 0.3, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_html_extract" -> 3.0, // r19 (builder) landing samples 0.32/0.48 (narrow codegen'd projection, no shuffle) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]
    "clean_html_main" -> 3.0, // r19 (builder) landing samples 0.18/0.23 (same shape: per-row state-machine walk + block scoring) [raw 2.5x budget 0.6, raised to the 3 s metrology floor]
    "clean_k_anonymity" -> 3.0, // r14f samples 0.38/0.49 + driver r10 0.36 + driver r11 0.33 (all calibration-normalized) [raw 2.5x budget 1.3, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_normalize" -> 3.0, // r14f samples 0.10/0.10 + driver r10 0.09 + driver r11 0.08 (all calibration-normalized) [raw 2.5x budget 0.3, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_pii_redact" -> 3.0, // r14f samples 0.10/0.11 + driver r10 0.09 + driver r11 0.09 (all calibration-normalized) [raw 2.5x budget 0.3, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_quality_floor" -> 3.0, // r14f samples 0.45/0.47 + driver r10 0.43 + driver r11 0.42 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_randomized_response" -> 3.0, // r14f samples 0.29/0.25 + driver r10 0.23 + driver r11 0.19 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "clean_repetition" -> 3.0, // r14f samples 0.12/0.13 + driver r10 0.11 + driver r11 0.10 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_cdc_chunks" -> 3.0, // r14f samples 0.36/0.46 + driver r10 0.37 + driver r11 0.33 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_cdc_deleted" -> 8.3, // r17 final-pair samples 2.53/3.30 (calibration-normalized; the row pays its own dedicated store: build + exact-decrement delete + compact); r12 sample lost to the driver record's stdout truncation
    "dedup_cdc_incremental" -> 5.0, // r14f samples 1.93/1.97 + driver r10 1.78 + driver r11 1.69 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_cdc_index_append" -> 4.9, // r14f samples 1.61/1.92 + driver r10 1.52 + driver r11 1.79 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_cdc_index_build" -> 3.0, // r14f samples 0.05/0.05 + driver r10 0.05 + driver r11 0.05 (all calibration-normalized) [raw 2.5x budget 0.2, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_cdc_index_compact" -> 3.0, // r14f samples 0.57/0.51 + driver r10 0.48 + driver r11 0.54 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_cdc_stats" -> 3.0, // r14f samples 0.28/0.34 + driver r10 0.28 + driver r11 0.34 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_clusters" -> 6.6, // r14f samples 2.21/2.19 + driver r10 2.42 + driver r11 2.64 (all calibration-normalized) — r11 ratchet governs (2.5x 2.64); r12 sample lost to the driver record's stdout truncation
    "dedup_clusters_incremental" -> 15.7, // r18 closing-pair samples 6.25/4.39 (calibration-normalized; the row pays its own label-store DDL: base CC + bucketed write, then the O(affected) merge — the landing raw-sample 20.3 corrected down per its own resample note)
    "dedup_clusters_star" -> 5.1, // r14f samples 1.76/1.75 + driver r10 1.78 + driver r11 2.03 (all calibration-normalized) — r11 ratchet governs (2.5x 2.03); r12 sample lost to the driver record's stdout truncation
    "dedup_containment_pairs" -> 6.3, // r14f samples 2.33/2.31 + driver r10 2.15 + driver r11 2.51 (all calibration-normalized) — r11 ratchet governs (2.5x 2.51); r12 sample lost to the driver record's stdout truncation
    "dedup_edit_pairs" -> 3.0, // r14f samples 0.59/0.58 + driver r10 0.50 + driver r11 0.47 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_embed_cos_lsh" -> 3.8, // r14f samples 1.43/1.51 + driver r10 1.32 + driver r11 1.35 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_embed_cos_pairs" -> 4.7, // r14f samples 1.46/1.86 + driver r10 1.39 + driver r11 1.44 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_exact" -> 3.0, // r14f samples 0.16/0.14 + driver r10 0.13 + driver r11 0.12 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_jaccard_deleted" -> 5.2, // r17 closing pair samples 2.08/1.71 (calibration-normalized; the indexed incremental join + the prefix anti-join + first-touch tombstone stamp); r12 sample lost to the driver record's stdout truncation
    "dedup_jaccard_incremental" -> 4.0, // r14f samples 1.52/1.53 + driver r10 1.51 + driver r11 1.60 (all calibration-normalized) — r11 ratchet governs (2.5x 1.60); r12 sample lost to the driver record's stdout truncation
    "dedup_jaccard_incremental_indexed" -> 4.6, // r14f samples 1.66/1.81 + driver r10 1.66 + driver r11 1.52 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_jaccard_index_build" -> 8.8, // r14f samples 3.17/3.51 + driver r10 2.90 + driver r11 2.92 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_jaccard_pairs" -> 8.2, // r14f samples 2.21/3.24 + driver r10 1.99 + driver r11 2.01 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_keep_best" -> 3.0, // r14f samples 0.46/0.44 + driver r10 0.42 + driver r11 0.39 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_minhash_lsh" -> 3.8, // r14f samples 1.50/1.45 + driver r10 1.37 + driver r11 1.37 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_semantic" -> 3.0, // r14f samples 1.08/1.12 + driver r10 1.05 + driver r11 0.94 (all calibration-normalized) [raw 2.5x budget 2.9, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_simhash" -> 3.0, // r14f samples 0.13/0.15 + driver r10 0.13 + driver r11 0.11 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_simhash_pairs" -> 5.2, // r14f samples 2.06/1.91 + driver r10 2.08 + driver r11 1.69 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_span_clean" -> 3.0, // r14f samples 0.13/0.14 + driver r10 0.14 + driver r11 0.13 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_span_deleted" -> 8.6, // r17 closing pair samples 3.43/3.25 (calibration-normalized; the row pays its own dedicated layout: build + exact-decrement delete + compact); r12 sample lost to the driver record's stdout truncation
    "dedup_span_incremental" -> 3.0, // r14f samples 0.34/0.31 + driver r10 0.34 + driver r11 0.29 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_span_index_append" -> 4.9, // r14f samples 1.96/1.81 + driver r10 1.83 + driver r11 1.83 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_span_index_build" -> 3.9, // r14f samples 1.36/1.56 + driver r10 1.27 + driver r11 1.29 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_span_index_compact" -> 3.0, // r14f samples 0.52/0.59 + driver r10 0.57 + driver r11 0.54 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_span_stats" -> 3.0, // r14f samples 0.12/0.14 + driver r10 0.12 + driver r11 0.13 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; r12 sample lost to the driver record's stdout truncation
    "dedup_winnow_census" -> 3.1, // r14f samples 0.89/1.22 + driver r10 0.89 + driver r11 0.80 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "dedup_winnow_pairs" -> 3.9, // r14f samples 1.40/1.55 + driver r10 1.45 + driver r11 1.34 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "embed_hash_tf" -> 4.4, // r14f samples 1.64/1.74 + driver r10 1.48 + driver r11 1.45 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "embed_kmeans_census" -> 3.6, // r14f samples 1.26/1.41 + driver r10 1.23 + driver r11 1.14 (all calibration-normalized); r12 sample lost to the driver record's stdout truncation
    "embed_knn_docs" -> 3.0, // r14f samples 0.78/0.72 + driver r10 0.70 + driver r11 0.57 (all calibration-normalized) [raw 2.5x budget 2.0, raised to the 3 s metrology floor]; driver r12 1.74 EXCLUDED as a load-window artifact (>2x every prior sample; r12 verdict: the tail's alphabetically-clustered 3-8x load window, ten siblings rerun-dismissed)
    "embed_label_centroids" -> 3.0, // r14f samples 0.41/0.45 + driver r10 0.42 + driver r11 0.37 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; driver r12 1.11 folds below the ratchet
    "embed_pca_project" -> 3.0, // r14f samples 0.89/0.89 + driver r10 0.78 + driver r11 0.75 (all calibration-normalized) [raw 2.5x budget 2.3, raised to the 3 s metrology floor]; driver r12 2.18 EXCLUDED as a load-window artifact (>2x every prior sample; r12 verdict: the tail's alphabetically-clustered 3-8x load window, ten siblings rerun-dismissed)
    "embed_project_jl" -> 3.0, // r14f samples 0.12/0.12 + driver r10 0.11 + driver r11 0.10 (all calibration-normalized) [raw 2.5x budget 0.3, raised to the 3 s metrology floor]; driver r12 0.32 folds below the ratchet
    "embed_quantize_binary" -> 3.0, // r14f samples 0.09/0.11 + driver r10 0.09 + driver r11 0.09 (all calibration-normalized) [raw 2.5x budget 0.3, raised to the 3 s metrology floor]; driver r12 0.32 folds below the ratchet
    "embed_quantize_int8" -> 3.0, // r14f samples 0.17/0.16 + driver r10 0.18 + driver r11 0.13 (all calibration-normalized) [raw 2.5x budget 0.5, raised to the 3 s metrology floor]; driver r12 0.48 folds below the ratchet
    "embed_tfidf" -> 3.9, // r14f samples 1.15/1.55 + driver r10 1.06 + driver r11 1.11 (all calibration-normalized); driver r12 iso 0.95 (measured 5.21 rerun-dismissed as a load artifact) folds below the ratchet
    "embed_whiten_checksum" -> 3.0, // r14f samples 0.35/0.40 + driver r10 0.34 + driver r11 0.33 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 1.15 folds below the ratchet
    "eval_ann_recall" -> 3.0, // r14f samples 0.31/0.35 + driver r10 0.29 + driver r11 0.26 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; driver r12 0.46 folds below the ratchet
    "eval_best_sim" -> 3.0, // r14f samples 0.74/0.92 + driver r10 0.73 + driver r11 0.67 (all calibration-normalized) [raw 2.5x budget 2.4, raised to the 3 s metrology floor]; driver r12 iso 0.36 (measured 5.55 rerun-dismissed as a load artifact) folds below the ratchet
    "eval_best_sim_summary" -> 3.0, // r14f samples 0.29/0.34 + driver r10 0.27 + driver r11 0.28 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; driver r12 1.43 EXCLUDED as a load-window artifact (>2x every prior sample; r12 verdict: the tail's alphabetically-clustered 3-8x load window, ten siblings rerun-dismissed)
    "eval_binary_recall" -> 3.0, // r14f samples 0.24/0.25 + driver r10 0.26 + driver r11 0.23 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 1.60 EXCLUDED as a load-window artifact (>2x every prior sample; r12 verdict: the tail's alphabetically-clustered 3-8x load window, ten siblings rerun-dismissed)
    "eval_dedup_lsh" -> 5.8, // r14f samples 1.79/1.59 + driver r10 1.67 + driver r11 1.53 (all calibration-normalized) + driver r12 iso 2.29 (measured 7.33 rerun-dismissed as a load artifact) — r12 iso ratchet governs (2.5x 2.29)
    "eval_dedup_simhash" -> 3.0, // r14f samples 0.78/0.78 + driver r10 0.60 + driver r11 0.58 (all calibration-normalized) [raw 2.5x budget 2.0, raised to the 3 s metrology floor]; driver r12 2.62 EXCLUDED as a load-window artifact (>2x every prior sample; r12 verdict: the tail's alphabetically-clustered 3-8x load window, ten siblings rerun-dismissed)
    "eval_deleted_ivf_recall" -> 3.0, // r17 closing clean-pair samples 1.03/0.91 (calibration-normalized; the exact side re-ranks the live corpus) [raw 2.5x budget 2.6, raised to the 3 s metrology floor]; driver r12 iso 0.66 (measured 4.13 rerun-dismissed as a load artifact) folds below the ratchet
    "eval_deleted_lsh_recall" -> 3.0, // r17 final-pair samples 0.53/0.58 (calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; driver r12 iso 0.49 (measured 3.45 rerun-dismissed as a load artifact) folds below the ratchet
    "eval_deleted_pq_recall" -> 3.0, // r17 final-pair samples 0.53/0.59 (calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; driver r12 iso 0.45 (measured 4.42 rerun-dismissed as a load artifact) folds below the ratchet
    "eval_filtered_ivf_recall" -> 3.0, // r15 closing clean-pair samples 0.63/0.88 + driver r11 0.66 (all calibration-normalized) [raw 2.5x budget 2.2, raised to the 3 s metrology floor]; driver r12 2.59 EXCLUDED as a load-window artifact (>2x every prior sample; r12 verdict: the tail's alphabetically-clustered 3-8x load window, ten siblings rerun-dismissed)
    "eval_filtered_lsh_recall" -> 3.0, // r17 closing clean-pair samples 0.41/0.42 (calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 2.53 EXCLUDED as a load-window artifact (>2x every prior sample; r12 verdict: the tail's alphabetically-clustered 3-8x load window, ten siblings rerun-dismissed)
    "eval_filtered_pq_recall" -> 3.0, // r17 closing clean-pair samples 0.42/0.42 (calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 2.63 EXCLUDED as a load-window artifact (>2x every prior sample; r12 verdict: the tail's alphabetically-clustered 3-8x load window, ten siblings rerun-dismissed)
    "eval_graph_hier_recall" -> 25.6, // r14f samples 9.33/10.24 + driver r10 8.28 + driver r11 8.84 (all calibration-normalized); driver r12 measured 50.51 rerun-dismissed (iso 0.41 was WARM-memo — see the r13 cold-rerun fix), prior samples stand
    "eval_graph_hops_curve" -> 3.0, // r14f samples 0.43/0.50 + driver r10 0.44 + driver r11 0.47 (all calibration-normalized) [raw 2.5x budget 1.3, raised to the 3 s metrology floor]; driver r12 iso 0.44 (measured 4.00 rerun-dismissed as a load artifact) folds below the ratchet
    "eval_graph_recall" -> 19.7, // r14f samples 7.85/7.45 + driver r10 6.81 + driver r11 7.03 (all calibration-normalized); driver r12 6.73 folds below the ratchet
    "eval_graph_stored_recall" -> 13.1, // r14f samples 5.21/5.08 + driver r10 4.39 + driver r11 4.63 (all calibration-normalized); driver r12 iso 4.98 (measured 15.08 rerun-dismissed as a load artifact) folds below the ratchet
    "eval_int8_recall" -> 3.0, // r14f samples 0.82/0.84 + driver r10 0.64 + driver r11 0.75 (all calibration-normalized) [raw 2.5x budget 2.1, raised to the 3 s metrology floor]; driver r12 0.75 folds below the ratchet
    "eval_mrl_recall" -> 3.0, // r14f samples 0.25/0.27 + driver r10 0.22 + driver r11 0.26 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.22 folds below the ratchet
    "eval_multiprobe_recall" -> 3.0, // r14f samples 0.36/0.34 + driver r10 0.29 + driver r11 0.33 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; driver r12 0.29 folds below the ratchet
    "eval_pca_recall" -> 3.0, // r14f samples 0.37/0.33 + driver r10 0.27 + driver r11 0.31 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.27 folds below the ratchet
    "eval_pq_recall" -> 3.0, // r14f samples 0.61/0.67 + driver r10 0.52 + driver r11 0.58 (all calibration-normalized) [raw 2.5x budget 1.7, raised to the 3 s metrology floor]; driver r12 0.54 folds below the ratchet
    "eval_rank_metrics" -> 3.0, // r14f samples 0.38/0.36 + driver r10 0.30 + driver r11 0.32 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.34 folds below the ratchet
    "eval_rank_summary" -> 3.0, // r14f samples 0.27/0.25 + driver r10 0.22 + driver r11 0.24 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.25 folds below the ratchet
    "eval_rank_tau" -> 3.5, // r14f samples 1.14/1.27 + driver r10 1.05 + driver r11 1.10 (all calibration-normalized) + driver r12 1.39 — r12 ratchet governs (2.5x 1.39)
    "eval_recall_bootstrap" -> 3.0, // r14f samples 0.78/0.97 + driver r10 0.70 + driver r11 0.85 (all calibration-normalized) [raw 2.5x budget 2.5, raised to the 3 s metrology floor]; driver r12 0.89 folds below the ratchet
    "eval_recall_summary" -> 3.0, // r14f samples 0.25/0.22 + driver r10 0.21 + driver r11 0.18 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.23 folds below the ratchet
    "eval_sign_test" -> 3.0, // r14f samples 0.49/0.56 + driver r10 0.46 + driver r11 0.39 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; driver r12 0.47 folds below the ratchet
    "eval_split_leakage_naive" -> 3.0, // r14f samples 0.34/0.42 + driver r10 0.31 + driver r11 0.31 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.47 folds below the ratchet
    "events_anomaly_days" -> 3.0, // r14f samples 0.54/0.67 + driver r10 0.52 + driver r11 0.50 (all calibration-normalized) [raw 2.5x budget 1.7, raised to the 3 s metrology floor]; driver r12 0.82 folds below the ratchet
    "events_attribution" -> 3.0, // r14f samples 0.27/0.33 + driver r10 0.27 + driver r11 0.25 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; driver r12 0.36 folds below the ratchet
    "events_concentration" -> 3.0, // r14f samples 0.24/0.27 + driver r10 0.23 + driver r11 0.21 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.29 folds below the ratchet
    "events_cusum_shift" -> 3.0, // r14f samples 0.46/0.43 + driver r10 0.41 + driver r11 0.43 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; driver r12 0.56 folds below the ratchet
    "events_dau_wau" -> 3.0, // r14f samples 1.07/1.05 + driver r10 1.06 + driver r11 0.77 (all calibration-normalized) [raw 2.5x budget 2.7, raised to the 3 s metrology floor]; driver r12 iso 0.83 (measured 3.97 rerun-dismissed as a load artifact) folds below the ratchet
    "events_debounce" -> 3.0, // r14f samples 0.23/0.21 + driver r10 0.19 + driver r11 0.21 (all calibration-normalized) [raw 2.5x budget 0.6, raised to the 3 s metrology floor]; driver r12 0.24 folds below the ratchet
    "events_decayed_value" -> 3.0, // r14f samples 0.50/0.56 + driver r10 0.47 + driver r11 0.45 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; driver r12 0.56 folds below the ratchet
    "events_enriched" -> 3.0, // r14f samples 0.24/0.23 + driver r10 0.20 + driver r11 0.20 (all calibration-normalized) [raw 2.5x budget 0.6, raised to the 3 s metrology floor]; driver r12 0.24 folds below the ratchet
    "events_funnel" -> 3.0, // r14f samples 0.26/0.24 + driver r10 0.23 + driver r11 0.21 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.26 folds below the ratchet
    "events_funnel_timing" -> 3.0, // r14f samples 0.18/0.16 + driver r10 0.16 + driver r11 0.16 (all calibration-normalized) [raw 2.5x budget 0.5, raised to the 3 s metrology floor]; driver r12 0.19 folds below the ratchet
    "events_gapfill" -> 3.0, // r14f samples 0.31/0.31 + driver r10 0.27 + driver r11 0.27 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.32 folds below the ratchet
    "events_holt_trend" -> 3.0, // r14f samples 0.33/0.39 + driver r10 0.32 + driver r11 0.30 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.39 folds below the ratchet
    "events_json_stats" -> 3.0, // r14f samples 0.14/0.12 + driver r10 0.12 + driver r11 0.12 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.15 folds below the ratchet
    "events_multitouch_credit" -> 3.0, // r14f samples 0.38/0.34 + driver r10 0.33 + driver r11 0.34 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.42 folds below the ratchet
    "events_retention" -> 3.0, // r14f samples 0.51/0.49 + driver r10 0.45 + driver r11 0.46 (all calibration-normalized) [raw 2.5x budget 1.3, raised to the 3 s metrology floor]; driver r12 0.56 folds below the ratchet
    "events_rfm_segments" -> 3.0, // r14f samples 0.50/0.55 + driver r10 0.44 + driver r11 0.48 (all calibration-normalized) [raw 2.5x budget 1.4, raised to the 3 s metrology floor]; driver r12 0.43 folds below the ratchet
    "events_rolling_stats" -> 3.0, // r14f samples 0.22/0.22 + driver r10 0.21 + driver r11 0.20 (all calibration-normalized) [raw 2.5x budget 0.6, raised to the 3 s metrology floor]; driver r12 0.22 folds below the ratchet
    "events_session_dynamic" -> 3.0, // r14f samples 0.70/0.63 + driver r10 0.58 + driver r11 0.62 (all calibration-normalized) [raw 2.5x budget 1.8, raised to the 3 s metrology floor]; driver r12 0.53 folds below the ratchet
    "events_session_overlap" -> 5.3, // r14f samples 2.10/1.98 + driver r10 1.91 + driver r11 2.00 (all calibration-normalized); driver r12 1.79 folds below the ratchet
    "events_session_stats" -> 3.0, // r14f samples 0.55/0.67 + driver r10 0.55 + driver r11 0.54 (all calibration-normalized) [raw 2.5x budget 1.7, raised to the 3 s metrology floor]; driver r12 0.49 folds below the ratchet
    "events_session_windows" -> 3.0, // r14f samples 0.36/0.38 + driver r10 0.40 + driver r11 0.41 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.33 folds below the ratchet
    "events_sessionized" -> 3.0, // r14f samples 0.15/0.16 + driver r10 0.12 + driver r11 0.15 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.12 folds below the ratchet
    "events_sliding_windows" -> 3.0, // r14f samples 0.36/0.37 + driver r10 0.29 + driver r11 0.32 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.25 folds below the ratchet
    "events_top_paths" -> 3.0, // r14f samples 0.77/0.71 + driver r10 0.75 + driver r11 0.69 (all calibration-normalized) [raw 2.5x budget 2.0, raised to the 3 s metrology floor]; driver r12 0.63 folds below the ratchet
    "events_transition_matrix" -> 3.0, // r14f samples 0.52/0.49 + driver r10 0.46 + driver r11 0.48 (all calibration-normalized) [raw 2.5x budget 1.3, raised to the 3 s metrology floor]; driver r12 0.43 folds below the ratchet
    "graph_index_append" -> 22.0, // r14f samples 8.80/7.89 + driver r10 7.38 + driver r11 7.33 (all calibration-normalized); driver r12 6.80 folds below the ratchet
    "graph_index_build_ann" -> 3.0, // r14f samples 0.09/0.10 + driver r10 0.09 + driver r11 0.09 (all calibration-normalized) [raw 2.5x budget 0.3, raised to the 3 s metrology floor]; driver r12 0.08 folds below the ratchet
    "graph_index_compact" -> 3.0, // r14f samples 0.47/0.42 + driver r10 0.42 + driver r11 0.43 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; driver r12 0.43 folds below the ratchet
    "graph_walk_build" -> 12.5, // r15 closing clean-pair samples 4.97/4.22 + driver r11 4.18 (all calibration-normalized; the stored-walk producer both stored-search twins read); driver r12 3.89 folds below the ratchet
    "hybrid_bm25_prf" -> 11.6, // r14f samples 4.62/4.41 + driver r10 4.03 + driver r11 4.40 (all calibration-normalized); driver r12 4.08 folds below the ratchet
    "hybrid_bm25_rrf" -> 3.8, // r14f samples 1.25/1.29 + driver r10 1.10 + driver r11 1.18 (all calibration-normalized) + driver r12 1.48 — r12 ratchet governs (2.5x 1.48)
    "hybrid_bm25_topk" -> 9.0, // r14f samples 2.79/3.59 + driver r10 2.81 + driver r11 2.60 (all calibration-normalized); driver r12 measured 22.19 EXCLUDED — unadjudicable load artifact on unchanged code (r12 verdict #1: the producer-skip rule could not rerun it; the verdict's own fresh-JVM cold re-measure ran 4.39 s, inside budget), prior samples stand
    "hybrid_borda_topk" -> 3.0, // r14f samples 0.88/0.81 + driver r10 0.73 + driver r11 0.81 (all calibration-normalized) [raw 2.5x budget 2.2, raised to the 3 s metrology floor]; driver r12 0.84 folds below the ratchet
    "hybrid_maxsim_rerank" -> 7.1, // r15 closing-pair samples 1.87/2.16 + driver r11 2.00 (all calibration-normalized; re-ranks the warm BM25 leg) + driver r12 2.81 — r12 ratchet governs (2.5x 2.81)
    "hybrid_rerank_topk" -> 8.0, // r14f samples 2.11/1.99 + driver r10 1.67 + driver r11 2.19 (all calibration-normalized) — r11 ratchet governs (2.5x 2.19) + driver r12 3.17 — r12 ratchet governs (2.5x 3.17)
    "hybrid_rrf_stopdrop" -> 5.2, // r14f samples 1.73/2.04 + driver r10 1.61 + driver r11 1.50 (all calibration-normalized); driver r12 1.37 folds below the ratchet
    "hybrid_rrf_topk" -> 4.3, // r14f samples 1.65/1.71 + driver r10 1.34 + driver r11 1.31 (all calibration-normalized); driver r12 1.19 folds below the ratchet
    "io_csv_quoted_roundtrip" -> 3.0, // r14f samples 0.33/0.34 + driver r10 0.30 + driver r11 0.30 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; driver r12 0.27 folds below the ratchet
    "io_jsonl_roundtrip" -> 3.0, // r14f samples 0.27/0.28 + driver r10 0.25 + driver r11 0.30 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.25 folds below the ratchet
    "io_npy_shard_roundtrip" -> 3.0, // r14f samples 0.47/0.55 + driver r10 0.48 + driver r11 0.52 (all calibration-normalized) [raw 2.5x budget 1.4, raised to the 3 s metrology floor]; driver r12 0.47 folds below the ratchet
    "io_orc_roundtrip" -> 3.0, // r14f samples 0.28/0.29 + driver r10 0.27 + driver r11 0.26 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.24 folds below the ratchet
    "io_partitioned_roundtrip" -> 3.0, // r14f samples 0.35/0.39 + driver r10 0.34 + driver r11 0.33 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.33 folds below the ratchet
    "io_schema_evolution" -> 3.0, // r14f samples 0.41/0.43 + driver r10 0.38 + driver r11 0.38 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.40 folds below the ratchet
    "io_tar_shards" -> 3.0, // r18 closing-pair samples 0.42/0.39 (calibration-normalized; tar-shard write + binaryFile read-back of the documents table) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]
    "io_time_travel" -> 3.0, // r14f samples 0.58/0.52 + driver r10 0.48 + driver r11 0.48 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; driver r12 0.53 folds below the ratchet
    "io_vacuum_retention" -> 3.0, // r14f samples 0.34/0.36 + driver r10 0.28 + driver r11 0.30 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; driver r12 0.31 folds below the ratchet
    "io_warc_crawl" -> 3.0, // r19 (builder) landing samples 0.68/0.58 (one text-source scan + codegen'd parse/extract + census; pays its own WARC export at first touch) [raw 2.5x budget 1.7, raised to the 3 s metrology floor]
    "io_wet_roundtrip" -> 3.0, // r14f samples 0.30/0.28 + driver r10 0.27 + driver r11 0.25 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.24 folds below the ratchet
    "ivf_ann_topk" -> 3.0, // r14f samples 0.79/0.79 + driver r10 0.59 + driver r11 0.66 (all calibration-normalized) [raw 2.5x budget 2.0, raised to the 3 s metrology floor]; driver r12 0.64 folds below the ratchet
    "ivf_auto_probe" -> 4.9, // r14f samples 1.93/1.88 + driver r10 1.68 + driver r11 1.81 (all calibration-normalized); driver r12 1.80 folds below the ratchet
    "ivf_balance" -> 3.0, // r14f samples 0.26/0.23 + driver r10 0.17 + driver r11 0.17 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.17 folds below the ratchet
    "ivf_drift_summary" -> 3.0, // r14f samples 0.47/0.41 + driver r10 0.39 + driver r11 0.38 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; driver r12 0.39 folds below the ratchet
    "ivf_index_build" -> 3.0, // r15 closing clean-pair samples 0.75/0.53 + driver r11 0.60 (all calibration-normalized; stored plain-IVF layout write, a producer) [raw 2.5x budget 1.9, raised to the 3 s metrology floor]; driver r12 0.55 folds below the ratchet
    "ivf_kmeans_recall" -> 4.4, // r14f samples 1.74/1.51 + driver r10 1.43 + driver r11 1.21 (all calibration-normalized); driver r12 1.36 folds below the ratchet
    "ivf_probe_all_exact" -> 3.0, // r14f samples 0.73/0.76 + driver r10 0.41 + driver r11 0.52 (all calibration-normalized) [raw 2.5x budget 1.9, raised to the 3 s metrology floor]; driver r12 0.46 folds below the ratchet
    "ivf_probe_curve" -> 3.0, // r14f samples 0.10/0.10 + driver r10 0.09 + driver r11 0.13 (all calibration-normalized) [raw 2.5x budget 0.3, raised to the 3 s metrology floor]; driver r12 0.10 folds below the ratchet
    "ivf_recall_summary" -> 3.0, // r14f samples 0.27/0.30 + driver r10 0.25 + driver r11 0.32 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.26 folds below the ratchet
    "ivfpq_ann_topk" -> 5.8, // r14f samples 1.51/2.29 + driver r10 1.44 + driver r11 1.48 (all calibration-normalized); driver r12 1.15 folds below the ratchet
    "ivfpq_appended_topk" -> 6.0, // r14f samples 2.38/2.18 + driver r10 2.01 + driver r11 1.89 (all calibration-normalized); driver r12 2.11 folds below the ratchet
    "ivfpq_kmeans_recall" -> 17.4, // r14f samples 6.94/6.83 + driver r10 0.50 + driver r11 0.50 (all calibration-normalized); driver r12 0.78 folds below the ratchet
    "ivfpq_stored_topk" -> 3.0, // r14f samples 0.71/0.59 + driver r10 0.44 + driver r11 0.45 (all calibration-normalized) [raw 2.5x budget 1.8, raised to the 3 s metrology floor]; driver r12 0.59 folds below the ratchet
    "join_anti_unshipped_parts" -> 3.0, // r14f samples 0.27/0.26 + driver r10 0.24 + driver r11 0.24 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.35 folds below the ratchet
    "join_asof_purchase_click" -> 3.0, // r14f samples 0.16/0.14 + driver r10 0.15 + driver r11 0.15 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.23 folds below the ratchet
    "join_bloom_pruned" -> 3.0, // r14f samples 0.63/0.58 + driver r10 0.55 + driver r11 0.56 (all calibration-normalized) [raw 2.5x budget 1.6, raised to the 3 s metrology floor]; driver r12 1.36 EXCLUDED as a load-window artifact (>2x every prior sample; r12 verdict: the tail's alphabetically-clustered 3-8x load window, ten siblings rerun-dismissed)
    "join_bucketed_build" -> 6.5, // r14f samples 2.53/2.59 + driver r10 2.01 + driver r11 1.97 (all calibration-normalized); driver r12 1.87 folds below the ratchet
    "join_bucketed_colocated" -> 3.0, // r14f samples 0.50/0.53 + driver r10 0.50 + driver r11 0.50 (all calibration-normalized) [raw 2.5x budget 1.4, raised to the 3 s metrology floor]; driver r12 0.50 folds below the ratchet
    "join_dpp_pruned" -> 3.0, // r14f samples 0.41/0.41 + driver r10 0.37 + driver r11 0.36 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.42 folds below the ratchet
    "join_outer_nation_counts" -> 3.0, // r14f samples 0.38/0.32 + driver r10 0.33 + driver r11 0.30 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.29 folds below the ratchet
    "join_range_followup_orders" -> 3.0, // r14f samples 0.41/0.43 + driver r10 0.39 + driver r11 0.39 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.38 folds below the ratchet
    "join_semi_urgent_customers" -> 3.0, // r14f samples 0.22/0.25 + driver r10 0.21 + driver r11 0.21 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.22 folds below the ratchet
    "join_skew_salted" -> 3.0, // r14f samples 0.54/0.65 + driver r10 0.56 + driver r11 0.54 (all calibration-normalized) [raw 2.5x budget 1.7, raised to the 3 s metrology floor]; driver r12 0.49 folds below the ratchet
    "knn_cosine_topk" -> 3.0, // r14f samples 0.43/0.40 + driver r10 0.48 + driver r11 0.41 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; driver r12 0.44 folds below the ratchet
    "knn_dedup_label_topk" -> 3.0, // r14f samples 0.64/0.48 + driver r10 0.53 + driver r11 0.46 (all calibration-normalized) [raw 2.5x budget 1.6, raised to the 3 s metrology floor]; driver r12 0.62 folds below the ratchet
    "knn_deleted_ivf" -> 3.0, // r17 closing clean-pair samples 0.56/0.72 (calibration-normalized) [raw 2.5x budget 1.8, raised to the 3 s metrology floor]; driver r12 0.67 folds below the ratchet
    "knn_deleted_ivfpq" -> 3.0, // r17 closing clean-pair samples 0.68/1.00 (calibration-normalized) [raw 2.5x budget 2.5, raised to the 3 s metrology floor]; driver r12 0.61 folds below the ratchet
    "knn_deleted_lsh" -> 3.0, // r17 closing clean-pair samples 0.74/0.78 (calibration-normalized) [raw 2.5x budget 1.9, raised to the 3 s metrology floor]; driver r12 0.58 folds below the ratchet
    "knn_filtered_ivf" -> 3.0, // r15 closing clean-pair samples 0.66/0.63 + driver r11 0.63 (all calibration-normalized) [raw 2.5x budget 1.7, raised to the 3 s metrology floor]; driver r12 0.52 folds below the ratchet
    "knn_filtered_ivfpq" -> 3.0, // r17 closing clean-pair samples 0.40/0.63 (calibration-normalized) [raw 2.5x budget 1.6, raised to the 3 s metrology floor]; driver r12 0.49 folds below the ratchet
    "knn_filtered_lsh" -> 3.0, // r17 closing clean-pair samples 0.37/0.73 (calibration-normalized) [raw 2.5x budget 1.8, raised to the 3 s metrology floor]; driver r12 0.46 folds below the ratchet
    "knn_filtered_topk" -> 3.0, // r14f samples 0.33/0.33 + driver r10 0.35 + driver r11 0.28 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; driver r12 0.37 folds below the ratchet
    "knn_graph_deleted_topk" -> 3.0, // r17 closing clean-pair samples 0.56/0.66 (calibration-normalized; ranking only — the walk is paid by graph_walk_build) [raw 2.5x budget 1.7, raised to the 3 s metrology floor]; driver r12 0.55 folds below the ratchet
    "knn_graph_filtered_topk" -> 3.0, // r15 closing clean-pair samples 0.33/0.38 + driver r11 0.29 (all calibration-normalized; ranking only — the walk is paid by graph_walk_build) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.38 folds below the ratchet
    "knn_graph_hier_topk" -> 3.0, // r14f samples 0.36/0.39 + driver r10 0.39 + driver r11 0.29 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.34 folds below the ratchet
    "knn_graph_stored_topk" -> 3.0, // r15 closing clean-pair samples 0.28/0.29 + driver r11 0.24 (all calibration-normalized; ranking only — the walk is paid by graph_walk_build) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.26 folds below the ratchet
    "knn_graph_topk" -> 3.0, // r14f samples 0.50/0.61 + driver r10 0.44 + driver r11 0.40 (all calibration-normalized) [raw 2.5x budget 1.6, raised to the 3 s metrology floor]; driver r12 0.44 folds below the ratchet
    "knn_hamming_refine" -> 3.0, // r14f samples 0.59/0.56 + driver r10 0.58 + driver r11 0.40 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; driver r12 0.40 folds below the ratchet
    "knn_hamming_topk" -> 3.0, // r14f samples 0.32/0.37 + driver r10 0.34 + driver r11 0.27 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.28 folds below the ratchet
    "knn_int8_adc" -> 3.0, // r14f samples 0.39/0.46 + driver r10 0.40 + driver r11 0.34 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; driver r12 0.36 folds below the ratchet
    "knn_ip_topk" -> 3.0, // r14f samples 0.41/0.43 + driver r10 0.38 + driver r11 0.34 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.37 folds below the ratchet
    "knn_l2_topk" -> 3.0, // r14f samples 0.37/0.40 + driver r10 0.34 + driver r11 0.29 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.36 folds below the ratchet
    "knn_mmr_diverse" -> 9.5, // r14f samples 3.31/3.77 + driver r10 2.80 + driver r11 2.68 (all calibration-normalized); driver r12 3.12 folds below the ratchet
    "knn_mmr_lambda1" -> 7.2, // r14f samples 2.60/2.87 + driver r10 2.37 + driver r11 1.98 (all calibration-normalized); driver r12 2.42 folds below the ratchet
    "knn_mrl_topk" -> 3.0, // r14f samples 0.45/0.50 + driver r10 0.47 + driver r11 0.36 (all calibration-normalized) [raw 2.5x budget 1.3, raised to the 3 s metrology floor]; driver r12 0.42 folds below the ratchet
    "knn_radius_cosine" -> 3.0, // r14f samples 0.31/0.27 + driver r10 0.30 + driver r11 0.22 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.22 folds below the ratchet
    "layout_compaction_plan" -> 3.0, // r14f samples 0.14/0.15 + driver r10 0.13 + driver r11 0.12 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.13 folds below the ratchet
    "layout_zonemap_prune" -> 6.3, // r14f samples 2.28/2.41 + driver r10 2.50 + driver r11 2.17 (all calibration-normalized); driver r12 1.99 folds below the ratchet
    "layout_zorder" -> 3.0, // r14f samples 0.73/0.89 + driver r10 0.91 + driver r11 0.76 (all calibration-normalized) [raw 2.5x budget 2.3, raised to the 3 s metrology floor]; driver r12 0.68 folds below the ratchet
    "lsh_ann_appended_topk" -> 4.3, // r14f samples 1.40/1.71 + driver r10 1.49 + driver r11 1.32 (all calibration-normalized); driver r12 1.34 folds below the ratchet
    "lsh_ann_stored_topk" -> 3.0, // r14f samples 0.49/0.65 + driver r10 0.56 + driver r11 0.49 (all calibration-normalized) [raw 2.5x budget 1.7, raised to the 3 s metrology floor]; driver r12 0.51 folds below the ratchet
    "lsh_ann_topk" -> 3.0, // r14f samples 0.75/0.92 + driver r10 0.71 + driver r11 0.70 (all calibration-normalized) [raw 2.5x budget 2.4, raised to the 3 s metrology floor]; driver r12 0.66 folds below the ratchet
    "lsh_index_append" -> 3.0, // r14f samples 0.15/0.16 + driver r10 0.15 + driver r11 0.14 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.15 folds below the ratchet
    "lsh_index_build" -> 3.0, // r14f samples 0.77/0.72 + driver r10 0.63 + driver r11 0.60 (all calibration-normalized) [raw 2.5x budget 2.0, raised to the 3 s metrology floor]; driver r12 0.57 folds below the ratchet
    "lsh_index_compact" -> 3.0, // r14f samples 0.34/0.43 + driver r10 0.39 + driver r11 0.34 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.40 folds below the ratchet
    "lsh_multiprobe_topk" -> 3.5, // r14f samples 0.54/1.39 + driver r10 0.71 + driver r11 0.62 (all calibration-normalized); driver r12 0.54 folds below the ratchet
    "media_audio_features" -> 3.0, // r14f samples 0.19/0.21 + driver r10 0.17 + driver r11 0.18 (all calibration-normalized) [raw 2.5x budget 0.6, raised to the 3 s metrology floor]; driver r12 0.18 folds below the ratchet
    "media_frame_sample" -> 3.0, // r14f samples 0.16/0.16 + driver r10 0.14 + driver r11 0.13 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.14 folds below the ratchet
    "media_image_features" -> 3.0, // r14f samples 0.15/0.15 + driver r10 0.13 + driver r11 0.13 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.12 folds below the ratchet
    "media_meta" -> 3.0, // r14f samples 0.11/0.13 + driver r10 0.11 + driver r11 0.10 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.10 folds below the ratchet
    "media_phash_dedup" -> 3.0, // r14f samples 0.29/0.27 + driver r10 0.25 + driver r11 0.25 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.28 folds below the ratchet
    "media_resize" -> 3.0, // r14f samples 0.09/0.75 + driver r10 0.09 + driver r11 0.09 (all calibration-normalized) [raw 2.5x budget 1.9, raised to the 3 s metrology floor]; driver r12 0.09 folds below the ratchet
    "media_video_meta" -> 3.0, // r14f samples 0.20/0.26 + driver r10 0.20 + driver r11 0.22 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.22 folds below the ratchet
    "merge_delete_docs" -> 3.0, // r14f samples 0.16/0.16 + driver r10 0.15 + driver r11 0.15 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.16 folds below the ratchet
    "merge_scd2_history" -> 3.0, // r14f samples 0.70/0.88 + driver r10 0.70 + driver r11 0.72 (all calibration-normalized) [raw 2.5x budget 2.2, raised to the 3 s metrology floor]; driver r12 0.75 folds below the ratchet
    "merge_upsert_docs" -> 3.0, // r14f samples 0.29/0.29 + driver r10 0.27 + driver r11 0.23 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.25 folds below the ratchet
    "mine_hard_negatives" -> 3.0, // r14f samples 0.59/0.58 + driver r10 0.51 + driver r11 0.49 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; driver r12 0.46 folds below the ratchet
    "pca_axis_drift" -> 4.6, // r14f samples 0.87/0.94 + driver r10 0.78 + driver r11 0.89 (all calibration-normalized) + driver r12 1.83 — r12 ratchet governs (2.5x 1.83)
    "pipeline_crawl_ingest" -> 3.3, // r14f samples 1.16/1.26 + driver r10 1.28 + driver r11 0.99 (all calibration-normalized); driver r12 1.20 folds below the ratchet
    "pipeline_dsir_select" -> 17.6, // r14f samples 5.27/5.65 + driver r10 6.74 + driver r11 4.68 (all calibration-normalized) + driver r12 7.02 — r12 ratchet governs (2.5x 7.02)
    "pipeline_entity_resolution" -> 5.7, // r14f samples 1.91/2.11 + driver r10 2.25 + driver r11 1.58 (all calibration-normalized); driver r12 1.91 folds below the ratchet
    "pipeline_eval_set" -> 4.5, // r14f samples 0.83/1.00 + driver r10 1.14 + driver r11 0.79 (all calibration-normalized) + driver r12 1.77 — r12 ratchet governs (2.5x 1.77)
    "pipeline_forget" -> 11.4, // r17 closing clean-pair samples 1.92/2.35 (calibration-normalized; the composition pays its own build + delete + compact + two serves) + driver r12 3.08 + r18 closing pair 2.22/4.55 (the r18 debt-census decision added a layout scan + 1-row control read; the 4.55 sample ran at drift 1.170) — r18 ratchet governs (2.5x 4.55)
    "pipeline_index_rebuild" -> 5.6, // r15 closing clean-pair samples 1.77/1.56 + driver r11 1.49 (all calibration-normalized; the composition pays its own era-1 build + append + rebuild) + driver r12 2.20 — r12 ratchet governs (2.5x 2.20)
    "pipeline_retrieval_stack" -> 25.0, // r14f samples 5.80/6.64 + driver r10 6.90 + driver r11 5.38 (all calibration-normalized) + driver r12 9.98 — r12 ratchet governs (2.5x 9.98)
    "pipeline_skills_for_jobs" -> 13.6, // r14f samples 4.96/4.87 + driver r10 5.43 + driver r11 4.29 (all calibration-normalized); driver r12 4.35 folds below the ratchet
    "pipeline_tokenizer_train" -> 3.0, // r14f samples 0.35/0.47 + driver r10 0.43 + driver r11 0.35 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; driver r12 0.33 folds below the ratchet
    "pipeline_training_data" -> 16.6, // r14f samples 5.02/6.61 + driver r10 2.43 + driver r11 4.48 (all calibration-normalized) — driver sample = the isolated-rerun time (the 20.148 s measured pass was driver-adjudicated a load artifact); driver r12 6.02 folds below the ratchet
    "pq_ann_stored_topk" -> 6.1, // r14f samples 0.62/0.80 + driver r10 2.44 + driver r11 0.55 (all calibration-normalized); driver r12 1.14 folds below the ratchet
    "pq_ann_topk" -> 5.5, // r14f samples 1.30/1.44 + driver r10 1.46 + driver r11 1.28 (all calibration-normalized) + driver r12 2.19 — r12 ratchet governs (2.5x 2.19)
    "pq_drift_summary" -> 3.0, // r14f samples 0.34/0.39 + driver r10 0.25 + driver r11 0.27 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.44 folds below the ratchet
    "pq_index_append" -> 3.0, // r14f samples 0.06/0.07 + driver r10 0.05 + driver r11 0.06 (all calibration-normalized) [raw 2.5x budget 0.2, raised to the 3 s metrology floor]; driver r12 0.13 folds below the ratchet
    "pq_index_build" -> 4.4, // r14f samples 1.32/1.73 + driver r10 1.36 + driver r11 1.21 (all calibration-normalized); driver r12 0.99 folds below the ratchet
    "pq_index_compact" -> 3.0, // r14f samples 0.39/0.40 + driver r10 0.32 + driver r11 0.33 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.52 folds below the ratchet
    "pq_kmeans_recall" -> 3.0, // r14f samples 0.45/0.57 + driver r10 0.43 + driver r11 0.40 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; driver r12 0.79 folds below the ratchet
    "pq_opq_recall" -> 8.2, // r14f samples 1.45/1.68 + driver r10 1.40 + driver r11 1.39 (all calibration-normalized) + driver r12 3.26 — r12 ratchet governs (2.5x 3.26)
    "pq_refine_topk" -> 4.1, // r14f samples 1.59/1.63 + driver r10 1.53 + driver r11 1.29 (all calibration-normalized); driver r12 1.52 folds below the ratchet
    "pq_train_build" -> 21.3, // r15 closing clean-pair samples 6.83/6.60 + driver r11 5.81 (all calibration-normalized; the producer paying both trained-quantizer Lloyd fits; driver r10 sample 6.30 agrees) + driver r12 8.51 — r12 ratchet governs (2.5x 8.51)
    "profile_tombstone_debt" -> 3.0, // r18 closing pairs 0.21/0.58 + 0.34/0.26 (calibration-normalized; 1-row debt census — one layout scan + a broadcast semi-join count) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]
    "profile_benford" -> 3.0, // r14f samples 0.39/0.43 + driver r10 0.34 + driver r11 0.32 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.30 folds below the ratchet
    "profile_column_corr" -> 3.0, // r14f samples 0.29/0.31 + driver r10 0.24 + driver r11 0.27 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.24 folds below the ratchet
    "profile_corpus_drift" -> 3.0, // r14f samples 0.37/0.40 + driver r10 0.35 + driver r11 0.44 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.34 folds below the ratchet
    "profile_cov_append" -> 3.0, // r14f samples 0.46/0.53 + driver r10 0.45 + driver r11 0.40 (all calibration-normalized) [raw 2.5x budget 1.4, raised to the 3 s metrology floor]; driver r12 0.43 folds below the ratchet
    "profile_drift_tokens" -> 3.0, // r14f samples 0.52/0.53 + driver r10 0.49 + driver r11 0.45 (all calibration-normalized) [raw 2.5x budget 1.4, raised to the 3 s metrology floor]; driver r12 0.41 folds below the ratchet
    "profile_embedding_cov" -> 3.0, // r14f samples 0.09/0.13 + driver r10 0.09 + driver r11 0.08 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.13 folds below the ratchet
    "profile_embedding_dims" -> 3.0, // r14f samples 0.25/0.24 + driver r10 0.22 + driver r11 0.20 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.20 folds below the ratchet
    "profile_expectations" -> 3.0, // r14f samples 0.53/0.60 + driver r10 0.51 + driver r11 0.50 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; driver r12 0.47 folds below the ratchet
    "profile_freshness" -> 3.0, // r14f samples 0.22/0.29 + driver r10 0.23 + driver r11 0.23 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.21 folds below the ratchet
    "profile_join_size" -> 3.0, // r14f samples 0.81/0.97 + driver r10 0.79 + driver r11 0.81 (all calibration-normalized) [raw 2.5x budget 2.5, raised to the 3 s metrology floor]; driver r12 0.75 folds below the ratchet
    "profile_lineitem_numeric" -> 3.0, // r14f samples 0.18/0.21 + driver r10 0.17 + driver r11 0.20 (all calibration-normalized) [raw 2.5x budget 0.6, raised to the 3 s metrology floor]; driver r12 0.15 folds below the ratchet
    "profile_orders_histogram" -> 3.0, // r14f samples 0.51/0.56 + driver r10 0.43 + driver r11 0.48 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; driver r12 0.45 folds below the ratchet
    "profile_sketch_gate" -> 3.0, // r14f samples 0.26/0.26 + driver r10 0.22 + driver r11 0.28 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.25 folds below the ratchet
    "rank_knn_degree_hist" -> 17.9, // r14f samples 6.56/7.13 + driver r10 5.56 + driver r11 5.79 (all calibration-normalized); driver r12 measured 30.27 EXCLUDED — unadjudicable load artifact on unchanged code (r12 verdict #1: the producer-skip rule could not rerun it; the verdict's own fresh-JVM cold re-measure ran 7.48 s, inside budget), prior samples stand
    "rank_knn_graph_summary" -> 3.0, // r14f samples 0.33/0.40 + driver r10 0.33 + driver r11 0.31 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.38 folds below the ratchet
    "rank_knn_hits" -> 7.7, // r14f samples 2.78/2.99 + driver r10 2.29 + driver r11 2.35 (all calibration-normalized) + driver r12 3.05 — r12 ratchet governs (2.5x 3.05)
    "rank_knn_kcore" -> 23.3, // r14f samples 5.31/5.86 + driver r10 5.17 + driver r11 9.30 (all calibration-normalized) — r11 ratchet governs (2.5x 9.30). ADJUDICATED box noise (r11 verdict watch #2): the r17 closing clean pair ran 3.99/5.22 normalized — back inside the r10 envelope, with the probe-cadence reduction (KCore.ProbeKnee) live; the 9.30 stands only as the ratchet sample; driver r12 5.06 folds below the ratchet
    "rank_knn_label_prop" -> 11.1, // r14f samples 2.26/2.45 + driver r10 2.01 + driver r11 4.41 (all calibration-normalized) — r11 ratchet governs (2.5x 4.41). ADJUDICATED box noise (r11 verdict watch #2): the r17 closing clean pair ran 1.56/2.21 normalized — back at the r10 level, code untouched; the 4.41 stands only as the ratchet sample; driver r12 2.17 folds below the ratchet
    "rank_knn_link_pred" -> 9.2, // r14f samples 1.86/2.40 + driver r10 2.04 + driver r11 1.84 (all calibration-normalized) + driver r12 3.65 — r12 ratchet governs (2.5x 3.65)
    "rank_knn_pagerank" -> 5.9, // r14f samples 1.95/2.34 + driver r10 1.98 + driver r11 2.03 (all calibration-normalized); driver r12 2.04 folds below the ratchet
    "rank_knn_ppr" -> 5.5, // r14f samples 1.71/2.17 + driver r10 1.83 + driver r11 1.83 (all calibration-normalized); driver r12 2.09 folds below the ratchet
    "rank_knn_triangles" -> 3.0, // r14f samples 0.78/0.97 + driver r10 0.76 + driver r11 0.85 (all calibration-normalized) [raw 2.5x budget 2.5, raised to the 3 s metrology floor]; driver r12 1.17 folds below the ratchet
    "rel_basket_pairs" -> 5.2, // r14f samples 1.91/2.02 + driver r10 2.04 + driver r11 1.90 (all calibration-normalized); driver r12 1.69 folds below the ratchet
    "rel_cube_flags" -> 3.0, // r14f samples 0.48/0.48 + driver r10 0.42 + driver r11 0.41 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; driver r12 0.40 folds below the ratchet
    "rel_events_hourly" -> 3.0, // r14f samples 0.29/0.34 + driver r10 0.26 + driver r11 0.26 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; driver r12 0.23 folds below the ratchet
    "rel_grouping_sets" -> 3.0, // r14f samples 0.34/0.40 + driver r10 0.36 + driver r11 0.31 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.26 folds below the ratchet
    "rel_nation_trade_volume" -> 3.4, // r14f samples 1.33/1.28 + driver r10 1.07 + driver r11 1.11 (all calibration-normalized); driver r12 1.05 folds below the ratchet
    "rel_nations_both" -> 3.0, // r14f samples 0.49/0.51 + driver r10 0.46 + driver r11 0.42 (all calibration-normalized) [raw 2.5x budget 1.3, raised to the 3 s metrology floor]; driver r12 0.57 folds below the ratchet
    "rel_order_deciles" -> 3.0, // r14f samples 0.51/0.47 + driver r10 0.50 + driver r11 0.46 (all calibration-normalized) [raw 2.5x budget 1.3, raised to the 3 s metrology floor]; driver r12 0.42 folds below the ratchet
    "rel_part_name_edits" -> 3.0, // r14f samples 0.19/0.18 + driver r10 0.17 + driver r11 0.19 (all calibration-normalized) [raw 2.5x budget 0.5, raised to the 3 s metrology floor]; driver r12 0.16 folds below the ratchet
    "rel_pricing_summary" -> 3.0, // r14f samples 0.37/0.32 + driver r10 0.30 + driver r11 0.30 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.25 folds below the ratchet
    "rel_priority_stats" -> 3.0, // r14f samples 0.31/0.28 + driver r10 0.24 + driver r11 0.21 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.19 folds below the ratchet
    "rel_region_revenue" -> 3.0, // r14f samples 0.62/0.95 + driver r10 0.45 + driver r11 0.46 (all calibration-normalized) [raw 2.5x budget 2.4, raised to the 3 s metrology floor]; driver r12 0.41 folds below the ratchet
    "rel_rollup_flags" -> 3.0, // r14f samples 0.51/0.77 + driver r10 0.38 + driver r11 0.34 (all calibration-normalized) [raw 2.5x budget 2.0, raised to the 3 s metrology floor]; driver r12 0.31 folds below the ratchet
    "rel_running_revenue" -> 3.0, // r14f samples 0.22/0.30 + driver r10 0.13 + driver r11 0.13 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.13 folds below the ratchet
    "rel_small_quantity_revenue" -> 3.5, // r14f samples 0.89/1.39 + driver r10 0.62 + driver r11 0.64 (all calibration-normalized); driver r12 0.65 folds below the ratchet
    "rel_top20_parts" -> 3.0, // r14f samples 0.17/0.25 + driver r10 0.12 + driver r11 0.11 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.14 folds below the ratchet
    "rel_top_orders_per_cust" -> 3.0, // r14f samples 0.68/0.98 + driver r10 0.43 + driver r11 0.45 (all calibration-normalized) [raw 2.5x budget 2.5, raised to the 3 s metrology floor]; driver r12 0.44 folds below the ratchet
    "rel_unpivot_measures" -> 3.0, // r14f samples 0.49/0.77 + driver r10 0.33 + driver r11 0.36 (all calibration-normalized) [raw 2.5x budget 2.0, raised to the 3 s metrology floor]; driver r12 0.31 folds below the ratchet
    "rel_urgent_only_customers" -> 3.0, // r14f samples 0.56/1.09 + driver r10 0.42 + driver r11 0.49 (all calibration-normalized) [raw 2.5x budget 2.8, raised to the 3 s metrology floor]; driver r12 0.51 folds below the ratchet
    "rel_waiting_orders" -> 7.5, // r14f samples 1.47/2.97 + driver r10 1.29 + driver r11 1.34 (all calibration-normalized); driver r12 1.36 folds below the ratchet
    "rel_window_rank_suite" -> 3.0, // r14f samples 0.12/0.23 + driver r10 0.11 + driver r11 0.11 (all calibration-normalized) [raw 2.5x budget 0.6, raised to the 3 s metrology floor]; driver r12 0.14 folds below the ratchet
    "rel_winsorized_prices" -> 3.0, // r14f samples 0.19/0.31 + driver r10 0.18 + driver r11 0.20 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.18 folds below the ratchet
    "report_dataset_card" -> 3.0, // r14f samples 0.53/1.18 + driver r10 0.44 + driver r11 0.48 (all calibration-normalized); driver r12 0.53 folds below the ratchet
    "report_job_skills_pivot" -> 3.2, // r14f samples 0.64/1.27 + driver r10 0.61 + driver r11 0.61 (all calibration-normalized); driver r12 0.67 folds below the ratchet
    "report_source_quality" -> 3.0, // r14f samples 0.13/0.23 + driver r10 0.12 + driver r11 0.12 (all calibration-normalized) [raw 2.5x budget 0.6, raised to the 3 s metrology floor]; driver r12 0.13 folds below the ratchet
    "sample_bottomk_merge" -> 3.0, // r14f samples 0.35/0.42 + driver r10 0.36 + driver r11 0.33 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.42 folds below the ratchet
    "sample_cluster_balanced" -> 3.0, // r14f samples 0.36/0.41 + driver r10 0.33 + driver r11 0.32 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.32 folds below the ratchet
    "sample_docs_curriculum" -> 3.0, // r14f samples 0.13/0.14 + driver r10 0.12 + driver r11 0.12 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.12 folds below the ratchet
    "sample_docs_hash" -> 3.0, // r14f samples 0.11/0.14 + driver r10 0.13 + driver r11 0.11 (all calibration-normalized) [raw 2.5x budget 0.4, raised to the 3 s metrology floor]; driver r12 0.13 folds below the ratchet
    "sample_docs_shuffle" -> 3.0, // r14f samples 0.11/0.11 + driver r10 0.09 + driver r11 0.09 (all calibration-normalized) [raw 2.5x budget 0.3, raised to the 3 s metrology floor]; driver r12 0.09 folds below the ratchet
    "sample_docs_split" -> 3.0, // r14f samples 0.09/0.11 + driver r10 0.08 + driver r11 0.09 (all calibration-normalized) [raw 2.5x budget 0.3, raised to the 3 s metrology floor]; driver r12 0.10 folds below the ratchet
    "sample_docs_stratified" -> 3.0, // r14f samples 0.21/0.25 + driver r10 0.20 + driver r11 0.23 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.22 folds below the ratchet
    "sample_docs_weighted" -> 3.0, // r14f samples 0.30/0.31 + driver r10 0.27 + driver r11 0.28 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.24 folds below the ratchet
    "sample_epoch_plan" -> 3.0, // r14f samples 0.35/0.38 + driver r10 0.31 + driver r11 0.38 (all calibration-normalized) [raw 2.5x budget 1.0, raised to the 3 s metrology floor]; driver r12 0.35 folds below the ratchet
    "sample_length_buckets" -> 3.0, // r14f samples 0.26/0.30 + driver r10 0.26 + driver r11 0.33 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.26 folds below the ratchet
    "sample_mixture_temperature" -> 3.0, // r14f samples 0.51/0.68 + driver r10 0.49 + driver r11 0.57 (all calibration-normalized) [raw 2.5x budget 1.7, raised to the 3 s metrology floor]; driver r12 0.51 folds below the ratchet
    "sample_split_dedup_aware" -> 3.0, // r14f samples 0.45/0.50 + driver r10 0.30 + driver r11 0.36 (all calibration-normalized) [raw 2.5x budget 1.3, raised to the 3 s metrology floor]; driver r12 0.39 folds below the ratchet
    "sample_token_budget" -> 3.0, // r14f samples 0.59/0.73 + driver r10 0.61 + driver r11 0.64 (all calibration-normalized) [raw 2.5x budget 1.9, raised to the 3 s metrology floor]; driver r12 0.65 folds below the ratchet
    "select_dsir_sample" -> 10.2, // r14f samples 3.63/4.05 + driver r10 3.20 + driver r11 3.43 (all calibration-normalized); driver r12 measured 15.46 EXCLUDED — unadjudicable load artifact on unchanged code (r12 verdict #1: the producer-skip rule could not rerun it; the verdict's own fresh-JVM cold re-measure ran 5.67 s, inside budget), prior samples stand
    "select_dsir_weights" -> 3.0, // r14f samples 0.22/0.29 + driver r10 0.19 + driver r11 0.18 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.89 folds below the ratchet
    "select_nb_calibrated" -> 3.0, // r14f samples 1.00/1.14 + driver r10 1.00 + driver r11 1.14 (all calibration-normalized) [raw 2.5x budget 2.9, raised to the 3 s metrology floor]; driver r12 1.02 folds below the ratchet
    "select_nb_confusion" -> 3.0, // r14f samples 0.20/0.29 + driver r10 0.21 + driver r11 0.21 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.22 folds below the ratchet
    "select_nb_quality" -> 3.0, // r14f samples 0.19/0.21 + driver r10 0.17 + driver r11 0.20 (all calibration-normalized) [raw 2.5x budget 0.6, raised to the 3 s metrology floor]; driver r12 0.20 folds below the ratchet
    "select_nb_reliability" -> 3.0, // r14f samples 1.00/0.97 + driver r10 0.92 + driver r11 0.96 (all calibration-normalized) [raw 2.5x budget 2.5, raised to the 3 s metrology floor]; driver r12 0.88 folds below the ratchet
    "sql_knn_topk" -> 3.0, // r14f samples 0.59/0.53 + driver r10 0.44 + driver r11 0.44 (all calibration-normalized) [raw 2.5x budget 1.5, raised to the 3 s metrology floor]; driver r12 0.47 folds below the ratchet
    "sql_text_pipeline" -> 3.0, // r14f samples 0.19/0.19 + driver r10 0.17 + driver r11 0.20 (all calibration-normalized) [raw 2.5x budget 0.5, raised to the 3 s metrology floor]; driver r12 0.19 folds below the ratchet
    "text_bigram_logprob" -> 3.7, // r14f samples 1.47/1.47 + driver r10 1.19 + driver r11 1.35 (all calibration-normalized); driver r12 1.05 folds below the ratchet
    "text_bpe_encode" -> 3.0, // r14f samples 0.45/0.46 + driver r10 0.40 + driver r11 0.44 (all calibration-normalized) [raw 2.5x budget 1.2, raised to the 3 s metrology floor]; driver r12 0.38 folds below the ratchet
    "text_bpe_merges" -> 3.3, // r14f samples 1.09/1.31 + driver r10 1.15 + driver r11 1.02 (all calibration-normalized); driver r12 measured 14.97 EXCLUDED — unadjudicable load artifact on unchanged code (r12 verdict #1: the producer-skip rule could not rerun it; the verdict's own fresh-JVM cold re-measure ran 1.52 s, inside budget), prior samples stand
    "text_bpe_stored_encode" -> 3.0, // r14f samples 0.41/0.51 + driver r10 0.42 + driver r11 0.48 (all calibration-normalized) [raw 2.5x budget 1.3, raised to the 3 s metrology floor]; driver r12 0.44 folds below the ratchet
    "text_chunk_windows" -> 3.0, // r14f samples 0.19/0.32 + driver r10 0.23 + driver r11 0.20 (all calibration-normalized) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]; driver r12 0.19 folds below the ratchet
    "text_cms_heavyhitters" -> 3.5, // r14f samples 0.53/1.38 + driver r10 0.58 + driver r11 0.58 (all calibration-normalized); driver r12 0.51 folds below the ratchet
    "text_collocations" -> 3.6, // r14f samples 0.60/1.43 + driver r10 0.60 + driver r11 0.70 (all calibration-normalized); driver r12 0.53 folds below the ratchet
    "text_fertility_by_lang" -> 3.0, // r14f samples 0.23/0.42 + driver r10 0.17 + driver r11 0.27 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.18 folds below the ratchet
    "text_fingerprint" -> 3.0, // r14f samples 0.10/0.20 + driver r10 0.09 + driver r11 0.14 (all calibration-normalized) [raw 2.5x budget 0.5, raised to the 3 s metrology floor]; driver r12 0.10 folds below the ratchet
    "text_heaps_law" -> 4.1, // r14f samples 0.83/1.63 + driver r10 0.89 + driver r11 0.84 (all calibration-normalized); driver r12 0.66 folds below the ratchet
    "text_keywords_tfidf" -> 7.0, // r14f samples 1.42/2.80 + driver r10 1.23 + driver r11 1.58 (all calibration-normalized); driver r12 1.03 folds below the ratchet
    "text_lm_deleted" -> 5.1, // r18 closing-pair samples 2.01/2.03 (calibration-normalized; the row pays its own store: build + exact-decrement delete + score — the landing raw-sample 9.2 corrected down per its own resample note)
    "text_lm_store_build" -> 3.0, // r18 closing-pair samples 1.03/0.73 (calibration-normalized; the shared LM store's DDL — the family's first row alphabetically; the landing raw-sample 4.9 corrected down per its own resample note) [raw 2.5x budget 2.6, raised to the 3 s metrology floor]
    "text_lm_stored_logprob" -> 3.0, // r18 closing-pair samples 0.30/0.25 (calibration-normalized; delta-bounded probes of the stored counts) [raw 2.5x budget 0.8, raised to the 3 s metrology floor]
    "text_lang_confusion" -> 3.0, // r14f samples 0.54/0.92 + driver r10 0.42 + driver r11 0.49 (all calibration-normalized) [raw 2.5x budget 2.4, raised to the 3 s metrology floor]; driver r12 0.39 folds below the ratchet
    "text_lang_id" -> 3.0, // r14f samples 0.12/0.20 + driver r10 0.09 + driver r11 0.10 (all calibration-normalized) [raw 2.5x budget 0.5, raised to the 3 s metrology floor]; driver r12 0.09 folds below the ratchet
    "text_ngram_novelty" -> 3.0, // r14f samples 0.48/0.95 + driver r10 0.43 + driver r11 0.43 (all calibration-normalized) [raw 2.5x budget 2.4, raised to the 3 s metrology floor]; driver r12 0.42 folds below the ratchet
    "text_pack_shards" -> 3.0, // r14f samples 0.09/0.19 + driver r10 0.09 + driver r11 0.09 (all calibration-normalized) [raw 2.5x budget 0.5, raised to the 3 s metrology floor]; driver r12 0.09 folds below the ratchet
    "text_phrase_match" -> 3.0, // r14f samples 0.13/0.26 + driver r10 0.11 + driver r11 0.12 (all calibration-normalized) [raw 2.5x budget 0.7, raised to the 3 s metrology floor]; driver r12 0.12 folds below the ratchet
    "text_quality" -> 3.0, // r14f samples 0.09/0.19 + driver r10 0.08 + driver r11 0.09 (all calibration-normalized) [raw 2.5x budget 0.5, raised to the 3 s metrology floor]; driver r12 0.08 folds below the ratchet
    "text_stats" -> 3.0, // r14f samples 0.09/0.20 + driver r10 0.09 + driver r11 0.09 (all calibration-normalized) [raw 2.5x budget 0.5, raised to the 3 s metrology floor]; driver r12 0.08 folds below the ratchet
    "text_textrank_keywords" -> 8.5, // r14f samples 1.99/3.37 + driver r10 1.70 + driver r11 1.74 (all calibration-normalized); driver r12 1.62 folds below the ratchet
    "text_top_ngrams" -> 3.0, // r14f samples 0.60/0.77 + driver r10 0.64 + driver r11 0.65 (all calibration-normalized) [raw 2.5x budget 2.0, raised to the 3 s metrology floor]; driver r12 0.58 folds below the ratchet
    "text_unigram_logprob" -> 3.0, // r14f samples 0.61/0.76 + driver r10 0.66 + driver r11 0.65 (all calibration-normalized) [raw 2.5x budget 1.9, raised to the 3 s metrology floor]; driver r12 0.58 folds below the ratchet
    "text_vocab_coverage" -> 3.0, // r14f samples 0.31/0.41 + driver r10 0.31 + driver r11 0.30 (all calibration-normalized) [raw 2.5x budget 1.1, raised to the 3 s metrology floor]; driver r12 0.28 folds below the ratchet
    "text_zipf_slope" -> 3.0, // r14f samples 0.25/0.33 + driver r10 0.23 + driver r11 0.23 (all calibration-normalized) [raw 2.5x budget 0.9, raised to the 3 s metrology floor]; driver r12 0.20 folds below the ratchet
    "vec_scalar_pairs" -> 3.0, // r14f samples 0.20/0.20 + driver r10 0.17 + driver r11 0.16 (all calibration-normalized) [raw 2.5x budget 0.5, raised to the 3 s metrology floor]; driver r12 0.17 folds below the ratchet
    "vec_text_roundtrip" -> 3.0, // r14f samples 0.11/0.09 + driver r10 0.10 + driver r11 0.10 (all calibration-normalized) [raw 2.5x budget 0.3, raised to the 3 s metrology floor]; driver r12 0.09 folds below the ratchet
  )
}
