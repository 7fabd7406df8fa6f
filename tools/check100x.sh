#!/bin/bash
# Round-16 extension of the scaled oracle gate: hash-gates a linear-
# oracle headline subset against DuckDB on the 100x corpus
# (/tmp/graft_sf10, 60M lineitem rows / 500k docs — built by
# `SPARK_GRAFT_FACTOR=100 SPARK_GRAFT_SCALE_OUT=/tmp/graft_sf10
# runMain graft.ScaleBench`), two decades above the driver gate.
#
# Subset: the TPC-H spine + integer-exact agg/window/join/text/profile
# families + the dedup pipeline (exact, the minhash banding candidate
# stage with its 32-permutation md5 oracle replayed over 500k docs, and
# the connected-components clusters) + auto-mass pagerank (gateable at
# any factor since the round-16 mass rule is mirrored in its oracle
# SQL) + the simhash candidate stage. Round-17 widening (verdict task
# 5): the cheap linear-oracle entries already proven at 10x — joins,
# windows, set ops, SCD2/CDC/snapshot, sample/split/shard manifests,
# text/profile — now also replay at this decade.
#
# The simhash entry is hash-green at 100x but its Hamming-ball oracle
# is constant-heavy (~45 min in DuckDB at 500k docs): pass
# --skip-simhash for the routine re-run and budget for the full gate
# once per round.
#
# Re-pay CADENCE for the opt-in simhash arm (round-18 verdict task 7):
# the carried result must be re-paid at HEAD whenever the signature or
# banding path changes — a new digest kernel, a band-width change, a
# Hamming-radius change — and otherwise at least once every four
# rounds. The round-18 md5-kernel swap qualified as a path change; its
# carry was sound only because Md5SixteenthsSpec pins corpus-wide
# BIT-EQUALITY of the new kernel against the replaced built-in chain,
# so the banded signatures (and therefore the Hamming ball) are
# provably unchanged. Re-paid at HEAD in round 19 (this file's history
# records each payment).
#
# Usage: tools/check100x.sh [--skip-simhash] [sf_dir] [out_dir]
set -e
SKIP_SIMHASH=0
if [ "$1" = "--skip-simhash" ]; then SKIP_SIMHASH=1; shift; fi
SF=${1:-/tmp/graft_sf10}
OUT=${2:-/tmp/graft_verify_100x}
QUERIES="q_sql_q3 q_sql_q5 q_sql_q10 q_sql_q18 q_sql_q21 q_dedup_exact \
  q_dedup_minhash q_dedup_clusters \
  q_agg_group q_window_rank q_filter_pred q_events_sessions \
  q_events_funnel q_ngram_counts q_agg_rfm q_sort_topk q_join_semi \
  q_agg_rollup q_text_tokens q_profile_moments q_pagerank"
QUERIES="$QUERIES q_join_inner q_join_left q_join_anti q_join_multiway \
  q_window_lag q_window_frame q_set_except q_scd2_build q_merge_upsert \
  q_snapshot_diff q_sample_hash q_split_holdout q_shard_assign \
  q_text_stats q_text_fingerprint q_profile_stats q_agg_mode \
  q_events_retention q_events_transitions"
# Round-17: the recall@k eval primitive at 200k vectors — the panel's
# exact top-k and the LSH candidate replay are both linear in n (panel
# is a constant 32), so the oracle stays minutes-cheap at this decade.
QUERIES="$QUERIES q_ann_recall"
# Round-17 second wave: the cheap-linear-oracle embedding entries (the
# one family the 100x gate did not touch) — integer-scaled sums, the
# quantization fidelity pass, the single-query LSH/IVF top-k, and the
# IVF recall twin. The k-means CTE oracles replay 3 Lloyd iterations
# over a 200k x 64 unpivot in DuckDB — minutes, not hours. Excluded
# here and documented (not silent): q_dedup_semdedup's flat k=64 fit
# and q_embed_kmeans' full-assignment output make their oracles
# hour-class at this decade; both stay gated at 10x.
QUERIES="$QUERIES q_embed_centroid q_embed_quant q_embed_covariance \
  q_ann_lsh q_ann_ivf q_ann_recall_ivf"
# Round-18: multimodal's first 100x rows (500k synthesized clips —
# closed-form oracles scale trivially; the decode is the measured
# cost) and the streaming family's first 100x rows (the 10M-event
# two-batch lifecycle; plain-SQL oracles). Kept to the cheap shapes —
# the full stream family stays gated at 10x.
QUERIES="$QUERIES q_multimodal_phash q_multimodal_audio \
  q_stream_tumble q_stream_sessions q_stream_scd2"
# ── Round-19 widening (round-18 verdict task 4: 52 → 200+ entries).
# Every addition below was PRICED in DuckDB at the 60M-row decade
# before inclusion (per-family notes at the end of this file) and ran
# hash-green at HEAD 2026-08-16. Wave 1: the remaining TPC-H shapes,
# the full join surface (minus the interval-pairs form — see
# exclusions), the events family, the scalar-function suites, the
# window/set/pivot/grouping/subquery remainder, the agg family.
QUERIES="$QUERIES q_sql_q2 q_sql_q4 q_sql_q6 q_sql_q7 q_sql_q8 \
  q_sql_q9 q_sql_q11 q_sql_q12 q_sql_q13 q_sql_q14 q_sql_q15 \
  q_sql_q16 q_sql_q17 q_sql_q19 q_sql_q20 q_sql_q22 q_sql_recursive"
QUERIES="$QUERIES q_join_right q_join_full q_join_null_safe \
  q_join_null_aware_anti q_join_lateral q_join_interval_agg \
  q_join_temporal q_asof_join q_asof_nearest q_range_join q_skew_join \
  q_join_cross"
QUERIES="$QUERIES q_events_ohlc q_events_tumble q_events_sliding \
  q_events_ewma q_events_interarrival q_events_cohorts \
  q_events_engagement q_events_densify q_events_cusum \
  q_events_seasonality q_events_anomaly q_events_anomaly_robust \
  q_events_concurrency q_events_cooccurrence q_events_attribution \
  q_events_funnel_windowed q_events_session_window \
  q_events_session_state q_events_paths q_orders_backlog \
  q_market_basket"
QUERIES="$QUERIES q_string_funcs q_string_advanced q_date_funcs \
  q_calendar_funcs q_math_funcs q_regexp_funcs q_bitwise_funcs \
  q_hash_funcs q_struct_funcs q_array_funcs q_array_advanced \
  q_null_semantics q_map_funcs q_json_extract q_url_extract"
QUERIES="$QUERIES q_window_analytic q_window_nav q_window_range \
  q_window_running_distinct q_set_intersect q_set_ops_all q_set_union \
  q_pivot q_union_by_name q_grouping_id q_grouping_sets \
  q_subquery_scalar q_subquery_correlated"
QUERIES="$QUERIES q_agg_approx q_agg_argmax q_agg_bool q_agg_cube \
  q_agg_distinct q_agg_having q_agg_hll_merge q_agg_incremental \
  q_agg_multi_distinct q_agg_percentile q_agg_percentile_approx \
  q_agg_percentile_counting q_agg_percentile_weighted q_agg_stats \
  q_agg_trend q_scan_project"
# The round-19 scaled-row closers at this decade too: the two slice
# twins (bounded oracles by construction), the fixed-corpus embed
# pair (O(300·n) oracles), the auto-sized heavy hitters.
QUERIES="$QUERIES q_dedup_embed_slice q_dedup_minhash_verified_slice \
  q_dedup_embed_incremental q_stream_dedup_embed q_heavy_hitters \
  q_heavy_hitters_approx"
# Multimodal: features/frames/video join phash/audio at the 500k-clip
# decade (closed-form oracles; 4.1M frame rows hash-exact).
QUERIES="$QUERIES q_multimodal_features q_multimodal_frames \
  q_multimodal_video"
# Wave 2: the text/curation/profiling/dedup remainder (500k-doc
# oracles, seconds-to-90s each), the decontamination family, the
# BPE pair, tfidf, the embedding small forms, labelprop, the
# histogram/winsorize pairs, semdedup_2l (the 298 s five-minute
# oracle — the semantic-dedup scale path earns it), agg_collect
# (128 s), and ELEVEN more streaming lifecycles at the 10M-event
# feed (cheap plain-SQL oracles; the engine arm is the real cost).
QUERIES="$QUERIES q_ann_range q_bpe_apply q_bpe_merges \
  q_curation_blocklist q_curation_kanon q_curation_token_budget \
  q_data_mix q_data_mix_temperature q_dedup_canonical \
  q_dedup_containment q_dedup_edit q_dedup_incremental q_dedup_ngram \
  q_dedup_paragraph q_dedup_url q_doc_repetition q_dq_audit \
  q_embed_cosine_topk q_embed_covariance_full q_embed_pca_power \
  q_graph_labelprop q_pii_scrub q_profile_corr q_profile_drift \
  q_profile_hist q_quality_filter q_sample_stratified \
  q_sample_weighted q_text_chunks q_text_confusion q_text_diversity \
  q_text_langid q_text_normalize q_text_postings q_text_quality \
  q_text_rarity q_tfidf q_winsorize q_hist_equidepth \
  q_decontaminate_semantic q_bloom_decontaminate q_decontaminate \
  q_text_collocations q_text_novelty q_langid_trigram q_agg_collect \
  q_dedup_semdedup_2l q_context_pack q_curation_global_index \
  q_curation_partition_layout q_hist_equidepth_approx \
  q_winsorize_approx q_zorder_layout q_stream_dedup_near \
  q_stream_attribution q_stream_cdc q_stream_dedup q_stream_enrich \
  q_stream_interval_join q_stream_interval_join_outer \
  q_stream_semi_join q_stream_ngrams q_stream_ngrams_sink \
  q_stream_sessions_bounded"
# ── Round-20 wave (verdict tasks 1-3): the comparer-bound class joins
# the gate through check.py --digest — both sides reduce to ONE
# count+SUM(hash) row inside DuckDB, so the 15M–180M-row outputs
# (the full converted corpus / unpivot fan-out is the RESULT by
# design) no longer pay the python fetchall boundary. Every digest
# entry keeps its order-sensitive full-hash row at sf0.01 and 10x;
# the digest drops only the row-order check at this decade.
# All 10 ran hash-green at HEAD 2026-08-17; measured digest cost
# (oracle SQL + both DuckDB digest scans): ingest_typed 151s (60M),
# stream_ingest 105s (60M), safe_cast 88s (60M), null_normalize 65s
# (60M), parse_bool 58s (60M), parse_ts_multi 42s (15M), ingest_jsonl
# 29s (15M), parse_date_multi 29s (15M), unpivot 24s (180M),
# stream_ingest_jsonl 7s (15M) — the 180M-row entry that was the
# comparer's worst case is now among the cheapest (pure column scan).
DIGEST_QUERIES="q_ingest_typed q_ingest_jsonl q_safe_cast \
  q_null_normalize q_parse_bool q_parse_date_multi q_parse_ts_multi \
  q_stream_ingest q_stream_ingest_jsonl q_unpivot"
QUERIES="$QUERIES $DIGEST_QUERIES"
# ...and the two new bounded-oracle twins (round-19 verdict task 3,
# the slice-twin recipe's 3rd/4th applications): simhash-verified's
# full pipeline gated through an md5-hash output slice, BFS gated
# through the seed rule R = max(100, n_cust/16) mirrored in the
# oracle's level-unrolled CTE. Both hash-green at HEAD 2026-08-17:
# 33 rows (non-vacuous: organic + planted replays in-slice) and
# 15,995 rows, full order-sensitive compares.
QUERIES="$QUERIES q_dedup_simhash_verified_slice q_graph_bfs_bounded"
# ── Excluded at 100x, each with its measured reason (the no-silent-
# caps discipline; all 10 are hash-gated at sf0.01, 8 directly at 10x
# and the two O(n²)-oracle production forms via their slice twins at
# the same decade — embed's full O(n²) oracle also paid once at 10x):
#   q_join_interval — BOTH arms super-linear at the 5M-event interval
#     density: the DuckDB IEJoin oracle exceeds 480 s and the
#     pair-OUTPUT itself grows with overlap density² (the entry's own
#     scaladoc documents this; its linear-output scale twin
#     q_join_interval_agg IS gated here — 24 s oracle, 9.5M rows).
#   q_dedup_incremental_near / q_dedup_index_append — oracle arms
#     cross-join batch grams against the 5M-doc corpus: >480 s.
#   q_dedup_simhash_verified — recall-preconditioned all-pairs oracle
#     >480 s (FINAL: measured round 19); its identical pipeline is
#     gated here by q_dedup_simhash_verified_slice, and the candidate
#     stage + Hamming ball by q_dedup_simhash.
#   q_graph_bfs — DuckDB's recursive-CTE frontier oracle from ALL
#     sources >480 s at 1.6M edges (FINAL); the identical iteration
#     is gated here by q_graph_bfs_bounded's seeded form.
#   q_graph_triangles — the DuckDB 3-way edge self-join spills >60 GB
#     of temp at this decade (measured: out-of-disk at 372 s; FINAL).
#   q_dedup_embed / q_dedup_minhash_verified — O(n²) brute-force
#     oracles (their _slice twins gate the identical pipelines here).
#   q_dedup_semdedup / q_embed_kmeans — hour-class oracles (round-17
#     note: flat k=64 fit / full-assignment output), gated at 10x;
#     the production-scale paths (semdedup_2l, the IVF/LSH probes)
#     are gated here.
# Tally: 232 of 242 registry entries hash-green at 100x.
if [ "$SKIP_SIMHASH" = "0" ]; then QUERIES="$QUERIES q_dedup_simhash"; fi
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Verify $SF $OUT $QUERIES"
python3 tools/check.py "$SF" "$OUT" --digest "$(echo $DIGEST_QUERIES | tr ' ' ',')"
