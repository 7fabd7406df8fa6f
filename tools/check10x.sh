#!/bin/bash
# Round-16 task 2: the 10x oracle gate — hash-gates a rotating headline
# subset against DuckDB on the SCALED corpus (/tmp/graft_sf1, built by
# `runMain graft.ScaleBench`), so scale-dependent wrongness (overflow,
# hash-collision effects, threshold drift) is caught above sf0.1.
#
# Subset: the TPC-H spine, the dedup candidate stages + the simhash
# verified twin, and the integer-exact families. q_dedup_minhash_verified
# is EXCLUDED at 10x only: its oracle is the brute-force all-pairs
# Jaccard (deliberately independent of banding), which is O(n²) in
# DuckDB — ~1.25B pairs at 50k docs; the banding candidate stage
# q_dedup_minhash and the linear-oracle q_dedup_simhash_verified carry
# the near-dup gate at this scale.
#
# Usage: tools/check10x.sh [sf_dir] (default /tmp/graft_sf1)
set -e
SF=${1:-/tmp/graft_sf1}
OUT=${2:-/tmp/graft_verify_10x}
QUERIES="q_sql_q3 q_sql_q5 q_sql_q9 q_sql_q10 q_sql_q13 q_sql_q17 \
  q_sql_q18 q_sql_q21 q_dedup_exact q_dedup_minhash q_dedup_simhash \
  q_dedup_simhash_verified q_dedup_clusters q_agg_group q_window_rank \
  q_sort_topk q_events_sessions q_events_funnel q_ngram_counts q_agg_rfm \
  q_pagerank q_agg_percentile_counting q_filter_pred"
# Round-16 widening: the rest of the rotating subset — joins, set ops,
# windows, rollups, SCD2/CDC, text and curation manifests, profiling
# moments. All linear-oracle entries (no all-pairs forms) so DuckDB
# replays them comfortably at 6M lineitem rows / 500k events.
QUERIES="$QUERIES q_join_inner q_join_left q_join_semi q_join_anti \
  q_join_multiway q_set_except q_window_lag q_window_frame q_agg_rollup \
  q_agg_stats q_agg_mode q_events_retention q_events_transitions \
  q_scd2_build q_merge_upsert q_snapshot_diff q_text_tokens q_text_stats \
  q_text_fingerprint q_sample_hash q_split_holdout q_shard_assign \
  q_profile_stats q_profile_moments"
# Round-17 widening (verdict task 1): the embedding/ANN/semantic family —
# the one family that had no scaled oracle row. Integer-scaled vector
# sums, LSH banding, kmeans/IVF assignment and the semantic-decontamination
# screen all change behavior with n (sum magnitudes, collision rates,
# tie shapes), so they are gated here at 20k vectors / 50k docs. Under
# Verify the k-knobs pin to their oracle-gated defaults (Knobs), so the
# DuckDB mirrors replay 1:1.
QUERIES="$QUERIES q_embed_centroid q_embed_covariance q_embed_covariance_full \
  q_embed_kmeans q_embed_pca_power q_embed_quant q_ann_lsh q_ann_ivf \
  q_ann_range q_dedup_semdedup q_dedup_semdedup_2l q_decontaminate_semantic"
# Round-17: the recall@k eval primitive — its oracle replays the exact
# top-k AND the LSH candidate stage per panel query, so bucket-occupancy
# drift at 10x (2k -> 20k vectors in a fixed 12-bit bucket space) is
# hash-gated, not just arm-measured.
QUERIES="$QUERIES q_ann_recall q_ann_recall_ivf"
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Verify $SF $OUT $QUERIES"
python3 tools/check.py "$SF" "$OUT"
