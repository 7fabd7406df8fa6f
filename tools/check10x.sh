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
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Verify $SF $OUT $QUERIES"
python3 tools/check.py "$SF" "$OUT"
