#!/bin/bash
# Chained round-3 measurement pipeline (recreated after the 2026-08-18 VM
# restart wiped the session-c versions). Runs everything sequentially —
# this host has ONE core, never two heavy python processes at once.
# Each stage re-waits for a healthy window (throttles last 90+ minutes).
set -u
cd /root/repo
LOG=.round3_logs
PY=python

stamp() { date "+%Y-%m-%d %H:%M:%S"; }
say() { echo "[$(stamp)] $*" >> $LOG/runner.log; }

wait_ok() {
  $PY $LOG/wait_healthy2.py >> $LOG/health.log 2>&1
  return $?
}

say "=== pipeline start ==="

# Stage 0: fixtures (host-only, no health gate needed)
if [ ! -f $LOG/rds1.hdf5 ]; then
  say "stage 0: fixtures"
  timeout 3600 $PY $LOG/make_r3_fixtures.py >> $LOG/fixtures.log 2>&1
  say "stage 0 done rc=$?"
fi

# Stage 1: bench preview
if [ ! -s $LOG/bench_preview.json ]; then
  wait_ok || exit 1
  say "stage 1: bench preview"
  timeout 5400 $PY bench.py > $LOG/bench_preview.json 2> $LOG/bench_preview.err
  say "stage 1 done rc=$? -> $(tail -c 300 $LOG/bench_preview.json)"
fi

# Stage 2: dataset stats + throughput cell -> docs/dataset_stats_r3.txt
if [ ! -s docs/dataset_stats_r3.txt ]; then
  wait_ok || exit 1
  say "stage 2: dataset_stats"
  timeout 7200 $PY examples/analysis/dataset_stats.py local \
    --paths $LOG/rds0.hdf5 $LOG/rds1.hdf5 --throughput \
    > $LOG/dataset_stats_r3.txt.tmp 2> $LOG/dataset_stats.err \
    && mv $LOG/dataset_stats_r3.txt.tmp docs/dataset_stats_r3.txt
  say "stage 2 done rc=$?"
fi

# Stage 3: BN-ablation + PRNG + batch rerun (the fixed BN_STATS_F32 knob
# now reaches bn_grouped — VALIDATION.md caveat row needs re-measured rows)
if [ ! -s $LOG/train_mfu_sweep_r3.txt ]; then
  wait_ok || exit 1
  say "stage 3: train_mfu_sweep"
  timeout 10800 $PY examples/analysis/train_mfu_sweep.py --batches 20 64 \
    > $LOG/train_mfu_sweep_r3.txt.tmp 2> $LOG/train_mfu_sweep.err \
    && mv $LOG/train_mfu_sweep_r3.txt.tmp $LOG/train_mfu_sweep_r3.txt
  say "stage 3 done rc=$?"
fi

# Stage 4: per-block train profile -> docs/train_layer_bench_r3.csv
if [ ! -s docs/train_layer_bench_r3.csv ]; then
  wait_ok || exit 1
  say "stage 4: train_layer_bench"
  timeout 10800 $PY examples/analysis/train_layer_bench.py \
    --csv docs/train_layer_bench_r3.csv \
    > $LOG/train_layer_bench_r3.txt 2> $LOG/train_layer_bench.err
  say "stage 4 done rc=$?"
fi

say "=== pipeline complete ==="
