#!/bin/bash
cd /root/repo || exit 1
for i in 1 2 3 4 5; do
  python .round3_logs/wait_healthy2.py >> .round4_logs/resid_gate.log 2>&1 || exit 1
  timeout 1500 python examples/analysis/train_residual_bench.py \
    --csv docs/train_residual_r4.csv >> .round4_logs/resid_r4.log 2>&1
  rc=$?
  echo "[resid] pass $i rc=$rc" >> .round4_logs/resid_gate.log
  [ $rc -eq 0 ] && break
done
