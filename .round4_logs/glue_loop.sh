#!/bin/bash
cd /root/repo || exit 1
for i in 1 2 3 4 5; do
  python .round3_logs/wait_healthy2.py >> .round4_logs/glue_gate.log 2>&1 || exit 1
  timeout 1800 python examples/analysis/train_glue_bench.py \
    --csv docs/train_glue_r4.csv >> .round4_logs/glue_r4.log 2>&1
  rc=$?
  echo "[glue] pass $i rc=$rc" >> .round4_logs/glue_gate.log
  [ $rc -eq 0 ] && break
done
