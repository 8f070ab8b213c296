#!/bin/bash
# Health-gated round-4 hyperparameter sweep (VERDICT r3 #6): accumulate
# 200 trials on the hard fixtures (resume-safe across VM restarts /
# throttle windows), then re-run the top 20 at 4 epochs.
#
# Relaunch after any restart:
#   nohup bash .round4_logs/search_r4.sh > .round4_logs/search_nohup.out 2>&1 &
cd /root/repo || exit 1
LOG=.round4_logs
CSV=docs/hyperparam_search_r4.csv
for i in $(seq 1 40); do
  rows=$(($(wc -l < "$CSV" 2>/dev/null || echo 1) - 1))
  echo "[search_r4] pass $i: $rows rows" >> "$LOG/search_gate.log"
  if [ "$rows" -ge 200 ]; then break; fi
  python .round3_logs/wait_healthy2.py >> "$LOG/search_gate.log" 2>&1 || exit 1
  timeout 7200 python examples/neurons/unet2ds_hyperparam_search.py fixtures \
      --make-fixtures 3 --trials 200 --epochs 2 --steps 60 \
      --val-shape 128 --seed 871 --resume --out "$CSV" \
      >> "$LOG/search_r4.log" 2>&1
done
# Longer-budget check of the sweep's conclusions: top decile at 4 epochs.
python .round3_logs/wait_healthy2.py >> "$LOG/search_gate.log" 2>&1 && \
timeout 10800 python examples/neurons/unet2ds_hyperparam_search.py fixtures \
    --make-fixtures 3 --epochs 4 --steps 60 --val-shape 128 --seed 871 \
    --rerun-top 20 --out "$CSV" >> "$LOG/search_r4.log" 2>&1
echo "[search_r4] complete" >> "$LOG/search_gate.log"
