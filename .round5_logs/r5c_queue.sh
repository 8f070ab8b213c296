#!/bin/bash
# Round-5 session-c queue: replay the 1-D rbg trace profile (the session-b
# attempt died mid-compile when that session ended). Supplementary evidence
# for VALIDATION's 1-D perf-preset paragraph: the trace should show the
# threefry dropout-mask fusions (~0.61 ms) gone under rbg.
# Relaunch after any restart:
#   nohup bash .round5_logs/r5c_queue.sh > .round5_logs/r5c_nohup.out 2>&1 &
cd /root/repo || exit 1
LOG=.round5_logs

gate() {
  python .round3_logs/wait_healthy2.py >> "$LOG/r5c_gate.log" 2>&1
}

if [ ! -s docs/train1d_step_profile_r5_rbg.csv ]; then
  if gate; then
    timeout 3600 python -u examples/analysis/train_step_profile.py \
        --net unet1d --win 4096 --prng rbg \
        --csv docs/train1d_step_profile_r5_rbg.csv \
        > "$LOG/profile_1d_rbg.out" 2> "$LOG/profile_1d_rbg.err"
    echo "[r5c] profile_1d_rbg done rc=$?" >> "$LOG/r5c.log"
  else
    echo "[r5c] gate failed — trace NOT run" >> "$LOG/r5c.log"
  fi
fi

if [ -s docs/train1d_step_profile_r5_rbg.csv ]; then
  echo "[r5c] complete" >> "$LOG/r5c.log"
else
  echo "[r5c] exiting WITHOUT artifact" >> "$LOG/r5c.log"
fi
