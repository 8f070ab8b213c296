#!/bin/bash
# Round-5 session-b queue: close the one dangling measurement from the
# previous session — the 1-D spike-step threefry-vs-rbg dropout PRNG A/B
# (docs/VALIDATION.md round-5 section promises it; the trace shows the
# top four 1-D ops are threefry dropout-mask fusions, ~0.61 ms of the
# 6.47 ms step). Health-gated, resumable, one TPU owner at a time.
# Relaunch after any restart:
#   nohup bash .round5_logs/r5b_queue.sh > .round5_logs/r5b_nohup.out 2>&1 &
cd /root/repo || exit 1
LOG=.round5_logs

gate() {
  python .round3_logs/wait_healthy2.py >> "$LOG/r5b_gate.log" 2>&1
}

if [ ! -s "$LOG/train1d_prng_ab.csv" ]; then
  if gate; then
    timeout 3600 python -u "$LOG/train1d_prng_ab.py" \
        > "$LOG/train1d_prng_ab.csv.part" 2> "$LOG/train1d_prng_ab.err" \
      && mv "$LOG/train1d_prng_ab.csv.part" "$LOG/train1d_prng_ab.csv"
    echo "[r5b] train1d_prng_ab done rc=$?" >> "$LOG/r5b.log"
  else
    echo "[r5b] gate failed (tunnel never healthy) — A/B NOT run" \
        >> "$LOG/r5b.log"
  fi
fi

# "complete" only when the artifact actually exists — a failed gate or
# measurement must not read as success after a VM restart.
if [ -s "$LOG/train1d_prng_ab.csv" ]; then
  echo "[r5b] complete" >> "$LOG/r5b.log"
else
  echo "[r5b] exiting WITHOUT artifact" >> "$LOG/r5b.log"
fi
