#!/bin/bash
# Round-5 post-search measurement queue (VERDICT r4 #2/#5): waits for the
# running search chain (search_r4.sh, PID in /tmp/search_r4.pid) to
# finish, then runs, each stage health-gated, resumable (skipped if its
# artifact already exists):
#   1. dropout_fused_bench      — one-draw dropout A/B (4 configs)
#   2. train_step_profile (rbg) — trace-derived seam table, baseline
#   3. train_step_profile --fused-dropout (if the A/B doesn't lose)
#   4. bench.py preview         — healthy-window capture with the
#      interleaved preset guard
# Relaunch after any restart:
#   nohup bash .round5_logs/post_search_queue.sh > .round5_logs/postq_nohup.out 2>&1 &
cd /root/repo || exit 1
LOG=.round5_logs
mkdir -p "$LOG"

# Wait (up to 6 h) while the search chain owns the TPU.
for i in $(seq 1 360); do
  pid=$(cat /tmp/search_r4.pid 2>/dev/null)
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then break; fi
  sleep 60
done
echo "[postq] search chain gone (or wait expired), starting" >> "$LOG/postq.log"

gate() {
  python .round3_logs/wait_healthy2.py >> "$LOG/postq_gate.log" 2>&1
}

if [ ! -s "$LOG/dropout_fused.csv" ]; then
  gate && timeout 3600 python examples/analysis/dropout_fused_bench.py \
      > "$LOG/dropout_fused.csv.part" 2> "$LOG/dropout_fused.err" \
    && mv "$LOG/dropout_fused.csv.part" "$LOG/dropout_fused.csv"
  echo "[postq] dropout_fused done rc=$?" >> "$LOG/postq.log"
fi

if [ ! -s docs/train_step_profile_r5.csv ]; then
  gate && timeout 3600 python examples/analysis/train_step_profile.py \
      --prng rbg --csv docs/train_step_profile_r5.csv \
      --logdir "$LOG/profile_base" \
      > "$LOG/profile_base.out" 2> "$LOG/profile_base.err"
  echo "[postq] profile_base done rc=$?" >> "$LOG/postq.log"
fi

# (stage 3, profiling --fused-dropout, was dropped: the A/B in
# dropout_fused.csv showed the fused draw LOSES — threefry 11.12->14.26,
# rbg 9.42->9.63 ms/step — so there is nothing to profile.)

if [ ! -s "$LOG/bench_r5_preview.json" ]; then
  gate && timeout 5400 python bench.py \
      > "$LOG/bench_r5_preview.json.part" 2> "$LOG/bench_r5.err" \
    && mv "$LOG/bench_r5_preview.json.part" "$LOG/bench_r5_preview.json"
  echo "[postq] bench preview done rc=$?" >> "$LOG/postq.log"
fi

echo "[postq] complete" >> "$LOG/postq.log"
