#!/bin/bash
# Post-search measurement queue (session h): runs AFTER search_r4.sh
# finishes so only one process owns the TPU at a time.
#   1. dropout_remat_bench — A/B the dropout backward form (residual vs
#      key-remat custom_vjp) on both train paths x both PRNG impls.
#   2. Fresh authoritative train_layer_bench run with the runtime-args
#      LoopTimer (retires the constant-baking provenance caveat on the
#      committed r4/r4b CSVs — docs/VALIDATION.md §Round 4).
# Each stage is health-gated, timeout-bounded, resume/skip-safe.
#
# Relaunch after any restart:
#   nohup bash .round4_logs/post_search_queue.sh > .round4_logs/postq_nohup.out 2>&1 &
cd /root/repo || exit 1
LOG=.round4_logs

# Wait for the search queue to finish: poll its PID (written by the
# relaunch one-liner to /tmp/search_r4.pid) — exit of that process means
# done OR killed; either way the TPU is free. If the pid file is missing
# (post-restart), proceed immediately.
for i in $(seq 1 600); do
  pid=$(cat /tmp/search_r4.pid 2>/dev/null)
  if [ -z "$pid" ] || [ ! -d "/proc/$pid" ]; then
    echo "[postq] search finished/absent (pid=${pid:-none})" >> "$LOG/postq.log"
    break
  fi
  sleep 60
done

# Stage 0 (cheap, ~2 min): does the JAX persistent compilation cache
# work through the axon PJRT plugin? If yes, future relaunches can skip
# the 100-500 s/shape recompiles that dominate every VM-restart recovery.
if [ ! -f "$LOG/compile_cache_probe.txt" ]; then
  python .round3_logs/wait_healthy2.py >> "$LOG/postq.log" 2>&1 || exit 1
  for pass in 1 2; do
    timeout 600 python - >> "$LOG/compile_cache_probe.txt" 2>&1 <<'PYEOF'
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
x = jnp.asarray(np.random.rand(512, 512), jnp.float32)
f = jax.jit(lambda v: jnp.tanh(v @ v.T).sum() * 1.00042)  # unusual graph
t0 = time.time()
float(f(x))
print(f"first-call (compile+load) {time.time()-t0:.2f}s on "
      f"{jax.devices()[0].platform}", flush=True)
PYEOF
  done
  echo "[postq] compile_cache probe done" >> "$LOG/postq.log"
fi

# Quick pass first (W-packed production path only, 4 configs) — it alone
# decides the DROPOUT_REMAT_BWD default; the parity-path rows are a
# completeness follow-up ("full" stage below).
if [ ! -f "$LOG/dropout_remat.csv" ]; then
  python .round3_logs/wait_healthy2.py >> "$LOG/postq.log" 2>&1 || exit 1
  timeout 3600 python examples/analysis/dropout_remat_bench.py --quick \
      > "$LOG/dropout_remat.csv.tmp" 2> "$LOG/dropout_remat.err" \
    && mv "$LOG/dropout_remat.csv.tmp" "$LOG/dropout_remat.csv"
  echo "[postq] dropout_remat quick done rc=$?" >> "$LOG/postq.log"
fi
if [ ! -f "$LOG/dropout_remat_full.csv" ]; then
  python .round3_logs/wait_healthy2.py >> "$LOG/postq.log" 2>&1 || exit 1
  timeout 5400 python examples/analysis/dropout_remat_bench.py \
      > "$LOG/dropout_remat_full.csv.tmp" 2> "$LOG/dropout_remat_full.err" \
    && mv "$LOG/dropout_remat_full.csv.tmp" "$LOG/dropout_remat_full.csv"
  echo "[postq] dropout_remat full done rc=$?" >> "$LOG/postq.log"
fi

if [ ! -f docs/train_layer_bench_r4c.csv.done ]; then
  for i in 1 2 3; do
    python .round3_logs/wait_healthy2.py >> "$LOG/postq.log" 2>&1 || exit 1
    timeout 5400 python examples/analysis/train_layer_bench.py \
        --csv docs/train_layer_bench_r4c.csv --resume \
        >> "$LOG/tlb_r4c.log" 2>&1
    rc=$?
    echo "[postq] tlb_r4c pass $i rc=$rc" >> "$LOG/postq.log"
    if [ "$rc" -eq 0 ]; then touch docs/train_layer_bench_r4c.csv.done; break; fi
  done
fi
echo "[postq] complete" >> "$LOG/postq.log"
