"""Quantify the train-loop wall/device gap and the K-step-scan fix.

Round-1 finding (docs/VALIDATION.md): ~63 ms/step wall vs ~2 ms/step device
time at the reference recipe (batch 20, 128^2) — a ~30x gap through the
tunnel's per-dispatch latency. This script measures, at the same recipe:

1. sampler throughput (1-core Python WindowSampler.sample_batch),
2. device-only step time (slope method on a resident batch),
3. end-to-end wall per step for K = 1 / 4 / 16 steps-per-dispatch using the
   production fit machinery (make_train_step / make_multi_step + Prefetcher
   with stacked batches).

Usage: python examples/analysis/dispatch_gap_bench.py
"""

import functools
import sys
import time

sys.path.append(".")

import jax
import jax.numpy as jnp
import numpy as np

from deepcalcium_tpu.models import unet2d
from deepcalcium_tpu.ops import losses as L
from deepcalcium_tpu.train import trainer as T
from deepcalcium_tpu.train.sampler import Prefetcher, WindowSampler

BATCH, WIN, STEPS = 20, 128, 96


def main():
    rng = np.random.default_rng(0)
    # Synthetic 512^2 dataset summary/mask pair for the sampler.
    S = [rng.standard_normal((512, 512)).astype(np.float32)]
    M = [(rng.random((512, 512)) < 0.05).astype(np.uint8)]
    sampler = WindowSampler(S, M, ["bench"], [(0, 384)], (WIN, WIN),
                            nb_max_augment=15, seed=0)

    tic = time.perf_counter()
    for _ in range(30):
        sampler.sample_batch(BATCH)
    samp = (time.perf_counter() - tic) / 30
    print(f"sampler: {samp*1e3:.1f} ms/batch "
          f"({BATCH/samp:.0f} windows/s on 1 core)")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params0, state0 = unet2d.init(jax.random.PRNGKey(0), nfb=32)
    dev = jax.devices()[0]
    apply_fn = functools.partial(unet2d.apply, compute_dtype=jnp.bfloat16)
    opt = T.make_optimizer(2e-3)

    # Device-only step time (resident batch, slope method).
    params = jax.device_put(params0, dev)
    state = jax.device_put(state0, dev)
    opt_state = opt.init(params)
    step = T.make_train_step(apply_fn, L.LOSSES["binary_crossentropy"], opt)
    xb = jax.device_put(rng.standard_normal((BATCH, WIN, WIN)).astype(np.float32))
    yb = jax.device_put((rng.random((BATCH, WIN, WIN)) > 0.9).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def run_n(n):
        nonlocal params, state, opt_state, key
        tic = time.perf_counter()
        met = None
        for _ in range(n):
            key, sub = jax.random.split(key)
            params, state, opt_state, met = step(params, state, opt_state,
                                                 xb, yb, sub)
        float(met["loss"])  # drain
        return time.perf_counter() - tic

    run_n(1)  # compile
    run_n(1)  # first-run executable load through the tunnel (~23 s)
    dt_dev = (run_n(22) - run_n(2)) / 20
    print(f"device step (slope): {dt_dev*1e3:.2f} ms/step")

    # End-to-end wall per step at K steps/dispatch through the real
    # prefetch pipeline.
    for k in (1, 4, 16):
        params = jax.device_put(params0, dev)
        state = jax.device_put(state0, dev)
        opt_state = opt.init(params)
        if k == 1:
            stepk = step
            gen = sampler.batches(BATCH)
        else:
            stepk = T.make_multi_step(apply_fn,
                                      L.LOSSES["binary_crossentropy"],
                                      opt, k)

            def stacked(gen=sampler.batches(BATCH), k=k):
                while True:
                    bs = [next(gen) for _ in range(k)]
                    yield (np.stack([b[0] for b in bs]),
                           np.stack([b[1] for b in bs]))

            gen = stacked()
        # Transfer on the producer thread (what fit does): overlaps the
        # ~10 ms/step host->device copy with the previous step's compute.
        prefetch = Prefetcher(
            gen, put_fn=lambda b: tuple(jax.device_put(a) for a in b),
            depth=3)
        key = jax.random.PRNGKey(1)
        met = None
        # TWO warm-up dispatches: the first pays compile, the second pays
        # the tunnel's first-run executable load (~23 s measured) — both
        # must stay out of the steady-state timing.
        for _ in range(2):
            sb, mb = next(prefetch)
            key, sub = jax.random.split(key)
            if k == 1:
                params, state, opt_state, met = stepk(
                    params, state, opt_state, sb, mb, sub)
            else:
                params, state, opt_state, _, met = stepk(
                    params, state, opt_state, None, sb, mb, sub)
            float(met["loss"] if k == 1 else met["loss"][-1])
        tic = time.perf_counter()
        for _ in range(STEPS // k):
            sb, mb = next(prefetch)
            key, sub = jax.random.split(key)
            if k == 1:
                params, state, opt_state, met = stepk(
                    params, state, opt_state, sb, mb, sub)
            else:
                params, state, opt_state, _, met = stepk(
                    params, state, opt_state, None, sb, mb, sub)
        lastloss = float(met["loss"] if k == 1 else met["loss"][-1])  # drain
        wall = (time.perf_counter() - tic) / STEPS
        prefetch.close()
        print(f"K={k:2d}: {wall*1e3:7.2f} ms/step wall  "
              f"(wall/device = {wall/dt_dev:4.1f}x, loss={lastloss:.3f})")


if __name__ == "__main__":
    main()
