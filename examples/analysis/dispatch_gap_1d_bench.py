"""Quantify the 1-D (spike) train-loop wall/device gap and the K-step fix.

Mirror of ``dispatch_gap_bench.py`` for the UNet1D fit, which in round 3
received the same dispatch-gap machinery as the 2-D loop (VERDICT r2 weak
#2): ``Prefetcher`` with transfer-on-producer-thread and
``fit(steps_per_dispatch=K)``. Measures, at the reference 1-D recipe
(batch 20 windows of 4096 samples, wbce(pos=2), margin 4, bf16):

1. device-only step time (slope method over chained donated steps),
2. end-to-end wall per step at K = 1 / 4 / 8 through the production
   machinery (make_train_step / make_multi_step + Prefetcher over the
   model's own ``_batch_gen``).

Usage: python examples/analysis/dispatch_gap_1d_bench.py
"""

import functools
import sys
import time

sys.path.append(".")

import jax

from deepcalcium_tpu.utils.benchtools import enable_compile_cache

# Persist compiled executables across runs (remote compiles cost minutes).
enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from deepcalcium_tpu.models import unet1d
from deepcalcium_tpu.models.unet_1d_segmentation import UNet1DSegmentation
from deepcalcium_tpu.ops import losses as L
from deepcalcium_tpu.train import trainer as T
from deepcalcium_tpu.train.sampler import Prefetcher, stack_batches

BATCH, WLEN, STEPS, MARGIN = 20, 4096, 96, 4


def main():
    rng = np.random.default_rng(0)
    # Synthetic trace corpus at St.-Jude-like scale for the generator.
    nb_traces, tlen = 120, 12000
    spikes = (rng.random((nb_traces, tlen)) < 0.01).astype(np.float32)
    kernel = np.exp(-np.arange(40) / 8.0)
    traces = [np.convolve(s, kernel)[:tlen] * 3.0
              + rng.standard_normal(tlen) * 0.15 for s in spikes]
    traces = [((t - t.mean()) / t.std()).astype(np.float32) for t in traces]
    spikes = [s for s in spikes]

    model = UNet1DSegmentation(compute_dtype=jnp.bfloat16)
    gen0 = model._batch_gen(traces, spikes, (WLEN,), BATCH, MARGIN, 0)
    next(gen0)  # first call compiles the margin-pool jit — not generator cost
    tic = time.perf_counter()
    for _ in range(30):
        next(gen0)
    samp = (time.perf_counter() - tic) / 30
    print(f"generator: {samp*1e3:.1f} ms/batch "
          f"({BATCH/samp:.0f} windows/s on 1 core)")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params0, state0 = unet1d.init(jax.random.PRNGKey(0))
    dev = jax.devices()[0]
    apply_fn = functools.partial(unet1d.apply, margin=MARGIN,
                                 compute_dtype=jnp.bfloat16)
    loss_fn = functools.partial(L.weighted_binary_crossentropy, weightpos=2.0)
    opt = T.make_optimizer(2e-3)

    params = jax.device_put(params0, dev)
    state = jax.device_put(state0, dev)
    opt_state = opt.init(params)
    step = T.make_train_step(apply_fn, loss_fn, opt,
                             metric_fns=dict(L.SPIKE_METRICS))
    xb, yb = next(gen0)
    xb, yb = jax.device_put(xb), jax.device_put(yb)
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
    run_n(1)  # tunnel first-run executable load
    dt_dev = (run_n(22) - run_n(2)) / 20
    print(f"device step (slope): {dt_dev*1e3:.2f} ms/step")

    for k in (1, 4, 8):
        params = jax.device_put(params0, dev)
        state = jax.device_put(state0, dev)
        opt_state = opt.init(params)
        if k == 1:
            stepk = step
            gen = model._batch_gen(traces, spikes, (WLEN,), BATCH, MARGIN, 1)
        else:
            stepk = T.make_multi_step(apply_fn, loss_fn, opt, k,
                                      metric_fns=dict(L.SPIKE_METRICS))
            gen = stack_batches(
                model._batch_gen(traces, spikes, (WLEN,), BATCH, MARGIN, 1),
                k)
        prefetch = Prefetcher(
            gen, put_fn=lambda b: tuple(jax.device_put(a) for a in b),
            depth=3)
        key = jax.random.PRNGKey(1)
        met = None
        for _ in range(2):  # compile + first-run load
            tb, sb = next(prefetch)
            key, sub = jax.random.split(key)
            if k == 1:
                params, state, opt_state, met = stepk(
                    params, state, opt_state, tb, sb, sub)
            else:
                params, state, opt_state, _, met = stepk(
                    params, state, opt_state, None, tb, sb, sub)
            float(met["loss"] if k == 1 else met["loss"][-1])
        tic = time.perf_counter()
        for _ in range(STEPS // k):
            tb, sb = next(prefetch)
            key, sub = jax.random.split(key)
            if k == 1:
                params, state, opt_state, met = stepk(
                    params, state, opt_state, tb, sb, sub)
            else:
                params, state, opt_state, _, met = stepk(
                    params, state, opt_state, None, tb, sb, sub)
        lastloss = float(met["loss"] if k == 1 else met["loss"][-1])  # drain
        wall = (time.perf_counter() - tic) / STEPS
        prefetch.close()
        print(f"K={k:2d}: {wall*1e3:7.2f} ms/step wall  "
              f"(wall/device = {wall/dt_dev:4.1f}x, loss={lastloss:.3f})")


if __name__ == "__main__":
    main()
