"""A/B the train step on the real chip: parity forward vs W-packed.

Measures the full gradient step (forward + backward + Adam + metrics) at
the reference recipe shape (batch 20 @ 128², bf16) through ONE jitted
lax.scan of K steps (device time dominates; the scan amortizes tunnel
dispatch), for:

  - unet2d.apply            (parity forward)
  - apply_fast_w_train      (W-packed forward, live grouped BN)

Usage: python examples/analysis/train_step_ab_bench.py [--batch 20]
       [--win 128] [--k 20]
"""

import argparse
import functools
import sys
import time

sys.path.append(".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--win", type=int, default=128)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.models.unet2d_fast import apply_fast_w_train
    from deepcalcium_tpu.ops import losses as L
    from deepcalcium_tpu.train import trainer as T

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = unet2d.init(jax.random.PRNGKey(0), nfb=32)
    dev = jax.devices()[0]

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal(
        (args.k, args.batch, args.win, args.win)), jnp.float32)
    ys = jnp.asarray(
        (rng.random((args.k, args.batch, args.win, args.win)) < 0.1),
        jnp.float32)

    for name, f in [("unet2d.apply", unet2d.apply),
                    ("apply_fast_w_train", apply_fast_w_train)]:
        apply_fn = functools.partial(f, compute_dtype=jnp.bfloat16)
        optimizer = T.make_optimizer(2e-3)
        step = T.make_train_step(apply_fn, L.LOSSES["binary_crossentropy"],
                                 optimizer)
        p = jax.device_put(params, dev)
        s = jax.device_put(state, dev)
        o = jax.device_put(optimizer.init(params), dev)

        # Device time per step by the slope method ACROSS SCAN LENGTHS:
        # t(K) - t(Kmin) cancels the constant dispatch+fetch latency of the
        # tunnel (measured ~300 ms/dispatch, which swamps the device delta
        # at any single K).
        kmin = 2

        def scan_steps(p, s, o, key, xs_k, ys_k):
            def body(carry, xy):
                p, s, o, key = carry
                key, sub = jax.random.split(key)
                x, y = xy
                p, s, o, logs = step(p, s, o, x, y, sub)
                return (p, s, o, key), logs["loss"]

            (p, s, o, _), losses = jax.lax.scan(
                body, (p, s, o, key), (xs_k, ys_k))
            return losses

        fn = jax.jit(scan_steps)
        times = {}
        for k in (kmin, args.k):
            xs_k, ys_k = xs[:k], ys[:k]
            float(jnp.sum(fn(p, s, o, jax.random.PRNGKey(7), xs_k, ys_k)))
            float(jnp.sum(fn(p, s, o, jax.random.PRNGKey(7), xs_k, ys_k)))
            tic = time.perf_counter()
            for _ in range(3):
                float(jnp.sum(fn(p, s, o, jax.random.PRNGKey(7), xs_k,
                                 ys_k)))
            times[k] = (time.perf_counter() - tic) / 3
        dt = (times[args.k] - times[kmin]) / (args.k - kmin)
        print(f"{name:22s} {dt*1e3:7.2f} ms/step device "
              f"({args.batch/dt:7.0f} windows/s); "
              f"wall at K={args.k}: {times[args.k]/args.k*1e3:.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
