"""A/B the fused one-draw dropout on the real chip (VERDICT r4 #5).

``blocks.DROPOUT_FUSED_DRAW`` switches the W-packed training forward
between seven per-site ``bernoulli`` draws (one per dropout layer) and
ONE fused random-bits call (``blocks.fused_dropout_masks`` — a single
uint8 stream sliced/thresholded per site; production rates 0.25/0.5 are
exact multiples of 1/256 so the distribution is exactly Bernoulli).
The round-4 residual decomposition (docs/train_residual_r4.csv) puts
dropout at 2.73 ms/step under threefry; the rbg preset recovers the
draw half, leaving ~1.3 ms of mask/fusion residual. This script asks
whether collapsing the seven draws into one kernel (fewer fusion
boundaries in the bwd graph, 4x less random-bit HBM traffic) recovers
more.

Times the full gradient step (forward + backward + Adam + metrics) at
the reference recipe shape through one jitted lax.scan, slope across
scan lengths (cancels tunnel dispatch), for PRNG impl (threefry parity /
rbg preset) x fused flag, W-packed path (the only path with the flag).

Usage: python examples/analysis/dropout_fused_bench.py [--batch 20]
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


def time_config(apply_fn, params, state, impl, k, kmin, xs, ys):
    from deepcalcium_tpu.ops import losses as L
    from deepcalcium_tpu.train import trainer as T

    optimizer = T.make_optimizer(2e-3)
    step = T.make_train_step(apply_fn, L.LOSSES["binary_crossentropy"],
                             optimizer)
    dev = jax.devices()[0]
    p = jax.device_put(params, dev)
    s = jax.device_put(state, dev)
    o = jax.device_put(optimizer.init(params), dev)

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
    key = jax.random.key(7, impl=impl)
    times = {}
    for kk in (kmin, k):
        xs_k, ys_k = xs[:kk], ys[:kk]
        # TWO warm dispatches: the first run of a fresh executable costs
        # ~23 s of remote load through the tunnel (CLAUDE.md).
        float(jnp.sum(fn(p, s, o, key, xs_k, ys_k)))
        float(jnp.sum(fn(p, s, o, key, xs_k, ys_k)))
        tic = time.perf_counter()
        for _ in range(3):
            float(jnp.sum(fn(p, s, o, key, xs_k, ys_k)))
        times[kk] = (time.perf_counter() - tic) / 3
    return (times[k] - times[kmin]) / (k - kmin)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--win", type=int, default=128)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    from deepcalcium_tpu.models import blocks as B
    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.models.unet2d_fast import apply_fast_w_train

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = unet2d.init(jax.random.PRNGKey(0), nfb=32)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal(
        (args.k, args.batch, args.win, args.win)), jnp.float32)
    ys = jnp.asarray(
        (rng.random((args.k, args.batch, args.win, args.win)) < 0.1),
        jnp.float32)

    apply_fn = functools.partial(apply_fast_w_train,
                                 compute_dtype=jnp.bfloat16)
    print("path,prng_impl,fused_draw,ms_per_step", flush=True)
    for impl in ("threefry2x32", "rbg"):
        for flag in (False, True):
            B.DROPOUT_FUSED_DRAW = flag  # trace-time knob
            try:
                dt = time_config(apply_fn, params, state, impl,
                                 args.k, 2, xs, ys)
            finally:
                B.DROPOUT_FUSED_DRAW = False
            print(f"w_packed,{impl},{int(flag)},{dt*1e3:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
