"""A/B the dropout backward form on the real chip: residual vs remat.

``blocks.DROPOUT_REMAT_BWD`` switches dropout between the plain form
(AD saves the mask as a residual across the fwd/bwd boundary) and a
custom_vjp whose backward REDRAWS the mask from the key (residual = the
key, a few words). Values and gradients are bitwise-identical
(tests/test_unet2d.py::test_dropout_remat_bwd_bitwise_equal); only the
HLO handed to XLA changes. The composite residual decomposition
(docs/train_residual_r4.csv) attributes 2.73 ms/step to dropout while
its isolated parts (draws + applies) sum to ~0.3 ms — this script asks
whether the residual *storage/fusion* form is the difference.

Times the full gradient step (forward + backward + Adam + metrics) at
the reference recipe shape through one jitted lax.scan, slope across
scan lengths (cancels tunnel dispatch), for every combination of
  forward path x PRNG impl (threefry parity / rbg preset) x remat flag.

Usage: python examples/analysis/dropout_remat_bench.py [--batch 20]
       [--win 128] [--k 20] [--quick]   (--quick: W-packed path only)
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
    ap.add_argument("--quick", action="store_true",
                    help="W-packed path only (4 configs, 4 compiles)")
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

    paths = [("w_packed", apply_fast_w_train)]
    if not args.quick:
        paths.append(("parity", unet2d.apply))

    print("path,prng_impl,remat_bwd,ms_per_step", flush=True)
    for pname, f in paths:
        apply_fn = functools.partial(f, compute_dtype=jnp.bfloat16)
        for impl in ("threefry2x32", "rbg"):
            for flag in (False, True):
                B.DROPOUT_REMAT_BWD = flag  # trace-time knob
                try:
                    dt = time_config(apply_fn, params, state, impl,
                                     args.k, 2, xs, ys)
                finally:
                    B.DROPOUT_REMAT_BWD = False
                print(f"{pname},{impl},{int(flag)},{dt*1e3:.3f}",
                      flush=True)


if __name__ == "__main__":
    main()
