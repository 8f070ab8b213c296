"""Per-block forward-vs-backward roofline profile of the W-packed TRAINING
step at the reference recipe geometry (batch 20 @ 128s, bf16, nfb=32).

Answers the question the aggregate train-MFU number (13-18%,
docs/VALIDATION.md round 3) can't: WHICH blocks' backward passes are
expensive, and is each at its hardware floor?

For every distinct conv block of ``apply_fast_w_train`` (packed W4@L0 /
W2@L1 + the standard-layout deep levels — models/unet2d_fast.py:501) it
times, in isolation behind one jit each:

- ``fwd``:    conv(+relu) forward;
- ``f+bwd``:  ``value_and_grad`` of sum(fn) w.r.t. (x, kernel) — the
  forward plus BOTH backward convs (input-grad and weight-grad), i.e. the
  3x-FLOP unit the analytic train accounting assumes.

and reports the measured f+bwd/fwd ratio against the 3.0 analytic, plus
achieved TFLOP/s per pass. A ratio >> 3 marks a block whose backward
shapes tile the MXU worse than its forward (the weight-grad conv of a
cin-thin layer contracts into a (3, 3, cin, cout) output — at cin=4 the
MXU runs at 4/128 lane utilization no matter the schedule).

Aux rows: grouped-BN statistics (bn_grouped), the packed dropout mask
draw (threefry vs rbg), and the up0 einsum, timed the same way.

Timing: slope method (pipelined 22-vs-2 iterations drained by a scalar
host fetch) — required through the axon tunnel (docs/VALIDATION.md
"Timing gotchas").

Usage: python examples/analysis/train_layer_bench.py [--csv out.csv]
       [--batch 20] [--win 128] [--smoke]  (--smoke: tiny shapes, CPU ok)
"""

import argparse
import os
import sys

sys.path.append(".")
sys.path.append(os.path.dirname(os.path.abspath(__file__)))

import jax

from deepcalcium_tpu.utils.benchtools import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from slope_timing import slope_time  # noqa: E402 (shared tunnel-safe timer)

PEAK_TFLOPS = 197e12  # v5e bf16


_DN = ("NHWC", "HWIO", "NHWC")


def conv_rows(batch, win):
    """(name, x_shape, k_shape) for every distinct conv of the W-packed
    training forward at (batch, win, win), nfb=32. Packed levels carry the
    PACKED shapes (the MXU's actual work); deep levels the standard ones."""
    b = batch
    rows = [
        # Level 0: W4 packing — width win/4, channels x4.
        ("enc0a_w4", (b, win, win // 4, 4), (3, 3, 4, 128)),
        ("enc0b_w4", (b, win, win // 4, 128), (3, 3, 128, 128)),
        ("dec0a_w4", (b, win, win // 4, 128), (3, 3, 128, 128)),
        # Level 1: W2 packing.
        ("enc1a_w2", (b, win // 2, win // 4, 64), (3, 3, 64, 128)),
        ("enc1b_w2", (b, win // 2, win // 4, 128), (3, 3, 128, 128)),
        # Levels 2+: standard layout.
        ("enc2a", (b, win // 4, win // 4, 64), (3, 3, 64, 128)),
        ("enc2b", (b, win // 4, win // 4, 128), (3, 3, 128, 128)),
        ("enc3a", (b, win // 8, win // 8, 128), (3, 3, 128, 256)),
        ("enc3b", (b, win // 8, win // 8, 256), (3, 3, 256, 256)),
        ("mida", (b, win // 16, win // 16, 256), (3, 3, 256, 512)),
        ("midb", (b, win // 16, win // 16, 512), (3, 3, 512, 512)),
        ("dec3a", (b, win // 8, win // 8, 512), (3, 3, 512, 256)),
        ("dec2a", (b, win // 4, win // 4, 256), (3, 3, 256, 128)),
    ]
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--win", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + 2 iters (CPU correctness drive)")
    args = ap.parse_args()
    if args.smoke:
        args.batch, args.win, args.iters = 2, 32, 2

    rng = np.random.default_rng(0)

    def arr(shape, dt=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape), dt)

    lines = [("block", "fwd_ms", "fbwd_ms", "ratio",
              "fwd_tflops", "bwd_tflops", "fwd_roof_ms", "note")]

    def conv_fn(x, k):
        return jax.nn.relu(jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=_DN))

    fwd = jax.jit(conv_fn)
    fbwd = jax.jit(jax.value_and_grad(
        lambda x, k: jnp.sum(conv_fn(x, k).astype(jnp.float32)),
        argnums=(0, 1)))

    for name, xs, ks in conv_rows(args.batch, args.win):
        x, k = arr(xs), arr(ks)
        t_f = slope_time(fwd, (x, k), args.iters)
        t_fb = slope_time(fbwd, (x, k), args.iters)
        m = xs[0] * xs[1] * xs[2]
        fl = 2 * m * ks[0] * ks[1] * ks[2] * ks[3]
        # Forward roofline: MXU lane padding on thin cin/cout.
        lane = min(ks[3], 128) / 128 * min(max(ks[2], 8), 128) / 128
        roof = fl / (PEAK_TFLOPS * lane)
        note = ""
        if ks[2] < 32:
            note = f"weight-grad lane floor cin={ks[2]}"
        lines.append((name, f"{t_f * 1e3:.3f}", f"{t_fb * 1e3:.3f}",
                      f"{t_fb / t_f:.2f}",
                      f"{fl / t_f / 1e12:.1f}",
                      f"{2 * fl / max(t_fb - t_f, 1e-9) / 1e12:.1f}",
                      f"{roof * 1e3:.3f}", note))
        print(" | ".join(lines[-1]), flush=True)

    # --- Aux: grouped BN statistics at the largest packed activation.
    from deepcalcium_tpu.models import blocks as B

    y = arr((args.batch, args.win, args.win // 4, 128))
    gamma = jnp.ones((32,), jnp.float32)
    beta = jnp.zeros((32,), jnp.float32)

    def bn_stats(yy):
        y5 = yy.astype(jnp.float32).reshape(*yy.shape[:-1], 4, 32)
        mean = jnp.mean(y5, axis=(0, 1, 2, 3))
        var = jnp.var(y5, axis=(0, 1, 2, 3))
        inv = jax.lax.rsqrt(var + B.BN_EPS) * gamma
        return ((yy - jnp.tile(mean, 4).astype(yy.dtype))
                * jnp.tile(inv, 4).astype(yy.dtype)
                + jnp.tile(beta, 4).astype(yy.dtype))

    t_f = slope_time(jax.jit(bn_stats), (y,), args.iters)
    t_fb = slope_time(jax.jit(jax.value_and_grad(
        lambda yy: jnp.sum(bn_stats(yy).astype(jnp.float32)))), (y,),
        args.iters)
    lines.append(("bn_grouped@L0", f"{t_f * 1e3:.3f}", f"{t_fb * 1e3:.3f}",
                  f"{t_fb / t_f:.2f}", "-", "-", "-", "batch-stat BN"))
    print(" | ".join(lines[-1]), flush=True)

    # --- Aux: dropout mask draw in packed layout, threefry vs rbg.
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)

        def draw(k2):
            return jax.random.bernoulli(
                k2, 0.75, (args.batch, args.win, args.win // 4, 128))

        t = slope_time(jax.jit(draw), (key,), args.iters)
        lines.append((f"dropout_mask {impl}", f"{t * 1e3:.3f}", "-", "-",
                      "-", "-", "-", "per L0-sized mask"))
        print(" | ".join(lines[-1]), flush=True)

    if args.csv:
        with open(args.csv, "w") as fp:
            for row in lines:
                fp.write(",".join(row) + "\n")
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
