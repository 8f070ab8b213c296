"""Training-throughput levers: batch scaling, PRNG impl, BN-stat dtype.

The round-2 verdict noted training MFU (~13% at the reference recipe,
batch 20 @ 128² bf16 W-packed) sits at half the eval figure with no
roofline argument on record (VERDICT r2 weak #3). This script measures the
three known unexplored levers on the real chip:

1. batch 20 -> 32 -> 64 -> 128 (at fixed 128² window): larger batches
   amortize per-step fixed costs and deepen the MXU pipelines;
2. threefry vs rbg dropout PRNG (fit(prng_impl=...) knob): the counter-
   based generator vectorizes on the VPU (~0.9 ms/step at batch 20 in the
   round-2 profile) — measured here as threefry-vs-rbg step delta;
3. BN batch stats in f32 (Keras-faithful default) vs compute-dtype bf16
   (blocks.BN_STATS_F32 knob): the f32 upcast materializes a float copy of
   every activation just to reduce it.

All timings: slope method across lax.scan lengths (cancels tunnel
dispatch+fetch latency; train_step_ab_bench.py methodology). MFU = analytic
3x-forward conv FLOPs / measured step time / 197 TFLOP/s (v5e bf16 peak).

Usage: python examples/analysis/train_mfu_sweep.py [--k 12]
"""

import argparse
import functools
import sys

sys.path.append(".")

import jax

from deepcalcium_tpu.utils.benchtools import (enable_compile_cache,
                                              slope_train_step_time)

# Persist compiled executables across runs (remote compiles cost minutes).
enable_compile_cache()
import jax.numpy as jnp

PEAK_TFLOPS = 197.0


def report(tag, dt, batch, win):
    from deepcalcium_tpu.models import unet2d

    flops = 3 * batch * unet2d.forward_flops(win, win, nfb=32)
    tfl = flops / dt / 1e12
    print(f"{tag:44s} {dt*1e3:7.2f} ms/step  {batch/dt:7.0f} win/s  "
          f"{tfl:5.1f} TFLOP/s  MFU {tfl/PEAK_TFLOPS:6.1%}", flush=True)
    return tfl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--win", type=int, default=128)
    ap.add_argument("--batches", type=int, nargs="*", default=[20, 32, 64, 128],
                    help="batch sizes for the scaling section (shrink for "
                    "large --win: same-pixel equivalents of the 128² row)")
    ap.add_argument("--skip-ablations", action="store_true",
                    help="only run the batch-scaling section")
    args = ap.parse_args()

    from deepcalcium_tpu.models import blocks
    from deepcalcium_tpu.models.unet2d_fast import apply_fast_w_train

    fast = functools.partial(apply_fast_w_train, compute_dtype=jnp.bfloat16)

    print(f"== batch scaling (W-packed, drp=0.25, threefry, win {args.win}) ==")
    for batch in args.batches:
        dt = slope_train_step_time(fast, batch, args.win, k=args.k)
        report(f"batch {batch} win {args.win}", dt, batch, args.win)
    if args.skip_ablations:
        return

    print("== PRNG impl at batch 20 and 64 ==")
    for batch in (20, 64):
        for impl in ("threefry2x32", "rbg"):
            dt = slope_train_step_time(fast, batch, args.win, k=args.k,
                                       rng_impl=impl)
            report(f"batch {batch} {impl}", dt, batch, args.win)

    print("== BN stats dtype (batch 64, threefry) ==")
    for f32 in (True, False):
        blocks.BN_STATS_F32 = f32
        try:
            # Fresh partial -> fresh trace -> picks up the knob.
            fast2 = functools.partial(apply_fast_w_train,
                                      compute_dtype=jnp.bfloat16)
            dt = slope_train_step_time(fast2, 64, args.win, k=args.k)
            report(f"BN stats {'f32' if f32 else 'bf16'}", dt, 64, args.win)
        finally:
            blocks.BN_STATS_F32 = True

    print("== dropout off (drp=0, batch 64) — upper bound of PRNG+mask ==")
    fast0 = functools.partial(apply_fast_w_train, compute_dtype=jnp.bfloat16,
                              drp=0.0)
    dt = slope_train_step_time(fast0, 64, args.win, k=args.k)
    report("drp=0", dt, 64, args.win)


if __name__ == "__main__":
    main()
