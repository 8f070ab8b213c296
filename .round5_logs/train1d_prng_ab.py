"""A/B: 1-D spike train step, threefry vs rbg dropout PRNG (round 5).

The 1-D trace profile (docs/train1d_step_profile_r5.csv) shows the top
four ops are threefry-consuming dropout-mask kLoop fusions (~0.61 ms of
the 6.47 ms step); the 2-D step's rbg switch saved 15%. Interleaved
reps like bench.py's 2-D guard."""
import sys
sys.path.append(".")
from deepcalcium_tpu.utils.benchtools import slope_train1d_step_time

for rep in range(2):
    for impl in ("threefry2x32", "rbg"):
        dt = slope_train1d_step_time(20, 4096, k=12, kmin=2, reps=2,
                                     rng_impl=impl)
        print(f"rep{rep},{impl},{dt*1e3:.3f}", flush=True)
