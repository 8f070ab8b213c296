"""Benchmark: end-to-end evaluate throughput on one TPU chip.

Measures the reference's headline pipeline (BASELINE.md: ingest TIFFs +
summarize + predict at 8,057 frames/min ≈ 134.3 fps on the author's
workstation): here, a synthetic 3000-frame 512x512 movie is (a) reduced to
mean/max summary images on device, (b) z-normalized, and (c) segmented by
UNet2DS with full 8x TTA in bfloat16 — the complete evaluate path after TIFF
decode. Steady-state wall-clock (one warm-up iteration excluded, jit cache
warm), mirroring how the reference number excludes its model build.

Prints ONE JSON line:
    {"metric": "e2e_eval_frames_per_sec", "value": N, "unit": "frames/s",
     "vs_baseline": N / 134.28}
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 8057.0 / 60.0  # reference: 8,057 frames/min end-to-end


def main():
    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.ops.augment import tta_collapse, tta_expand
    from deepcalcium_tpu.ops.summary import movie_summary

    t, h, w = 3000, 512, 512
    rng = np.random.default_rng(0)
    movie = rng.integers(0, 2000, size=(t, h, w), dtype=np.int16)

    params, state = unet2d.init(jax.random.PRNGKey(0), nfb=32)

    @jax.jit
    def evaluate(movie_dev):
        mean, _ = movie_summary(movie_dev, chunk=250)
        z = (mean - jnp.mean(mean)) / jnp.std(mean)
        views = tta_expand(z[None])                      # (8, 1, 512, 512)
        flat = views.reshape(8, h, w)
        probs, _ = unet2d.apply(params, state, flat, train=False,
                                compute_dtype=jnp.bfloat16)
        merged = tta_collapse(probs.reshape(8, 1, h, w))
        return (merged[0] > 0.5).astype(jnp.uint8)

    movie_dev = jax.device_put(movie)
    # Warm-up (compile) excluded from timing.
    jax.block_until_ready(evaluate(movie_dev))

    iters = 5
    tic = time.perf_counter()
    for _ in range(iters):
        out = evaluate(movie_dev)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - tic) / iters

    fps = t / dt
    print(json.dumps({
        "metric": "e2e_eval_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
