"""Reproduce the docs/VALIDATION.md kernel microbenchmarks on a TPU chip.

Timing methodology (required through the axon tunnel, where
``block_until_ready`` can return before the device queue drains):
*slope method* — wall-clock 22 pipelined iterations and 2, each batch
drained by a host fetch of a scalar checksum; per-iteration cost is
(t22 - t2) / 20, which cancels the one-off dispatch/transfer latency.

Usage:  python examples/analysis/tpu_microbench.py [T H W]
Prints a table comparing the XLA chunked-scan reduction with the Pallas
single-HBM-pass kernel (ops/summary.py).
"""

import functools
import sys
import time

sys.path.append(".")

import jax
import jax.numpy as jnp
import numpy as np

from deepcalcium_tpu.ops.summary import movie_summary, movie_summary_pallas


def slope_time(fn, arg, iters=20):
    """Per-iteration seconds by the slope method (see module docstring)."""

    def drain(x):
        return float(jnp.sum(x[0]))

    drain(fn(arg))  # compile
    drain(fn(arg))  # warm (first-run executable load through the tunnel)
    ts = {}
    for n in (2, 2 + iters):
        tic = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(arg)
        drain(out)
        ts[n] = time.perf_counter() - tic
    return (ts[2 + iters] - ts[2]) / iters


def main():
    t, h, w = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (3000, 512, 512)
    movie = jax.jit(
        lambda k: jax.random.randint(k, (t, h, w), 0, 2000, jnp.int16)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(movie)
    gb = t * h * w * 2 / 2**30

    # Off-TPU the Mosaic kernel cannot lower; run it interpreted so the
    # script still checks correctness (timings are then meaningless).
    interpret = jax.default_backend() != "tpu"
    if interpret:
        print("NOTE: non-TPU backend — Pallas runs in interpret mode; "
              "numbers are not comparable.")

    # Correctness cross-check before timing.
    mp = jax.jit(functools.partial(movie_summary_pallas, interpret=interpret))(movie)
    ms = movie_summary(movie, chunk=250)
    np.testing.assert_allclose(np.asarray(mp[0]), np.asarray(ms[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mp[1]),
                               np.asarray(ms[1]).astype(np.float32))

    print(f"movie ({t}, {h}, {w}) int16 = {gb:.2f} GiB   "
          f"backend={jax.default_backend()}")
    for name, fn in [
        ("xla_scan", lambda m: movie_summary(m, chunk=250)),
        ("pallas", jax.jit(functools.partial(movie_summary_pallas,
                                             interpret=interpret))),
    ]:
        per = slope_time(fn, movie)
        print(f"  {name:10s} {per * 1e3:7.2f} ms/iter   {gb / per:7.1f} GB/s")


if __name__ == "__main__":
    main()
