"""Tunnel-safe device timing shared by the analysis benchmarks.

Two gotchas this helper encodes (docs/VALIDATION.md, CLAUDE.md):

- ``block_until_ready`` can return before the tunnel's device queue drains;
  reliable timing forces a HOST FETCH of a scalar reduced from the output.
- A compiled executable's FIRST run through the tunnel costs ~23 s (remote
  load, distinct from compile), so warm up with TWO dispatches.
- Constant dispatch/fetch latency (~30 ms+) is cancelled by the slope
  method: time N+k vs k pipelined iterations and divide the difference.
"""

import time

import jax
import jax.numpy as jnp


def drain(out) -> float:
    """Force a host fetch of a scalar checksum — drains the device queue."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def slope_time(fn, args, iters: int = 20) -> float:
    """Seconds per call of ``fn(*args)`` in pipelined steady state."""
    drain(fn(*args))  # compile
    drain(fn(*args))  # warm (first-run executable load through the tunnel)
    ts = {}
    for n in (2, 2 + iters):
        tic = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        drain(out)
        ts[n] = time.perf_counter() - tic
    return (ts[2 + iters] - ts[2]) / iters
