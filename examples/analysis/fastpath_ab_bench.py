"""A/B the UNet2DS inference rewrites on the real chip at (8, 512, 512).

Compares, with the slope method (pipelined 22-vs-2 iterations drained by a
host checksum fetch — required through the axon tunnel):

  - unet2d.apply            parity forward (the round-1 baseline)
  - apply_fast              2x2 space-to-depth level 0 (round-2 shipped)
  - apply_fast_w            W-only packing, W4@L0 / W2@L1, free seams

and the full fused movie evaluator built on each.

Usage: python examples/analysis/fastpath_ab_bench.py
"""

import functools
import sys
import time

sys.path.append(".")

import jax
import jax.numpy as jnp
import numpy as np


from slope_timing import slope_time  # noqa: E402 (shared tunnel-safe timer)


def main():
    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.models.unet2d_fast import apply_fast, apply_fast_w
    from deepcalcium_tpu.train.evaluate import make_movie_evaluator

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = unet2d.init(jax.random.PRNGKey(0), nfb=32)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 512, 512)), jnp.bfloat16)
    flops = 8 * unet2d.forward_flops(512, 512, nfb=32)

    fwds = [
        ("unet2d.apply", functools.partial(unet2d.apply,
                                           compute_dtype=jnp.bfloat16)),
        ("apply_fast (s2d 2x2 L0)", apply_fast),
        ("apply_fast_w (W4/W2)", apply_fast_w),
    ]
    outs = {}
    for name, f in fwds:
        fn = jax.jit(lambda p, s, xx, f=f: f(p, s, xx, train=False)[0])
        dt = slope_time(fn, (params, state, x))
        outs[name] = np.asarray(fn(params, state, x), np.float32)
        print(f"forward {name:28s} {dt*1e3:8.2f} ms "
              f"{flops/dt/1e12:6.1f} TFLOP/s (logical)", flush=True)

    ref = outs["unet2d.apply"]
    for name in list(outs)[1:]:
        d = np.abs(outs[name] - ref).max()
        print(f"  max|{name} - parity| = {d:.3e}  (bf16 path)")

    # Full fused evaluator on each fast path.
    t, h, w = 3000, 512, 512
    movie = jax.jit(lambda k: jax.random.randint(
        k, (t, h, w), 0, 2000, jnp.int16))(jax.random.PRNGKey(0))
    jax.block_until_ready(movie)
    for name, f in fwds[1:]:
        ev = make_movie_evaluator(
            functools.partial(f, compute_dtype=jnp.bfloat16),
            (t, h, w), window=(512, 512), tta=True)
        dt = slope_time(lambda m: ev(params, state, m), (movie,))
        print(f"evaluate_movie on {name:28s} {dt*1e3:8.2f} ms "
              f"{t/dt:9.0f} fps  {flops/dt/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
