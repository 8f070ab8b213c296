"""Stage-by-stage timing of the fused movie evaluator on the real chip.

fastpath_ab_bench shows the full evaluator costs ~17 ms while its forward
costs ~9.9 ms and the Pallas summary ~2.1 ms — so ~5 ms hides in the glue
(z-norm, TTA view expansion, inverse/average, threshold). This times each
stage as its own jitted graph to find it.

Usage: python examples/analysis/evaluator_stage_bench.py
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
    from deepcalcium_tpu.models.unet2d_fast import apply_fast_w
    from deepcalcium_tpu.ops.augment import tta_collapse, tta_expand
    from deepcalcium_tpu.ops.summary import movie_summary_fast

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = unet2d.init(jax.random.PRNGKey(0), nfb=32)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)

    t, h, w = 3000, 512, 512
    movie = jax.jit(lambda k: jax.random.randint(
        k, (t, h, w), 0, 2000, jnp.int16))(jax.random.PRNGKey(0))
    jax.block_until_ready(movie)

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((h, w)), jnp.float32)
    views = jnp.asarray(rng.standard_normal((8, h, w)), jnp.float32)
    probs = jnp.asarray(rng.random((8, h, w)), jnp.float32)

    stages = [
        ("summary (pallas)", jax.jit(lambda m: movie_summary_fast(m)[0]),
         (movie,)),
        ("z-norm", jax.jit(lambda zz: (zz - jnp.mean(zz)) / jnp.std(zz)),
         (z,)),
        ("tta_expand", jax.jit(lambda zz: tta_expand(zz[None]).reshape(
            8, h, w)), (z,)),
        ("forward bf16 (W4/W2)", jax.jit(
            lambda p, s, v: apply_fast_w(p, s, v, train=False,
                                         compute_dtype=jnp.bfloat16)[0]),
         (params, state, views)),
        ("tta_collapse", jax.jit(lambda pp: tta_collapse(
            pp.reshape(8, 1, h, w))[0]), (probs,)),
        ("threshold", jax.jit(lambda pp: (pp > 0.5).astype(jnp.uint8)),
         (probs[0],)),
    ]
    total = 0.0
    for name, fn, args in stages:
        dt = slope_time(fn, args)
        total += dt
        print(f"{name:24s} {dt*1e3:8.3f} ms", flush=True)
    print(f"{'stage sum':24s} {total*1e3:8.3f} ms")

    # And the monolithic evaluator for the same config.
    from deepcalcium_tpu.train.evaluate import make_movie_evaluator
    ev = make_movie_evaluator(
        functools.partial(apply_fast_w, compute_dtype=jnp.bfloat16),
        (t, h, w), window=(512, 512), tta=True)
    dt = slope_time(lambda m: ev(params, state, m), (movie,))
    print(f"{'FULL evaluator':24s} {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
