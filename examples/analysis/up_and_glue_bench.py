"""Candidates for the remaining fast-forward slack: up2/up3 interleaves,
mida's small-M conv, f32-vs-bf16 TTA views, cast-order in the W4 pack.

Usage: python examples/analysis/up_and_glue_bench.py
"""

import sys
import time

sys.path.append(".")

import jax
import jax.numpy as jnp
import numpy as np


from slope_timing import slope_time  # noqa: E402 (shared tunnel-safe timer)


def main():
    rng = np.random.default_rng(0)
    B = 8

    def arr(shape, dt=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape), dt)

    # ---- up2 / up3: direct merge vs staged (W2-merge, then W-split) ----
    for name, res, cin, cout in [("up3", 32, 512, 256), ("up2", 64, 256, 128)]:
        h = arr((B, res, res, cin))
        k = arr((2, 2, cout, cin))  # HWOI

        @jax.jit
        def direct(hh, k=k, cout=cout):
            y = jnp.einsum("bijc,pqoc->bipjqo", hh, k)
            bsz, r, _, _, _, o = y.shape
            return jax.nn.relu(y.reshape(bsz, 2 * r, 2 * r, o))

        @jax.jit
        def staged(hh, k=k, cout=cout):
            y = jnp.einsum("bijc,pqoc->bipjqo", hh, k)
            bsz, r, _, _, _, o = y.shape
            y = y.reshape(bsz, 2 * r, r, 2 * o)      # free merges
            y = jax.lax.optimization_barrier(y)       # keep the W2 form
            return jax.nn.relu(y.reshape(bsz, 2 * r, 2 * r, o))

        fl = 2 * B * res * res * 4 * cin * cout
        dt_direct = slope_time(direct, (h,))
        print(f"{name} direct  {dt_direct*1e3:7.3f} ms "
              f"({fl/dt_direct/1e12:5.1f} TFLOP/s)", flush=True)
        print(f"{name} staged  {slope_time(staged, (h,))*1e3:7.3f} ms",
              flush=True)

    # ---- mida: as-is vs batch-folded-to-H with halo discard ----
    x3 = arr((B, 32, 32, 256))
    km = arr((3, 3, 256, 512))

    @jax.jit
    def mida(x):
        return jax.nn.relu(jax.lax.conv_general_dilated(
            x, km, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))

    fl = 2 * B * 32 * 32 * 9 * 256 * 512
    dt = slope_time(mida, (x3,))
    print(f"mida as-is   {dt*1e3:7.3f} ms ({fl/dt/1e12:5.1f} TFLOP/s)",
          flush=True)

    @jax.jit
    def mida_folded(x):
        # fold batch into H with 1-row zero gaps -> one (1, 8*33, 32) image
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))
        xf = xp.reshape(1, B * 33, 32, 256)
        y = jax.lax.conv_general_dilated(
            xf, km, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(B, 33, 32, 512)[:, :32]
        return jax.nn.relu(y)

    dt = slope_time(mida_folded, (x3,))
    print(f"mida folded  {dt*1e3:7.3f} ms ({fl/dt/1e12:5.1f} TFLOP/s)",
          flush=True)

    # ---- forward on f32 views vs bf16 views (cast-order fix applied) ----
    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.models.unet2d_fast import apply_fast_w

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = unet2d.init(jax.random.PRNGKey(0), nfb=32)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)
    flops = 8 * unet2d.forward_flops(512, 512, nfb=32)
    for dt_in in (jnp.bfloat16, jnp.float32):
        v = arr((8, 512, 512), dt_in)
        fn = jax.jit(lambda p, s, x: apply_fast_w(
            p, s, x, train=False, compute_dtype=jnp.bfloat16)[0])
        d = slope_time(fn, (params, state, v))
        print(f"forward W4/W2 on {jnp.dtype(dt_in).name:9s} views "
              f"{d*1e3:7.3f} ms ({flops/d/1e12:5.1f} TFLOP/s logical)",
              flush=True)


if __name__ == "__main__":
    main()
