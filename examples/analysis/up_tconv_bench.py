"""A/B the W-packed k=2 s=2 transpose-conv lowerings: 7-D einsum vs
XLA-native dilated grouped conv.

Round-4's rebuilt per-block profile (train_layer_bench.py) found
``up0_w2_to_w4``'s einsum ("bijqc,pLoc->bipjqLo" + 6-D reshape) running at
10.8 TF/s — 1.4 ms/step across fwd+gx+gk, ~18% of the W-packed train
step's measured parts and 9x its roofline (the 7-D intermediate lowers to
strided copies). The same op expressed as ``lax.conv_general_dilated``
with ``lhs_dilation=(2,1)`` (exactly how XLA lowers transposed convs) and
``feature_group_count=2`` (the W2 input group q1 is preserved into the
W4 output group q=2*q1+L — block-diagonal channel mixing) needs no big
transpose at all.

Derivation (up1, std -> W2): out[b, 2i+p, j, (q,o)] = sum_c
hh[b,i,j,c] * kt[p,q,o,c].  With lhs_dilation=2 on H and padding (1,1),
dilated-input position r=2i+p receives kernel tap t: t=1 for p=0, t=0 for
p=1 — i.e. the kernel H axis is FLIPPED.  HWIO kernel:
K[t, 0, c, q*O+o] = kt[1-t, q, o, c].
up0 (W2 -> W4) is the same with the (q1) input group preserved:
feature_group_count=2, per-group kernel identical, O tiled 2x.

Verifies exact equality against the einsum forms (f32), then slope-times
both lowerings (same harness as train_layer_bench: runtime-length
fori_loop, relu(+bias) anti-slicing wrappers).

Usage: python examples/analysis/up_tconv_bench.py [--batch 20] [--win 128]
       [--smoke]
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

from train_layer_bench import LoopTimer, measure  # noqa: E402

_DN = ("NHWC", "HWIO", "NHWC")


# ---- einsum forms (verbatim semantics of unet2d_fast._up_pure) ----

def up1_einsum(hh, kt):
    b, i, j, _ = hh.shape
    o = kt.shape[2]
    y = jnp.einsum("bijc,pqoc->bipjqo", hh, kt)
    return y.reshape(b, 2 * i, j, 2 * o)


def up0_einsum(hh, kt, cin):
    b, i, j, _ = hh.shape
    o = kt.shape[2]
    x5 = hh.reshape(b, i, j, 2, cin)
    y = jnp.einsum("bijqc,pLoc->bipjqLo", x5, kt)
    return y.reshape(b, 2 * i, j, 4 * o)


# ---- dilated-conv forms ----

def up1_kernel(kt):
    """kt (2, 2, o, c) [p, q, o, c] -> HWIO (2, 1, c, 2o), H flipped,
    channel layout (q, o) q-major."""
    k = jnp.flip(kt, axis=0)              # p -> 1-p
    k = k.transpose(0, 3, 1, 2)           # (p', c, q, o)
    p, c, q, o = k.shape
    return k.reshape(p, 1, c, q * o)


def up1_dilated(hh, kt):
    return jax.lax.conv_general_dilated(
        hh, up1_kernel(kt), (1, 1), ((1, 1), (0, 0)),
        lhs_dilation=(2, 1), dimension_numbers=_DN)


def up0_dilated(hh, kt):
    kb = up1_kernel(kt)                   # (2, 1, c, 2o) per group
    k2 = jnp.concatenate([kb, kb], axis=-1)
    return jax.lax.conv_general_dilated(
        hh, k2, (1, 1), ((1, 1), (0, 0)),
        lhs_dilation=(2, 1), feature_group_count=2,
        dimension_numbers=_DN)


def up0_blockdiag(hh, kt):
    """Same as up0_dilated but the 2-group channel mixing written as one
    DENSE block-diagonal kernel (full 128x128 MXU tiles; the off-diagonal
    zeros double the FLOPs of a tiny op in exchange for the dense-conv
    schedule XLA gives up1)."""
    kb = up1_kernel(kt)                   # (2, 1, 64, 64) per group
    p, _, c, o = kb.shape
    z = jnp.zeros((p, 1, c, o), kb.dtype)
    k2 = jnp.concatenate([
        jnp.concatenate([kb, z], axis=-1),
        jnp.concatenate([z, kb], axis=-1)], axis=2)   # (2, 1, 128, 128)
    return jax.lax.conv_general_dilated(
        hh, k2, (1, 1), ((1, 1), (0, 0)),
        lhs_dilation=(2, 1), dimension_numbers=_DN)


def up_std_einsum(hh, kt):
    b, i, j, _ = hh.shape
    o = kt.shape[2]
    y = jnp.einsum("bijc,pqoc->bipjqo", hh, kt)
    return y.reshape(b, 2 * i, 2 * j, o)


def up_std_einsum_staged(hh, kt):
    """The production eval staged form (W2 intermediate + barrier)."""
    b, i, j, _ = hh.shape
    o = kt.shape[2]
    y = jnp.einsum("bijc,pqoc->bipjqo", hh, kt)
    y = y.reshape(b, 2 * i, j, 2 * o)
    y = jax.lax.optimization_barrier(y)
    return y.reshape(b, 2 * i, 2 * j, o)


def up_std_dilated(hh, kt):
    """Standard-layout k=2 s=2 tconv as one lhs_dilation=(2,2) conv:
    kernel flipped on BOTH spatial axes, HWIO (2, 2, c, o)."""
    k = jnp.flip(jnp.flip(kt, axis=0), axis=1)     # (1-p, 1-q, o, c)
    k = k.transpose(0, 1, 3, 2)                    # HWIO
    return jax.lax.conv_general_dilated(
        hh, k, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=_DN)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--win", type=int, default=128)
    ap.add_argument("--target-ms", type=float, default=40.0)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.batch, args.win, args.target_ms = 2, 32, 2.0
    b, win = args.batch, args.win
    wp = win // 4
    rng = np.random.default_rng(0)

    # On TPU the einsum and dilated-conv lowerings agree BITWISE (f32).
    # On CPU XLA's default conv precision truncates (CLAUDE.md gotcha), so
    # the smoke path compares with a truncation-sized tolerance instead.
    if jax.devices()[0].platform == "cpu":
        def check(a, bb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=0.02, atol=1e-4)
    else:
        def check(a, bb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

    # ---- exactness (f32) ----
    hh1 = jnp.asarray(rng.standard_normal((b, win // 4, win // 4, 128)),
                      jnp.float32)
    kt1 = jnp.asarray(rng.standard_normal((2, 2, 64, 128)), jnp.float32)
    check(up1_einsum(hh1, kt1), up1_dilated(hh1, kt1))
    hh0 = jnp.asarray(rng.standard_normal((b, win // 2, wp, 128)),
                      jnp.float32)
    kt0 = jnp.asarray(rng.standard_normal((2, 2, 32, 64)), jnp.float32)
    check(up0_einsum(hh0, kt0, 64), up0_dilated(hh0, kt0))
    check(up0_einsum(hh0, kt0, 64), up0_blockdiag(hh0, kt0))
    hhs = jnp.asarray(rng.standard_normal((b, win // 8, win // 8, 256)),
                      jnp.float32)
    kts = jnp.asarray(rng.standard_normal((2, 2, 128, 256)), jnp.float32)
    check(up_std_einsum(hhs, kts), up_std_dilated(hhs, kts))
    print("exactness: einsum == dilated conv == blockdiag == std-dilated "
          "(f32, bitwise)")

    # ---- timing (bf16, fwd + gx + gk like the layer bench) ----
    target_s = args.target_ms * 1e-3
    reps = 1 if args.smoke else 3
    dt = jnp.bfloat16

    def arr(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.1, dt)

    cases = [
        ("up1", (b, win // 4, win // 4, 128), (2, 2, 64, 128),
         [("einsum", lambda h, k: up1_einsum(h, k)),
          ("dilated", up1_dilated)]),
        ("up0", (b, win // 2, wp, 128), (2, 2, 32, 64),
         [("einsum", lambda h, k: up0_einsum(h, k, 64)),
          ("dilated", up0_dilated), ("blockdiag", up0_blockdiag)]),
        # up3: mid 32² grid, 256 -> 128 ch; up2: 64² grid, 128 -> 128 ch
        ("up3", (b, win // 8, win // 8, 256), (2, 2, 128, 256),
         [("einsum", up_std_einsum), ("staged", up_std_einsum_staged),
          ("dilated", up_std_dilated)]),
        ("up2", (b, win // 4, win // 4, 128), (2, 2, 128, 128),
         [("einsum", up_std_einsum), ("staged", up_std_einsum_staged),
          ("dilated", up_std_dilated)]),
    ]
    for name, xs, ks, variants in cases:
        x, kt = arr(xs), arr(ks)
        out_shape = jax.eval_shape(variants[0][1], x, kt).shape
        bias_o = arr((out_shape[-1],))
        bias_i = arr((xs[-1],))
        ct = arr(out_shape)
        for label, f in variants:
            t_f = measure(LoopTimer(
                lambda c, kk, _f=f: jax.nn.relu(_f(c, kk) + bias_o),
                x, (kt,)), target_s, reps=reps)
            gx_t = jax.linear_transpose(lambda h, _f=f: _f(h, kt),
                                        jax.ShapeDtypeStruct(xs, dt))
            t_gx = measure(LoopTimer(
                lambda c: jax.nn.relu(gx_t(c)[0] + bias_i), ct),
                target_s, reps=reps)
            kspec = jax.ShapeDtypeStruct(ks, dt)

            def gk_op(c, xx, _f=f, _ks=kspec):
                return jax.nn.relu(jax.linear_transpose(
                    lambda kk: _f(xx, kk), _ks)(c)[0]
                    + jnp.zeros((ks[-1],), dt))

            t_gk = measure(LoopTimer(gk_op, ct, (x,)), target_s,
                           reps=reps)
            print(f"{name} {label:8s} fwd {t_f*1e3:7.3f} ms  "
                  f"gx {t_gx*1e3:7.3f}  gk {t_gk*1e3:7.3f}  "
                  f"tot {(t_f+t_gx+t_gk)*1e3:7.3f}", flush=True)


if __name__ == "__main__":
    main()
