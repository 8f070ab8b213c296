"""Measure every candidate formulation of the level-1 space-to-depth seams.

Round-2 finding (docs/VALIDATION.md): extending the s2d rewrite to level 1
LOSES (16.6 ms vs 13.8 ms for the (8, 512, 512) fast forward) because the
`_s2d`/`_inv_s2d` reshape-transpose seams move 33-134 MB at ~60 GB/s, while
level-1's K>=64 convs already run at a usable fraction of peak.

This script times, on the real chip (bf16, batch 8, the fast path's real
shapes), the alternatives that could make packed-L1 win:

pack  (8,256,256,32) -> (8,128,128,128):
  - reshape-transpose `_s2d` (the measured loser)
  - identity stride-2 conv (2,2,32,128) — routes the shuffle through the MXU
  - FUSED into enc1a: one stride-2 4x4 conv (4,4,32,256) == s2d + 3x3 packed
    conv (so the seam costs nothing beyond the conv itself)

unpack (8,128,128,256) -> (8,256,256,64):
  - reshape-transpose `_inv_s2d`
  - identity k=2 s=2 transpose conv, einsum+reshape form (blocks.tconv2x2)
  - identity k=2 s=2 transpose conv, lax.conv_transpose form
  - 4 strided `.at[::2, ::2].set` writes

stage ops at both layouts (to price the conv gain the seams must pay for):
  - enc1b standard (3,3,64,64)@256² vs packed (3,3,256,256)@128²
  - dec1a standard (3,3,128,64)@256² vs packed (3,3,512,256)@128²
  - up1 einsum tconv (std out) vs packed 1x1 matmul
  - pool1 maxpool2 vs packed channel-group max
  - channel concat of two packed tensors (group-blocked, kernel-permutation
    layout — no interleave)

Usage: python examples/analysis/s2d_seam_bench.py
"""

import sys
import time

sys.path.append(".")

import jax
import jax.numpy as jnp
import numpy as np


from slope_timing import slope_time  # noqa: E402 (shared tunnel-safe timer)


def report(name, dt, byts=0, flops=0):
    gbs = byts / dt / 1e9 if byts else 0.0
    tfs = flops / dt / 1e12 if flops else 0.0
    print(f"{name:44s} {dt*1e3:8.3f} ms {gbs:7.0f} GB/s {tfs:7.1f} TFLOP/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    B, F = 8, 32

    def arr(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    x_std = arr((B, 256, 256, F))            # pool0 output, standard layout
    z_pk = arr((B, 128, 128, 8 * F))         # dec1b output, packed layout
    h_up = arr((B, 128, 128, 4 * F))         # dec2b output (up1 input)
    e1b_std = arr((B, 256, 256, 2 * F))      # enc1b input standard
    e1b_pk = arr((B, 128, 128, 8 * F))       # enc1b input packed
    d1a_std = arr((B, 256, 256, 4 * F))      # dec1a input standard
    d1a_pk = arr((B, 128, 128, 16 * F))      # dec1a input packed

    # ---- pack candidates ------------------------------------------------
    from deepcalcium_tpu.models.unet2d_fast import _s2d, _inv_s2d

    nbytes_pack = 2 * (B * 256 * 256 * F) * 2  # bf16 in+out

    report("pack: reshape-transpose _s2d",
           slope_time(jax.jit(_s2d), (x_std,)), nbytes_pack)

    kpack = np.zeros((2, 2, F, 4 * F), np.float32)
    for p in range(2):
        for q in range(2):
            for c in range(F):
                kpack[p, q, c, (p * 2 + q) * F + c] = 1.0
    kpack = jnp.asarray(kpack, jnp.bfloat16)

    @jax.jit
    def pack_conv(x):
        return jax.lax.conv_general_dilated(
            x, kpack, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("pack: identity stride-2 conv", slope_time(pack_conv, (x_std,)),
           nbytes_pack, 2 * B * 128 * 128 * (4 * F) * (4 * F))

    # fused enc1a: stride-2 4x4 conv == _s2d + packed 3x3 conv (same output)
    k4 = arr((4, 4, F, 8 * F))

    @jax.jit
    def enc1a_fused(x):
        y = jax.lax.conv_general_dilated(
            x, k4, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y)

    fl = 2 * B * 128 * 128 * 16 * F * (8 * F)
    report("enc1a FUSED pack (4x4 s2 conv) -> packed",
           slope_time(enc1a_fused, (x_std,)), 0, fl)

    # reference: the packed-space enc1a the fused conv replaces (_s2d + 3x3)
    k3p = arr((3, 3, 4 * F, 8 * F))

    @jax.jit
    def enc1a_s2d_then_conv(x):
        z = _s2d(x)
        y = jax.lax.conv_general_dilated(
            z, k3p, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y)

    fl = 2 * B * 128 * 128 * 9 * 4 * F * (8 * F)
    report("enc1a _s2d + 3x3 packed conv",
           slope_time(enc1a_s2d_then_conv, (x_std,)), 0, fl)

    # standard enc1a for comparison
    k3s = arr((3, 3, F, 2 * F))

    @jax.jit
    def enc1a_std(x):
        y = jax.lax.conv_general_dilated(
            x, k3s, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y)

    fl = 2 * B * 256 * 256 * 9 * F * (2 * F)
    report("enc1a standard (3x3 32->64 @256)",
           slope_time(enc1a_std, (x_std,)), 0, fl)

    # ---- unpack candidates ----------------------------------------------
    nbytes_unpack = 2 * (B * 128 * 128 * 8 * F) * 2

    report("unpack: reshape-transpose _inv_s2d",
           slope_time(jax.jit(lambda z: _inv_s2d(z, 2 * F)), (z_pk,)),
           nbytes_unpack)

    kt = np.zeros((2, 2, 8 * F, 2 * F), np.float32)  # HWIO for conv_transpose
    for p in range(2):
        for q in range(2):
            for c in range(2 * F):
                kt[p, q, (p * 2 + q) * 2 * F + c, c] = 1.0
    kt = jnp.asarray(kt, jnp.bfloat16)

    @jax.jit
    def unpack_tconv(z):
        return jax.lax.conv_transpose(
            z, kt, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    fl = 2 * B * 128 * 128 * (8 * F) * (8 * F)
    report("unpack: identity conv_transpose",
           slope_time(unpack_tconv, (z_pk,)), nbytes_unpack, fl)

    # einsum+reshape identity tconv (HWOI like blocks.tconv2x2)
    kte = jnp.asarray(np.transpose(np.asarray(kt, np.float32), (0, 1, 3, 2)),
                      jnp.bfloat16)  # (2,2,out,in)

    @jax.jit
    def unpack_einsum(z):
        y = jnp.einsum("bhwc,pqoc->bhpwqo", z, kte)
        bsz, hh, _, ww, _, o = y.shape
        return y.reshape(bsz, 2 * hh, 2 * ww, o)

    report("unpack: identity einsum tconv",
           slope_time(unpack_einsum, (z_pk,)), nbytes_unpack, fl)

    @jax.jit
    def unpack_strided(z):
        c = 2 * F
        out = jnp.zeros((B, 256, 256, c), z.dtype)
        for p in range(2):
            for q in range(2):
                g = p * 2 + q
                out = out.at[:, p::2, q::2, :].set(
                    z[..., g * c:(g + 1) * c])
        return out

    report("unpack: 4 strided .at set",
           slope_time(unpack_strided, (z_pk,)), nbytes_unpack)

    # ---- stage ops at both layouts --------------------------------------
    ke1_std = arr((3, 3, 2 * F, 2 * F))
    ke1_pk = arr((3, 3, 8 * F, 8 * F))

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("enc1b standard (3,3,64,64)@256",
           slope_time(jax.jit(lambda x: jax.nn.relu(conv(x, ke1_std))),
                      (e1b_std,)), 0, 2 * B * 256 * 256 * 9 * 2 * F * 2 * F)
    report("enc1b packed (3,3,256,256)@128",
           slope_time(jax.jit(lambda x: jax.nn.relu(conv(x, ke1_pk))),
                      (e1b_pk,)), 0, 2 * B * 128 * 128 * 9 * 8 * F * 8 * F)

    kd1_std = arr((3, 3, 4 * F, 2 * F))
    kd1_pk = arr((3, 3, 16 * F, 8 * F))
    report("dec1a standard (3,3,128,64)@256",
           slope_time(jax.jit(lambda x: jax.nn.relu(conv(x, kd1_std))),
                      (d1a_std,)), 0, 2 * B * 256 * 256 * 9 * 4 * F * 2 * F)
    report("dec1a packed (3,3,512,256)@128",
           slope_time(jax.jit(lambda x: jax.nn.relu(conv(x, kd1_pk))),
                      (d1a_pk,)), 0, 2 * B * 128 * 128 * 9 * 16 * F * 8 * F)

    # up1: einsum tconv to standard vs packed 1x1 matmul
    ku = arr((2, 2, 2 * F, 4 * F))  # HWOI

    @jax.jit
    def up1_einsum(h):
        y = jnp.einsum("bhwc,pqoc->bhpwqo", h, ku)
        bsz, hh, _, ww, _, o = y.shape
        return jax.nn.relu(y.reshape(bsz, 2 * hh, 2 * ww, o))

    fl = 2 * B * 128 * 128 * 4 * 4 * F * 2 * F
    report("up1: einsum tconv -> standard",
           slope_time(up1_einsum, (h_up,)), 0, fl)

    k1 = arr((4 * F, 8 * F))

    @jax.jit
    def up1_packed(h):
        return jax.nn.relu(h @ k1)

    report("up1: packed 1x1 matmul",
           slope_time(up1_packed, (h_up,)), 0, fl)

    # pool1: standard maxpool2 vs packed group-max
    from deepcalcium_tpu.models import blocks as Bk

    report("pool1: maxpool2 standard @256",
           slope_time(jax.jit(Bk.maxpool2), (e1b_std,)),
           (B * 256 * 256 * 2 * F + B * 128 * 128 * 2 * F) * 2)

    @jax.jit
    def pool1_packed(z):
        return z.reshape(B, 128, 128, 4, 2 * F).max(axis=3)

    report("pool1: packed group-max @128",
           slope_time(pool1_packed, (e1b_pk,)),
           (B * 128 * 128 * 8 * F + B * 128 * 128 * 2 * F) * 2)

    # concat of two packed tensors, group-blocked layout (no interleave)
    report("concat packed (256+256 ch, blocked)",
           slope_time(jax.jit(lambda a, b: jnp.concatenate([a, b], -1)),
                      (z_pk, e1b_pk)), 3 * (B * 128 * 128 * 8 * F) * 2)


if __name__ == "__main__":
    main()
