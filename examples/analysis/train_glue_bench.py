"""Micro-profile the training step's GLUE ops — the pieces between the
convs that train_layer_bench.py does not row out: maxpools (forward +
the select_and_scatter backward), grouped-BN full vjp, the sigmoid-diff
head + loss, and a dropout apply. Complements train_residual_bench.py's
composite decomposition (which brackets the glue at ~5 ms/step:
dropout 2.7, backward-side non-dropout glue ~3.2) by attributing it to
named ops, exact shapes of ``apply_fast_w_train`` at batch 20 @ 128²
bf16 (models/unet2d_fast.py:695-741).

Same in-dispatch slope methodology as train_layer_bench (imports its
LoopTimer/measure): each op runs K times inside one fori_loop, vjp rows
consume the grad through a full reduce (slice-sinking trap #2), times
are slopes over runtime loop lengths.

Usage: python examples/analysis/train_glue_bench.py
         [--csv docs/train_glue_r4.csv] [--batch 20] [--win 128]
"""

import argparse
import importlib.util
import os
import sys

sys.path.append(".")
sys.path.append(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "train_layer_bench",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "train_layer_bench.py"))
_tlb = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_tlb)
LoopTimer, measure = _tlb.LoopTimer, _tlb.measure

import jax
import jax.numpy as jnp
import numpy as np

HBM_BPS = _tlb.HBM_BPS


def main():
    pa = argparse.ArgumentParser()
    pa.add_argument("--csv", default="docs/train_glue_r4.csv")
    pa.add_argument("--batch", type=int, default=20)
    pa.add_argument("--win", type=int, default=128)
    pa.add_argument("--target-s", type=float, default=0.04)
    args = pa.parse_args()

    b, win = args.batch, args.win
    wp = win // 4
    nfb = 32
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def arr(shape, dtype=dt):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    done = set()
    rows = []
    if os.path.exists(args.csv):
        # Resume: rows already in the CSV are skipped by row() below, so
        # load them here too or the final sum-of-glue total would cover
        # only this session's rows (a resumed run would print ~0 ms).
        with open(args.csv) as fp:
            for ln in fp.read().splitlines()[1:]:
                parts = ln.split(",")
                rows.append((parts[0], float(parts[1]), float(parts[2]),
                             float(parts[3]), float(parts[4]),
                             ",".join(parts[5:])))
        done = {r[0] for r in rows}
    else:
        with open(args.csv, "w") as fp:
            fp.write("op,fwd_ms,fbwd_ms,bwd_ms,hbm_floor_ms,note\n")

    def row(name, fwd_fn, x, note="", count=1):
        if name in done:
            print(f"{name}: in CSV, skipping", flush=True)
            return
        t_f = measure(LoopTimer(
            lambda c: jnp.sum(fwd_fn(c), dtype=jnp.float32), x),
            args.target_s)

        def fb(c):
            out, vjp = jax.vjp(fwd_fn, c)
            return jnp.sum(vjp(out)[0], dtype=jnp.float32)

        t_fb = measure(LoopTimer(fb, x), args.target_s)
        nbytes = x.size * x.dtype.itemsize
        floor = 2 * nbytes / HBM_BPS  # one read + one write, fwd only
        rec = (name, t_f * 1e3, t_fb * 1e3, max(t_fb - t_f, 0.0) * 1e3,
               floor * 1e3, note)
        rows.append(rec)
        print(f"{name:22s} fwd {t_f*1e3:7.3f}  f+bwd {t_fb*1e3:7.3f}  "
              f"bwd~{(t_fb-t_f)*1e3:7.3f} ms   {note}", flush=True)
        with open(args.csv, "a") as fp:
            fp.write(f"{rec[0]},{rec[1]:.4f},{rec[2]:.4f},{rec[3]:.4f},"
                     f"{rec[4]:.4f},{rec[5]}\n")

    # ---- pool0: W4 level — (q,L)-group max then H reduce_window ----
    def pool0(z):
        m = (z.reshape(b, win, wp, 2, 2, nfb).max(axis=4)
             .reshape(b, win, wp, 2 * nfb))
        return jax.lax.reduce_window(m, -jnp.inf, jax.lax.max,
                                     (1, 2, 1, 1), (1, 2, 1, 1), "VALID")

    row("pool0_w4", pool0, arr((b, win, wp, 4 * nfb)),
        "group-max + H select_and_scatter bwd")

    # ---- pool1: W2 level — half-max then H reduce_window ----
    def pool1(z):
        m = jnp.maximum(z[..., :2 * nfb], z[..., 2 * nfb:])
        return jax.lax.reduce_window(m, -jnp.inf, jax.lax.max,
                                     (1, 2, 1, 1), (1, 2, 1, 1), "VALID")

    row("pool1_w2", pool1, arr((b, win // 2, wp, 4 * nfb)),
        "half-max + H select_and_scatter bwd")

    # ---- pools 2, 3: standard 2x2 ----
    from deepcalcium_tpu.models import blocks as B

    # B.maxpool2 now carries the 4-way dense first-match gradient
    # (bf226fe); committed rows named pool2_std/pool3_std predate that
    # and measured the select_and_scatter form.
    row("pool2_std", B.maxpool2, arr((b, win // 4, win // 4, 4 * nfb)),
        "2x2 dense first-match bwd (production maxpool2)")
    row("pool3_std", B.maxpool2, arr((b, win // 8, win // 8, 8 * nfb)),
        "2x2 dense first-match bwd (production maxpool2)")

    # ---- grouped BN at L0 (largest activation), FULL vjp ----
    gamma = jnp.ones((nfb,), jnp.float32)
    beta = jnp.zeros((nfb,), jnp.float32)

    def bn_grouped_l0(y):
        r, c = 4, nfb
        ys = y.astype(jnp.float32)
        y5 = ys.reshape(*y.shape[:-1], r, c)
        mean = jnp.mean(y5, axis=tuple(range(y5.ndim - 1)))
        var = jnp.var(y5, axis=tuple(range(y5.ndim - 1)))
        inv = jax.lax.rsqrt(var + 1e-3) * gamma
        return ((y - jnp.tile(mean, r).astype(y.dtype))
                * jnp.tile(inv, r).astype(y.dtype)
                + jnp.tile(beta, r).astype(y.dtype))

    row("bn_grouped_L0_vjp", bn_grouped_l0, arr((b, win, wp, 4 * nfb)),
        "full vjp incl. stat grads (sum-consumed)")

    # ---- dropout apply (mask already drawn): scale + select at L0 ----
    mask = jnp.asarray(rng.random((b, win, wp, 4 * nfb)) < 0.75)

    def drop_apply(y):
        return jnp.where(mask, y / jnp.asarray(0.75, y.dtype), 0.0)

    row("dropout_apply_L0", drop_apply, arr((b, win, wp, 4 * nfb)),
        "mask mult only (draw timed in train_layer_bench)")

    # ---- head: f32 cast + sigmoid-diff einsum + bce loss ----
    wd = jnp.asarray(rng.standard_normal((nfb,)), jnp.float32)
    yt = jnp.asarray(rng.random((b, win, win)) < 0.1, jnp.float32)

    def head_loss(z):
        zz = z.reshape(b, win, wp, 4, nfb).astype(jnp.float32)
        logit = jnp.einsum("bhwqc,c->bhwq", zz, wd) + 0.1
        prob = jax.nn.sigmoid(logit).reshape(b, win, win)
        eps = 1e-7
        p = jnp.clip(prob, eps, 1 - eps)
        bce = -(yt * jnp.log(p) + (1 - yt) * jnp.log(1 - p))
        return jnp.mean(bce)[None]  # keep an indexable output

    row("head_loss", head_loss, arr((b, win, wp, 4 * nfb)),
        "f32 cast + sigmoid-diff head + bce")

    # ---- concat seams at dec3a/dec2a ----
    sk3 = arr((b, win // 8, win // 8, 8 * nfb))

    def concat3(z):
        return jnp.concatenate([z, sk3], axis=-1) * jnp.asarray(1.5, dt)

    row("concat_dec3a", concat3, arr((b, win // 8, win // 8, 8 * nfb)),
        "concat + scale (slice bwd)")

    # ---- DENSE-GRAD pools (now the production path) ---------------
    # select_and_scatter (reduce_window max's vjp) costs pool0 0.59 ms
    # of backward against a 0.05 ms floor. For a window-2/stride-2 max,
    # first-match routing is exactly `a >= b`: da = g*(a>=b),
    # db = g*(a<b) — dense elementwise, no scatter, IDENTICAL semantics
    # (select_and_scatter picks the first maximal element per window).
    # These rows time the SHIPPED primitive (unet2d_fast.hpool2, i.e.
    # blocks.pool2_axis) — an earlier revision timed a private copy,
    # which would silently decouple the CSV from production if the
    # shared implementation ever changed.
    from deepcalcium_tpu.models.unet2d_fast import hpool2 as hpool2_dense

    def pool0_dense(z):
        m = (z.reshape(b, win, wp, 2, 2, nfb).max(axis=4)
             .reshape(b, win, wp, 2 * nfb))
        return hpool2_dense(m)

    row("pool0_dense", pool0_dense, arr((b, win, wp, 4 * nfb)),
        "group-max + dense-grad H pool (candidate)")

    def pool1_dense(z):
        m = jnp.maximum(z[..., :2 * nfb], z[..., 2 * nfb:])
        return hpool2_dense(m)

    row("pool1_dense", pool1_dense, arr((b, win // 2, wp, 4 * nfb)),
        "half-max + dense-grad H pool (candidate)")

    # Equivalence: fwd bitwise; bwd vs select_and_scatter on data WITH
    # deliberate ties (first-match routing must agree).
    z = arr((b, win, wp, 4 * nfb))
    z = z.at[:, 0::2].set(z[:, 1::2])  # every H window tied
    for f_ref, f_new in ((pool0, pool0_dense), (pool1, pool1_dense)):
        zz = z[:, :, :, :] if f_ref is pool0 else z[:, :win // 2]
        o_ref, vjp_ref = jax.vjp(f_ref, zz)
        o_new, vjp_new = jax.vjp(f_new, zz)
        assert bool(jnp.all(o_ref == o_new)), "fwd mismatch"
        ct = jnp.ones_like(o_ref)
        g_ref, = vjp_ref(ct)
        g_new, = vjp_new(ct)
        assert bool(jnp.all(g_ref == g_new)), (
            f"bwd tie-routing mismatch: {int(jnp.sum(g_ref != g_new))} "
            f"elements")
    print("dense-grad pools: fwd bitwise-equal, bwd equal incl. ties",
          flush=True)

    tot = sum(r[2] for r in rows)
    print(f"\nsum of glue f+bwd: {tot:.3f} ms "
          f"(composite residual brackets: ~3.2 ms bwd-side non-dropout "
          f"glue + ~0.8 ms fwd-side — train_residual_r4.csv)")


if __name__ == "__main__":
    main()
