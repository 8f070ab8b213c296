"""Per-block roofline profile of the W-packed TRAINING step — round-4
rebuild with noise-resolving per-block timing.

Round 3's version differenced two ~30 ms wall readings per sub-ms block
and produced physically impossible rows (negative times, 2.4e7 TFLOP/s
"backward rates" — VERDICT r3 weak #2). This rebuild times every pass
INSIDE one device dispatch: the op runs K times in a ``lax.fori_loop``
whose carry is perturbed by one element of each iteration's output (a
1-element in-place update on the aliased while-loop buffer), so XLA can
neither hoist nor dead-code the op, and the per-iteration time is the
slope between two loop lengths chosen so the differential is >= ~40 ms —
three orders of magnitude above the tunnel's per-dispatch jitter.
``n`` is a RUNTIME argument (fori_loop with a traced bound), so each op
compiles once.

What is timed, per distinct conv shape of ``apply_fast_w_train``
(models/unet2d_fast.py:501 — W4@L0 / W2@L1 packing, split convs instead
of concats; reference recipe geometry batch 20 @ 128s, nfb=32, bf16):

- ``fwd``: conv + bias + relu on the PACKED shapes (the MXU's actual
  work — the packing trades 4x/2x redundant FLOPs at L0/L1 for full
  lane utilization);
- ``gx``:  the input-gradient conv alone, via ``jax.linear_transpose``
  of the linear conv (exactly XLA's grad conv, no forward in the loop);
- ``gk``:  the weight-gradient conv alone, same construction.

Each row carries its per-step multiplicity (e.g. the (3,3,128,128)@L0
shape appears 4x: enc0b, dec0a's two split halves, dec0b), so
sum(count x (fwd+gx+gk)) over rows + the aux rows (grouped-BN fwd/bwd,
up-tconv einsums fwd/gx/gk, dropout mask draws, Adam update) can be
compared against the whole measured step (benchtools'
slope_train_step_time, same process) — the residual is the
seam/maxpool/loss/metric glue.

Roofline model per pass: lane-padding MXU efficiency
min(max(cin,8),128)/128 x min(cout,128)/128 (measured basis:
docs/VALIDATION.md "Conv MXU efficiency"); weight-grad uses 9*cin for
the row dim (the (3,3,cin,cout) output's M dimension). Aux-row floors
use HBM bytes / 810 GB/s. The sum of count-weighted floors is the
step's analytic floor; useful FLOPs (3 x unpacked forward) over it is
the train-MFU ceiling this schedule can reach.

Usage: python examples/analysis/train_layer_bench.py
         [--csv docs/train_layer_bench_r4.csv] [--batch 20] [--win 128]
         [--skip-step] [--smoke]   (--smoke: tiny shapes + CPU ok)
"""

import argparse
import os
import sys
import time

sys.path.append(".")
sys.path.append(os.path.dirname(os.path.abspath(__file__)))

import jax

from deepcalcium_tpu.utils.benchtools import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = float(os.environ.get("DC_TPU_PEAK_TFLOPS", "197")) * 1e12
HBM_BPS = 810e9  # v5e HBM bandwidth

_DN = ("NHWC", "HWIO", "NHWC")


# --------------------------------------------------------------------------
# Census: every distinct conv / einsum / BN shape of apply_fast_w_train at
# (batch, win, nfb=32), with per-step multiplicities.
# --------------------------------------------------------------------------

def conv_census(b, win):
    """(name, x_shape(packed NHWC), k_shape(packed HWIO), count, needs_gx).

    enc0a consumes the input image — no input-grad is computed for it.
    Shape identities (see apply_fast_w_train): dec0a's two split halves
    and dec0b share enc0b's packed shape; dec1a's halves and dec1b share
    enc1b's; dec2b shares enc2b's; dec3b shares enc3b's.
    """
    wp = win // 4
    return [
        ("enc0a_w4", (b, win, wp, 4), (3, 3, 4, 128), 1, False),
        ("L0_128_w4 (enc0b+dec0a*2+dec0b)",
         (b, win, wp, 128), (3, 3, 128, 128), 4, True),
        ("enc1a_w2", (b, win // 2, wp, 64), (3, 3, 64, 128), 1, True),
        ("L1_128_w2 (enc1b+dec1a*2+dec1b)",
         (b, win // 2, wp, 128), (3, 3, 128, 128), 4, True),
        ("enc2a", (b, win // 4, win // 4, 64), (3, 3, 64, 128), 1, True),
        ("L2_128 (enc2b+dec2b)",
         (b, win // 4, win // 4, 128), (3, 3, 128, 128), 2, True),
        ("dec2a", (b, win // 4, win // 4, 256), (3, 3, 256, 128), 1, True),
        ("enc3a", (b, win // 8, win // 8, 128), (3, 3, 128, 256), 1, True),
        ("L3_256 (enc3b+dec3b)",
         (b, win // 8, win // 8, 256), (3, 3, 256, 256), 2, True),
        ("dec3a", (b, win // 8, win // 8, 512), (3, 3, 512, 256), 1, True),
        ("mida", (b, win // 16, win // 16, 256), (3, 3, 256, 512), 1, True),
        ("midb", (b, win // 16, win // 16, 512), (3, 3, 512, 512), 1, True),
    ]


def up_census(b, win):
    """k=2 s=2 transpose-conv einsums: (name, x_shape, kt_shape(2,2,o,c),
    out_elems, count). FLOPs = 2 * out_elems * 4 * cin (each output pixel
    is a cin-vector times a (cin, cout) kernel slice)."""
    wp = win // 4
    return [
        ("up3_std", (b, win // 16, win // 16, 512), (2, 2, 256, 512), 1),
        ("up2_std", (b, win // 8, win // 8, 256), (2, 2, 128, 256), 1),
        ("up1_to_w2", (b, win // 4, win // 4, 128), (2, 2, 64, 128), 1),
        ("up0_w2_to_w4", (b, win // 2, wp, 128), (2, 2, 32, 64), 1),
    ]


def bn_census(b, win):
    """Grouped/standard BN activations: (name, y_shape, r, count).
    Five BN layers per level (conv a/b, dec a/b, up) except mid's two."""
    wp = win // 4
    return [
        ("bn_L0_r4", (b, win, wp, 128), 4, 5),
        ("bn_L1_r2", (b, win // 2, wp, 128), 2, 5),
        ("bn_L2", (b, win // 4, win // 4, 128), 1, 5),
        ("bn_L3", (b, win // 8, win // 8, 256), 1, 5),
        ("bn_mid", (b, win // 16, win // 16, 512), 1, 2),
    ]


# --------------------------------------------------------------------------
# Timing: runtime-length fori_loop, slope between two lengths.
# --------------------------------------------------------------------------

class LoopTimer:
    """Times ``op(carry, *consts)`` per iteration inside one dispatch.

    The carry is perturbed by 1e-24 x one output element each iteration
    (in-place on the aliased while-loop buffer) — loop-variant, so the op
    can't be hoisted; numerically a no-op, so shapes/values stay sane.

    ``consts`` are passed to the jitted loop as RUNTIME arguments (they
    are runtime tensors in the real training step); an earlier revision
    closed over them instead, baking them in as HLO constants XLA could
    constant-specialize against (e.g. pre-fold layouts of a weight that
    is runtime in production). The committed r4/r4b CSVs predate the fix;
    their rows cross-checked against composite step timings (sum-of-parts
    vs the 11.6 ms step) so the bias was bounded, but fresh runs are the
    authoritative form.
    """

    def __init__(self, op, carry0, consts=()):
        self.carry0 = carry0
        self.consts = consts
        idx = (0,) * carry0.ndim

        def body(c, cs):
            # Anti-slicing contract (VERDICT r3 weak #2 class of bug):
            # the op's result is consumed via ONE element, and XLA's
            # slice-sinking will happily shrink a BARE conv to a
            # one-output-position conv (measured: bare linear-transpose
            # convs read 0.001 ms / >500 TF/s). Callers must therefore
            # hand in ops whose output resists slicing: MXU ops wrapped
            # in relu(op + bias) (empirically blocks the rewrite AND
            # matches the production epilogues), elementwise producers
            # pre-reduced to a scalar via jnp.sum (a reduce consumes
            # every element by construction). optimization_barrier would
            # be the principled fence, but it hangs the TPU compiler
            # inside while-loop bodies (>300 s for one small graph).
            y = op(c, *cs)
            s = (y[(0,) * y.ndim].astype(carry0.dtype)
                 * jnp.asarray(1e-24, carry0.dtype))
            return c.at[idx].add(s)

        def run(n, c, *cs):
            out = jax.lax.fori_loop(0, n, lambda i, cc: body(cc, cs), c)
            return out[idx].astype(jnp.float32)

        self._jfn = jax.jit(run)

    def __call__(self, n):
        return float(self._jfn(jnp.int32(n), self.carry0, *self.consts))


def measure(timer, target_s=0.04, kmax=16384, reps=3):
    """Per-iteration seconds: slope between loop lengths 4 and 4+K, with
    K chosen so the differential is >= target_s (>= ~40 ms on the real
    chip — far above the tunnel's few-ms dispatch jitter)."""
    timer(4)
    timer(4)  # compile + first-run remote executable load

    def t(n, r):
        best = float("inf")
        for _ in range(r):
            tic = time.perf_counter()
            timer(n)
            best = min(best, time.perf_counter() - tic)
        return best

    est = max((t(68, 1) - t(4, 1)) / 64.0, 1e-6)
    k = int(min(max(target_s / est, 64), kmax))
    for attempt in range(4):
        t4 = t(4, reps)
        tk = t(4 + k, reps)
        slope = (tk - t4) / k
        # Accept only when the ACHIEVED differential clears half the
        # target: the est probe can read wrong-high during a tunnel
        # hiccup, picking a K whose differential drowns in dispatch
        # jitter (this produced 426 TF/s ghost rows). A genuinely sliced
        # op saturates kmax and gets caught by the peak-rate flag.
        if slope > 0 and (tk - t4 >= 0.5 * target_s or k >= kmax):
            return slope
        k = int(min(k * 4, kmax))
    return slope


# --------------------------------------------------------------------------
# Ops
# --------------------------------------------------------------------------

def _convfn(x, k):
    return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=_DN)


def lane(c):
    return min(max(c, 8), 128) / 128.0


def conv_pass_roofs(xs, ks):
    """(fwd, gx, gk) roofline seconds for one packed conv."""
    m = xs[0] * xs[1] * xs[2]
    fl = 2 * m * ks[0] * ks[1] * ks[2] * ks[3]
    eff_f = lane(ks[2]) * lane(ks[3])
    eff_gx = lane(ks[3]) * lane(ks[2])
    eff_gk = lane(min(ks[0] * ks[1] * ks[2], 128)) * lane(ks[3])
    return tuple(fl / (PEAK_TFLOPS * e) for e in (eff_f, eff_gx, eff_gk)), fl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--win", type=int, default=128)
    ap.add_argument("--target-ms", type=float, default=40.0,
                    help="minimum timed differential per measurement")
    ap.add_argument("--skip-step", action="store_true",
                    help="skip the whole-step comparison run")
    ap.add_argument("--resume", action="store_true",
                    help="skip rows already present in --csv and append "
                         "new ones incrementally — the remote compile "
                         "service hangs at random (observed: one small BN "
                         "graph blocked >11 min), so drive the script "
                         "under `timeout` in a retry loop")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + short loops (CPU correctness run)")
    args = ap.parse_args()
    if args.smoke:
        args.batch, args.win, args.target_ms = 2, 32, 2.0

    target_s = args.target_ms * 1e-3
    reps = 1 if args.smoke else 3
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def arr(shape, dtype=dt, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    csv_header = ("block,kind,count,fwd_ms,gx_ms,gk_ms,tot_ms,"
                  "fwd_tflops,flops,roof3p_ms,note\n")

    def row_line(r):
        tot = r["fwd"] + r["gx"] + r["gk"]
        tf = (r["flops"] / max(r["fwd"], 1e-12) / 1e12
              if r["flops"] else 0.0)
        return (f"{r['name']},{r['kind']},{r['count']},"
                f"{r['fwd']*1e3:.4f},{r['gx']*1e3:.4f},"
                f"{r['gk']*1e3:.4f},{tot*1e3:.4f},"
                f"{tf:.1f},{r['flops']},{r['roof']*1e3:.4f},{r['note']}\n")

    rows = []  # dicts: name,kind,count,fwd,gx,gk,flops,roof,note
    if args.resume and args.csv and os.path.exists(args.csv):
        import csv as _csv

        with open(args.csv) as fp:
            for rec in _csv.DictReader(fp):
                if rec["block"] == "TOTAL" or not rec.get("kind"):
                    continue
                rows.append(dict(
                    name=rec["block"], kind=rec["kind"],
                    count=int(rec["count"]),
                    fwd=float(rec["fwd_ms"]) / 1e3,
                    gx=float(rec["gx_ms"]) / 1e3,
                    gk=float(rec["gk_ms"]) / 1e3,
                    flops=int(rec["flops"]),
                    roof=float(rec["roof3p_ms"]) / 1e3,
                    note=rec["note"]))
        # Rewrite without any stale TOTAL line, then append live rows.
        with open(args.csv, "w") as fp:
            fp.write(csv_header)
            for r in rows:
                fp.write(row_line(r))
        print(f"resuming: {len(rows)} rows loaded from {args.csv}",
              flush=True)
    elif args.csv:
        with open(args.csv, "w") as fp:
            fp.write(csv_header)
    done = {r["name"] for r in rows}

    def emit(r):
        rows.append(r)
        if args.csv:
            with open(args.csv, "a") as fp:
                fp.write(row_line(r))

    # ---- conv rows ----
    for name, xs, ks, count, needs_gx in conv_census(args.batch, args.win):
        if name in done:
            continue
        x, k = arr(xs), arr(ks)
        bias = arr((ks[3],))
        ct = arr(xs[:3] + (ks[3],))
        (roof_f, roof_gx, roof_gk), fl = conv_pass_roofs(xs, ks)

        t_f = measure(LoopTimer(
            lambda c, kk, bb: jax.nn.relu(_convfn(c, kk) + bb),
            x, (k, bias)), target_s, reps=reps)

        # relu(grad + bias) wrappers: near-free fused epilogues that (a)
        # block slice-sinking (see LoopTimer.body) and (b) mirror the
        # production backward, where the relu-mask multiply fuses into
        # the grad convs the same way.
        t_gx = 0.0
        if needs_gx:
            gx_t = jax.linear_transpose(
                lambda xx: _convfn(xx, k),
                jax.ShapeDtypeStruct(xs, dt))
            bias_in = arr((xs[3],))
            t_gx = measure(
                LoopTimer(lambda c: jax.nn.relu(gx_t(c)[0] + bias_in), ct),
                target_s, reps=reps)

        kspec = jax.ShapeDtypeStruct(ks, dt)
        bias_k = arr((ks[3],))

        def gk_op(c, xx, _ks=kspec, _bk=bias_k):
            return jax.nn.relu(jax.linear_transpose(
                lambda kk: _convfn(xx, kk), _ks)(c)[0] + _bk)

        t_gk = measure(LoopTimer(gk_op, ct, (x,)), target_s, reps=reps)

        emit(dict(
            name=name, kind="conv", count=count,
            fwd=t_f, gx=t_gx, gk=t_gk, flops=fl,
            roof=(roof_f + (roof_gx if needs_gx else 0.0) + roof_gk),
            note=("no input-grad (consumes the image)" if not needs_gx
                  else "")))
        r = rows[-1]
        print(f"{name:34s} x{count}  fwd {t_f*1e3:7.3f} ms "
              f"({fl/max(t_f,1e-12)/1e12:6.1f} TF/s)  gx {t_gx*1e3:7.3f}  "
              f"gk {t_gk*1e3:7.3f}  roof(3p) {r['roof']*1e3:7.3f}",
              flush=True)

    # ---- transpose-conv einsum rows ----
    for name, xs, kts, count in up_census(args.batch, args.win):
        if name in done:
            continue
        x, kt = arr(xs), arr(kts)
        cin = kts[3]
        cout = kts[2]
        b_ = xs[0]

        if name == "up0_w2_to_w4":
            # Production lowering (round 4): dense block-diagonal
            # lhs_dilation=(2,1) conv — see models/unet2d_fast.up_w4_kernel.
            from deepcalcium_tpu.models.unet2d_fast import (_up_dilated,
                                                            up_w4_kernel)

            def up_f(hh, kk):
                return _up_dilated(hh, up_w4_kernel(kk))
            out_elems = b_ * 2 * xs[1] * xs[2] * 4 * cout
        elif name == "up1_to_w2":
            from deepcalcium_tpu.models.unet2d_fast import (_up_dilated,
                                                            up_w2_kernel)

            def up_f(hh, kk):
                return _up_dilated(hh, up_w2_kernel(kk))
            out_elems = b_ * 2 * xs[1] * xs[2] * 2 * cout
        else:
            def up_f(hh, kk):
                bb, i, j, _ = hh.shape
                y = jnp.einsum("bijc,pqoc->bipjqo", hh, kk)
                return y.reshape(bb, 2 * i, 2 * j, cout)
            out_elems = b_ * 4 * xs[1] * xs[2] * cout

        fl = 2 * out_elems * cin  # each output pixel: a cin-dot-product
        out_shape = jax.eval_shape(up_f, x, kt).shape
        bias_o = arr((out_shape[-1],))
        # relu(+bias) wrappers, same anti-slicing contract as the convs.
        t_f = measure(
            LoopTimer(lambda c, kk: jax.nn.relu(up_f(c, kk) + bias_o),
                      x, (kt,)), target_s, reps=reps)
        ct = arr(out_shape)
        gx_t = jax.linear_transpose(lambda hh: up_f(hh, kt),
                                    jax.ShapeDtypeStruct(xs, dt))
        bias_in = arr((xs[-1],))
        t_gx = measure(
            LoopTimer(lambda c: jax.nn.relu(gx_t(c)[0] + bias_in), ct),
            target_s, reps=reps)

        ktspec = jax.ShapeDtypeStruct(kts, dt)
        bias_kt = arr((kts[-1],))

        def upgk_op(c, xx, _ks=ktspec, _bk=bias_kt):
            return jax.nn.relu(jax.linear_transpose(
                lambda kk: up_f(xx, kk), _ks)(c)[0] + _bk)

        t_gk = measure(LoopTimer(upgk_op, ct, (x,)), target_s, reps=reps)

        # Roof: contraction over cin only, M = out_elems — lane model on
        # (cin, cout-per-(p,q)-slice); small-K einsums are usually
        # bandwidth-bound, so also floor by bytes moved.
        bytes_m = (np.prod(xs) + out_elems) * 2
        roof = max(fl / (PEAK_TFLOPS * lane(cin) * lane(cout)),
                   bytes_m / HBM_BPS) * 3
        lowering = ("dilated-conv" if name in ("up0_w2_to_w4", "up1_to_w2")
                    else "einsum")
        emit(dict(name=name, kind="tconv", count=count,
                  fwd=t_f, gx=t_gx, gk=t_gk, flops=fl, roof=roof,
                  note=f"{lowering} k=2 s=2 tconv"))
        print(f"{name:34s} x{count}  fwd {t_f*1e3:7.3f} ms  "
              f"gx {t_gx*1e3:7.3f}  gk {t_gk*1e3:7.3f}", flush=True)

    # ---- grouped-BN rows (fwd and fwd+bwd via vjp in-loop) ----
    from deepcalcium_tpu.models import blocks as B

    for name, ys, r, count in bn_census(args.batch, args.win):
        if name in done:
            continue
        c = ys[-1] // r
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)

        def bn_f(yy):
            ysf = yy.astype(jnp.float32) if B.BN_STATS_F32 else yy
            y5 = ysf.reshape(*yy.shape[:-1], r, c)
            mean = jnp.mean(y5, axis=tuple(range(y5.ndim - 1)))
            var = jnp.var(y5, axis=tuple(range(y5.ndim - 1)))
            inv = jax.lax.rsqrt(var.astype(jnp.float32) + B.BN_EPS) * gamma
            return ((yy - jnp.tile(mean.astype(jnp.float32), r)
                     .astype(yy.dtype))
                    * jnp.tile(inv, r).astype(yy.dtype)
                    + jnp.tile(beta, r).astype(yy.dtype))

        y = arr(ys)
        # BN's normalize is pure elementwise — scalar extraction would be
        # sliced to one element (measured 0.027 ms < the 0.052 ms 2-pass
        # bandwidth floor at L0). Pre-reduce to a scalar instead: the sum
        # consumes every element; the big output write may fuse away, so
        # these rows are read-side estimates (note the '~').
        t_f = measure(
            LoopTimer(lambda cc: jnp.sum(bn_f(cc), dtype=jnp.float32), y),
            target_s, reps=reps)

        def bn_fb(cc):
            out, vjp = jax.vjp(bn_f, cc)
            return jnp.sum(vjp(out)[0], dtype=jnp.float32)

        t_fb = measure(LoopTimer(bn_fb, y), target_s, reps=reps)
        nbytes = int(np.prod(ys)) * 2
        emit(dict(name=name, kind="bn", count=count,
                  fwd=t_f, gx=0.0, gk=max(t_fb - t_f, 0.0),
                  flops=0, roof=4 * nbytes / HBM_BPS,
                  note=f"~fbwd {t_fb*1e3:.3f} ms sum-consumed; "
                       f"floor=4*bytes/HBM"))
        print(f"{name:34s} x{count}  fwd {t_f*1e3:7.3f} ms  "
              f"f+bwd {t_fb*1e3:7.3f} ms", flush=True)

    # ---- dropout mask draws (largest two sizes; threefry vs rbg) ----
    wp = args.win // 4
    mask_shape = (args.batch, args.win, wp, 128)
    for impl in ("threefry2x32", "rbg"):
        if f"dropout_mask_L0 {impl}" in done:
            continue
        key = jax.random.key(0, impl=impl)

        def draw_op(kk):
            kk = jax.random.fold_in(kk, 1)
            # Consume the mask via a full reduce — a one-element read
            # would let slice-sinking shrink the draw to one element.
            m = jax.random.bernoulli(kk, 0.75, mask_shape)
            return jax.random.fold_in(kk, jnp.sum(m, dtype=jnp.int32))

        # Key carry: fold_in chains the key; the mask read feeds back so
        # the draw can't be dead-coded. LoopTimer's perturb trick doesn't
        # apply to typed keys, so run a dedicated fori here.
        def run(n, kk):
            out = jax.lax.fori_loop(0, n, lambda i, c: draw_op(c), kk)
            return jax.random.key_data(out)[0].astype(jnp.float32)

        jfn = jax.jit(run)

        class KeyTimer:
            def __init__(self, fn, k0):
                self._fn, self._k0 = fn, k0

            def __call__(self, n):
                return float(self._fn(jnp.int32(n), self._k0))

        t_d = measure(KeyTimer(jfn, key), target_s, reps=reps)
        emit(dict(name=f"dropout_mask_L0 {impl}", kind="aux",
                  count=7 if impl == "threefry2x32" else 0,
                  fwd=t_d, gx=0.0, gk=0.0, flops=0,
                  roof=int(np.prod(mask_shape)) / HBM_BPS,
                  note="7 masks/step (sizes vary; L0-size bound)"))
        print(f"dropout_mask_L0 {impl:12s}  {t_d*1e3:7.3f} ms", flush=True)

    # ---- Adam update on the full param pytree ----
    from deepcalcium_tpu.models import unet2d

    if "adam_update" not in done:
        import optax

        from deepcalcium_tpu.train import trainer as T

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params, _ = unet2d.init(jax.random.PRNGKey(0), nfb=32)
        dev = jax.devices()[0]
        params = jax.device_put(params, dev)
        opt = T.make_optimizer(2e-3)
        opt_state = jax.device_put(opt.init(jax.device_get(params)), dev)
        grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-4), params)

        def adam_run(n, p, o, g):
            def body(i, c):
                pp, oo = c
                u, oo = opt.update(g, oo, pp)
                return (optax.apply_updates(pp, u), oo)

            pp, _ = jax.lax.fori_loop(0, n, body, (p, o))
            # Consume one element of EVERY leaf: XLA's while-loop
            # simplifier dead-code-eliminates unused tuple elements of
            # the carry, so fetching a single leaf would time a one-bias
            # Adam update. (Per-element slicing can't occur here — the
            # leaves are loop CARRIES, materialized in full at every
            # iteration boundary; measured 0.332 ms vs the 0.27 ms
            # bandwidth floor.)
            return sum(leaf.ravel()[0].astype(jnp.float32)
                       for leaf in jax.tree.leaves(pp))

        adam_jfn = jax.jit(adam_run)

        class AdamTimer:
            def __call__(self, n):
                return float(adam_jfn(jnp.int32(n), params, opt_state,
                                      grads))

        t_adam = measure(AdamTimer(), target_s, reps=reps)
        nparams = sum(int(np.prod(p.shape))
                      for p in jax.tree.leaves(params))
        emit(dict(name="adam_update", kind="aux", count=1,
                  fwd=t_adam, gx=0.0, gk=0.0, flops=0,
                  roof=7 * 4 * nparams / HBM_BPS,
                  note=f"{nparams/1e6:.1f} M params"))
        print(f"adam_update                         {t_adam*1e3:7.3f} ms",
              flush=True)

    # ---- totals ----
    sum_ms = sum(r["count"] * (r["fwd"] + r["gx"] + r["gk"])
                 for r in rows) * 1e3
    floor_ms = sum(r["count"] * r["roof"] for r in rows) * 1e3
    useful = 3 * args.batch * unet2d.forward_flops(args.win, args.win,
                                                   nfb=32)
    device_fl = sum(r["count"] * 3 * r["flops"] for r in rows
                    if r["kind"] == "conv")
    print(f"\nSum of isolated count-weighted passes: {sum_ms:.2f} ms")
    print(f"Analytic floor (rooflines + bandwidth): {floor_ms:.2f} ms")
    print(f"Useful (unpacked 3x-forward) FLOPs/step: {useful/1e9:.1f} G; "
          f"packed device conv FLOPs/step: {device_fl/1e9:.1f} G "
          f"({device_fl/useful:.2f}x)")
    print(f"Train-MFU ceiling at the analytic floor: "
          f"{useful / (floor_ms * 1e-3) / PEAK_TFLOPS:.1%}")

    step_ms = None
    if not args.skip_step:
        import functools

        from deepcalcium_tpu.models.unet2d_fast import apply_fast_w_train
        from deepcalcium_tpu.utils.benchtools import slope_train_step_time

        apply_tr = functools.partial(apply_fast_w_train,
                                     compute_dtype=jnp.bfloat16)
        step_ms = slope_train_step_time(apply_tr, args.batch,
                                        args.win) * 1e3
        print(f"Whole W-packed train step (same process): {step_ms:.2f} ms"
              f" -> residual vs sum-of-parts {step_ms - sum_ms:+.2f} ms")
        print(f"Step MFU: measured {useful/(step_ms*1e-3)/PEAK_TFLOPS:.1%}"
              f" / ceiling {useful/(floor_ms*1e-3)/PEAK_TFLOPS:.1%}")

    bad = []
    for r in rows:
        if (min(r["fwd"], r["gx"], r["gk"]) < 0
                or max(r["fwd"], r["gx"], r["gk"]) > 1.0):
            bad.append((r["name"], "negative/degenerate time"))
        if r["kind"] in ("conv", "tconv") and r["flops"]:
            # Each pass runs the row's FLOPs once; a rate above the chip's
            # peak means the loop body got sliced/DCE'd, not measured.
            for pass_name in ("fwd", "gx", "gk"):
                tp = r[pass_name]
                if tp > 0 and r["flops"] / tp > PEAK_TFLOPS:
                    bad.append((r["name"],
                                f"{pass_name} superluminal "
                                f"({r['flops']/tp/1e12:.0f} TF/s)"))
    if bad:
        print(f"WARNING: implausible rows: {bad}", file=sys.stderr)

    if args.csv:
        note = f"step={step_ms:.2f}ms" if step_ms is not None else ""
        with open(args.csv, "a") as fp:
            fp.write(f"TOTAL,,,,,,{sum_ms:.2f},,,{floor_ms:.2f},{note}\n")
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
