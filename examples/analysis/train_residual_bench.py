"""Decompose the W-packed training step's +5 ms glue residual.

The round-4 per-block profile (train_layer_bench.py, docs/
train_layer_bench_r4b.csv) accounts 7.18 ms of isolated parts against a
12.26 ms whole step: the +5.1 ms residual is everything isolated-block
timing cannot see — maxpools and their gradients, dropout applies, the
sigmoid+loss head, BN's in-graph cost beyond the sum-consumed estimate,
layout seams, metrics, and cross-block fusion differences. This script
localizes it by slope-timing COMPOSITE graphs (same K-vs-kmin scan
methodology as utils/benchtools.py — one dispatch per K steps, constant
tunnel latency cancels in the slope):

  full      production step: value_and_grad + Adam + the 7 metrics
  nomet     same without metrics                 -> metrics = full - nomet
  vg        value_and_grad only (grads sum-consumed; a one-element read
            would let XLA slice-sink the weight-grad convs — trap #2 of
            train_layer_bench.py)                -> adam = nomet - vg
  fwd       forward loss only, train=True        -> backward = vg - fwd
  fwd_nodrp forward, drp=0                       -> dropout fwd cost
  vg_nodrp  value_and_grad, drp=0                -> dropout total cost
  fwd_eval  forward, train=False (running-stat BN, no dropout)
                                                 -> BN batch stats + drop

All at the reference recipe shape (batch 20 @ 128², bf16, threefry),
apply_fast_w_train. Rows append to the CSV as they complete (--resume
skips finished rows: the remote compile service hangs at random —
CLAUDE.md round-4 notes — so long measurement scripts must be
re-runnable under a timeout loop).

Usage: python examples/analysis/train_residual_bench.py
         [--csv docs/train_residual_r4.csv] [--batch 20] [--win 128]
         [--k 12] [--kmin 2] [--reps 3]
"""

import argparse
import functools
import os
import sys
import time

sys.path.append(".")

import jax

from deepcalcium_tpu.utils.benchtools import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np


def build_variants(batch, win, k):
    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.models.unet2d_fast import apply_fast_w_train
    from deepcalcium_tpu.ops import losses as L
    from deepcalcium_tpu.train import trainer as T

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = unet2d.init(jax.random.PRNGKey(0), nfb=32)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)
    optimizer = T.make_optimizer(2e-3)
    opt_state = jax.device_put(optimizer.init(jax.device_get(params)), dev)

    rng_np = np.random.default_rng(0)
    xs = jnp.asarray(rng_np.standard_normal((k, batch, win, win)),
                     jnp.float32)
    ys = jnp.asarray(rng_np.random((k, batch, win, win)) < 0.1, jnp.float32)

    loss_fn = L.LOSSES["binary_crossentropy"]
    ap = functools.partial(apply_fast_w_train, compute_dtype=jnp.bfloat16)
    ap0 = functools.partial(apply_fast_w_train, compute_dtype=jnp.bfloat16,
                            drp=0.0)

    def scan_of(body):
        """jit(scan) over (xs, ys) with carry (key, state, opt), returning
        the summed per-iteration scalar (host-fetched by the timer:
        block_until_ready can return before the tunnel drains)."""

        def run(p, s, o, key, xs_k, ys_k):
            def b(carry, xy):
                return body(p, carry, xy)

            _, outs = jax.lax.scan(b, (key, s, o), (xs_k, ys_k))
            return jnp.sum(outs)

        return jax.jit(run)

    def consume_grads(grads):
        # Full-reduce every leaf: a single-element read of a bare grad
        # conv gets slice-sunk to a one-output-position conv (measured
        # >500 TF/s in the broken round-3 profiler).
        return sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree.leaves(grads))

    def full_body_carryparams(metric_fns):
        """True production accounting: params flow through the carry like
        the real fit loop (trap #1: an unused carry element is DCE'd by
        XLA's while simplifier — params are carried AND reduced into the
        output, never scaled by 0.0, which constant-folds and re-opens
        the trap). Every metric scalar is consumed too, or the metric
        graphs are dead code."""
        step = T.make_train_step(ap, loss_fn, optimizer,
                                 metric_fns=metric_fns)
        raw = step.__wrapped__

        def run(p, s, o, key, xs_k, ys_k):
            def b(carry, xy):
                p, s, o, key = carry
                key, sub = jax.random.split(key)
                p, s, o, logs = raw(p, s, o, xy[0], xy[1], sub)
                out = sum(logs.values())  # consume ALL metrics
                return (p, s, o, key), out

            (pf, _, _, _), outs = jax.lax.scan(b, (p, s, o, key),
                                               (xs_k, ys_k))
            return jnp.sum(outs) + sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree.leaves(pf))

        return jax.jit(run)

    def vg_body(apply_fn):
        def body(p, carry, xy):
            key, s, o = carry
            key, sub = jax.random.split(key)

            def lfn(pp):
                probs, s2 = apply_fn(pp, s, xy[0], train=True, rng=sub)
                return jnp.mean(loss_fn(xy[1], probs)), s2

            (loss, s2), grads = jax.value_and_grad(lfn, has_aux=True)(p)
            # Add the grad reduction RAW (a *0.0 scale constant-folds and
            # dead-codes the entire backward).
            return (key, s2, o), loss + consume_grads(grads)

        return body

    def fwd_body(apply_fn):
        def body(p, carry, xy):
            key, s, o = carry
            key, sub = jax.random.split(key)
            probs, s2 = apply_fn(p, s, xy[0], train=True, rng=sub)
            return (key, s2, o), jnp.mean(loss_fn(xy[1], probs))

        return body

    def fwd_eval_body():
        def body(p, carry, xy):
            key, s, o = carry
            probs, _ = ap(p, s, xy[0], train=False)
            return (key, s, o), jnp.mean(loss_fn(xy[1], probs))

        return body

    variants = {
        "full": full_body_carryparams(None),
        "nomet": full_body_carryparams({}),
        "vg": scan_of(vg_body(ap)),
        "fwd": scan_of(fwd_body(ap)),
        "vg_nodrp": scan_of(vg_body(ap0)),
        "fwd_nodrp": scan_of(fwd_body(ap0)),
        "fwd_eval": scan_of(fwd_eval_body()),
    }
    args_tuple = (params, state, opt_state)
    return variants, args_tuple, xs, ys


def main():
    pa = argparse.ArgumentParser()
    pa.add_argument("--csv", default="docs/train_residual_r4.csv")
    pa.add_argument("--batch", type=int, default=20)
    pa.add_argument("--win", type=int, default=128)
    pa.add_argument("--k", type=int, default=12)
    pa.add_argument("--kmin", type=int, default=2)
    pa.add_argument("--reps", type=int, default=3)
    pa.add_argument("--no-resume", action="store_true")
    args = pa.parse_args()

    done = set()
    if not args.no_resume and os.path.exists(args.csv):
        with open(args.csv) as fp:
            done = {ln.split(",")[0] for ln in fp.read().splitlines()[1:]}
    elif args.csv:
        with open(args.csv, "w") as fp:
            fp.write("variant,ms_per_step,t_kmin_s,t_k_s\n")

    variants, (params, state, opt_state), xs, ys = build_variants(
        args.batch, args.win, args.k)
    key0 = jax.random.key(7, impl="threefry2x32")

    results = {}
    for name, fn in variants.items():
        if name in done:
            print(f"{name}: already in CSV, skipping", flush=True)
            continue
        times = {}
        for kk in (args.kmin, args.k):
            xk, yk = xs[:kk], ys[:kk]
            for _ in range(2):  # compile + first-run remote load
                float(fn(params, state, opt_state, key0, xk, yk))
            tic = time.perf_counter()
            for _ in range(args.reps):
                float(fn(params, state, opt_state, key0, xk, yk))
            times[kk] = (time.perf_counter() - tic) / args.reps
        ms = (times[args.k] - times[args.kmin]) / (args.k - args.kmin) * 1e3
        results[name] = ms
        print(f"{name:10s} {ms:7.3f} ms/step   "
              f"(t{args.kmin}={times[args.kmin]:.3f}s t{args.k}="
              f"{times[args.k]:.3f}s)", flush=True)
        if args.csv:
            with open(args.csv, "a") as fp:
                fp.write(f"{name},{ms:.4f},{times[args.kmin]:.4f},"
                         f"{times[args.k]:.4f}\n")

    if os.path.exists(args.csv):
        with open(args.csv) as fp:
            for ln in fp.read().splitlines()[1:]:
                parts = ln.split(",")
                results.setdefault(parts[0], float(parts[1]))

    if all(n in results for n in ("full", "nomet", "vg", "fwd",
                                  "vg_nodrp", "fwd_nodrp", "fwd_eval")):
        r = results
        print("\n--- decomposition (ms/step) ---")
        print(f"metrics (full - nomet):        {r['full'] - r['nomet']:7.3f}")
        print(f"adam+state plumbing (nomet-vg):{r['nomet'] - r['vg']:7.3f}")
        print(f"backward (vg - fwd):           {r['vg'] - r['fwd']:7.3f}")
        print(f"forward, train (fwd):          {r['fwd']:7.3f}")
        print(f"dropout total (vg - vg_nodrp): {r['vg'] - r['vg_nodrp']:7.3f}")
        print(f"dropout fwd (fwd - fwd_nodrp): {r['fwd'] - r['fwd_nodrp']:7.3f}")
        print(f"BN-stats+drop fwd (fwd - fwd_eval): "
              f"{r['fwd'] - r['fwd_eval']:7.3f}")
        print(f"eval-mode forward (fwd_eval):  {r['fwd_eval']:7.3f}")


if __name__ == "__main__":
    main()
