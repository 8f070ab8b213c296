"""Trace ONE production train-step dispatch; attribute device time by op.

VERDICT r4 #5: the per-block profile (docs/train_layer_bench_r4c.csv)
attributes 7.38 ms of the 11.2 ms threefry step (parts floor 5.05 ms),
leaving ~2-4 ms of inter-block seams / fusion residuals only composite
timing sees. This script captures a `jax.profiler` trace of the
production W-packed gradient step (K steps in one jitted lax.scan
dispatch, so per-step attribution is trace-sound) and aggregates the
device plane's op events into a named table — the "trace-derived table
of the seam residual" the round-4 verdict asks for.

Parsing uses `jax.profiler.ProfileData` (in-process xplane reader; no
TensorBoard round trip). Buckets: conv / dropout-rng / bn / pool /
copy-reshape / other, mapped from XLA op names.

Usage: python examples/analysis/train_step_profile.py [--batch 20]
       [--win 128] [--k 8] [--prng rbg] [--fused-dropout]
       [--logdir /tmp/dc_profile] [--csv docs/train_step_profile_r5.csv]
"""

import argparse
import collections
import functools
import glob
import os
import re
import sys
import time

sys.path.append(".")

import jax

# --cpu must take effect BEFORE any backend touch: JAX_PLATFORM_NAME is
# unreliable in this image (the site config pre-seeds jax_platforms=
# axon,cpu and the axon plugin still initializes — CLAUDE.md session-h).
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

BUCKETS = [
    ("conv", re.compile(r"conv(?!ert)|dot", re.I)),
    ("dropout-rng", re.compile(r"rng|threefry|philox|erf_inv", re.I)),
    ("bn-stats", re.compile(r"batch-norm|variance|rsqrt", re.I)),
    ("pool", re.compile(r"reduce-window|select-and-scatter|scatter", re.I)),
    ("copy-reshape", re.compile(r"copy|transpose|reshape|concatenate|slice|"
                                r"pad|bitcast|dynamic-update", re.I)),
    # On this TPU backend the convolutions lower to %custom-call ops that
    # live INSIDE kOutput fusions, so named fusions carry the MXU work —
    # "fusion" buckets here are compute, not glue; copy-reshape is the
    # pure-data-movement bucket.
    ("reduce-fusion", re.compile(r"reduce", re.I)),
    ("compute-fusion", re.compile(r"fusion|add|multiply|maximum|select|"
                                  r"convert|subtract|divide", re.I)),
]


def bucket_of(name):
    # Classify by the op's OWN name only (the part before ' = ') — the
    # full signature lists operand producers (%copy-done.458, ...), which
    # mis-bucketed conv-bearing fusions as copy-reshape in the first r5
    # capture. HLO op names encode the fused leads
    # (multiply_reduce_fusion, maximum_convert_fusion, ...).
    own = name.split(" = ")[0].lstrip("%")
    own = re.sub(r"\.\d+$", "", own)
    for b, pat in BUCKETS:
        if pat.search(own):
            return b
    return "other"


def build_dispatch(batch, win, k, prng_impl, compute_dtype=jnp.bfloat16,
                   nfb=32, net="unet2d"):
    from deepcalcium_tpu.ops import losses as L
    from deepcalcium_tpu.train import trainer as T

    cpu = jax.devices("cpu")[0]
    if net == "unet1d":
        # The 1-D spike step exactly as slope_train1d_step_time /
        # UNet1DSegmentation.fit dispatch it: wbce(pos=2), margin-4
        # max-pool head, full SPIKE_METRICS, batch 20 @ 4096 samples.
        from deepcalcium_tpu.models import unet1d

        with jax.default_device(cpu):
            params, state = unet1d.init(jax.random.PRNGKey(0), nfb=nfb)
        apply_fn = functools.partial(unet1d.apply, margin=4,
                                     compute_dtype=compute_dtype)
        loss_fn = functools.partial(L.weighted_binary_crossentropy,
                                    weightpos=2.0)
        optimizer = T.make_optimizer(2e-3)
        step = T.make_train_step(apply_fn, loss_fn, optimizer,
                                 metric_fns=dict(L.SPIKE_METRICS))
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.standard_normal((k, batch, win)), jnp.float32)
        ys = jnp.asarray(rng.random((k, batch, win)) < 0.01, jnp.float32)
    else:
        from deepcalcium_tpu.models import unet2d
        from deepcalcium_tpu.models.unet2d_fast import apply_fast_w_train

        with jax.default_device(cpu):
            params, state = unet2d.init(jax.random.PRNGKey(0), nfb=nfb)
        apply_fn = functools.partial(apply_fast_w_train,
                                     compute_dtype=compute_dtype)
        optimizer = T.make_optimizer(2e-3)
        step = T.make_train_step(apply_fn, L.LOSSES["binary_crossentropy"],
                                 optimizer)
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.standard_normal((k, batch, win, win)),
                         jnp.float32)
        ys = jnp.asarray((rng.random((k, batch, win, win)) < 0.1),
                         jnp.float32)
    dev = jax.devices()[0]
    p = jax.device_put(params, dev)
    s = jax.device_put(state, dev)
    o = jax.device_put(optimizer.init(params), dev)

    def scan_steps(p, s, o, key, xs_k, ys_k):
        def body(carry, xy):
            p, s, o, key = carry
            key, sub = jax.random.split(key)
            x, y = xy
            p, s, o, logs = step(p, s, o, x, y, sub)
            return (p, s, o, key), logs["loss"]

        (p, s, o, _), losses = jax.lax.scan(body, (p, s, o, key),
                                            (xs_k, ys_k))
        return losses

    fn = jax.jit(scan_steps)
    key = jax.random.key(7, impl=prng_impl)
    return lambda: float(jnp.sum(fn(p, s, o, key, xs, ys)))


def aggregate(logdir):
    """Return {plane_name: {line_name: {event_name: (total_ps, count)}}}."""
    files = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no xplane.pb under {logdir}")
    pd = jax.profiler.ProfileData.from_file(files[-1])
    out = {}
    for plane in pd.planes:
        lines = {}
        for line in plane.lines:
            agg = collections.defaultdict(lambda: [0, 0])
            for ev in line.events:
                # C++-scoped names (ThunkExecutor::Execute, ...) are infra
                # wrappers that double-count the HLO ops nested under them;
                # HLO op names never contain '::'.
                if "::" in ev.name:
                    continue
                # %while.N wrapper events span the entire scan loop and
                # double-count every op nested under them (measured: one
                # %while = 75.4 ms on a 75.8 ms module — exactly the sum
                # of the n=8 per-step events beside it).
                if ev.name.startswith("%while"):
                    continue
                # duration_ps preferred; fall back to (end - start) ns.
                dur = getattr(ev, "duration_ps", None)
                if dur is None:
                    dur = int((ev.end_ns - ev.start_ns) * 1e3)
                a = agg[ev.name]
                a[0] += dur
                a[1] += 1
            lines[line.name] = dict(agg)
        out[plane.name] = lines
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--win", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--prng", default="rbg")
    ap.add_argument("--nfb", type=int, default=32)
    ap.add_argument("--fused-dropout", action="store_true")
    ap.add_argument("--logdir", default="/tmp/dc_profile")
    ap.add_argument("--csv", default="")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", action="store_true",
                    help="skip running; re-parse an existing --logdir trace")
    ap.add_argument("--net", default="unet2d", choices=["unet2d", "unet1d"],
                    help="unet1d profiles the spike step (pass --win 4096)")
    args = ap.parse_args()

    if not args.parse_only:
        from deepcalcium_tpu.models import blocks as B
        # The flag is read at TRACE time, and jax.jit traces lazily at the
        # FIRST run() — so it must stay set through every dispatch below,
        # not just through build_dispatch (resetting it right after build
        # would silently profile the non-fused graph).
        B.DROPOUT_FUSED_DRAW = args.fused_dropout
        try:
            run = build_dispatch(args.batch, args.win, args.k, args.prng,
                                 nfb=args.nfb, net=args.net)
            # TWO warm dispatches (first run of a fresh executable costs
            # ~23 s of remote load through the tunnel — CLAUDE.md).
            print("# built; compiling + warm dispatch 1...", file=sys.stderr,
                  flush=True)
            run()
            print("# warm dispatch 2...", file=sys.stderr, flush=True)
            run()
            print("# tracing...", file=sys.stderr, flush=True)
            tic = time.perf_counter()
            with jax.profiler.trace(args.logdir):
                run()
        finally:
            B.DROPOUT_FUSED_DRAW = False
        wall = time.perf_counter() - tic
        print(f"# traced dispatch wall={wall*1e3:.1f} ms "
              f"({wall/args.k*1e3:.2f} ms/step incl. dispatch overhead)",
              file=sys.stderr, flush=True)

    planes = aggregate(args.logdir)
    # Diagnose what the plugin actually recorded.
    for pname, lines in planes.items():
        for lname, agg in lines.items():
            tot = sum(v[0] for v in agg.values()) / 1e9
            print(f"# plane={pname!r} line={lname!r} events={len(agg)} "
                  f"total={tot:.3f} ms", file=sys.stderr, flush=True)

    # Device plane = the non-host plane with the largest *synchronous* op
    # total. 'Async XLA Ops' events span their whole async window and
    # overlap compute — summing them reads 8-9x the wall step (this
    # produced a bogus 81.5 ms/step copy bucket in the first r5 capture);
    # skip any Async line outright.
    def is_host(n):
        return "Host" in n or "host" in n or "python" in n.lower()

    best, best_tot = None, -1.0
    for pname, lines in planes.items():
        if is_host(pname):
            continue
        for lname, agg in lines.items():
            if "Async" in lname or "XLA Ops" not in lname:
                continue
            tot = sum(v[0] for v in agg.values())
            if tot > best_tot:
                best, best_tot = (pname, lname), tot
    if best is None:
        # CPU backend (and possibly the axon tunnel) records XLA op events
        # under a host plane line named tf_XLAEigen/... instead of a device
        # plane. Fall back to the busiest XLA-named host line so the table
        # still lands; mark provenance so readers know it's host-side.
        for pname_, lines in planes.items():
            for lname_, agg in lines.items():
                if "XLA" not in lname_ or "PjRt" in lname_:
                    continue
                tot = sum(v[0] for v in agg.values())
                if tot > best_tot:
                    best, best_tot = (pname_, lname_), tot
        if best is None:
            raise SystemExit("no device plane found — profiler recorded "
                             "host events only (axon tunnel limitation?)")
        print("# WARNING: no device plane; using host-side XLA op line "
              "(CPU-backend layout) — durations are host-thread times",
              file=sys.stderr, flush=True)
    pname, lname = best
    agg = planes[pname][lname]
    rows = sorted(((v[0], v[1], k) for k, v in agg.items()), reverse=True)
    total_ms = best_tot / 1e9
    print(f"# device plane {pname!r} line {lname!r}: "
          f"{total_ms:.3f} ms / {args.k} steps = "
          f"{total_ms/args.k:.3f} ms/step device-op time",
          file=sys.stderr, flush=True)
    # Cross-check: the XLA Modules line is the wall device time of the
    # whole dispatch; after dropping the %while wrapper, the op sum must
    # land within ~5% of it or the attribution is double- or under-
    # counting something.
    mod_lines = planes.get(pname, {})
    mod_tot = sum(v[0] for ln, ag in mod_lines.items()
                  if "Modules" in ln for v in ag.values())
    if mod_tot:
        ratio = best_tot / mod_tot
        print(f"# cross-check: ops/modules = {ratio:.3f} "
              f"(modules {mod_tot/1e9:.3f} ms)", file=sys.stderr, flush=True)
        if not 0.90 <= ratio <= 1.05:
            print(f"# WARNING: op sum is {ratio:.2f}x the module wall — "
                  "attribution suspect", file=sys.stderr, flush=True)

    buckets = collections.defaultdict(float)
    prefixes = collections.defaultdict(float)
    for dur, _, name in rows:
        buckets[bucket_of(name)] += dur / 1e9
        own = re.sub(r"\.\d+$", "", name.split(" = ")[0].lstrip("%"))
        prefixes[own] += dur / 1e9
    out = ["what,name,ms_per_step,count,pct_of_device"]
    for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        out.append(f"bucket,{b},{ms/args.k:.4f},,"
                   f"{100*ms*1e9/best_tot:.1f}")
    for p, ms in sorted(prefixes.items(), key=lambda kv: -kv[1]):
        if ms * 1e9 / best_tot < 0.005:
            break
        out.append(f"prefix,{p},{ms/args.k:.4f},,"
                   f"{100*ms*1e9/best_tot:.1f}")
    for dur, cnt, name in rows[:args.top]:
        nm = name.replace(",", ";")
        out.append(f"op,{nm},{dur/1e9/args.k:.4f},{cnt},"
                   f"{100*dur/best_tot:.1f}")
    text = "\n".join(out)
    print(text, flush=True)
    if args.csv:
        with open(args.csv, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
