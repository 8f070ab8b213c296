"""Per-layer roofline profile of the UNet2DS TTA-eval forward on a TPU chip.

Times every distinct conv/tconv/pool block of the (8, 512, 512) TTA batch in
isolation (bf16, inference-mode BN + ReLU fused behind one jit each), plus
the Pallas summary reduction and the full fused evaluate graph, and compares
each against a per-layer roofline:

    t_roofline = max(flops / (peak * lane_util), bytes / bw_peak)

where lane_util = min(cout, 128)/128 models MXU lane padding for thin output
channels (the v5e MXU is 128x128; a cout=32 conv leaves 3/4 of the lanes
idle), and bytes counts bf16 input+output (+kernel) traffic.

Timing uses the slope method (22-vs-2 pipelined iterations, drained by a
scalar host fetch) — required through the axon tunnel where
block_until_ready can return before the queue drains.

Usage: python examples/analysis/unet_layer_bench.py [--csv out.csv]
"""

import argparse
import functools
import sys
import time

sys.path.append(".")

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197e12  # v5e bf16
PEAK_GBS = 819e9      # v5e HBM


def slope_time(fn, args, iters=20):
    def drain(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

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


def block_fns():
    """(name, fn, x_shape, flops, bytes) for every distinct block of the
    (8, 512, 512) eval forward, nfb=32."""
    from deepcalcium_tpu.models import blocks as B

    rng = np.random.default_rng(0)
    out = []

    def cbr(name, res, cin, cout, k=3):
        kern = jnp.asarray(rng.standard_normal((k, k, cin, cout)), jnp.float32)
        bias = jnp.zeros((cout,), jnp.float32)
        g = jnp.ones((cout,), jnp.float32)
        be = jnp.zeros((cout,), jnp.float32)
        mu = jnp.zeros((cout,), jnp.float32)
        va = jnp.ones((cout,), jnp.float32)

        @jax.jit
        def fn(x):
            y = B.conv2d(x, {"kernel": kern, "bias": bias}, dtype=jnp.bfloat16)
            y, _ = B.batch_norm(y, {"gamma": g, "beta": be},
                                {"mean": mu, "var": va}, False, 0.99)
            return jax.nn.relu(y)

        flops = 2 * k * k * cin * cout * res * res * 8
        byts = (res * res * (cin + cout) * 8) * 2  # bf16 in+out
        out.append((name, fn, (8, res, res, cin), flops, byts, cout))

    def tconv(name, res, cin, cout):
        kern = jnp.asarray(rng.standard_normal((2, 2, cout, cin)), jnp.float32)
        bias = jnp.zeros((cout,), jnp.float32)

        @jax.jit
        def fn(x):
            return B.tconv2x2(x, {"kernel": kern, "bias": bias},
                              dtype=jnp.bfloat16)

        flops = 2 * 4 * cin * cout * res * res * 8
        byts = (res * res * cin + 4 * res * res * cout) * 8 * 2
        out.append((name, fn, (8, res, res, cin), flops, byts, cout))

    def pool(name, res, c):
        @jax.jit
        def fn(x):
            return B.maxpool2(x)

        byts = (res * res + (res // 2) ** 2) * c * 8 * 2
        out.append((name, fn, (8, res, res, c), 0, byts, c))

    f = 32
    cbr("enc0a 1->32@512", 512, 1, f)
    cbr("enc0b 32->32@512", 512, f, f)
    cbr("enc1a 32->64@256", 256, f, 2 * f)
    cbr("enc1b 64->64@256", 256, 2 * f, 2 * f)
    cbr("enc2a 64->128@128", 128, 2 * f, 4 * f)
    cbr("enc2b 128->128@128", 128, 4 * f, 4 * f)
    cbr("enc3a 128->256@64", 64, 4 * f, 8 * f)
    cbr("enc3b 256->256@64", 64, 8 * f, 8 * f)
    cbr("mida 256->512@32", 32, 8 * f, 16 * f)
    cbr("midb 512->512@32", 32, 16 * f, 16 * f)
    tconv("up3 512->256@32", 32, 16 * f, 8 * f)
    cbr("dec3a 512->256@64", 64, 16 * f, 8 * f)
    tconv("up2 256->128@64", 64, 8 * f, 4 * f)
    cbr("dec2a 256->128@128", 128, 8 * f, 4 * f)
    tconv("up1 128->64@128", 128, 4 * f, 2 * f)
    cbr("dec1a 128->64@256", 256, 4 * f, 2 * f)
    tconv("up0 64->32@256", 256, 2 * f, f)
    cbr("dec0a 64->32@512", 512, 2 * f, f)
    cbr("head 32->2@512", 512, f, 2, k=1)
    pool("pool0 32@512", 512, f)
    pool("pool1 64@256", 256, 2 * f)
    return out


def wpack_block_fns():
    """(name, fn, x_shape, flops, bytes, cout_eff) for every distinct block
    of the W-packed fast forward (apply_fast_w) at (8, 512, 512), nfb=32.
    FLOPs are the PACKED (inflated) counts — the work the MXU actually
    does; compare against the parity rows for the logical counts."""
    import jax.numpy as jnp

    from deepcalcium_tpu.models import blocks as Bk

    rng = np.random.default_rng(0)
    out = []
    dn = ("NHWC", "HWIO", "NHWC")

    def arr(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    def conv_block(name, xshape, kshape):
        k = arr(kshape)

        @jax.jit
        def fn(x):
            return jax.nn.relu(jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=dn))

        m = xshape[0] * xshape[1] * xshape[2]
        fl = 2 * m * kshape[0] * kshape[1] * kshape[2] * kshape[3]
        byts = (np.prod(xshape) + m * kshape[3]) * 2
        out.append((name, fn, xshape, fl, int(byts), kshape[3]))

    def split_block(name, xshape, kshape):
        ka, kb = arr(kshape), arr(kshape)

        @jax.jit
        def fn(x):
            ya = jax.lax.conv_general_dilated(x, ka, (1, 1), "SAME",
                                              dimension_numbers=dn)
            yb = jax.lax.conv_general_dilated(x, kb, (1, 1), "SAME",
                                              dimension_numbers=dn)
            return jax.nn.relu(ya + yb)

        m = xshape[0] * xshape[1] * xshape[2]
        fl = 4 * m * kshape[0] * kshape[1] * kshape[2] * kshape[3]
        byts = (2 * np.prod(xshape) + m * kshape[3]) * 2
        out.append((name, fn, xshape, fl, int(byts), kshape[3]))

    # Level 0 (W4, packed width 128) and level 1 (W2).
    conv_block("enc0a_w4 (3,3,4,128)@512", (8, 512, 128, 4), (3, 3, 4, 128))
    conv_block("enc0b_w4 (3,3,128,128)@512", (8, 512, 128, 128),
               (3, 3, 128, 128))
    split_block("dec0a_w4 split 2x(3,3,128,128)", (8, 512, 128, 128),
                (3, 3, 128, 128))
    conv_block("enc1a_w2 (3,3,64,128)@256", (8, 256, 128, 64),
               (3, 3, 64, 128))
    conv_block("enc1b_w2 (3,3,128,128)@256", (8, 256, 128, 128),
               (3, 3, 128, 128))
    split_block("dec1a_w2 split 2x(3,3,128,128)", (8, 256, 128, 128),
                (3, 3, 128, 128))

    # Pools as channel-group max + H-window.
    @jax.jit
    def pool0(z):
        m = z.reshape(8, 512, 128, 2, 2, 32).max(axis=4).reshape(
            8, 512, 128, 64)
        return jax.lax.reduce_window(m, -jnp.inf, jax.lax.max,
                                     (1, 2, 1, 1), (1, 2, 1, 1), "VALID")

    out.append(("pool0_w4->w2", pool0, (8, 512, 128, 128), 0,
                (8 * 512 * 128 * 128 + 8 * 256 * 128 * 64) * 2, 64))

    @jax.jit
    def pool1(z):
        m = jnp.maximum(z[..., :64], z[..., 64:])
        return jax.lax.reduce_window(m, -jnp.inf, jax.lax.max,
                                     (1, 2, 1, 1), (1, 2, 1, 1), "VALID")

    out.append(("pool1_w2->std", pool1, (8, 256, 128, 128), 0,
                (8 * 256 * 128 * 128 + 8 * 128 * 128 * 64) * 2, 64))

    # Transpose-up einsums with layout-preserving merges.
    ku1 = arr((2, 2, 64, 128))  # HWOI

    @jax.jit
    def up1(h):
        y = jnp.einsum("bijc,pqoc->bipjqo", h, ku1)
        return jax.nn.relu(y.reshape(8, 256, 128, 128))

    out.append(("up1->w2 einsum", up1, (8, 128, 128, 128),
                2 * 8 * 128 * 128 * 4 * 128 * 64,
                (8 * 128 * 128 * 128 + 8 * 256 * 128 * 128) * 2, 128))

    ku0 = arr((2, 2, 32, 64))

    @jax.jit
    def up0(h):
        x5 = h.reshape(8, 256, 128, 2, 64)
        y = jnp.einsum("bijqc,pLoc->bipjqLo", x5, ku0)
        return jax.nn.relu(y.reshape(8, 512, 128, 128))

    out.append(("up0_w2->w4 einsum", up0, (8, 256, 128, 128),
                2 * 8 * 256 * 128 * 4 * 64 * 32,
                (8 * 256 * 128 * 128 + 8 * 512 * 128 * 128) * 2, 128))

    # Mid block batch-folded into H.
    km1, km2 = arr((3, 3, 256, 512)), arr((3, 3, 512, 512))

    @jax.jit
    def mid_folded(x):
        bs, hm, wm, cm = x.shape
        xf = jnp.pad(x, ((0, 0), (0, 2), (0, 0), (0, 0))).reshape(
            1, bs * (hm + 2), wm, cm)
        gap = (jnp.arange(bs * (hm + 2)) % (hm + 2) < hm).astype(x.dtype)
        y = jax.nn.relu(jax.lax.conv_general_dilated(
            xf, km1, (1, 1), "SAME", dimension_numbers=dn))
        y = y * gap[None, :, None, None]
        y = jax.nn.relu(jax.lax.conv_general_dilated(
            y, km2, (1, 1), "SAME", dimension_numbers=dn))
        return y.reshape(bs, hm + 2, wm, -1)[:, :hm]

    fl = 2 * 8 * 32 * 32 * 9 * (256 * 512 + 512 * 512)
    out.append(("mid folded (a+b)", mid_folded, (8, 32, 32, 256), fl,
                (8 * 32 * 32 * (256 + 512 + 512)) * 2, 128))

    # Head: channel-dot + sigmoid in f32.
    wd = jnp.asarray(rng.standard_normal(32), jnp.float32)

    @jax.jit
    def head(z):
        zz = z.reshape(8, 512, 128, 4, 32).astype(jnp.float32)
        logit = jnp.einsum("bhwqc,c->bhwq", zz, wd)
        return jax.nn.sigmoid(logit).reshape(8, 512, 512)

    out.append(("head sigmoid-diff", head, (8, 512, 128, 128),
                2 * 8 * 512 * 512 * 32,
                (8 * 512 * 128 * 128) * 2 + 8 * 512 * 512 * 4, 128))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv")
    ap.add_argument("--fast", action="store_true",
                    help="profile the W-packed fast-forward blocks instead "
                         "of the parity blocks")
    args = ap.parse_args()

    if args.fast:
        rows = []
        rng = np.random.default_rng(1)
        print(f"{'block':34s} {'ms':>7s} {'TFLOP/s':>8s} {'GB/s':>7s}")
        total = 0.0
        for name, fn, xshape, flops, byts, _ in wpack_block_fns():
            x = jnp.asarray(rng.standard_normal(xshape), jnp.bfloat16)
            dt = slope_time(fn, (x,))
            total += dt
            rows.append((name, dt * 1e3, flops, byts))
            print(f"{name:34s} {dt*1e3:7.3f} {flops/dt/1e12:8.1f} "
                  f"{byts/dt/1e9:7.0f}")
        print(f"single-count block sum: {total*1e3:.2f} ms "
              f"(shared-shape blocks counted once)")
        if args.csv:
            import csv

            with open(args.csv, "w", newline="") as fp:
                wr = csv.writer(fp)
                wr.writerow(["block", "ms", "flops_packed", "bytes"])
                wr.writerows(rows)
        return

    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.ops.summary import movie_summary_fast
    from deepcalcium_tpu.train.evaluate import make_movie_evaluator

    rows = []
    rng = np.random.default_rng(1)
    total_meas = 0.0
    total_roof = 0.0
    print(f"{'block':26s} {'ms':>7s} {'roof_ms':>8s} {'x':>5s} "
          f"{'TFLOP/s':>8s} {'GB/s':>7s}")
    for name, fn, xshape, flops, byts, cout in block_fns():
        x = jnp.asarray(rng.standard_normal(xshape), jnp.bfloat16)
        dt = slope_time(fn, (x,))
        lane = min(cout, 128) / 128
        roof = max(flops / (PEAK_TFLOPS * lane), byts / PEAK_GBS)
        # multiplicity: enc blocks with a same-shape twin (b-convs reused by
        # dec) are reported once; the caller sums by hand.
        rows.append((name, dt * 1e3, roof * 1e3, flops, byts))
        total_meas += dt
        total_roof += roof
        print(f"{name:26s} {dt*1e3:7.3f} {roof*1e3:8.3f} "
              f"{dt/max(roof,1e-9):5.1f} {flops/dt/1e12:8.1f} "
              f"{byts/dt/1e9:7.0f}")

    # Summary reduction + full fused evaluate for reference.
    t, h, w = 3000, 512, 512
    movie = jax.jit(lambda k: jax.random.randint(k, (t, h, w), 0, 2000,
                                                 jnp.int16))(jax.random.PRNGKey(0))
    jax.block_until_ready(movie)
    dt = slope_time(jax.jit(lambda m: movie_summary_fast(m)[0]), (movie,))
    print(f"{'summary(pallas)':26s} {dt*1e3:7.3f} "
          f"{t*h*w*2/PEAK_GBS*1e3:8.3f} {'':5s} {'':8s} "
          f"{t*h*w*2/dt/1e9:7.0f}")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = unet2d.init(jax.random.PRNGKey(0), nfb=32)
    params = jax.device_put(params, jax.devices()[0])
    state = jax.device_put(state, jax.devices()[0])
    ev = make_movie_evaluator(
        functools.partial(unet2d.apply, compute_dtype=jnp.bfloat16),
        (t, h, w))
    dt = slope_time(lambda m: ev(params, state, m), (movie,))
    print(f"{'FULL fused evaluate':26s} {dt*1e3:7.3f}")
    print(f"single-count block sum: measured={total_meas*1e3:.2f} ms "
          f"roofline={total_roof*1e3:.2f} ms")

    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as fp:
            wr = csv.writer(fp)
            wr.writerow(["block", "ms", "roof_ms", "flops", "bytes"])
            wr.writerows(rows)


if __name__ == "__main__":
    main()
