"""Shared measurement harness for training-step throughput.

One implementation of the slope-method train-step timer used by both
``bench.py`` (the driver benchmark) and
``examples/analysis/train_mfu_sweep.py`` (the lever sweep), so a
methodology fix lands in both (docs/VALIDATION.md "Timing gotchas": the
tunnel's dispatch+fetch latency and first-run executable load have each
silently corrupted a committed number before).

Methodology (docs/VALIDATION.md round 2, ``train_step_ab_bench.py``):
- steps run inside ``lax.scan`` so K steps cost ONE dispatch;
- per-step device time = (time(K=k) - time(K=kmin)) / (k - kmin), which
  cancels the constant per-dispatch latency of a tunneled chip;
- every compiled shape is dispatched TWICE before timing (compile, then
  the ~23 s first-run remote executable load);
- the loss sum is fetched to host each rep — ``block_until_ready`` alone
  can return before the tunnel drains.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

def _cache_root() -> str:
    """Repo root when running from a checkout (three levels above this
    file, identified by its pyproject.toml); the user cache dir when the
    package is pip-installed (where site-packages' parent is not writable
    and not ours to write into)."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.exists(os.path.join(root, "pyproject.toml")):
        return root
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "deepcalcium_tpu")


def enable_compile_cache(min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at the repo-root
    ``.jax_compile_cache`` (or ``~/.cache/deepcalcium_tpu`` for installed
    packages) and return the path.

    One implementation for every measurement entry point (bench.py and the
    analysis/search scripts): remote compiles cost minutes each, and a
    killed run resumes compile-warm. Call BEFORE the first trace."""
    cache = os.path.join(_cache_root(), ".jax_compile_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache


def _slope_scan_steps(step, params, state, opt_state, xs, ys, rng_impl,
                      k, kmin, reps):
    """Shared core: per-step device seconds via K-vs-kmin scan slope.

    One-impl view of :func:`_slope_scan_steps_ab` (single implementation
    of the scan body and timing discipline, per this module's header);
    the kmin/k cells are timed round-robin there, which for one impl is
    simply alternating scan lengths — weather-neutral like the A/B."""
    return _slope_scan_steps_ab(step, params, state, opt_state, xs, ys,
                                (rng_impl,), k, kmin, reps)[rng_impl]


def _train_step_setup(apply_fn, batch, win, k, nfb, lr, loss):
    """Shared setup for the 2-D train-step slope timers: params on device,
    optimizer state, the jitted step, and K steps of synthetic data."""
    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.ops import losses as L
    from deepcalcium_tpu.train import trainer as T

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = unet2d.init(jax.random.PRNGKey(0), nfb=nfb)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)
    optimizer = T.make_optimizer(lr)
    opt_state = jax.device_put(optimizer.init(jax.device_get(params)), dev)
    step = T.make_train_step(apply_fn, L.LOSSES[loss], optimizer)

    rng_np = np.random.default_rng(0)
    xs = jnp.asarray(rng_np.standard_normal((k, batch, win, win)),
                     jnp.float32)
    ys = jnp.asarray(rng_np.random((k, batch, win, win)) < 0.1, jnp.float32)
    return step, params, state, opt_state, xs, ys


def slope_train_step_time(apply_fn, batch, win, *, k=12, kmin=2, reps=3,
                          nfb=32, rng_impl="threefry2x32", lr=2e-3,
                          loss="binary_crossentropy"):
    """Measured device seconds per 2-D training step for one config.

    ``apply_fn``: a train-signature forward (e.g. ``unet2d.apply`` or
    ``unet2d_fast.apply_fast_w_train``, usually with ``compute_dtype``
    bound). Params are initialized on the CPU backend (device-side init
    costs ~25 s of tiny RNG kernels through a remote-compile service) and
    transferred once.
    """
    step, params, state, opt_state, xs, ys = _train_step_setup(
        apply_fn, batch, win, k, nfb, lr, loss)
    return _slope_scan_steps(step, params, state, opt_state, xs, ys,
                             rng_impl, k, kmin, reps)


def slope_train_step_time_ab(apply_fn, batch, win, *, k=12, kmin=2, reps=3,
                             nfb=32, rng_impls=("threefry2x32", "rbg"),
                             lr=2e-3, loss="binary_crossentropy"):
    """INTERLEAVED A/B slope timing of the same train step under several
    PRNG implementations; returns ``{impl: seconds_per_step}``.

    Why not two :func:`slope_train_step_time` calls: this VM throttles
    wholesale for minutes at a time, and a throttle window landing between
    two sequential measurements inverts the comparison (VERDICT r4 weak
    #2 — BENCH_r04 showed the supported perf preset *losing* 26% to the
    parity default while the builder's own interleaved A/B measured the
    opposite). Here every timed reading of every (impl, K) cell is taken
    round-robin inside one loop, so weather hits all cells equally and
    the comparison survives a drift.

    All configs share ONE jit wrapper (the typed PRNG key's aval differs
    per impl, so each impl is its own compile-cache entry under the same
    wrapper) and one params/data setup.
    """
    step, params, state, opt_state, xs, ys = _train_step_setup(
        apply_fn, batch, win, k, nfb, lr, loss)
    return _slope_scan_steps_ab(step, params, state, opt_state, xs, ys,
                                rng_impls, k, kmin, reps)


def _slope_scan_steps_ab(step, params, state, opt_state, xs, ys, rng_impls,
                         k, kmin, reps):
    """Shared core of the interleaved A/B slope timers (2-D and 1-D):
    every timed reading of every (impl, K) cell is taken round-robin in
    one loop, so a throttle window hits all cells equally and the
    comparison survives weather drift."""

    def scan_steps(p, s, o, key, xs_k, ys_k):
        def body(carry, xy):
            p, s, o, key = carry
            key, sub = jax.random.split(key)
            p, s, o, logs = step(p, s, o, xy[0], xy[1], sub)
            return (p, s, o, key), logs["loss"]

        (_, _, _, _), losses = jax.lax.scan(body, (p, s, o, key),
                                            (xs_k, ys_k))
        return losses

    fn = jax.jit(scan_steps)
    keys = {impl: jax.random.key(7, impl=impl) for impl in rng_impls}
    cells = [(impl, kk) for kk in (kmin, k) for impl in rng_impls]
    # Compile + first-run executable load (~23 s through the tunnel lands
    # on the SECOND dispatch) for every cell before any timing.
    for impl, kk in cells:
        for _ in range(2):
            float(jnp.sum(fn(params, state, opt_state, keys[impl],
                             xs[:kk], ys[:kk])))
    acc = {cell: 0.0 for cell in cells}
    for _ in range(reps):
        for cell in cells:  # round-robin: weather hits all cells equally
            impl, kk = cell
            tic = time.perf_counter()
            float(jnp.sum(fn(params, state, opt_state, keys[impl],
                             xs[:kk], ys[:kk])))
            acc[cell] += time.perf_counter() - tic
    return {impl: (acc[(impl, k)] - acc[(impl, kmin)]) / reps / (k - kmin)
            for impl in rng_impls}


def slope_train1d_step_time(batch=20, wlen=4096, *, k=12, kmin=2, reps=3,
                            nfb=32, rng_impl="threefry2x32", lr=2e-3,
                            margin=4):
    """Measured device seconds per 1-D (UNet1D spike) training step at the
    reference recipe: batch windows of ``wlen`` samples, wbce(pos=2),
    margin max-pool head, bf16, full SPIKE_METRICS — the same graph
    ``UNet1DSegmentation.fit`` dispatches per step (counterpart of
    ``slope_train_step_time`` for bench.py's ``train1d_*`` fields)."""
    step, params, state, opt_state, xs, ys = _train1d_step_setup(
        batch, wlen, k, nfb, lr, margin)
    return _slope_scan_steps(step, params, state, opt_state, xs, ys,
                             rng_impl, k, kmin, reps)


def _train1d_step_setup(batch, wlen, k, nfb, lr, margin):
    """Shared setup for the 1-D train-step slope timers (single-config and
    interleaved A/B): params on device, optimizer state, the jitted step,
    and K steps of synthetic spike data."""
    import functools

    from deepcalcium_tpu.models import unet1d
    from deepcalcium_tpu.ops import losses as L
    from deepcalcium_tpu.train import trainer as T

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = unet1d.init(jax.random.PRNGKey(0), nfb=nfb)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)
    optimizer = T.make_optimizer(lr)
    opt_state = jax.device_put(optimizer.init(jax.device_get(params)), dev)
    apply_fn = functools.partial(unet1d.apply, margin=margin,
                                 compute_dtype=jnp.bfloat16)
    loss_fn = functools.partial(L.weighted_binary_crossentropy,
                                weightpos=2.0)
    step = T.make_train_step(apply_fn, loss_fn, optimizer,
                             metric_fns=dict(L.SPIKE_METRICS))

    rng_np = np.random.default_rng(0)
    xs = jnp.asarray(rng_np.standard_normal((k, batch, wlen)), jnp.float32)
    ys = jnp.asarray(rng_np.random((k, batch, wlen)) < 0.01, jnp.float32)
    return step, params, state, opt_state, xs, ys


def slope_train1d_step_time_ab(batch=20, wlen=4096, *, k=12, kmin=2, reps=3,
                               nfb=32, rng_impls=("threefry2x32", "rbg"),
                               lr=2e-3, margin=4):
    """INTERLEAVED A/B slope timing of the 1-D spike train step under
    several PRNG implementations; returns ``{impl: seconds_per_step}``.
    Same weather-immunity rationale as :func:`slope_train_step_time_ab`
    (VERDICT r4 weak #2); measured round 5: rbg 5.65 vs threefry 6.69
    ms/step (−15%) at the reference recipe shape."""
    step, params, state, opt_state, xs, ys = _train1d_step_setup(
        batch, wlen, k, nfb, lr, margin)
    return _slope_scan_steps_ab(step, params, state, opt_state, xs, ys,
                                rng_impls, k, kmin, reps)
