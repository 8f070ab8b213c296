"""Streaming mean/max summary-image reduction over a movie's time axis.

Parity target: the reference ingest hot loop (``datasets/nf.py:126-130``) —
one CPU pass over T TIFF frames accumulating ``series/mean`` (float16 +=) and
``series/max`` (np.maximum). That loop ran at ~205 frames/s and was the
end-to-end throughput bottleneck (BASELINE.md).

TPU-native design:
- :func:`movie_summary` — chunked ``lax.scan`` reduction over a resident
  (T, H, W) array: sum in float32, max in the input dtype, fused by XLA.
- :func:`movie_summary_pallas` — Pallas kernel: (row-stripe, time-chunk)
  grid with VMEM-revisited accumulators; the movie streams HBM -> VMEM
  exactly once with no intermediate (T, H, W) float32 materialization.
  Measured 2.1x the XLA scan on v5e (705 GB/s vs 348 at 3000x512²).
- :func:`movie_summary_fast` — backend dispatcher: Pallas on TPU, scan
  elsewhere. Use this from production paths.
- :class:`StreamingSummary` — host-streaming accumulator for ingest: frames
  decoded on host arrive in chunks; a donated jitted update folds each chunk
  into device-resident state. Mean accumulates in float32 (deliberate upgrade
  over the reference's lossy float16 ``+=``; stored dtype stays float16 per
  the HDF5 contract).
- :func:`movie_summary_sharded` — time-axis sharding over a mesh: each device
  reduces its T-shard, then ``psum``/``pmax`` combine over ICI.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import shard_map
from jax.sharding import PartitionSpec as P

__all__ = [
    "auto_backend",
    "movie_summary",
    "movie_summary_fast",
    "movie_summary_pallas",
    "movie_summary_sharded",
    "StreamingSummary",
]


# ---------------------------------------------------------------------------
# One-shot XLA reduction
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("chunk",))
def movie_summary(movie, chunk: int = 64):
    """Mean and max projections of a (T, H, W) movie.

    Scans over time-chunks so peak memory is one chunk in float32 rather than
    the full movie, regardless of T.

    # Returns
        (mean, mx): (H, W) float32 mean and (H, W) max in the input dtype.
    """
    t = movie.shape[0]
    pad = (-t) % chunk
    if pad:
        movie = jnp.concatenate([movie, jnp.zeros((pad,) + movie.shape[1:], movie.dtype)])
    nchunks = movie.shape[0] // chunk
    chunks = movie.reshape((nchunks, chunk) + movie.shape[1:])
    tidx = jnp.arange(chunk)

    neg_inf = (
        jnp.finfo(movie.dtype).min
        if jnp.issubdtype(movie.dtype, jnp.floating)
        else jnp.iinfo(movie.dtype).min
    )

    def step(carry, xs):
        i, x = xs
        s, m = carry
        valid = (i * chunk + tidx) < t  # mask the zero padding
        xf = x.astype(jnp.float32) * valid[:, None, None]
        xm = jnp.where(valid[:, None, None], x, neg_inf)
        return (s + jnp.sum(xf, axis=0), jnp.maximum(m, jnp.max(xm, axis=0))), None

    init = (
        jnp.zeros(movie.shape[1:], jnp.float32),
        jnp.full(movie.shape[1:], neg_inf, movie.dtype),
    )
    (s, m), _ = jax.lax.scan(step, init, (jnp.arange(nchunks), chunks))
    return s / jnp.float32(t), m


# ---------------------------------------------------------------------------
# Pallas kernel: single HBM pass, VMEM-resident accumulators
# ---------------------------------------------------------------------------

def _summary_kernel(x_ref, sum_ref, max_ref, *, chunk, t):
    i = pl.program_id(1)  # time-chunk index (innermost, sequential)
    x = x_ref[:].astype(jnp.float32)
    if t % chunk:
        # Ragged tail: frames past t are out-of-bounds garbage — mask them
        # out of both reductions (zero for the sum, -inf for the max).
        valid = (i * chunk + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)) < t
        csum = jnp.sum(jnp.where(valid, x, 0.0), axis=0)
        cmax = jnp.max(jnp.where(valid, x, -jnp.inf), axis=0)
    else:
        csum = jnp.sum(x, axis=0)
        cmax = jnp.max(x, axis=0)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = csum
        max_ref[:] = cmax

    @pl.when(i > 0)
    def _():
        sum_ref[:] = sum_ref[:] + csum
        max_ref[:] = jnp.maximum(max_ref[:], cmax)


def movie_summary_pallas(movie, chunk: int | None = None, block_h: int = 8,
                         interpret: bool = False):
    """Fused mean+max projection as a Pallas TPU kernel — the fastest path
    for device-resident movies (measured 659 GB/s on a v5e chip vs 348 GB/s
    for the XLA chunked scan in :func:`movie_summary`; docs/VALIDATION.md).

    Grid = (row-blocks, time-chunks) with ``dimension_semantics``
    ``("parallel", "arbitrary")``: spatial row-blocks are independent, and
    for each row-block the time axis is walked innermost/sequentially with
    the (block_h, W) float32 accumulators revisited in VMEM — each movie
    element streams HBM -> VMEM exactly once, with no (T, H, W) float32
    intermediate. Thin 8-row stripes keep the per-step working set small
    enough for time-chunks of hundreds of frames at 512², so each grid step
    is one large VPU reduction (the whole-frame variant is limited to
    ~5-frame chunks by the 16 MB VMEM budget and pays per-step overheads).

    Ragged edges (T % chunk, H % block_h, W % 128) are handled by in-kernel
    masking and output cropping — never by padding the input, which would
    materialize a full copy of the movie and dominate the runtime (the
    measured cost of a ``jnp.pad``/``concatenate`` on a 1.5 GB movie is ~3x
    the whole reduction).

    # Arguments
        movie: (T, H, W) array (int16/uint16/float32...).
        chunk: frames per grid step; None auto-sizes to the VMEM budget
            (double-buffered input + f32 cast temp + 2 f32 accumulators
            under ~12 MB of the ~16 MB VMEM).
        block_h: rows per spatial block (multiple of 8; 8 measured fastest).
        interpret: run in interpreter mode (for CPU tests).

    # Returns
        (mean, mx): (H, W) float32 mean and (H, W) max in float32.
    """
    t, h, w = movie.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    block_h = min(block_h, hp)
    assert block_h % 8 == 0, block_h
    isize = np.dtype(movie.dtype).itemsize
    if chunk is None:
        # VMEM stack model (verified against Mosaic's scoped-vmem accounting):
        # per frame, the unmasked kernel holds 2x the input block (pipeline
        # double buffer) + one f32 cast temp; the masked (ragged-tail) kernel
        # additionally materializes the int32 iota + where temps (~8 B/elem
        # more). Budget 12 MB of the 16 MB scoped VMEM.
        fixed = 2 * block_h * wp * 4
        c_unmask = int(max(1, min(512, (12 * 2**20 - fixed)
                                  // (block_h * wp * (2 * isize + 4)))))
        c_masked = int(max(1, min(512, (12 * 2**20 - fixed)
                                  // (block_h * wp * (2 * isize + 12)))))
        c_unmask, c_masked = min(c_unmask, t), min(c_masked, t)
        if t % c_unmask == 0:
            chunk = c_unmask
        else:
            # Largest divisor of t that still fills VMEM reasonably: exact
            # division skips the mask ops AND their scratch.
            d = next((d for d in range(c_unmask, 0, -1) if t % d == 0), 1)
            chunk = d if d >= max(32, c_unmask // 4) else c_masked
    chunk = min(chunk, t)
    nchunks = -(-t // chunk)
    nhblocks = -(-hp // block_h)

    movie = jnp.asarray(movie)
    sum_out, max_out = pl.pallas_call(
        functools.partial(_summary_kernel, chunk=chunk, t=t),
        grid=(nhblocks, nchunks),
        in_specs=[
            pl.BlockSpec((chunk, block_h, wp), lambda hb, i: (i, hb, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((block_h, wp), lambda hb, i: (hb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, wp), lambda hb, i: (hb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(movie)

    # Spatial over-reads land only in the cropped-away pad region.
    return sum_out[:h, :w] / jnp.float32(t), max_out[:h, :w]


def movie_summary_fast(movie, chunk: int | None = None):
    """Backend-dispatched mean/max projection: the Pallas kernel on TPU
    (2.1x the XLA scan at 512², ~705 GB/s on v5e), the XLA chunked scan
    elsewhere (Pallas interpret mode on CPU is orders slower than XLA).

    The choice keys off ``jax.default_backend()`` at trace time, which is
    the backend a surrounding ``jit`` compiles for in every supported
    configuration here. Note the Pallas path returns max as float32 (the
    XLA path preserves the input dtype).
    """
    if jax.default_backend() == "tpu":
        return movie_summary_pallas(movie, chunk=chunk)
    return movie_summary(movie, chunk=chunk or 64)


# ---------------------------------------------------------------------------
# Host-streaming accumulator (ingest path)
# ---------------------------------------------------------------------------

# Minimum measured host->device bandwidth (MB/s) at which streaming raw
# frames to the device beats reducing them on host. DMA-attached TPU VMs
# measure >10 GB/s; tunneled remote chips measure 0.25-1 GB/s AND pay a
# control-plane round trip per donated-buffer update, so the cutoff sits
# well above the tunnel range.
DEVICE_BACKEND_MIN_MBPS = 4000.0


@functools.lru_cache(maxsize=1)
def _device_bandwidth_mbps() -> float:
    """Measured host->device transfer bandwidth (MB/s), cached per process.

    The device *platform* string cannot distinguish a DMA-attached chip from
    a tunneled remote one (both say 'tpu'); a transfer probe can. The probe
    data is random — compressible zeros overstate tunnel links by ~5x. CPU
    backends return inf (no transfer cost).

    Drain correctness: the transfer is timed through a HOST FETCH of an
    on-device checksum, not ``block_until_ready`` — through the tunnel
    ``block_until_ready`` can return before the device queue drains
    (docs/VALIDATION.md), which made the original probe read spuriously
    FAST and misroute StreamingSummary's auto backend to ``device`` on a
    ~250 MB/s link (the BENCH_r02 ``from_host_fps``=250 regression).
    Two probes, ``min()``: a spuriously slow reading only routes to the
    safe host backend; a spuriously fast one ships raw movies over a thin
    link. 32 MB probes amortize the fixed dispatch+fetch latency so a
    DMA-attached chip (>10 GB/s) still reads well above the threshold."""
    import time

    if jax.devices()[0].platform.lower() == "cpu":
        return float("inf")
    checksum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))
    probe = np.random.default_rng(0).integers(
        0, 2**15, (16 * 1024, 1024), dtype=np.int16)  # 32 MB, incompressible
    mb = probe.nbytes / 2**20
    # Warm the transfer path AND the checksum executable (a compiled
    # executable's first run through the tunnel costs ~23 s of remote load
    # — it must not land in the measurement).
    int(checksum(jax.device_put(probe)))
    readings = []
    for i in (1, 2):
        # Materialize the fresh buffer BEFORE the clock starts: the numpy
        # add is ~96 MB of host memory traffic, which on a fast DMA link
        # would dominate the measurement and cap the reading at host-add
        # bandwidth (misrouting real TPU VMs to the host backend).
        probe_i = probe + i
        tic = time.perf_counter()
        int(checksum(jax.device_put(probe_i)))  # scalar fetch = full drain
        readings.append(mb / max(time.perf_counter() - tic, 1e-9))
    return min(readings)


def auto_backend() -> tuple[str, float]:
    """(backend, probe_mbps) the ``backend='auto'`` policy selects right
    now: ``'device'`` when the measured host->device link exceeds
    ``DEVICE_BACKEND_MIN_MBPS``, else ``'host'``. Exposed so benchmarks and
    logs can record WHICH path a streaming run took alongside the probe
    reading that chose it (a weather-skewed result is then self-diagnosing
    — see BENCH_r02's undiagnosable ``from_host_fps``)."""
    mbps = _device_bandwidth_mbps()
    return ("device" if mbps > DEVICE_BACKEND_MIN_MBPS else "host"), mbps


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _streaming_device_update(s, m, chunk, n_valid):
    """Donated device fold of one frame chunk into (sum, max) accumulators.
    Module-level (not a per-instance closure) so jax's global jit cache
    reuses the compiled kernel across StreamingSummary instances — a fresh
    closure per instance recompiled on every evaluate_movie call.

    ``n_valid`` (traced int32 scalar): frames past it are zero padding from
    the caller and are masked out of both reductions — so the RAGGED TAIL
    chunk of a stream reuses the same compiled executable as the full
    chunks instead of triggering a second compile mid-measurement."""
    valid = jax.lax.broadcasted_iota(jnp.int32, chunk.shape, 0) < n_valid
    neg = (jnp.finfo(chunk.dtype).min
           if jnp.issubdtype(chunk.dtype, jnp.floating)
           else jnp.iinfo(chunk.dtype).min)
    s = s + jnp.sum(jnp.where(valid, chunk.astype(jnp.float32), 0.0), axis=0)
    m = jnp.maximum(m, jnp.max(jnp.where(valid, chunk, neg), axis=0))
    return s, m


@functools.partial(jax.jit, donate_argnums=(0,))
def _streaming_device_update_mean(s, chunk, n_valid):
    """Mean-only variant (track_max=False); same masking contract."""
    valid = jax.lax.broadcasted_iota(jnp.int32, chunk.shape, 0) < n_valid
    return s + jnp.sum(jnp.where(valid, chunk.astype(jnp.float32), 0.0),
                       axis=0)


class StreamingSummary:
    """Fold host-decoded frame chunks into mean/max accumulators.

    Replaces the reference's per-frame NumPy accumulation
    (``datasets/nf.py:126-130``). Two backends:

    - ``device``: donated jitted chunk updates; the movie crosses host->device
      once and the reduction is free alongside. Right when the accelerator is
      DMA-attached (a real TPU VM).
    - ``host``: vectorized NumPy accumulation. Right when frames would have
      to cross a thin link just to be reduced (e.g. a tunneled remote chip,
      where the transfer costs more than the whole reduction).

    ``backend='auto'`` probes the measured host->device bandwidth
    (:func:`_device_bandwidth_mbps`): above ``DEVICE_BACKEND_MIN_MBPS``
    (4 GB/s — DMA-attached accelerators, or a CPU backend where 'transfer'
    is free) selects ``device``; slower links (tunneled remotes,
    0.25-1 GB/s, whose donated updates also round-trip the control plane)
    select ``host``.
    """

    def __init__(self, frame_shape, dtype=jnp.int16, backend: str = "auto",
                 track_max: bool = True):
        """``track_max=False`` skips the max projection — the mean-only
        consumers (evaluate_movie_streaming) save a full per-frame pass."""
        assert backend in ("auto", "device", "host")
        self.track_max = track_max
        self.probe_mbps = None
        if backend == "auto":
            # DMA-attached accelerators measure >10 GB/s; tunneled remotes
            # measure 0.25-1 GB/s. The threshold sits well above the tunnel
            # range because raw link speed understates the tunnel's real
            # cost: each donated-buffer update also ROUND-TRIPS the control
            # plane (measured: bench from_host 294 fps with the device
            # backend at a ~1 GB/s probe vs ~700 fps host on a 1-core
            # host), while host NumPy reduces at memory bandwidth.
            backend, self.probe_mbps = auto_backend()
        self.backend = backend
        self._chunk_len = None  # first-seen chunk length (device path)
        npdtype = np.dtype(dtype)
        neg = (np.finfo(npdtype).min if np.issubdtype(npdtype, np.floating)
               else np.iinfo(npdtype).min)
        self._count = 0

        if backend == "host":
            self._sum = np.zeros(frame_shape, np.float32)
            self._max = np.full(frame_shape, neg, npdtype)
        else:
            self._sum = jnp.zeros(frame_shape, jnp.float32)
            self._max = jnp.full(frame_shape, neg, dtype)

    def update(self, chunk) -> None:
        """chunk: (C, H, W) host array of frames."""
        n = chunk.shape[0]
        if self.backend == "host":
            self._sum += np.sum(np.asarray(chunk, np.float32), axis=0)
            if self.track_max:
                np.maximum(self._max, np.max(chunk, axis=0), out=self._max)
        else:
            # The jitted update specializes on chunk.shape: a ragged tail
            # chunk would trigger a second compile mid-stream (~25 s
            # through a remote-compile service, and it poisoned
            # BENCH_r02's from_host measurement). Zero-pad to the
            # first-seen chunk length and mask inside the kernel instead.
            if self._chunk_len is None:
                self._chunk_len = n
            if n > self._chunk_len:
                # A chunk LARGER than the first-seen one would specialize a
                # NEW executable just like a ragged tail would (same ~25 s
                # mid-stream compile class) — split it into first-seen-size
                # slabs instead; a short final slab pads below.
                for i in range(0, n, self._chunk_len):
                    self.update(chunk[i:i + self._chunk_len])
                return
            if n < self._chunk_len:
                pad = np.zeros((self._chunk_len - n,) + chunk.shape[1:],
                               np.asarray(chunk[:1]).dtype)
                chunk = np.concatenate([np.asarray(chunk), pad])
            if self.track_max:
                self._sum, self._max = _streaming_device_update(
                    self._sum, self._max, jnp.asarray(chunk), np.int32(n))
            else:
                self._sum = _streaming_device_update_mean(
                    self._sum, jnp.asarray(chunk), np.int32(n))
        self._count += n

    def result(self):
        """(mean float32, max) as host numpy arrays; max is ``None`` when
        constructed with ``track_max=False`` (it was never folded — the
        min-sentinel buffer must not escape as data)."""
        if self._count == 0:
            raise ValueError("no frames accumulated")
        return (
            np.asarray(self._sum) / self._count,
            np.asarray(self._max) if self.track_max else None,
        )


# ---------------------------------------------------------------------------
# Time-axis sharding over a device mesh
# ---------------------------------------------------------------------------

def movie_summary_sharded(movie, mesh, axis: str = "data", chunk: int = 64,
                          use_pallas: bool | None = None):
    """Mean/max projection with the time axis sharded over ``mesh[axis]``.

    Each device reduces its local T-shard (the Pallas kernel on TPU meshes,
    the scan elsewhere — override with ``use_pallas``), then combines
    partial sums with ``psum`` and partial maxes with ``pmax`` over ICI.

    Ragged T is handled without materializing a padded copy of the movie:
    the divisible head reduces sharded, the tail (< mesh size frames)
    reduces single-device, and the two combine exactly.
    """
    t = movie.shape[0]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    n = mesh.shape[axis]
    r = t % n
    if r:
        if t < n:
            mean, mx = movie_summary(movie, chunk=min(chunk, t))
            return mean, mx.astype(jnp.float32)
        head_mean, head_max = movie_summary_sharded(
            movie[: t - r], mesh, axis=axis, chunk=chunk,
            use_pallas=use_pallas)
        tail_mean, tail_max = movie_summary(movie[t - r :],
                                            chunk=min(chunk, r))
        mean = (head_mean * (t - r) + tail_mean * r) / jnp.float32(t)
        return mean, jnp.maximum(head_max, tail_max.astype(jnp.float32))

    fn = _sharded_summary_fn(mesh, axis, int(chunk), bool(use_pallas), t)
    return fn(movie)


@functools.lru_cache(maxsize=32)
def _sharded_summary_fn(mesh, axis: str, chunk: int, use_pallas: bool,
                        t: int):
    """Cached jitted shard_map for :func:`movie_summary_sharded`.

    Module-level cache so REPEAT top-level calls on same-shaped movies
    reuse one executable — a fresh shard_map closure + ``jax.jit(fn)`` per
    call retraces every time (~25-200 s per compile through a
    remote-compile service; the same failure mode the evaluator builders
    were lru-cached for in round 2b). ``t`` keys the cache because the
    global mean divides by it inside the mapped fn; jit itself re-
    specializes on the (T, H, W)/dtype of the movie as usual."""

    def local(mv):
        if use_pallas:
            mean_local, max_local = movie_summary_pallas(mv, chunk=None)
        else:
            mean_local, max_local = movie_summary(mv, chunk=chunk)
        sum_local = mean_local * mv.shape[0]
        s = jax.lax.psum(sum_local, axis)
        m = jax.lax.pmax(max_local.astype(jnp.float32), axis)
        return s / jnp.float32(t), m

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis, None, None),
        out_specs=(P(None, None), P(None, None)),
        # The scan carry is created inside the mapped fn (unvarying) and
        # becomes device-varying after the first fold; skip the vma check.
        check_vma=False,
    )
    return jax.jit(fn)
