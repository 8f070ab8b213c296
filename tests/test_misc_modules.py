"""Coverage for small modules with no dedicated test file: the C2S
deprecation stub, the model-download helper (idempotent path, no network),
and the shared bench harness (benchtools)."""

import os

import jax
import numpy as np
import pytest


def test_c2s_stub_raises_with_pointer():
    """SURVEY §2 row 29: the C2S wrapper is documented-deprecated — it must
    refuse construction loudly and point at the working alternatives."""
    from deepcalcium_tpu.models.c2s_segmentation import C2SSegmentation

    with pytest.raises(NotImplementedError, match="GLMSegmentation"):
        C2SSegmentation()


def test_download_model_idempotent(tmp_path):
    """An existing file short-circuits before any network touch (this box
    has zero egress, so reaching urlretrieve would fail loudly)."""
    from deepcalcium_tpu.utils.model_downloads import download_model

    p = tmp_path / "m.hdf5"
    p.write_bytes(b"weights")
    out = download_model("https://unreachable.invalid/m.hdf5", str(p))
    assert out == str(p) and p.read_bytes() == b"weights"


def test_enable_compile_cache_sets_config(tmp_path):
    from deepcalcium_tpu.utils.benchtools import enable_compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        cache = enable_compile_cache()
        assert os.path.isdir(cache)
        assert jax.config.jax_compilation_cache_dir == cache
        # From a checkout the cache anchors at the repo root (pyproject
        # marker).
        assert os.path.exists(os.path.join(os.path.dirname(cache),
                                           "pyproject.toml"))
    finally:
        # Global JAX config: restore so later tests don't silently serve
        # executables from the persistent on-disk cache.
        jax.config.update("jax_compilation_cache_dir", prev)


def test_slope_train_step_time_smoke():
    """The shared slope timer must run the real train-step graph end-to-end
    and return a finite per-step time on tiny shapes (CPU; the value itself
    is timing noise here — only bench.py's TPU runs read it)."""
    import functools

    import jax.numpy as jnp

    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.utils.benchtools import slope_train_step_time

    fn = functools.partial(unet2d.apply, compute_dtype=jnp.float32)
    dt = slope_train_step_time(fn, 2, 32, k=3, kmin=1, reps=1, nfb=4)
    assert np.isfinite(dt)


def test_slope_train1d_step_time_smoke():
    """The 1-D counterpart (bench.py's train1d_* fields) runs the real
    UNet1D train-step graph — wbce(pos=2), margin head, SPIKE_METRICS —
    and returns a finite per-step time on tiny shapes."""
    from deepcalcium_tpu.utils.benchtools import slope_train1d_step_time

    dt = slope_train1d_step_time(2, 64, k=3, kmin=1, reps=1, nfb=4)
    assert np.isfinite(dt)
