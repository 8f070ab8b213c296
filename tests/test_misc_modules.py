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


def test_search_csv_torn_row_and_atomic_rewrite(tmp_path):
    """load_rows must drop a torn final line even when the tear preserves
    field count and parseability (a 'seconds' value cut mid-digits), and
    write_rows must replace atomically (tmp+rename) so a snapshotter or a
    VM restart can never observe a header-only truncation (ADVICE r4 /
    round-5 review)."""
    import importlib
    import sys as _sys

    _sys.path.insert(0, "examples/neurons")
    try:
        hs = importlib.import_module("unet2ds_hyperparam_search")
    finally:
        _sys.path.pop(0)

    rows = [
        {"window": "64", "trial": "0", "val_nf_f1_mean": "0.81",
         "seconds": "123.4"},
        {"window": "48", "trial": "1", "val_nf_f1_mean": "0.72",
         "seconds": "456.7"},
    ]
    p = tmp_path / "search.csv"
    hs.write_rows(str(p), rows)
    assert not (tmp_path / "search.csv.tmp").exists()  # renamed, not left
    assert hs.load_rows(str(p)) == rows

    # Tear the final line mid-'seconds': same comma count, still parses —
    # only the missing newline terminator gives it away.
    text = p.read_text()
    assert text.endswith("\n")
    p.write_text(text[: text.rfind("456.7") + 1])  # ...,0.72,4  (no \n)
    kept = hs.load_rows(str(p))
    assert kept == rows[:1]

    # A torn line that DOES break field count is also dropped.
    p.write_text(text + "96,2,0.9")  # missing 'seconds', no newline
    assert hs.load_rows(str(p)) == rows

    # Header-only and empty files resume from zero, not crash.
    p.write_text(text.split("\n")[0] + "\n")
    assert hs.load_rows(str(p)) == []
    p.write_text("")
    assert hs.load_rows(str(p)) == []


def test_train_step_profile_bucket_classification():
    """The trace profiler must classify ops by their OWN name, not the
    full HLO signature: operand lists name their producers (%copy-done,
    %reshape, ...), which mis-bucketed conv-bearing fusions as
    copy-reshape in the first round-5 capture (98.4% 'copy' on a step
    that is 73% MXU fusions)."""
    import importlib
    import sys as _sys

    _sys.path.insert(0, "examples/analysis")
    try:
        tsp = importlib.import_module("train_step_profile")
    finally:
        _sys.path.pop(0)

    # A conv-bearing kOutput fusion whose OPERANDS are copies/reshapes —
    # must NOT land in copy-reshape.
    fusion = ("%fusion.1461 = f32[3;3;128;128]{3;2;1;0} fusion("
              "bf16[20;128;32;128] %copy-done.111, bf16[128] %reshape.8492)"
              "; kind=kOutput; calls=%fused_computation.752")
    assert tsp.bucket_of(fusion) == "compute-fusion"
    assert tsp.bucket_of(
        "%multiply_reduce_fusion.107 = (bf16[128]) fusion(%copy.1396)"
    ) == "reduce-fusion"
    assert tsp.bucket_of(
        "%copy.1385 = f32[20;128;32;128] copy(f32 %maximum_convert_fusion.2)"
    ) == "copy-reshape"
    assert tsp.bucket_of("%convolution.42 = bf16[1] convolution(...)") \
        == "conv"
    # convert must not match the conv pattern (conv(?!ert)).
    assert tsp.bucket_of("%convert_element_type.3 = f32[1] convert(...)") \
        == "compute-fusion"
    assert tsp.bucket_of("%rng-bit-generator.24 = u32[1] rng(...)") \
        == "dropout-rng"
    assert tsp.bucket_of("%dynamic-update-slice.1377 = ... "
                         "dynamic-update-slice(...)") == "copy-reshape"
