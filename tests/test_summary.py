"""Streaming mean/max summary kernels vs np.mean/np.max oracles."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from deepcalcium_tpu.ops.summary import (
    StreamingSummary,
    movie_summary,
    movie_summary_fast,
    movie_summary_pallas,
    movie_summary_sharded,
)


@pytest.fixture
def movie(rng):
    return rng.integers(-100, 3000, size=(37, 24, 40)).astype(np.int16)


def test_movie_summary_oracle(movie):
    mean, mx = movie_summary(movie, chunk=8)
    np.testing.assert_allclose(np.asarray(mean), movie.mean(0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(mx), movie.max(0))


def test_movie_summary_chunk_invariance(movie):
    m1, x1 = movie_summary(movie, chunk=5)
    m2, x2 = movie_summary(movie, chunk=37)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_movie_summary_float_input(rng):
    movie = rng.standard_normal((16, 8, 16)).astype(np.float32)
    mean, mx = movie_summary(movie, chunk=4)
    np.testing.assert_allclose(np.asarray(mean), movie.mean(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mx), movie.max(0), rtol=1e-6)


def test_pallas_summary_interpret(movie):
    """Pallas kernel in interpreter mode (no TPU in CI) vs oracle."""
    mean, mx = movie_summary_pallas(movie, chunk=8, interpret=True)
    np.testing.assert_allclose(np.asarray(mean), movie.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mx), movie.max(0))


def test_streaming_summary(movie):
    ss = StreamingSummary(movie.shape[1:], dtype=movie.dtype)
    for i in range(0, movie.shape[0], 10):
        ss.update(movie[i : i + 10])
    mean, mx = ss.result()
    np.testing.assert_allclose(mean, movie.mean(0), rtol=1e-5)
    np.testing.assert_array_equal(mx, movie.max(0))


def test_sharded_summary_matches_single_device(rng):
    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("data",))
    t = 8 * 6
    movie = rng.integers(0, 1000, size=(t, 16, 128)).astype(np.int16)
    mean, mx = movie_summary_sharded(movie, mesh, axis="data", chunk=8)
    np.testing.assert_allclose(np.asarray(mean), movie.mean(0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(mx), movie.max(0))


def test_sharded_summary_ragged_t(rng):
    """T not divisible by the mesh: head reduces sharded, tail locally —
    result exact vs a single-device reduction (no padded movie copy)."""
    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("data",))
    n = devices.size
    for t in (8 * n + 3, n - 1, 5 * n + n - 1):
        movie = rng.integers(0, 1000, size=(t, 16, 128)).astype(np.int16)
        mean, mx = movie_summary_sharded(movie, mesh, axis="data", chunk=8)
        np.testing.assert_allclose(np.asarray(mean), movie.mean(0), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(mx), movie.max(0))


def test_pallas_float_movie_nondivisible_t(rng):
    """Regression: float movies with T % chunk != 0 must not NaN (the old
    finfo.min time-padding poisoned the sum)."""
    movie = rng.standard_normal((10, 8, 128)).astype(np.float32) - 5.0
    mean, mx = movie_summary_pallas(movie, chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(mean), movie.mean(0), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mx), movie.max(0))


def test_pallas_all_negative_int_movie(rng):
    """Max must survive spatial over-reads + ragged-tail masking even when
    every value is negative."""
    movie = rng.integers(-5000, -10, (7, 8, 130)).astype(np.int16)
    mean, mx = movie_summary_pallas(movie, chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(mean), movie.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mx), movie.max(0))


def test_pallas_prime_t_ragged_spatial(rng):
    """Prime T (no usable chunk divisor -> masked tail) with H and W both
    off-tile: every ragged edge at once, auto chunk/block selection."""
    movie = rng.integers(-100, 3000, (31, 19, 137)).astype(np.int16)
    mean, mx = movie_summary_pallas(movie, interpret=True)
    np.testing.assert_allclose(np.asarray(mean), movie.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mx), movie.max(0))


def test_pallas_multirow_blocks(rng):
    """H spanning several row-blocks exercises the parallel grid dimension."""
    movie = rng.integers(0, 2000, (12, 40, 128)).astype(np.int16)
    mean, mx = movie_summary_pallas(movie, chunk=6, block_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(mean), movie.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mx), movie.max(0))


def test_movie_summary_fast_cpu_dispatch(movie):
    """On the CPU test backend the dispatcher must take the XLA-scan path
    and match the oracle (Pallas interpret would be pathologically slow)."""
    assert jax.default_backend() == "cpu"
    mean, mx = movie_summary_fast(movie)
    np.testing.assert_allclose(np.asarray(mean), movie.mean(0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(mx), movie.max(0))
