"""Native TIFF batch decoder: correctness vs PIL, corruption tolerance,
throughput sanity."""

import os
import time

import numpy as np
import pytest

from deepcalcium_tpu.data import tiff_native as tn
from deepcalcium_tpu.data.fixtures import make_tiff_tree

pytestmark = pytest.mark.skipif(
    not tn.available(), reason="native TIFF loader not built (no toolchain)")


@pytest.fixture(scope="module")
def tiff_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiffs")
    ds_dir, movie, _ = make_tiff_tree(str(d), "nat.00", shape=(64, 64),
                                      nb_frames=24, test_set=True)
    img_dir = os.path.join(ds_dir, "images")
    paths = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    return paths, movie


def test_decode_matches_pil(tiff_fixture):
    paths, movie = tiff_fixture
    frames, status = tn.decode_batch(paths, 64, 64)
    assert status.sum() == 0
    np.testing.assert_array_equal(frames, movie)


def test_tiff_size(tiff_fixture):
    paths, _ = tiff_fixture
    assert tn.tiff_size(paths[0]) == (64, 64)
    assert tn.tiff_size("/nonexistent.tiff") is None


def test_corrupt_and_missing_zero_fill(tiff_fixture, tmp_path):
    paths, movie = tiff_fixture
    bad = str(tmp_path / "bad.tiff")
    with open(bad, "wb") as fp:
        fp.write(b"II*\x00junkjunk")
    mixed = [paths[0], bad, "/does/not/exist.tiff", paths[1]]
    frames, status = tn.decode_batch(mixed, 64, 64)
    np.testing.assert_array_equal(status, [0, 1, 1, 0])
    assert frames[1].sum() == 0 and frames[2].sum() == 0
    np.testing.assert_array_equal(frames[0], movie[0])
    np.testing.assert_array_equal(frames[3], movie[1])


def test_wrong_shape_rejected(tiff_fixture):
    paths, _ = tiff_fixture
    frames, status = tn.decode_batch(paths[:2], 32, 32)  # wrong target shape
    assert status.sum() == 2  # shape-mismatch frames fail, zero-filled


def test_thread_counts_equivalent(tiff_fixture):
    paths, movie = tiff_fixture
    f1, _ = tn.decode_batch(paths, 64, 64, nthreads=1)
    f8, _ = tn.decode_batch(paths, 64, 64, nthreads=8)
    np.testing.assert_array_equal(f1, f8)
