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


def _tiff_writer():
    try:
        from imageio.plugins import _tifffile
        return _tifffile.TiffWriter
    except Exception:
        return None


@pytest.mark.skipif(_tiff_writer() is None,
                    reason="no tifffile writer for exotic-layout fixtures")
def test_tiled_signed_and_halffloat_layouts(tmp_path):
    """Layouts beyond plain strips (review r5c): tiled TIFFs decode
    exactly (libtiff refuses scanline reads on them — the old loader
    zero-filled VALID files), signed 8-bit keeps its sign (-1 != 255),
    and 16-bit half-float is REJECTED with a status flag rather than
    reinterpreted as uint16 garbage under status 0."""
    w = _tiff_writer()
    tiled = (np.arange(64 * 64) % 1000).astype(np.uint16).reshape(64, 64)
    edge = (np.arange(70 * 50) % 777).astype(np.uint16).reshape(70, 50)
    i8 = (np.arange(64 * 64) % 255 - 128).astype(np.int8).reshape(64, 64)
    f16 = np.linspace(0, 100, 64 * 64).astype(np.float16).reshape(64, 64)
    p = {}
    for name, arr, kw in [("tiled", tiled, {"tile": (16, 16)}),
                          ("edge", edge, {"tile": (32, 32)}),
                          ("i8", i8, {}), ("f16", f16, {})]:
        p[name] = str(tmp_path / f"{name}.tif")
        with w(p[name]) as tw:
            tw.save(arr, **kw)

    frames, status = tn.decode_batch([p["tiled"], p["i8"], p["f16"]], 64, 64)
    np.testing.assert_array_equal(status, [0, 0, 1])
    np.testing.assert_array_equal(frames[0], tiled.astype(np.int16))
    np.testing.assert_array_equal(frames[1], i8.astype(np.int16))
    assert frames[2].sum() == 0  # flagged AND zeroed, never garbage

    # Image not a multiple of the tile: edge tiles crop correctly.
    fe, se = tn.decode_batch([p["edge"]], 70, 50)
    assert se[0] == 0
    np.testing.assert_array_equal(fe[0], edge.astype(np.int16))


def test_decode_chunk_retries_flagged_frames_on_pil(tiff_fixture, monkeypatch):
    """A frame the native tier flags but PIL can decode must be RECOVERED,
    not zero-filled — the fast path is never a correctness downgrade."""
    from deepcalcium_tpu.data import _ingest

    paths, movie = tiff_fixture
    real = tn.decode_batch

    def flaky(ps, h, w, nthreads=None):
        frames, status = real(ps, h, w, nthreads)
        frames[1] = 0  # pretend the native tier could not decode frame 1
        status[1] = 1
        return frames, status

    monkeypatch.setattr(tn, "decode_batch", flaky)
    out = _ingest.decode_chunk(paths[:3], (64, 64))
    np.testing.assert_array_equal(out, movie[:3])  # frame 1 recovered
