"""Custom ingestion (St. Jude-style), movie segmentation, visualization."""

import os

import h5py
import jax
import numpy as np
import pytest

from deepcalcium_tpu.data.custom import bbox_masks, make_dataset_from_tiffs
from deepcalcium_tpu.data.fixtures import make_tiff_tree
from deepcalcium_tpu.models import unet2d
from deepcalcium_tpu.models.movie_segmentation import segment_movie
from deepcalcium_tpu.utils.visualization import mask_outlines


def test_bbox_masks_semantics():
    masks = bbox_masks([(10, 10), (2, 30)], radius=3, shape=(40, 40))
    assert masks.shape == (2, 40, 40)
    assert masks[0].sum() == 36  # full (2r)^2 square
    assert masks[1].sum() == 30  # clipped at the x border (5 cols x 6 rows)
    assert masks[0, 10, 10] == 1 and masks[0, 6, 6] == 0
    assert masks[0, 7, 7] == 1


def test_make_dataset_from_tiffs(tmp_path):
    ds_dir, movie, _ = make_tiff_tree(str(tmp_path), "custom.00", shape=(32, 32),
                                      nb_frames=8, test_set=True)
    out = str(tmp_path / "custom.hdf5")
    make_dataset_from_tiffs("custom.00", os.path.join(ds_dir, "images", "*.tiff"),
                            out, centers=[(8, 8), (24, 24)], radius=2)
    with h5py.File(out, "r") as fp:
        assert fp.attrs["name"] == "custom.00"
        np.testing.assert_array_equal(fp["series/raw"][...], movie)
        np.testing.assert_allclose(fp["series/mean"][...].astype(np.float32),
                                   movie.mean(0), rtol=2e-3)
        assert fp["masks/raw"].shape == (2, 32, 32)
        assert fp["masks/raw"][0].sum() == 16
    # Idempotent: second call returns without rewriting.
    mtime = os.path.getmtime(out)
    make_dataset_from_tiffs("custom.00", "ignored", out)
    assert os.path.getmtime(out) == mtime


def test_corrupted_tiff_zero_fills(tmp_path):
    ds_dir, movie, _ = make_tiff_tree(str(tmp_path), "corrupt.00", shape=(32, 32),
                                      nb_frames=6, test_set=True)
    # Truncate one frame file to provoke a decode error.
    victim = sorted(os.listdir(os.path.join(ds_dir, "images")))[2]
    with open(os.path.join(ds_dir, "images", victim), "wb") as fp:
        fp.write(b"II*\x00garbage")
    out = str(tmp_path / "corrupt.hdf5")
    make_dataset_from_tiffs("corrupt.00", os.path.join(ds_dir, "images", "*.tiff"), out)
    with h5py.File(out, "r") as fp:
        raw = fp["series/raw"][...]
    assert raw[2].sum() == 0  # zero-filled
    np.testing.assert_array_equal(raw[3], movie[3])  # neighbors intact


def test_segment_movie_shapes_and_values():
    params, state = unet2d.init(jax.random.PRNGKey(0), nfb=4)
    movie = np.random.default_rng(0).integers(
        0, 1000, (10, 40, 56)).astype(np.int16)  # non-16-multiple H/W
    out = segment_movie(params, state, movie, slab=4, compute_dtype=None)
    assert out.shape == (10, 40, 56)
    assert out.dtype == np.uint8
    assert set(np.unique(out)).issubset({0, 1})


def test_segment_movie_fast_dispatch_matches_parity():
    """The auto-dispatched W-packed forward produces the same masks as the
    explicit parity forward (f32).

    The two paths differ by float reassociation (~1e-7), and a random-init
    net clusters probabilities near the 0.5 threshold — so the assertion
    tolerates a sub-percent fraction of threshold-boundary pixel flips
    rather than demanding seed-lucky bit equality.
    """
    params, state = unet2d.init(jax.random.PRNGKey(2), nfb=4)
    movie = np.random.default_rng(4).integers(
        0, 1000, (6, 32, 32)).astype(np.int16)
    fast = segment_movie(params, state, movie, slab=3, compute_dtype=None)
    slow = segment_movie(params, state, movie, slab=3, compute_dtype=None,
                         apply_fn=unet2d.apply)
    assert np.mean(fast != slow) < 0.005


def test_segment_movie_upsampling_mode_checkpoint():
    """Upsampling-mode checkpoints (no tconv weights) take the parity
    forward with the matching up_mode instead of crashing."""
    params, state = unet2d.init(jax.random.PRNGKey(3), nfb=4,
                                up_mode="upsampling")
    movie = np.random.default_rng(5).integers(
        0, 1000, (4, 32, 32)).astype(np.int16)
    out = segment_movie(params, state, movie, slab=2, compute_dtype=None)
    assert out.shape == (4, 32, 32) and set(np.unique(out)).issubset({0, 1})


def test_segment_movie_sharded_matches_single():
    from deepcalcium_tpu.parallel.mesh import get_mesh

    params, state = unet2d.init(jax.random.PRNGKey(0), nfb=4)
    movie = np.random.default_rng(1).integers(
        0, 1000, (16, 32, 32)).astype(np.int16)
    single = segment_movie(params, state, movie, slab=8, compute_dtype=None)
    sharded = segment_movie(params, state, movie, slab=8, compute_dtype=None,
                            mesh=get_mesh(8))
    np.testing.assert_array_equal(single, sharded)


def test_mask_outlines_smoke():
    img = np.random.default_rng(0).random((32, 32)).astype(np.float32)
    m = np.zeros((32, 32), np.uint8)
    m[10:16, 10:16] = 1
    out = mask_outlines(img, [m], ["red"])
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
    # Boundary pixels are red-dominant; interior untouched by stroke.
    assert out[10, 12, 0] > out[10, 12, 2]
    assert (out[12, 12] != np.array([255, 0, 0])).any()


def test_realistic_fixture_contract(tmp_path):
    from deepcalcium_tpu.data.fixtures import make_realistic_hdf5
    from deepcalcium_tpu.ops.mask_summary import mask_summary_exact

    p = make_realistic_hdf5(str(tmp_path / "r.hdf5"), "real.0",
                            shape=(64, 64), nb_frames=16, nb_neurons=10,
                            seed=3)
    with h5py.File(p, "r") as fp:
        masks = fp["masks/raw"][...]
        raw = fp["series/raw"][...]
        assert raw.shape == (16, 64, 64) and raw.dtype == np.int16
        assert masks.shape[0] == 10
    # Neurons are soft disks with positive area; erosion keeps most pixels.
    summ = mask_summary_exact(masks)
    assert summ.sum() > 0.5 * masks.max(axis=0).sum()


def test_sj_matlab_loader_flat_schema(tmp_path):
    from scipy.io import savemat

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
    from examples.neurons.unet2ds_sj import load_matlab_centers

    p = str(tmp_path / "ann.mat")
    savemat(p, {"centers": np.array([[10.2, 30.7], [12.9, 8.1]]), "radius": 3})
    centers, radius = load_matlab_centers(p)
    assert centers == [(10, 13), (31, 8)] and radius == 3
