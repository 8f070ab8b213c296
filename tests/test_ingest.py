"""TIFF-tree ingest -> HDF5 contract (reference nf.py:99-150 behavior)."""

import os
import h5py
import numpy as np
import pytest

from deepcalcium_tpu.data.fixtures import make_tiff_tree
from deepcalcium_tpu.data.nf import _resolve_names, ingest_tiff_dataset, NEUROFINDER_NAMES


def test_ingest_contract(tmp_path):
    ds_dir, movie, masks = make_tiff_tree(str(tmp_path), "synthetic.01.00",
                                          shape=(48, 48), nb_frames=12)
    out = ingest_tiff_dataset(ds_dir, str(tmp_path / "dataset.hdf5"),
                              "synthetic.01.00", chunk=5)
    with h5py.File(out, "r") as fp:
        assert fp.attrs["name"] == "synthetic.01.00"
        raw = fp["series/raw"][...]
        mean = fp["series/mean"][...]
        mx = fp["series/max"][...]
        m_raw = fp["masks/raw"][...]
        m_max = fp["masks/max"][...]
        assert raw.dtype == np.int16 and mean.dtype == np.float16
        assert mx.dtype == np.int16 and m_raw.dtype == np.int8
    np.testing.assert_array_equal(raw, movie)
    np.testing.assert_array_equal(mx, movie.max(0))
    # float16 storage quantum bounds the mean error.
    np.testing.assert_allclose(mean.astype(np.float32), movie.mean(0), rtol=2e-3)
    np.testing.assert_array_equal(m_raw, masks)
    np.testing.assert_array_equal(m_max, masks.max(0))


def test_ingest_test_set_has_no_masks(tmp_path):
    ds_dir, _, _ = make_tiff_tree(str(tmp_path), "synthetic.00.00.test",
                                  nb_frames=6, test_set=True)
    out = ingest_tiff_dataset(ds_dir, str(tmp_path / "d.hdf5"),
                              "synthetic.00.00.test")
    with h5py.File(out, "r") as fp:
        assert "masks" not in fp
        assert "series/mean" in fp


def test_resolve_names():
    assert len(_resolve_names("all")) == 28
    assert len(_resolve_names("all_train")) == 19
    assert len(_resolve_names("all_test")) == 9
    assert _resolve_names("neurofinder.00.00,neurofinder.01.00") == [
        "neurofinder.00.00", "neurofinder.01.00"]
    assert _resolve_names(["a", "b"]) == ["a", "b"]
    assert all(n in NEUROFINDER_NAMES for n in _resolve_names("all"))


def test_pil_fallback_zero_fills_bad_frame(tmp_path, monkeypatch):
    """A frame with the wrong resolution must zero-fill + warn on the PIL
    fallback tier exactly like the native decoder does (reference corrupt-
    TIFF tolerance, unet2ds_sj.py:75-82) — not abort the ingest."""
    from PIL import Image

    from deepcalcium_tpu.data import tiff_native
    from deepcalcium_tpu.data.fixtures import make_tiff_tree
    from deepcalcium_tpu.data.nf import ingest_tiff_dataset

    root, movie, _ = make_tiff_tree(str(tmp_path), "bad.00.00",
                                    shape=(24, 24), nb_frames=6)
    # Corrupt frame 3: a different resolution.
    bad = os.path.join(root, "images", "image00003.tiff")
    Image.fromarray(np.zeros((10, 10), np.int32), mode="I").save(bad)
    monkeypatch.setattr(tiff_native, "available", lambda: False)

    ds = ingest_tiff_dataset(root, os.path.join(root, "dataset.hdf5"),
                             "bad.00.00")
    with h5py.File(ds, "r") as fp:
        raw = fp["series/raw"][...]
    assert raw.shape == (6, 24, 24)
    assert raw[3].sum() == 0          # zero-filled
    assert raw[2].sum() > 0           # neighbors intact
