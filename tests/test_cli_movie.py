"""The movie-level CLI subcommands (evaluate-movie, segment) end-to-end on
fixture data with a saved checkpoint."""

import os

import h5py
import jax
import numpy as np
import pytest


@pytest.fixture()
def fixture_env(tmp_path, monkeypatch):
    from deepcalcium_tpu.data.fixtures import make_neurons_hdf5
    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.train.checkpoints import save_checkpoint

    monkeypatch.setenv("DEEPCALCIUM_TPU_DIR", str(tmp_path / "dc"))
    ds = make_neurons_hdf5(str(tmp_path / "d" / "dataset.hdf5"),
                           name="cli.0", shape=(48, 48), nb_frames=16)
    # The CLI constructs the stock net (nfb=32), so the checkpoint must
    # match; the 48x48 fixture keeps the forward compile small.
    params, state = unet2d.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, params, state)
    return ds, ckpt, tmp_path


def test_cli_evaluate_movie(fixture_env):
    from deepcalcium_tpu.cli import main

    ds, ckpt, tmp_path = fixture_env
    out = str(tmp_path / "ev.npz")
    png = str(tmp_path / "ev.png")
    main(["evaluate-movie", ds, "-m", ckpt, "--window", "48",
          "--out", out, "--png", png])
    z = np.load(out)
    assert z["mask"].shape == (48, 48) and z["mask"].dtype == np.uint8
    assert z["prob"].shape == (48, 48)
    assert os.path.exists(png)


def test_cli_segment(fixture_env):
    from deepcalcium_tpu.cli import main

    ds, ckpt, tmp_path = fixture_env
    out = str(tmp_path / "masks.hdf5")
    main(["segment", ds, "-m", ckpt, "--slab", "8", "--out", out])
    with h5py.File(out, "r") as fp:
        masks = fp["masks/frames"][...]
    assert masks.shape == (16, 48, 48) and masks.dtype == np.uint8
    assert set(np.unique(masks)).issubset({0, 1})
