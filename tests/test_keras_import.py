"""Keras HDF5 weight import: synthesize a Keras-format file, import, verify.

No Keras/TF in this environment, so the fixture writes the exact
``save_model`` HDF5 layout (model_weights group, layer_names/weight_names
attrs) with random weights in Keras shape conventions.
"""

import h5py
import numpy as np
import pytest

from deepcalcium_tpu.interop.keras_import import (
    load_unet1d_keras,
    load_unet2ds_keras,
)
from deepcalcium_tpu.models import unet1d, unet2d


def _write_keras_h5(path, layer_table, expected_shapes,
                    weightless_every=3, kind_1d=False):
    """Write a Keras-2.0.6-layout file for the given layer table."""
    rng = np.random.default_rng(0)
    conv_prefix = "conv1d" if kind_1d else "conv2d"
    counters = {"conv": 0, "tconv": 0, "bn": 0, "junk": 0}
    layer_names, groups = [], {}
    expected = {}

    def add_weightless():
        counters["junk"] += 1
        nm = f"max_pooling_{counters['junk']}"
        layer_names.append(nm)
        groups[nm] = {}

    for i, (name, kind, cout) in enumerate(layer_table):
        if i % weightless_every == 0:
            add_weightless()
        if kind in ("conv3", "conv5", "conv1"):
            counters["conv"] += 1
            lname = f"{conv_prefix}_{counters['conv']}"
            k = {"conv3": (3, 3), "conv5": (5,), "conv1": (1, 1) if not kind_1d else (1,)}[kind]
            # Post-concat convs have larger fan-in; read from our init shapes.
            kshape = expected_shapes[name]["kernel"]
            ws = {f"{lname}/kernel:0": rng.standard_normal(kshape).astype(np.float32),
                  f"{lname}/bias:0": rng.standard_normal((cout,)).astype(np.float32)}
        elif kind == "tconv":
            counters["tconv"] += 1
            lname = f"conv2d_transpose_{counters['tconv']}"
            kshape = expected_shapes[name]["kernel"]
            ws = {f"{lname}/kernel:0": rng.standard_normal(kshape).astype(np.float32),
                  f"{lname}/bias:0": rng.standard_normal((cout,)).astype(np.float32)}
        else:  # bn
            counters["bn"] += 1
            lname = f"batch_normalization_{counters['bn']}"
            ws = {f"{lname}/gamma:0": rng.standard_normal((cout,)).astype(np.float32),
                  f"{lname}/beta:0": rng.standard_normal((cout,)).astype(np.float32),
                  f"{lname}/moving_mean:0": rng.standard_normal((cout,)).astype(np.float32),
                  f"{lname}/moving_variance:0": rng.random((cout,)).astype(np.float32) + 0.5}
        layer_names.append(lname)
        groups[lname] = ws
        expected[name] = ws

    with h5py.File(path, "w") as fp:
        fp.attrs["model_config"] = b"{}"
        mw = fp.create_group("model_weights")
        mw.attrs["layer_names"] = np.array([n.encode() for n in layer_names])
        for lname in layer_names:
            g = mw.create_group(lname)
            ws = groups[lname]
            g.attrs["weight_names"] = np.array([w.encode() for w in ws])
            for wname, arr in ws.items():
                g.create_dataset(wname, data=arr)
    return expected


@pytest.fixture(scope="module")
def init_shapes_2d():
    import jax

    params, state = unet2d.init(jax.random.PRNGKey(0), nfb=4)
    return {k: {kk: vv.shape for kk, vv in v.items()} for k, v in params.items()}


@pytest.fixture(scope="module")
def init_shapes_1d():
    import jax

    params, state = unet1d.init(jax.random.PRNGKey(0), nfb=4)
    return {k: {kk: vv.shape for kk, vv in v.items()} for k, v in params.items()}


def test_unet2ds_import_roundtrip(tmp_path, init_shapes_2d):
    path = str(tmp_path / "unet2ds_model.hdf5")
    expected = _write_keras_h5(path, unet2d.layer_order(4), init_shapes_2d)

    params, state = load_unet2ds_keras(path, nfb=4)

    # Every kernel landed at the right layer.
    for name in params:
        ws = expected[name]
        for key in params[name]:
            kname = {"kernel": "kernel", "bias": "bias",
                     "gamma": "gamma", "beta": "beta"}[key]
            src = [v for k, v in ws.items() if f"/{kname}:" in k][0]
            np.testing.assert_array_equal(params[name][key], src)
    for name in state:
        ws = expected[name]
        np.testing.assert_array_equal(
            state[name]["mean"], [v for k, v in ws.items() if "moving_mean" in k][0])
        np.testing.assert_array_equal(
            state[name]["var"], [v for k, v in ws.items() if "moving_variance" in k][0])

    # Imported net runs at full-image shape.
    probs, _ = unet2d.apply(params, state, np.zeros((1, 64, 64), np.float32))
    assert probs.shape == (1, 64, 64)


def test_unet1d_import_roundtrip(tmp_path, init_shapes_1d):
    path = str(tmp_path / "unet1d_model.hdf5")
    expected = _write_keras_h5(path, unet1d.layer_order(4), init_shapes_1d,
                               kind_1d=True)
    params, state = load_unet1d_keras(path, nfb=4)
    # VALUES, not just shape: a slot-swap bug (gamma/beta crossed, two
    # same-width convs exchanged) yields a valid shape but wrong numerics.
    for name in params:
        ws = expected[name]
        for key in params[name]:
            src = [v for k, v in ws.items() if f"/{key}:" in k][0]
            np.testing.assert_array_equal(params[name][key], src)
    for name in state:
        ws = expected[name]
        np.testing.assert_array_equal(
            state[name]["mean"],
            [v for k, v in ws.items() if "moving_mean" in k][0])
        np.testing.assert_array_equal(
            state[name]["var"],
            [v for k, v in ws.items() if "moving_variance" in k][0])
    probs, _ = unet1d.apply(params, state, np.zeros((1, 64), np.float32))
    assert probs.shape == (1, 64)


def test_import_rejects_wrong_order(tmp_path, init_shapes_2d):
    """Swapping two layers must produce a loud error, not silent garbage."""
    path = str(tmp_path / "bad.hdf5")
    _write_keras_h5(path, unet2d.layer_order(4), init_shapes_2d)
    with h5py.File(path, "a") as fp:
        names = list(fp["model_weights"].attrs["layer_names"])
        # Swap the first conv and first bn.
        i = names.index(b"conv2d_1")
        j = names.index(b"batch_normalization_1")
        names[i], names[j] = names[j], names[i]
        fp["model_weights"].attrs["layer_names"] = np.array(names)
    with pytest.raises(ValueError):
        load_unet2ds_keras(path, nfb=4)


def test_fit_warm_start_from_keras_hdf5(tmp_path):
    """Training continuity from Keras checkpoints (reference
    fit(model_path=..., proceed=...), unet_2d_summary.py:383-394): fit must
    start from the imported Keras weights, not a fresh init. With lr=0 the
    Adam updates are exactly zero, so the epoch-0 checkpoint's params must
    equal the Keras file's weights bit-for-bit."""
    import functools

    import jax

    from deepcalcium_tpu.data.fixtures import (
        make_keras_unet2ds_hdf5, make_neurons_hdf5)
    from deepcalcium_tpu.models.unet_2d_summary import UNet2DSummary
    from deepcalcium_tpu.train.checkpoints import load_checkpoint

    ds = make_neurons_hdf5(str(tmp_path / "d" / "dataset.hdf5"),
                           name="warm.0", shape=(96, 96), nb_frames=16)
    keras_ckpt = make_keras_unet2ds_hdf5(str(tmp_path / "unet2ds_model.hdf5"),
                                         nfb=4)
    model = UNet2DSummary(
        cpdir=str(tmp_path / "cp"),
        net_init_func=functools.partial(unet2d.init, nfb=4))
    history, best = model.fit(
        [ds], model_path=keras_ckpt, proceed=True, learning_rate=0.0,
        shape_trn=(32, 32), shape_val=(96, 96), batch_size_trn=2,
        nb_steps_trn=1, nb_epochs=1)
    assert best is not None and np.isfinite(history["loss"][0])

    kp, ks = load_unet2ds_keras(keras_ckpt)
    p_like, s_like = unet2d.init(jax.random.PRNGKey(0), nfb=4)
    params, _, _, _ = load_checkpoint(best, p_like, s_like)
    for lname in kp:
        for wname in kp[lname]:
            np.testing.assert_array_equal(
                np.asarray(params[lname][wname]), kp[lname][wname])


def test_cli_convert_keras_to_ckpt(tmp_path):
    """dc-tpu convert model.hdf5 model.ckpt produces a loadable native
    checkpoint with the same weights."""
    import jax

    from deepcalcium_tpu.cli import main
    from deepcalcium_tpu.data.fixtures import make_keras_unet2ds_hdf5
    from deepcalcium_tpu.train.checkpoints import load_checkpoint

    src = make_keras_unet2ds_hdf5(str(tmp_path / "unet2ds_model.hdf5"), nfb=4)
    dst = str(tmp_path / "unet2ds_model.ckpt")
    main(["convert", src, dst])

    kp, ks = load_unet2ds_keras(src)
    p_like, s_like = unet2d.init(jax.random.PRNGKey(0), nfb=4)
    params, state, _, meta = load_checkpoint(dst, p_like, s_like)
    for lname in kp:
        for wname in kp[lname]:
            np.testing.assert_array_equal(
                np.asarray(params[lname][wname]), kp[lname][wname])
    assert meta["arch"] == "unet2ds"
    probs, _ = unet2d.apply(params, state, np.zeros((1, 64, 64), np.float32))
    assert probs.shape == (1, 64, 64)


def test_predict_directly_from_keras_hdf5(tmp_path):
    """Migration path: UNet2DSummary.predict(model_path='*.hdf5') routes a
    Keras checkpoint through the import shim transparently."""
    import functools

    from deepcalcium_tpu.data.fixtures import (
        make_keras_unet2ds_hdf5, make_neurons_hdf5)
    from deepcalcium_tpu.models.unet_2d_summary import UNet2DSummary

    ds = make_neurons_hdf5(str(tmp_path / "d" / "dataset.hdf5"),
                           name="mig.0", shape=(96, 96), nb_frames=16)
    keras_ckpt = make_keras_unet2ds_hdf5(str(tmp_path / "unet2ds_model.hdf5"),
                                         nfb=4)
    model = UNet2DSummary(
        cpdir=str(tmp_path / "cp"),
        net_init_func=functools.partial(unet2d.init, nfb=4))
    Mp, names = model.predict([ds], keras_ckpt, window_shape=(96, 96),
                              augmentation=True)
    assert names == ["mig.0"] and Mp[0].shape == (96, 96)


def test_import_rejects_wrong_kernel_size(tmp_path, init_shapes_2d):
    """A variant net with the same filter schedule but 5x5 convs must be
    rejected (silent wrong numerics would defeat score-parity validation)."""
    path = str(tmp_path / "k5.hdf5")
    _write_keras_h5(path, unet2d.layer_order(4), init_shapes_2d)
    with h5py.File(path, "a") as fp:
        g = fp["model_weights/conv2d_1"]
        wn = [n.decode() if isinstance(n, bytes) else n
              for n in g.attrs["weight_names"]]
        kname = [n for n in wn if "kernel" in n][0]
        k = np.asarray(g[kname])
        del g[kname]
        g.create_dataset(kname, data=np.zeros((5, 5) + k.shape[2:],
                                              k.dtype))
    with pytest.raises(ValueError, match="conv"):
        load_unet2ds_keras(path, nfb=4)


def test_import_rejects_truncated_checkpoint(tmp_path, init_shapes_2d):
    """Fewer weight-bearing layers than the table must raise a diagnostic
    ValueError, not a bare StopIteration."""
    path = str(tmp_path / "short.hdf5")
    _write_keras_h5(path, unet2d.layer_order(4), init_shapes_2d)
    with h5py.File(path, "a") as fp:
        names = list(fp["model_weights"].attrs["layer_names"])
        fp["model_weights"].attrs["layer_names"] = np.array(names[:-4])
    with pytest.raises(ValueError, match="ran out"):
        load_unet2ds_keras(path, nfb=4)
