"""GLM spike inference: the TPU-native replacement for the C2S baseline.

The reference's ``C2SSegmentation`` wrapped the external c2s package (C++
CMT/liblbfgs STM models) and is broken upstream (SURVEY §2 row 29; see
models/c2s_segmentation.py). Instead of porting the breakage, this module
provides the working equivalent capability — classical (non-deep) spike
inference from calcium traces — as a convolutional generalized linear model:

    p(spike_t) = sigmoid(w · x[t-k..t+k] + b)

i.e. a single learned temporal filter + bias, trained by weighted logistic
regression with optax. This is the linear core of c2s's STM (minus the
quadratic feature mixture), runs entirely under jit on TPU, and slots into
the same wrapper API as UNet1DSegmentation (fit/predict over the
``traces``/``spikes`` HDF5 contract).

It is intentionally small: a baseline to compare UNet1D against, not the
flagship.
"""

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepcalcium_tpu.models.unet_1d_segmentation import (
    get_dataset_attrs,
    get_dataset_spikes,
    get_dataset_traces,
    maxpool_labels,
)
from deepcalcium_tpu.ops import losses as L
from deepcalcium_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from deepcalcium_tpu.utils.config import checkpoints_dir
from deepcalcium_tpu.utils.runtime import funcname

__all__ = ["GLMSegmentation", "glm_init", "glm_apply"]


def glm_init(key, filter_len: int = 41):
    assert filter_len % 2 == 1, "temporal filter length must be odd"
    return {
        "w": jax.random.normal(key, (filter_len,), jnp.float32) * 0.01,
        "b": jnp.zeros((), jnp.float32),
    }


def glm_apply(params, traces):
    """(R, T) traces -> (R, T) spike probabilities via one SAME conv."""
    w = params["w"][:, None, None]  # (K, 1, 1) WIO
    x = traces[..., None].astype(jnp.float32)  # (R, T, 1)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))
    return jax.nn.sigmoid(y[..., 0] + params["b"])


class GLMSegmentation:
    """Classical spike-inference wrapper (fit/predict), C2S-capability slot."""

    def __init__(self, cpdir=None, filter_len: int = 41,
                 dataset_attrs_func=get_dataset_attrs,
                 dataset_traces_func=get_dataset_traces,
                 dataset_spikes_func=get_dataset_spikes):
        self.cpdir = cpdir or os.path.join(checkpoints_dir(), "spikes_glm")
        os.makedirs(self.cpdir, exist_ok=True)
        self.filter_len = filter_len
        self.dataset_attrs_func = dataset_attrs_func
        self.dataset_traces_func = dataset_traces_func
        self.dataset_spikes_func = dataset_spikes_func

    def fit(self, dataset_paths, error_margin=4, nb_epochs=200,
            learning_rate=1e-2, prop_trn=0.8, seed=865):
        """Full-batch weighted logistic regression; returns
        (metrics_trn, metrics_val, checkpoint_path)."""
        logger = logging.getLogger(funcname())
        traces = np.concatenate(
            [self.dataset_traces_func(p) for p in dataset_paths])
        spikes = np.concatenate(
            [self.dataset_spikes_func(p) for p in dataset_paths])
        spikes = maxpool_labels(spikes, int(error_margin))

        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(traces))
        n_trn = int(len(idx) * prop_trn)
        tr_t, tr_v = traces[idx[:n_trn]], traces[idx[n_trn:]]
        sp_t, sp_v = spikes[idx[:n_trn]], spikes[idx[n_trn:]]

        params = glm_init(jax.random.PRNGKey(seed), self.filter_len)
        opt = optax.adam(learning_rate)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, x, y):
            def lfn(p):
                probs = glm_apply(p, x)
                return jnp.mean(
                    L.weighted_binary_crossentropy(y, probs, weightpos=2.0))

            loss, grads = jax.value_and_grad(lfn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        xt, yt = jnp.asarray(tr_t, jnp.float32), jnp.asarray(sp_t, jnp.float32)
        for epoch in range(nb_epochs):
            params, opt_state, loss = step(params, opt_state, xt, yt)
        logger.info("GLM trained: final loss %.4f", float(loss))

        def metrics(x, y):
            probs = np.asarray(glm_apply(params, jnp.asarray(x, jnp.float32)))
            return {k: float(np.mean(np.asarray(fn(y, probs))))
                    for k, fn in L.SPIKE_METRICS.items()}

        mt, mv = metrics(tr_t, sp_t), metrics(tr_v, sp_v)
        path = os.path.join(self.cpdir, f"{int(time.time())}_glm.ckpt")
        save_checkpoint(path, params, {}, meta={"val_F2": mv["F2"]})
        for k in sorted(mt):
            logger.info("%-10s trn=%-9.4f val=%-9.4f", k, mt[k], mv[k])
        return mt, mv, path

    def predict(self, dataset_paths, model_path, threshold=0.5):
        """(list of (R, T) uint8 spike masks, names)."""
        params, _, _, _ = load_checkpoint(
            model_path, glm_init(jax.random.PRNGKey(0), self.filter_len), {})
        preds, names = [], []
        for p in dataset_paths:
            names.append(self.dataset_attrs_func(p)["name"])
            traces = self.dataset_traces_func(p)
            probs = np.asarray(glm_apply(params, jnp.asarray(traces, jnp.float32)))
            preds.append((probs > threshold).astype(np.uint8))
        return preds, names
