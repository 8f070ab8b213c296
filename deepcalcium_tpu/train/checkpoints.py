"""Checkpoint save/load: atomic pytree serialization.

Replaces the reference's Keras ``ModelCheckpoint`` HDF5 files plus the
input-shape-rewriting loader (``utils/keras_helpers.py:24-68``). The JAX nets
are fully convolutional, so checkpoints carry no input shape at all — one
file serves 128² training and 512² inference.

Format: a single msgpack file (flax.serialization) holding
``{"params", "state", "opt_state"(optional), "meta"}`` written atomically
(tmp + rename) so a preempted TPU job never sees a torn checkpoint.
"""

import os
import tempfile

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, state, opt_state=None, meta: dict | None = None):
    """Atomically serialize a training snapshot to ``path``."""
    payload = {
        "params": _to_host(params),
        "state": _to_host(state),
        "opt_state": _to_host(opt_state) if opt_state is not None else {},
        "meta": meta or {},
    }
    blob = serialization.to_bytes(payload)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fp:
            fp.write(blob)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path


def load_checkpoint(path: str, params_like, state_like, opt_state_like=None):
    """Deserialize a snapshot; ``*_like`` provide the pytree structure.

    # Returns
        (params, state, opt_state_or_None, meta)
    """
    with open(path, "rb") as fp:
        blob = fp.read()
    # msgpack_restore needs no target (meta has arbitrary keys); the
    # structured pytrees are then rebuilt against their templates.
    raw = serialization.msgpack_restore(blob)
    params = serialization.from_state_dict(params_like, raw["params"])
    state = serialization.from_state_dict(state_like, raw["state"])
    opt = None
    if opt_state_like is not None and raw.get("opt_state"):
        opt = serialization.from_state_dict(opt_state_like, raw["opt_state"])
    return params, state, opt, raw.get("meta", {})


def latest_checkpoint(cpdir: str, prefix: str = "") -> str | None:
    """Newest checkpoint by mtime (the reference picks best-by-mtime too,
    ``unet_1d_segmentation.py:304-307``)."""
    if not os.path.isdir(cpdir):
        return None
    cands = [
        os.path.join(cpdir, f)
        for f in os.listdir(cpdir)
        if f.startswith(prefix) and f.endswith(".ckpt")
    ]
    if not cands:
        return None
    return max(cands, key=os.path.getmtime)
