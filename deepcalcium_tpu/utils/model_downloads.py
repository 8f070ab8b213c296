"""Released-model download helper.

Parity with reference ``download_model`` (``utils/keras_helpers.py:14-21``):
idempotent urlretrieve of the released weights. The reference release URLs
(``unet_2d_summary.py:28``, ``unet_1d_segmentation.py:23``) point at Keras
HDF5 files — load them through
:mod:`deepcalcium_tpu.interop.keras_import` after downloading.
"""

import logging
import os
from urllib import request

from deepcalcium_tpu.utils.runtime import funcname

# Reference released weights (Keras HDF5 format; import via interop).
UNET2DS_MODEL_URL = (
    "https://github.com/alexklibisz/deep-calcium/releases/download/"
    "v0.0.1-weights/unet2ds_model.hdf5")
UNET1D_MODEL_URL = (
    "https://github.com/alexklibisz/deep-calcium/releases/download/"
    "v0.0.1-weights/unet1d_model.hdf5")


def download_model(url: str, save_path: str) -> str:
    """Idempotent model download; returns save_path."""
    logger = logging.getLogger(funcname())
    if os.path.exists(save_path):
        logger.info("Model already downloaded at %s", save_path)
        return save_path
    logger.info("Downloading model from %s to %s", url, save_path)
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    # tmp+rename: idempotency keys on save_path existing, so a partial
    # download must never land there (it would be treated as complete
    # forever after).
    tmp = save_path + ".tmp"
    request.urlretrieve(url, tmp)
    os.replace(tmp, save_path)
    logger.info("Download complete.")
    return save_path
