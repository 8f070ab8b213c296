"""Shared TIFF->HDF5 series ingestion core.

One implementation of the decode-and-reduce flow used by both the
Neurofinder ingester (data/nf.py) and the custom/new-data ingester
(data/custom.py): chunked decode via the native thread-pool loader (PIL
fallback), corrupted-frame zero-fill with a warning (reference
``unet2ds_sj.py:75-82``), raw frames to HDF5, mean/max folded on device
(ops.summary.StreamingSummary), ``series/mean`` stored float16 per the
contract (reference ``nf.py:121-124``).
"""

import logging

import numpy as np

from deepcalcium_tpu.ops.summary import StreamingSummary

logger = logging.getLogger(__name__)


def read_tiff(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im)


def decode_chunk(paths, i_shape) -> np.ndarray:
    """Decode TIFF paths -> (N, H, W) int16; corrupted frames zero-fill."""
    from deepcalcium_tpu.data import tiff_native

    if tiff_native.available():
        frames, status = tiff_native.decode_batch(list(paths), *i_shape)
        for i, (p, bad) in enumerate(zip(paths, status)):
            if bad:
                # The native tier flags layouts it does not decode exactly
                # (exotic sample formats, odd strip/tile arrangements) as
                # well as genuinely corrupt files. Retry flagged frames on
                # the PIL tier before declaring them corrupt — the fast
                # path must never be a correctness downgrade vs. PIL.
                try:
                    frames[i] = read_tiff(p)  # raises on shape mismatch
                    logger.info("Native decode failed on %s; PIL tier "
                                "recovered it.", p)
                except (OSError, ValueError) as e:
                    logger.warning("Error on file %s: %s — zero-filled.",
                                   p, e)
        return frames
    out = np.zeros((len(paths),) + tuple(i_shape), np.int16)
    for i, p in enumerate(paths):
        try:
            out[i] = read_tiff(p)
        except (OSError, ValueError) as e:
            # ValueError too: a frame with the wrong resolution/sample
            # layout must zero-fill like the native tier does (decode_one
            # returns a bad status on dimension mismatch) — the reference's
            # corrupt-frame tolerance (unet2ds_sj.py:75-82) holds on every
            # decode tier.
            logger.warning("Error on file %s: %s — zero-filling.", p, e)
    return out


def write_series(dsf, s_paths, i_shape, chunk: int = 64) -> None:
    """Populate series/{raw,mean,max} in an open HDF5 file from TIFF paths.

    Per-phase throughput (decode / hdf5-write / reduce) is measured with a
    ThroughputMeter and logged — ingest was the reference's end-to-end
    bottleneck (~205 frames/s, BASELINE.md), so the split is first-class
    observability here.
    """
    from deepcalcium_tpu.utils.profiling import ThroughputMeter

    t = len(s_paths)
    raw = dsf.create_dataset("series/raw", (t,) + tuple(i_shape), dtype="int16")
    summ = StreamingSummary(tuple(i_shape), dtype=np.int16)
    meter = ThroughputMeter()
    for base in range(0, t, chunk):
        n = len(s_paths[base : base + chunk])
        with meter.track("decode", n):
            frames = decode_chunk(s_paths[base : base + chunk], i_shape)
        with meter.track("hdf5_write", n):
            raw[base : base + frames.shape[0]] = frames
        with meter.track("reduce", n):
            summ.update(frames)
    mean, mx = summ.result()
    dsf.create_dataset("series/mean", data=mean.astype(np.float16),
                       dtype="float16")
    dsf.create_dataset("series/max", data=mx, dtype="int16")
    logger.info("ingest throughput (frames/s): %s",
                {k: round(v, 1) for k, v in meter.rates().items()})
