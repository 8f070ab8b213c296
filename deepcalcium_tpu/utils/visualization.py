"""Visualization: outlined masks, trace/spike plots, movie export.

Parity targets:
- ``mask_outlines`` (reference ``utils/neurons.py:183-227``): base image
  clipped at the 99th percentile, scaled to [0,1], RGB, with per-component
  stroke outlines alpha-merged on top. The reference used the ``regional``
  package for strokes; here an outline is mask minus its erosion
  (scipy.ndimage), which is the same 1-px boundary.
- ``plot_traces_spikes`` (reference ``utils/spikes.py:60-107``): black trace,
  cyan dots at ground-truth spikes, red segments at predictions.
- ``dataset_to_mp4`` (reference ``utils/neurons.py:140-180``): grayscale
  movie with cyan neuron outlines burned in; writes via imageio/matplotlib
  if available, else falls back to a directory of PNG frames.
"""

import logging
import os

import numpy as np
from scipy import ndimage

_COLORS = {
    "red": (1.0, 0.0, 0.0),
    "green": (0.0, 1.0, 0.0),
    "blue": (0.0, 0.3, 1.0),
    "cyan": (0.4, 1.0, 1.0),
    "white": (1.0, 1.0, 1.0),
    "yellow": (1.0, 1.0, 0.0),
}


def _outline(mask: np.ndarray) -> np.ndarray:
    """1-px boundary of a binary mask (mask minus erosion)."""
    m = np.asarray(mask) > 0
    er = ndimage.binary_erosion(m, structure=np.ones((3, 3)))
    return m & ~er


def mask_outlines(img: np.ndarray, mask_arrs=(), colors=()) -> np.ndarray:
    """Base image with colored outlines for each mask; uint8 RGB (H, W, 3)."""
    assert len(mask_arrs) == len(colors), "One color per mask."
    img = np.asarray(img, np.float32)
    hi = np.percentile(img, 99)
    img = np.clip(img, img.min(), hi)
    rng = img.max() - img.min()
    img = (img - img.min()) / (rng if rng > 0 else 1.0)
    rgb = np.stack([img] * 3, axis=-1)

    oln = np.zeros_like(rgb)
    for m, c in zip(mask_arrs, colors):
        if np.sum(m) == 0:
            continue
        col = np.array(_COLORS.get(c, _COLORS["red"]), np.float32)
        edge = _outline(m)
        oln[edge] = col

    oln_msk = oln.max(axis=-1, keepdims=True)
    merged = oln * oln_msk + rgb * (1.0 - oln_msk)
    return (np.clip(merged, 0, 1) * 255).astype(np.uint8)


def save_png(path: str, arr: np.ndarray) -> None:
    """Save a (H, W) or (H, W, 3) array as PNG (PIL)."""
    from PIL import Image

    a = np.asarray(arr)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(a).save(path)


def plot_traces_spikes(traces, spikes_true=None, spikes_pred=None, title=None,
                       save_path=None, dpi=100, fig_width=20, legend=True):
    """Per-trace subplot figure (reference utils/spikes.py:60-107)."""
    import matplotlib

    if save_path:
        matplotlib.use("agg")
    import matplotlib.pyplot as plt

    traces = np.asarray(traces)
    n = traces.shape[0]
    fig, axes = plt.subplots(n, 1, figsize=(fig_width, n * 1.7), squeeze=False)
    axes = [ax for row in axes for ax in row]
    for i, ax in enumerate(axes):
        t = traces[i]
        ax.plot(t, c="k", linewidth=1.0)
        if spikes_true is not None:
            (xxt,) = np.where(np.asarray(spikes_true)[i] == 1)
            ax.scatter(xxt, t[xxt], c="cyan", marker="o", s=150, alpha=0.8,
                       label="Ground-truth spike")
        if spikes_pred is not None:
            (xx,) = np.where(np.round(np.asarray(spikes_pred)[i]) == 1)
            label = "Predicted spikes"
            for x in xx:
                x1 = min(x + 1, len(t) - 1)
                ax.plot([x, x1], t[[x, x1]], "r", label=label)
                label = None
        if legend and (i == 0 or i == n - 1):
            ax.legend(loc="lower left", ncol=3)
        ax.set_ylabel("Brightness")
        ax.set_xlabel("Time steps")
    plt.subplots_adjust(hspace=0.7)
    if title:
        plt.suptitle(title)
    if save_path:
        plt.savefig(save_path, dpi=dpi, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
    else:  # pragma: no cover
        plt.show()


def dataset_to_mp4(s, m, mp4_path):
    """Movie export with cyan outlines (reference utils/neurons.py:140-180).

    Uses imageio's ffmpeg writer when present; otherwise writes PNG frames to
    ``<mp4_path>.frames/`` so the capability degrades gracefully without the
    codec dependency.
    """
    logger = logging.getLogger(__name__)
    s = np.asarray(s, np.float32)
    s = (s - s.min()) / max(s.max() - s.min(), 1e-9) * 255

    # Cast BEFORE replicating to RGB: repeating the float32 movie first
    # materializes a ~12 B/px transient (~9.4 GB for a 3000x512^2 movie) on
    # a small host; uint8-first is 1/4 of that.
    video = np.repeat(s.astype(np.uint8)[..., None], 3, axis=-1)
    if m is not None:
        edges = np.zeros(s.shape[1:], bool)
        for i in range(m.shape[0]):
            edges |= _outline(m[i])
        video[:, edges, :] = np.array([102, 255, 255], np.uint8)

    try:
        import imageio.v2 as imageio

        imageio.mimwrite(mp4_path, video, fps=30)
        logger.info("Saved video %s", mp4_path)
        return
    except Exception:
        pass
    try:
        # No ffmpeg plugin: animated GIF needs only Pillow.
        import imageio.v2 as imageio

        gif_path = os.path.splitext(mp4_path)[0] + ".gif"
        imageio.mimwrite(gif_path, video, duration=1000 / 30, loop=0)
        logger.warning("No mp4 codec available; saved GIF %s instead", gif_path)
        return
    except Exception:
        pass
    frames_dir = mp4_path + ".frames"
    os.makedirs(frames_dir, exist_ok=True)
    step = max(1, len(video) // 100)
    for i in range(0, len(video), step):
        save_png(os.path.join(frames_dir, f"frame_{i:06d}.png"), video[i])
    logger.warning(
        "No video writer available; wrote every %dth frame (%d PNGs of %d "
        "total) to %s", step, -(-len(video) // step), len(video), frames_dir)
