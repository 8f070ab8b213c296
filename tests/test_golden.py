"""Golden regression: frozen checkpoints + inputs must reproduce frozen
outputs.

Guards the numerics of the forward paths across refactors and rounds (the
role the README's fixed-score example plays for the reference, SURVEY §4).
Goldens were generated on CPU at Precision.HIGHEST; regenerate deliberately
(never casually) with the snippet in git history if the architecture
changes on purpose.
"""

import os

import jax
import numpy as np

from deepcalcium_tpu.models import unet1d, unet2d
from deepcalcium_tpu.train.checkpoints import load_checkpoint

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def test_unet2d_forward_golden():
    data = np.load(os.path.join(GOLD, "golden_io.npz"))
    p0, s0 = unet2d.init(jax.random.PRNGKey(0), nfb=4)
    params, state, _, _ = load_checkpoint(
        os.path.join(GOLD, "unet2d_tiny.ckpt"), p0, s0)
    probs, _ = unet2d.apply(params, state, data["x2"],
                            precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(probs), data["y2"],
                               rtol=1e-4, atol=1e-6)


def test_unet1d_forward_golden():
    data = np.load(os.path.join(GOLD, "golden_io.npz"))
    p0, s0 = unet1d.init(jax.random.PRNGKey(0), nfb=4)
    params, state, _, _ = load_checkpoint(
        os.path.join(GOLD, "unet1d_tiny.ckpt"), p0, s0)
    probs, _ = unet1d.apply(params, state, data["x1"], margin=4,
                            precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(probs), data["y1"],
                               rtol=1e-4, atol=1e-6)
