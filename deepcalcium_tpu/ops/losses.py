"""Segmentation losses and metrics as pure JAX functions.

Behavioral parity with the reference Keras-backend implementations:

- 2-D neuron metrics/losses: reference ``utils/neurons.py:13-106``
  (``weighted_binary_crossentropy``, ``prec``, ``reca``, ``F1``, ``jacc``,
  ``jacc_loss``, ``dice``, ``dice_loss``, ``dicesq``, ``dicesq_loss``,
  ``posyt``, ``posyp``).
- 1-D spike metrics/losses: reference ``utils/spikes.py:11-57``
  (``weighted_binary_crossentropy``, ``prec``, ``reca``, ``F2``, ``ytspks``,
  ``ypspks``).

Conventions carried over exactly:
- ``EPS = 1e-7`` plays the role of ``K.epsilon()``.
- Reductions are **global over the whole batch tensor** (the reference calls
  ``K.sum`` with no axis), so precision/recall/F1 are batch-aggregate, not
  per-sample means.
- ``round`` means round-half-away-from-zero is irrelevant here: inputs are
  probabilities in [0, 1], so ``jnp.round`` matches ``K.round``.

Everything here is jit-able and differentiable (the ``*_loss`` variants avoid
rounding, like the reference).
"""

import jax.numpy as jnp

EPS = 1e-7  # K.epsilon() in Keras 2.0.6.


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def binary_crossentropy(yt, yp):
    """Keras ``losses.binary_crossentropy``: elementwise BCE with clipping,
    mean over the last axis. Reference selects it by name
    (``unet_2d_summary.py:372-380``)."""
    ypc = jnp.clip(yp, EPS, 1.0 - EPS)
    bce = -(yt * jnp.log(ypc) + (1.0 - yt) * jnp.log(1.0 - ypc))
    return jnp.mean(bce, axis=-1)


def weighted_binary_crossentropy(yt, yp, weightpos=2.0, weightneg=1.0):
    """Class-weighted BCE; reference ``utils/neurons.py:13-29`` /
    ``utils/spikes.py:11-27`` (identical bodies, ``log(x + 1e-7)`` flavor)."""
    losspos = yt * jnp.log(yp + 1e-7)
    lossneg = (1.0 - yt) * jnp.log(1.0 - yp + 1e-7)
    return -1.0 * (weightpos * losspos + weightneg * lossneg)


def jacc_loss(yt, yp):
    """Smooth (unrounded) Jaccard loss; reference ``utils/neurons.py:61-67``."""
    inter = jnp.sum(yt * yp)
    union = jnp.sum(yt) + jnp.sum(yp) - inter
    return 1.0 - inter / (union + 1e-7)


def dice_loss(yt, yp):
    """Smooth dice loss; reference ``utils/neurons.py:78-83``."""
    inter = jnp.sum(yt * yp)
    return 1.0 - (2.0 * inter) / (jnp.sum(yt) + jnp.sum(yp) + 1e-7)


def dicesq_loss(yt, yp):
    """Negated squared-denominator dice (V-Net, arXiv:1606.04797);
    reference ``utils/neurons.py:93-94``."""
    return -1.0 * dicesq(yt, yp)


# ---------------------------------------------------------------------------
# Metrics (2-D neurons; reference utils/neurons.py)
# ---------------------------------------------------------------------------

def prec(yt, yp):
    """Batch-aggregate pixel precision; reference ``utils/neurons.py:32-35``."""
    ypr = jnp.round(yp)
    return jnp.sum(ypr * yt) / (jnp.sum(ypr) + EPS)


def reca(yt, yp):
    """Batch-aggregate pixel recall; reference ``utils/neurons.py:38-43``."""
    ypr = jnp.round(yp)
    tp = jnp.sum(ypr * yt)
    fn = jnp.sum(jnp.clip(yt - ypr, 0.0, 1.0))
    return tp / (tp + fn + EPS)


def F1(yt, yp):
    """Pixelwise F1 from the aggregate prec/reca; reference
    ``utils/neurons.py:46-50``."""
    p = prec(yt, yp)
    r = reca(yt, yp)
    return (2.0 * p * r) / (p + r + EPS)


def jacc(yt, yp):
    """Rounded Jaccard coefficient; reference ``utils/neurons.py:53-58``."""
    ypr = jnp.round(yp)
    inter = jnp.sum(yt * ypr)
    union = jnp.sum(yt) + jnp.sum(ypr) - inter
    return inter / (union + 1e-7)


def dice(yt, yp):
    """Rounded dice coefficient; reference ``utils/neurons.py:70-75``."""
    ypr = jnp.round(yp)
    inter = jnp.sum(yt * ypr)
    return (2.0 * inter) / (jnp.sum(yt) + jnp.sum(ypr) + 1e-7)


def dicesq(yt, yp):
    """Squared-denominator dice; reference ``utils/neurons.py:86-90``.
    Note: unrounded (used both as metric and, negated, as loss)."""
    nmr = 2.0 * jnp.sum(yt * yp)
    dnm = jnp.sum(yt**2) + jnp.sum(yp**2) + EPS
    return nmr / dnm


def posyt(yt, yp):
    """Positive-pixel proportion of the ground truth; reference
    ``utils/neurons.py:97-100``."""
    size = jnp.sum(jnp.ones_like(yt))
    return jnp.sum(yt) / (size + EPS)


def posyp(yt, yp):
    """Positive-pixel proportion of the rounded prediction; reference
    ``utils/neurons.py:103-106``."""
    size = jnp.sum(jnp.ones_like(yp))
    return jnp.sum(jnp.round(yp)) / (size + EPS)


# ---------------------------------------------------------------------------
# Metrics (1-D spikes; reference utils/spikes.py)
# ---------------------------------------------------------------------------

def F2(yt, yp, beta=2.0):
    """Recall-weighted F-beta (beta=2); reference ``utils/spikes.py:44-47``."""
    p = prec(yt, yp)
    r = reca(yt, yp)
    return (1.0 + beta**2) * ((p * r) / (beta**2 * p + r + EPS))


def ytspks(yt, yp):
    """Spike count per ground-truth sample; reference
    ``utils/spikes.py:50-52``. Returns a per-row vector like the reference."""
    return jnp.sum(yt, axis=1)


def ypspks(yt, yp):
    """Spike count per rounded prediction row; reference
    ``utils/spikes.py:55-57``."""
    return jnp.sum(jnp.round(yp), axis=1)


# ---------------------------------------------------------------------------
# Registries (mirrors the fit-time loss lookup, unet_2d_summary.py:372-380)
# ---------------------------------------------------------------------------

LOSSES = {
    "binary_crossentropy": binary_crossentropy,
    "weighted_binary_crossentropy": weighted_binary_crossentropy,
    "dice_loss": dice_loss,
    "dicesq_loss": dicesq_loss,
}

NEURON_METRICS = {
    "F1": F1,
    "prec": prec,
    "reca": reca,
    "dice": dice,
    "dicesq": dicesq,
    "posyt": posyt,
    "posyp": posyp,
}

SPIKE_METRICS = {
    "F2": F2,
    "prec": prec,
    "reca": reca,
    "ytspks": lambda yt, yp: jnp.mean(ytspks(yt, yp)),
    "ypspks": lambda yt, yp: jnp.mean(ypspks(yt, yp)),
}
