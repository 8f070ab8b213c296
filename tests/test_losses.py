"""Losses/metrics vs NumPy oracles (reference utils/neurons.py / spikes.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepcalcium_tpu.ops import losses as L

EPS = 1e-7


@pytest.fixture
def yt_yp(rng):
    yt = (rng.random((4, 32, 32)) > 0.8).astype(np.float32)
    yp = rng.random((4, 32, 32)).astype(np.float32)
    return yt, yp


def test_prec_oracle(yt_yp):
    yt, yp = yt_yp
    ypr = np.round(yp)
    want = (ypr * yt).sum() / (ypr.sum() + EPS)
    np.testing.assert_allclose(L.prec(yt, yp), want, rtol=1e-6)


def test_reca_oracle(yt_yp):
    yt, yp = yt_yp
    ypr = np.round(yp)
    tp = (ypr * yt).sum()
    fn = np.clip(yt - ypr, 0, 1).sum()
    np.testing.assert_allclose(L.reca(yt, yp), tp / (tp + fn + EPS), rtol=1e-6)


def test_f1_perfect_prediction(yt_yp):
    yt, _ = yt_yp
    assert float(L.F1(yt, yt)) == pytest.approx(1.0, abs=1e-5)


def test_f1_harmonic_mean(yt_yp):
    yt, yp = yt_yp
    p, r = float(L.prec(yt, yp)), float(L.reca(yt, yp))
    np.testing.assert_allclose(L.F1(yt, yp), 2 * p * r / (p + r + EPS), rtol=1e-5)


def test_dice_equals_f1_on_binary(yt_yp):
    """Dice == F1 for binary masks (noted at reference utils/neurons.py:70)."""
    yt, yp = yt_yp
    np.testing.assert_allclose(L.dice(yt, yp), L.F1(yt, yp), rtol=1e-4)


def test_jacc_oracle(yt_yp):
    yt, yp = yt_yp
    ypr = np.round(yp)
    inter = (yt * ypr).sum()
    union = yt.sum() + ypr.sum() - inter
    np.testing.assert_allclose(L.jacc(yt, yp), inter / (union + 1e-7), rtol=1e-6)


def test_dicesq_oracle(yt_yp):
    yt, yp = yt_yp
    nmr = 2 * (yt * yp).sum()
    dnm = (yt**2).sum() + (yp**2).sum() + EPS
    np.testing.assert_allclose(L.dicesq(yt, yp), nmr / dnm, rtol=1e-6)
    np.testing.assert_allclose(L.dicesq_loss(yt, yp), -nmr / dnm, rtol=1e-6)


def test_wbce_oracle(yt_yp):
    yt, yp = yt_yp
    want = -(2.0 * yt * np.log(yp + 1e-7) + (1 - yt) * np.log(1 - yp + 1e-7))
    got = L.weighted_binary_crossentropy(yt, yp)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
    # Positive weighting: errors on positives cost double.
    yt1 = np.ones((2, 2), np.float32)
    yp_half = np.full((2, 2), 0.5, np.float32)
    l_pos = L.weighted_binary_crossentropy(yt1, yp_half)
    l_neg = L.weighted_binary_crossentropy(1 - yt1, yp_half)
    assert float(l_pos.mean()) > float(l_neg.mean())


def test_bce_oracle(yt_yp):
    yt, yp = yt_yp
    ypc = np.clip(yp, EPS, 1 - EPS)
    want = -(yt * np.log(ypc) + (1 - yt) * np.log(1 - ypc)).mean(axis=-1)
    np.testing.assert_allclose(L.binary_crossentropy(yt, yp), want, rtol=1e-4)


def test_posyt_posyp(yt_yp):
    yt, yp = yt_yp
    np.testing.assert_allclose(L.posyt(yt, yp), yt.mean(), rtol=1e-5)
    np.testing.assert_allclose(L.posyp(yt, yp), np.round(yp).mean(), rtol=1e-5)


def test_f2_weights_recall(rng):
    """F2 should reward recall more than precision (beta=2)."""
    yt = np.zeros((1, 100), np.float32)
    yt[0, :20] = 1
    # High recall, low precision.
    yp_hr = np.zeros_like(yt)
    yp_hr[0, :40] = 1.0
    # High precision, low recall (same F1 by symmetry of counts).
    yp_hp = np.zeros_like(yt)
    yp_hp[0, :10] = 1.0
    assert float(L.F2(yt, yp_hr)) > float(L.F2(yt, yp_hp))


def test_spike_counts(rng):
    yt = (rng.random((3, 50)) > 0.9).astype(np.float32)
    yp = rng.random((3, 50)).astype(np.float32)
    np.testing.assert_allclose(L.ytspks(yt, yp), yt.sum(axis=1))
    np.testing.assert_allclose(L.ypspks(yt, yp), np.round(yp).sum(axis=1))


def test_losses_differentiable(yt_yp):
    import jax

    yt, yp = yt_yp
    for name in ["binary_crossentropy", "weighted_binary_crossentropy", "dice_loss", "dicesq_loss"]:
        fn = L.LOSSES[name]
        g = jax.grad(lambda p: jnp.mean(fn(yt, p)))(jnp.asarray(yp))
        assert np.all(np.isfinite(np.asarray(g))), name
