"""TTA registry and D4 group structure vs the reference NumPy semantics
(utils/neurons.py:112-137, unet_2d_summary.py:459-466)."""

import numpy as np
import pytest

from deepcalcium_tpu.ops import augment as A


@pytest.fixture
def batch(rng):
    return rng.random((3, 16, 16)).astype(np.float32)


def _np_fns():
    """The reference augmentations, independently in NumPy (the oracle)."""
    rot = lambda x, k: np.rot90(x, k, axes=(1, 2))
    return [
        lambda x: x,
        lambda x: x[:, ::-1, ...],
        lambda x: x[:, :, ::-1],
        lambda x: rot(x, 1),
        lambda x: rot(x, 2),
        lambda x: rot(x, 3),
        lambda x: rot(x, 1)[:, ::-1, ...],
        lambda x: rot(x, 1)[:, :, ::-1],
    ]


def test_forward_matches_numpy_reference(batch):
    for (name, fwd, _), np_fwd in zip(A.INVERTIBLE_2D_AUGMENTATIONS, _np_fns()):
        np.testing.assert_array_equal(np.asarray(fwd(batch)), np_fwd(batch), err_msg=name)


def test_inverse_is_identity(batch):
    for name, fwd, inv in A.INVERTIBLE_2D_AUGMENTATIONS:
        np.testing.assert_array_equal(np.asarray(inv(fwd(batch))), batch, err_msg=name)


def test_eight_distinct_views(batch):
    views = [np.asarray(f(batch)) for _, f, _ in A.INVERTIBLE_2D_AUGMENTATIONS]
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.array_equal(views[i], views[j])


def test_d4_table_is_correct(batch):
    fns = _np_fns()
    views = [f(batch) for f in fns]

    def code_of(y):
        for i, v in enumerate(views):
            if np.array_equal(y, v):
                return i
        raise AssertionError("not a D4 element")

    for a in range(8):
        for b in range(8):
            assert A.D4_TABLE[a, b] == code_of(fns[a](fns[b](batch)))
    for a in range(8):
        assert code_of(fns[A.D4_INVERSE[a]](views[a])) == 0


def test_tta_expand_collapse_roundtrip(batch):
    """collapse(expand(x)) == x: the 8 views invert back and average."""
    stacked = A.tta_expand(batch)
    assert stacked.shape == (8,) + batch.shape
    np.testing.assert_allclose(np.asarray(A.tta_collapse(stacked)), batch, rtol=1e-6)


def test_apply_d4_batch_matches_table(batch):
    codes = np.arange(3, dtype=np.int32) + 2  # hflip, rot90, rot180
    out = np.asarray(A.apply_d4_batch(batch, codes))
    fns = _np_fns()
    for i, c in enumerate(codes):
        np.testing.assert_array_equal(out[i], fns[c](batch[i : i + 1])[0])


def test_compose_random_walk_matches_sequential(rng, batch):
    """Composing codes in the group table == applying generators one by one."""
    fns = _np_fns()
    for _ in range(50):
        seed = int(rng.integers(0, 2**31))
        r1 = np.random.default_rng(seed)
        code = A.compose_random_walk(r1, nb_max_augment=15)
        # Replay the same walk applying images sequentially.
        r2 = np.random.default_rng(seed)
        k = int(r2.integers(0, 16))
        img = batch.copy()
        for _ in range(k):
            g = A.GENERATOR_CODES[int(r2.integers(0, 6))]
            img = fns[g](img)
        np.testing.assert_array_equal(fns[code](batch), img)


def test_np_twins_match_jnp_tta():
    """tta_expand_np/tta_collapse_np (the host-side batching-layer twins)
    must match the jnp originals exactly for every view."""
    import jax.numpy as jnp

    from deepcalcium_tpu.ops.augment import (tta_collapse, tta_collapse_np,
                                             tta_expand, tta_expand_np)

    rng = np.random.default_rng(0)
    batch = rng.standard_normal((3, 16, 16)).astype(np.float32)
    vj = np.asarray(tta_expand(jnp.asarray(batch)))
    vn = tta_expand_np(batch)
    np.testing.assert_array_equal(vj, vn)
    preds = rng.standard_normal((8, 3, 16, 16)).astype(np.float32)
    cj = np.asarray(tta_collapse(jnp.asarray(preds)))
    cn = tta_collapse_np(preds)
    np.testing.assert_allclose(cj, cn, rtol=1e-6, atol=1e-7)
