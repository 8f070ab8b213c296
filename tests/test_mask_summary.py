"""Mask summary vs an independent oracle of the reference algorithm
(unet_2d_summary.py:244-291)."""

import numpy as np

from deepcalcium_tpu.ops.mask_summary import (
    mask_summary_exact,
    mask_summary_stencil,
)


def reference_oracle(msks):
    """Independent literal re-derivation of the reference dict-loop."""
    zyx = list(zip(*np.where(msks == 1)))
    yx_z = {(y, x): [] for z, y, x in zyx}
    for z, y, x in zyx:
        yx_z[(y, x)].append(z)
    for k in list(yx_z.keys()):
        if len(yx_z[k]) > 1:
            del yx_z[k]
    for y, x in list(yx_z.keys()):
        nbrs = [(y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1), (y + 1, x + 1),
                (y - 1, x - 1), (y + 1, x - 1), (y - 1, x + 1)] + [(y, x)]
        nbrs = [k for k in nbrs if k in yx_z]
        allz = [yx_z[k][0] for k in nbrs]
        if len(np.unique(allz)) > 1:
            for k in nbrs:
                del yx_z[k]
    summ = np.zeros(msks.shape[1:])
    if yx_z:
        yy, xx = [y for y, x in yx_z.keys()], [x for y, x in yx_z.keys()]
        summ[yy, xx] = 1.0
    return summ


def random_stack(rng, n=12, h=48, w=48, r=3):
    msks = np.zeros((n, h, w), np.int8)
    for i in range(n):
        cy, cx = rng.integers(r, h - r), rng.integers(r, w - r)
        msks[i, cy - r : cy + r + 1, cx - r : cx + r + 1] = 1
    return msks


def test_exact_matches_reference_oracle(rng):
    for _ in range(10):
        msks = random_stack(rng)
        np.testing.assert_array_equal(mask_summary_exact(msks), reference_oracle(msks))


def test_exact_overlap_removed():
    msks = np.zeros((2, 8, 8), np.int8)
    msks[0, 2:5, 2:5] = 1
    msks[1, 3:6, 3:6] = 1  # overlaps at [3:5,3:5]
    out = mask_summary_exact(msks)
    assert out[3, 3] == 0 and out[4, 4] == 0


def test_exact_separated_neurons_untouched():
    msks = np.zeros((2, 16, 16), np.int8)
    msks[0, 1:4, 1:4] = 1
    msks[1, 10:13, 10:13] = 1
    out = mask_summary_exact(msks)
    assert out.sum() == 18  # both 3x3 blocks intact


def test_stencil_matches_exact_on_separated(rng):
    """With >=2px separation, sequential and parallel semantics coincide."""
    msks = np.zeros((4, 40, 40), np.int8)
    for i, (cy, cx) in enumerate([(5, 5), (5, 30), (30, 5), (30, 30)]):
        msks[i, cy - 3 : cy + 4, cx - 3 : cx + 4] = 1
    np.testing.assert_array_equal(
        np.asarray(mask_summary_stencil(msks)), mask_summary_exact(msks)
    )


def test_stencil_close_to_exact_on_random(rng):
    """Parallel semantics may over-delete on touching chains; divergence must
    stay tiny and one-sided (stencil ⊆ exact)."""
    total = diff = 0
    for _ in range(10):
        msks = random_stack(rng, n=16)
        ex = mask_summary_exact(msks)
        st = np.asarray(mask_summary_stencil(msks))
        assert not np.any((st == 1) & (ex == 0))  # stencil never adds pixels
        total += ex.sum()
        diff += np.abs(ex - st).sum()
    # 16 blobs of 7x7 in 48x48 is far denser than any Neurofinder dataset;
    # even there the over-deletion stays under 10% of positive pixels.
    assert diff <= 0.10 * total
