"""Neurofinder metric reimplementation: labeling, greedy matching, scoring."""

import numpy as np
import pytest

from deepcalcium_tpu.metrics import neurofinder as nf


def blob(m, cy, cx, r=2):
    m[max(0, cy - r) : cy + r + 1, max(0, cx - r) : cx + r + 1] = 1
    return m


def test_label_8_connectivity():
    m = np.zeros((6, 6), np.uint8)
    m[0, 0] = 1
    m[1, 1] = 1  # diagonal touch -> one component under 8-connectivity
    lbl = nf.label_mask(m)
    assert lbl.max() == 1


def test_mask_to_regions_centers():
    m = np.zeros((32, 32), np.uint8)
    blob(m, 5, 5)
    blob(m, 20, 25)
    regions = nf.mask_to_regions(m)
    assert len(regions) == 2
    centers = sorted(tuple(r.center) for r in regions)
    assert centers == [(5.0, 5.0), (20.0, 25.0)]


def test_perfect_prediction_scores_one():
    m = np.zeros((64, 64), np.uint8)
    for cy, cx in [(10, 10), (10, 40), (40, 10), (40, 40)]:
        blob(m, cy, cx)
    p, r, i, e, f1 = nf.nf_mask_metrics(m, m.copy())
    assert (p, r, i, e, f1) == (1.0, 1.0, 1.0, 1.0, 1.0)


def test_empty_prediction_short_circuits():
    m = blob(np.zeros((32, 32), np.uint8), 10, 10)
    assert nf.nf_mask_metrics(m, np.zeros_like(m)) == (0.0, 0.0, 0.0, 0.0, 0.0)


def test_extra_predictions_hit_precision():
    m = np.zeros((64, 64), np.uint8)
    blob(m, 10, 10)
    blob(m, 40, 40)
    mp = m.copy()
    blob(mp, 10, 40)  # false positive
    blob(mp, 40, 10)  # false positive
    p, r, i, e, f1 = nf.nf_mask_metrics(m, mp)
    assert r == 1.0
    assert p == pytest.approx(0.5)
    assert f1 == pytest.approx(2 * 0.5 / 1.5)


def test_missed_region_hits_recall():
    m = np.zeros((64, 64), np.uint8)
    blob(m, 10, 10)
    blob(m, 40, 40)
    mp = np.zeros_like(m)
    blob(mp, 10, 10)
    p, r, i, e, f1 = nf.nf_mask_metrics(m, mp)
    assert p == 1.0
    assert r == pytest.approx(0.5)


def test_greedy_matching_consumes_targets():
    """Two GT regions near one predicted region: only one can match."""
    a = [nf.Region([[0, 0]]), nf.Region([[0, 2]])]
    b = [nf.Region([[0, 1]])]
    inds = nf.match_centers(a, b)
    assert inds == [0, None]  # first-come greedy; target consumed


def test_threshold_gates_matches():
    a = [nf.Region([[0, 0]])]
    b = [nf.Region([[0, 10]])]
    assert nf.match_centers(a, b, threshold=5.0) == [None]
    assert nf.match_centers(a, b, threshold=np.inf) == [0]


def test_shapes_inclusion_exclusion():
    # GT is a 4px region; prediction covers 2 of them plus 2 extra.
    a = [nf.Region([[0, 0], [0, 1], [1, 0], [1, 1]])]
    b = [nf.Region([[0, 0], [0, 1], [5, 5], [5, 6]])]
    i, e = nf.shapes(a, b)
    assert i == pytest.approx(0.5)  # |∩|/|a|
    assert e == pytest.approx(0.5)  # |∩|/|b|


def test_shifted_prediction_still_matches_with_partial_overlap():
    m = np.zeros((64, 64), np.uint8)
    blob(m, 20, 20, r=3)
    mp = np.zeros_like(m)
    blob(mp, 22, 22, r=3)  # shifted by (2,2)
    p, r, i, e, f1 = nf.nf_mask_metrics(m, mp)
    assert f1 == 1.0  # centers within inf threshold
    assert 0 < i < 1 and 0 < e < 1


def test_probability_map_is_rounded_before_labeling():
    """A raw sigmoid map must be thresholded at 0.5 (round), not > 0:
    sub-0.5 background probabilities are NOT predicted area. Regression for
    the gate/label mismatch (the emptiness gate rounded, labeling didn't)."""
    m = blob(np.zeros((32, 32), np.uint8), 10, 10)
    prob = np.full((32, 32), 0.2, np.float64)  # low-confidence everywhere
    prob[8:13, 8:13] = 0.9                     # one confident region
    p, r, i, e, f1 = nf.nf_mask_metrics(m, prob)
    assert f1 == 1.0  # the 0.2 background must not merge into a giant blob

    # All-sub-threshold map == empty prediction.
    low = np.full((32, 32), 0.4, np.float64)
    assert nf.nf_mask_metrics(m, low) == (0.0, 0.0, 0.0, 0.0, 0.0)
