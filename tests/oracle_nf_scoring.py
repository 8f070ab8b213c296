"""Independent second oracle for the Neurofinder scoring semantics.

metrics/neurofinder.py re-implements the scoring ground truth
(``neurofinder==1.1.1`` + ``regional==1.1.2``, reference
``datasets/nf.py:4,168-173``) with numpy/scipy machinery. This module is a
SECOND, structurally different transcription of the same published
semantics — pure-Python BFS labeling, dict/set regions, an explicit
distance-matrix greedy matcher — used only by tests/test_scoring_oracle.py
to property-check the production implementation on random configurations.
Any tie-breaking or ordering divergence between two independent
implementations of the spec shows up as a property-test failure.

Spec being transcribed (neurofinder-python ``match``/``centers``/``shapes``,
regional ``center``/``overlap(method='rates')``):

- region center = coordinate-wise mean of its pixel coordinates;
- match: iterate source regions in order; each takes the nearest remaining
  target center by Euclidean distance (first-lowest-index wins ties, as
  np.argmin and order-preserving deletion both do) if strictly below the
  threshold, else stays unmatched;
- centers(a, b) -> (recall, precision) = matched/|a|, matched/|b|;
- shapes(a, b) -> mean inclusion |a∩b|/|a| and exclusion |a∩b|/|b| over
  matched pairs, 0.0 when nothing matched;
- components are 8-connected; F1 is the harmonic mean of precision/recall
  with an all-zeros-prediction short circuit (reference nf.py:164-174).
"""

import math


def bfs_label(mask):
    """8-connected components via BFS; returns list of coordinate lists in
    first-pixel raster order (the order scipy.ndimage.label assigns 1..n)."""
    h = len(mask)
    w = len(mask[0]) if h else 0
    seen = [[False] * w for _ in range(h)]
    comps = []
    for y in range(h):
        for x in range(w):
            if not mask[y][x] or seen[y][x]:
                continue
            queue = [(y, x)]
            seen[y][x] = True
            comp = []
            while queue:
                cy, cx = queue.pop()
                comp.append((cy, cx))
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ny, nx = cy + dy, cx + dx
                        if (0 <= ny < h and 0 <= nx < w
                                and mask[ny][nx] and not seen[ny][nx]):
                            seen[ny][nx] = True
                            queue.append((ny, nx))
            comps.append(sorted(comp))
    return comps


def center_of(coords):
    n = float(len(coords))
    return (sum(c[0] for c in coords) / n, sum(c[1] for c in coords) / n)


def greedy_match(coords_a, coords_b, threshold=math.inf):
    """For each region of a (in order): index of the nearest still-unmatched
    region of b if strictly under threshold, else None."""
    centers_b = [center_of(c) for c in coords_b]
    taken = set()
    out = []
    for ca in coords_a:
        cy, cx = center_of(ca)
        best, best_d = None, math.inf
        for i, (by, bx) in enumerate(centers_b):
            if i in taken:
                continue
            # sqrt of sum-of-squares, exactly the numpy float path the
            # published package takes (math.hypot rounds differently in the
            # last ulp and flips exact-tie winners).
            d = math.sqrt((cy - by) ** 2 + (cx - bx) ** 2)
            if d < best_d:  # strict: first-lowest-index wins ties
                best, best_d = i, d
        if best is not None and best_d < threshold:
            taken.add(best)
            out.append(best)
        else:
            out.append(None)
    return out


def score_masks(m, mp, threshold=math.inf):
    """(precision, recall, inclusion, exclusion, F1) for two binary masks,
    same contract as metrics.neurofinder.nf_mask_metrics."""
    if not any(v for row in mp for v in row):
        return 0.0, 0.0, 0.0, 0.0, 0.0
    A = bfs_label(m)
    B = bfs_label(mp)
    inds = greedy_match(A, B, threshold)
    nm = sum(1 for i in inds if i is not None)
    recall = nm / float(len(A)) if A else 0.0
    precision = nm / float(len(B)) if B else 0.0
    incl, excl = [], []
    for j, i in enumerate(inds):
        if i is None:
            continue
        inter = len(set(A[j]) & set(B[i]))
        incl.append(inter / float(len(A[j])))
        excl.append(inter / float(len(B[i])))
    inclusion = sum(incl) / len(incl) if incl else 0.0
    exclusion = sum(excl) / len(excl) if excl else 0.0
    f1 = 2 * precision * recall / (precision + recall) \
        if (precision + recall) > 0 else 0.0
    return precision, recall, inclusion, exclusion, f1
