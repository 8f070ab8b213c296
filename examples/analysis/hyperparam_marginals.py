"""Per-dimension marginal means for a hyperparameter-search CSV.

Counterpart of the analysis cells in the reference's
``notebooks/unet2ds_random_hyperparameter_search.ipynb`` (the reference
eyeballed 812 runs; this prints the same per-level aggregation for
``docs/hyperparam_search_r*.csv``):

    python examples/analysis/hyperparam_marginals.py docs/hyperparam_search_r4.csv

For every swept dimension, prints each level's (n, mean, max) of
``val_nf_f1_mean``, plus the overall spread and the top-10 configs.
Pure host-side CSV arithmetic — no JAX, safe to run during a sweep.
"""

import csv
import sys
from collections import defaultdict

METRIC = "val_nf_f1_mean"
SKIP = {"trial", "seconds", METRIC}


def main(path):
    with open(path) as fp:
        raw = list(csv.DictReader(fp))
    # The search writes val_nf_f1_mean=nan for diverged/failed configs by
    # design; NaN poisons mean/max/sort, so drop (and report) those rows.
    rows = [r for r in raw if float(r[METRIC]) == float(r[METRIC])]
    if len(rows) < len(raw):
        print(f"{path}: dropped {len(raw) - len(rows)} NaN "
              f"(diverged/failed) of {len(raw)} rows")
    vals = [float(r[METRIC]) for r in rows]
    n = len(vals)
    mean = sum(vals) / n
    sd = (sum((v - mean) ** 2 for v in vals) / n) ** 0.5
    print(f"{path}: {n} trials, mean {mean:.3f} +- {sd:.3f}, "
          f"best {max(vals):.4f}, worst {min(vals):.4f}")

    dims = [k for k in rows[0] if k not in SKIP]
    for dim in dims:
        groups = defaultdict(list)
        for r in rows:
            groups[r[dim]].append(float(r[METRIC]))
        def _key(kv):
            try:
                return (0, float(kv[0]))
            except ValueError:
                return (1, kv[0])
        parts = [f"{k}: n={len(v)} mean={sum(v)/len(v):.3f} "
                 f"max={max(v):.3f}"
                 for k, v in sorted(groups.items(), key=_key)]
        print(f"  {dim:14s} " + " | ".join(parts))

    print("top 10:")
    for r in sorted(rows, key=lambda r: -float(r[METRIC]))[:10]:
        cfg = {k: r[k] for k in dims}
        print(f"  {float(r[METRIC]):.4f}  {cfg}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "docs/hyperparam_search_r4.csv")
