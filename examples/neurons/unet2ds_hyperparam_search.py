"""Random hyperparameter search for UNet2DS.

Counterpart of the reference's 812-run random search documented in
``notebooks/unet2ds_random_hyperparameter_search.ipynb`` (SURVEY §2 row 34):
samples window shape, learning rate, loss, base filters, dropout, and
upsampling-vs-transpose; trains each config briefly and ranks by
``val_nf_f1_mean``. Results stream to a CSV for analysis.

    python examples/neurons/unet2ds_hyperparam_search.py all_train \
        --trials 20 --epochs 3 [--out search.csv]
"""

import argparse
import csv
import functools
import logging
import os
import sys
import time

sys.path.append(".")

import numpy as np

logging.basicConfig(level=logging.INFO)

SPACE = {
    "window": [64, 96, 128],
    "learning_rate": [1e-2, 2e-3, 1e-3, 5e-4],
    "loss": ["binary_crossentropy", "weighted_binary_crossentropy",
             "dice_loss", "dicesq_loss"],
    "nfb": [16, 32],
    "drp": [0.0, 0.1, 0.25],
    "up_mode": ["transpose", "upsampling"],
    "batch": [16, 20, 32],
}


def sample(rng):
    return {k: v[int(rng.integers(0, len(v)))] for k, v in SPACE.items()}


def main():
    from deepcalcium_tpu.data.nf import nf_load_hdf5
    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.models.unet_2d_summary import UNet2DSummary
    from deepcalcium_tpu.utils.config import checkpoints_dir

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset_name", default="all_train",
                    help="Neurofinder name(s), or --paths for local HDF5s")
    ap.add_argument("--paths", nargs="*", default=None,
                    help="local contract-HDF5 dataset paths (skips download)")
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--val-shape", type=int, default=512)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=865)
    args = ap.parse_args()

    paths = args.paths or nf_load_hdf5(args.dataset_name)
    rng = np.random.default_rng(args.seed)
    out_csv = args.out or os.path.join(
        checkpoints_dir(), f"hyperparam_search_{int(time.time())}.csv")

    rows = []
    for trial in range(args.trials):
        cfg = sample(rng)
        cpdir = os.path.join(checkpoints_dir(),
                             f"search_{int(time.time())}_{trial}")
        model = UNet2DSummary(
            cpdir=cpdir,
            net_init_func=functools.partial(
                unet2d.init, nfb=cfg["nfb"], up_mode=cfg["up_mode"]),
            net_apply_func=functools.partial(
                unet2d.apply, drp=cfg["drp"], up_mode=cfg["up_mode"]))
        try:
            hist, _ = model.fit(
                paths, shape_trn=(cfg["window"], cfg["window"]),
                shape_val=(args.val_shape, args.val_shape),
                batch_size_trn=cfg["batch"],
                nb_steps_trn=args.steps, nb_epochs=args.epochs,
                learning_rate=cfg["learning_rate"], loss=cfg["loss"],
                seed=args.seed + trial)
            score = max(hist["val_nf_f1_mean"])
        except Exception as e:  # a diverging config must not kill the sweep
            logging.warning("trial %d failed: %s", trial, e)
            score = float("nan")
        row = {**cfg, "trial": trial, "val_nf_f1_mean": score}
        rows.append(row)
        with open(out_csv, "w", newline="") as fp:
            w = csv.DictWriter(fp, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        logging.info("trial %d: %s -> %.4f", trial, cfg, score)

    best = max((r for r in rows if r["val_nf_f1_mean"] == r["val_nf_f1_mean"]),
               key=lambda r: r["val_nf_f1_mean"], default=None)
    print("best:", best)
    print("results:", out_csv)


if __name__ == "__main__":
    main()
