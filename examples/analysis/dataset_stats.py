"""Dataset statistics and throughput report.

Counterpart of the reference's ``notebooks/dlmia_workshop_figures.ipynb``
analysis cells (SURVEY §2 row 34): per-dataset frame/neuron counts,
positive-pixel proportion of the mask summaries (reference reported mean
0.126 across Neurofinder train), and an end-to-end evaluate-throughput
measurement (the 8,057 frames/min cell).

    python examples/analysis/dataset_stats.py all_train [--model m.ckpt]
"""

import argparse
import logging
import sys
import time

sys.path.append(".")

import h5py
import numpy as np

logging.basicConfig(level=logging.INFO)


def main():
    from deepcalcium_tpu.data.nf import nf_load_hdf5
    from deepcalcium_tpu.models.unet_2d_summary import (
        UNet2DSummary, summarize_mask)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset_name", default="all_train")
    ap.add_argument("--paths", nargs="*", default=None,
                    help="local contract-HDF5 dataset paths (skips download)")
    ap.add_argument("--model", help="checkpoint for the throughput cell")
    args = ap.parse_args()

    paths = args.paths or nf_load_hdf5(args.dataset_name)

    total_frames = total_neurons = 0
    pos_props = []
    print(f"{'dataset':28s} {'frames':>7s} {'neurons':>8s} {'HxW':>10s} {'pos%':>6s}")
    for p in paths:
        with h5py.File(p, "r") as fp:
            name = fp.attrs["name"]
            t, h, w = fp["series/raw"].shape
            n = fp["masks/raw"].shape[0] if "masks" in fp else 0
        total_frames += t
        total_neurons += n
        pos = np.nan
        if n:
            summ = summarize_mask(p)
            pos = float(summ.mean())
            pos_props.append(pos)
        print(f"{name:28s} {t:7d} {n:8d} {h:5d}x{w:<4d} {pos:6.3f}")

    print(f"\ntotals: {total_frames} frames, {total_neurons} neurons, "
          f"mean positive-pixel proportion "
          f"{np.mean(pos_props) if pos_props else float('nan'):.3f}")

    if args.model:
        model = UNet2DSummary()
        model.predict(paths, args.model, augmentation=True)  # compile warm-up
        tic = time.time()
        model.predict(paths, args.model, augmentation=True)
        dt = time.time() - tic
        print(f"\nevaluate throughput (predict+TTA over cached HDF5, warm "
              f"jit): {total_frames / dt * 60:.0f} frames/min "
              f"(reference dlmia cell: 8,057 frames/min incl. ingest)")


if __name__ == "__main__":
    main()
