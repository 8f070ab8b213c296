"""Export Neurofinder datasets as movies with neuron outlines.

Counterpart of reference ``examples/neurons/nf_videos.py:14-22``.

    python examples/neurons/nf_videos.py neurofinder.00.00 [out_dir]
"""

import logging
import os
import sys

sys.path.append(".")

import h5py

from deepcalcium_tpu.data.nf import nf_load_hdf5
from deepcalcium_tpu.utils.visualization import dataset_to_mp4

logging.basicConfig(level=logging.INFO)

if __name__ == "__main__":
    names = sys.argv[1] if len(sys.argv) > 1 else "all_train"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "."
    for p in nf_load_hdf5(names):
        with h5py.File(p, "r") as fp:
            name = fp.attrs["name"]
            s = fp["series/raw"][...]
            m = fp["masks/raw"][...] if "masks" in fp else None
        dataset_to_mp4(s, m, os.path.join(out_dir, f"{name}.mp4"))
