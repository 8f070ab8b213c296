"""Realistic-scale fixtures for the r3 dataset_stats run: two 512-square
contract HDF5s at Neurofinder-like density (target positive-pixel
proportion ~0.126 — scaled from the hyperparam-search hard-fixture recipe
which hits 0.126 at 128-square with 31 neurons)."""
import logging
import os
import sys

sys.path.append("/root/repo")
logging.basicConfig(level=logging.INFO)

from deepcalcium_tpu.data.fixtures import make_realistic_hdf5
from deepcalcium_tpu.models.unet_2d_summary import summarize_mask

out = "/root/repo/.round3_logs"
for i in range(2):
    p = os.path.join(out, f"rds{i}.hdf5")
    if os.path.exists(p):
        print(f"{p}: exists, skipping", flush=True)
        continue
    make_realistic_hdf5(
        p, name=f"realistic.synthetic.0{i}", shape=(512, 512),
        nb_frames=512, nb_neurons=480, r_lo=3, r_hi=6,
        amp_lo=40, amp_hi=150, spike_rate=0.03, seed=7100 + i)
    pos = float(summarize_mask(p).mean())
    print(f"{p}: positive-pixel proportion {pos:.3f}", flush=True)
