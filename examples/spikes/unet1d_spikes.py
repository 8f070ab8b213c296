"""Spike segmentation with UNet1D on HDF5 trace datasets.

Counterpart of the reference spikes workflow
(``deepcalcium/models/spikes/unet_1d_segmentation.py`` usage). Expects HDF5
files with ``traces`` (R, T), ``spikes`` (R, T), attr ``name``.

    python examples/spikes/unet1d_spikes.py train data1.hdf5 data2.hdf5
    python examples/spikes/unet1d_spikes.py crossval data.hdf5
    python examples/spikes/unet1d_spikes.py predict data.hdf5 -m best.ckpt
"""

import sys

sys.path.append(".")

from deepcalcium_tpu.cli import main

if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "train":
        main(["spikes-train"] + args[1:])
    elif args and args[0] == "crossval":
        main(["spikes-train", "--val_type", "cross_validate"] + args[1:])
    elif args and args[0] == "predict":
        main(["spikes-predict"] + args[1:])
    else:
        print(__doc__)
