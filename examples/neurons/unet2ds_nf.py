"""Neurofinder training and prediction using UNet2DS — example entry point.

Counterpart of reference ``examples/neurons/unet2ds_nf.py``. The argparse
surface lives in :mod:`deepcalcium_tpu.cli`; this shim preserves the familiar
invocation:

    python examples/neurons/unet2ds_nf.py train all_train
    python examples/neurons/unet2ds_nf.py evaluate neurofinder.00.00 -m m.ckpt
    python examples/neurons/unet2ds_nf.py predict all_test -m m.ckpt
"""

import sys

sys.path.append(".")

from deepcalcium_tpu.cli import main

if __name__ == "__main__":
    main()
