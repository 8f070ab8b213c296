"""Layer-activation visualization for UNet2DS.

Counterpart of the reference's ``notebooks/unet2ds_inspection.ipynb``
(SURVEY §2 row 34): renders per-block mean activation maps for a checkpoint
on a dataset's summary image.

    python examples/analysis/activation_maps.py dataset.hdf5 model.ckpt out/
"""

import os
import sys

sys.path.append(".")

import jax
import numpy as np


def main():
    from deepcalcium_tpu.models import unet2d
    from deepcalcium_tpu.models.unet_2d_summary import summarize_series
    from deepcalcium_tpu.train.checkpoints import load_checkpoint
    from deepcalcium_tpu.train.evaluate import reflect_pad_to
    from deepcalcium_tpu.utils.visualization import save_png

    ds_path, ckpt, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    os.makedirs(out_dir, exist_ok=True)

    p0, s0 = unet2d.init(jax.random.PRNGKey(0))
    params, state, _, _ = load_checkpoint(ckpt, p0, s0)

    img = summarize_series(ds_path)
    hw = max(-(-d // 16) * 16 for d in img.shape)
    x = reflect_pad_to(img, hw, hw)[None]

    acts: dict = {}
    probs, _ = unet2d.apply(params, state, x, capture=acts)
    save_png(os.path.join(out_dir, "prediction.png"), np.asarray(probs[0]))

    for name, a in acts.items():
        m = np.asarray(a[0]).mean(axis=-1)  # mean over channels
        rng = m.max() - m.min()
        save_png(os.path.join(out_dir, f"{name}.png"),
                 (m - m.min()) / (rng if rng > 0 else 1.0))
    print(f"wrote {len(acts) + 1} activation maps to {out_dir}")


if __name__ == "__main__":
    main()
