"""Command-line interface: train / evaluate / predict on Neurofinder data.

Parity rebuild of the reference CLI (``examples/neurons/unet2ds_nf.py``):
same subcommands, same defaults (train at 128²/512², batch 20, 100 steps,
10 epochs; reference ``:33-44``), same timestamped + ``latest`` submission
JSON outputs (``:75-96``). Additional subcommands expose the spike model and
the dataset ingest.

Usage:
    python -m deepcalcium_tpu.cli train all_train
    python -m deepcalcium_tpu.cli evaluate neurofinder.00.00 -m model.ckpt
    python -m deepcalcium_tpu.cli predict all_test -m model.ckpt
    python -m deepcalcium_tpu.cli spikes-train data1.hdf5 data2.hdf5
    python -m deepcalcium_tpu.cli ingest /path/to/tiffdir name
"""

import argparse
import logging
import os
import time

from deepcalcium_tpu.utils.config import checkpoints_dir


def _neurons_cpdir(override=None):
    return override or os.path.join(checkpoints_dir(), "neurons_unet2ds_nf")


def _tta_passes(tta: str):
    """'both' mirrors the reference CLI (TTA pass then plain pass,
    unet2ds_nf.py:54-64); 'on'/'off' run just one."""
    return {"both": (True, False), "on": (True,), "off": (False,)}[tta]


def cmd_convert(args):
    """Convert a Keras HDF5 checkpoint (e.g. the released
    unet2ds_model.hdf5) into a native .ckpt pytree snapshot."""
    from deepcalcium_tpu.train.checkpoints import save_checkpoint

    if args.arch == "unet2ds":
        from deepcalcium_tpu.interop.keras_import import (
            load_unet2ds_keras as load_keras)
    else:
        from deepcalcium_tpu.interop.keras_import import (
            load_unet1d_keras as load_keras)
    params, state = load_keras(args.src)
    save_checkpoint(args.dst, params, state,
                    meta={"source": os.path.abspath(args.src),
                          "arch": args.arch})
    print(args.dst)


# float32 = Keras-parity numerics (wrapper default); bfloat16 = the
# benchmarked fast configuration (~2x MXU rate, threshold-level-identical
# masks — bench.py measures this one).
_DTYPES = {"float32": None, "bfloat16": "bfloat16"}


def _add_dtype_flag(p, default):
    p.add_argument("--dtype", default=default,
                   choices=["float32", "bfloat16"],
                   help="compute dtype: float32 = reference-parity "
                        "numerics, bfloat16 = the benchmarked fast config")


def cmd_train(args):
    from deepcalcium_tpu.data.nf import nf_load_hdf5
    from deepcalcium_tpu.models.unet_2d_summary import UNet2DSummary

    if args.window % 16 or args.window < 16:
        raise SystemExit(f"--window {args.window} must be a multiple of 16 "
                         f"(4 pooling levels) — failing before the "
                         f"disk-bound dataset summaries")
    dspaths = nf_load_hdf5(args.dataset_name)
    shape_trn = (args.window, args.window)
    # 512²-window training recommends remat (2x faster + fits HBM; see
    # docs/VALIDATION.md); honor an explicit flag either way.
    remat = args.remat if args.remat is not None else args.window >= 256
    model = UNet2DSummary(cpdir=_neurons_cpdir(args.checkpoints_dir),
                          remat=remat)
    history, best = model.fit(
        dspaths,
        model_path=args.model_path,
        shape_trn=shape_trn, shape_val=(512, 512),
        batch_size_trn=args.batch, nb_steps_trn=args.steps,
        nb_epochs=args.epochs,
        prop_trn=0.75, prop_val=0.25,
        loss=args.loss, seed=args.seed,
        lr_schedule=args.lr_schedule,
        steps_per_dispatch=args.steps_per_dispatch,
        # String choices parse cleanly (a dict-lookup type= raises KeyError
        # past argparse); map to fit's auto/True/False here.
        fast_train={"auto": "auto", "on": True, "off": False}[args.fast_train],
        weight_decay=args.weight_decay,
        prng_impl=args.prng_impl,
        ema_decay=args.ema_decay,
        preset=args.preset,
    )
    print(f"best checkpoint: {best}")
    return history, best


def cmd_evaluate(args):
    from deepcalcium_tpu.data.nf import nf_load_hdf5
    from deepcalcium_tpu.models.unet_2d_summary import UNet2DSummary

    dspaths = nf_load_hdf5(args.dataset_name)
    model = UNet2DSummary(cpdir=_neurons_cpdir(args.checkpoints_dir),
                          compute_dtype=_DTYPES[args.dtype])
    for aug in _tta_passes(args.tta):
        logging.getLogger("evaluate").info(
            "Evaluation with%s.", " TTA" if aug else "out TTA")
        model.predict(dspaths, model_path=args.model_path,
                      window_shape=(512, 512), save=True, print_scores=True,
                      augmentation=aug)


# Reference README golden numbers for neurofinder.00.00 with the released
# unet2ds_model.hdf5. Label mapping pinned by the reference's own loop
# order: ``for aug in [True, False]`` runs the TTA pass FIRST
# (/root/reference/examples/neurons/unet2ds_nf.py:52-62), and in the
# README's captured output the 0.976/0.988 block appears BEFORE the
# "Evaluation without TTA." header while 0.919/0.958 appears after it
# (/root/reference/README.md:29-37). So 0.976/0.988 is the WITH-TTA
# score and 0.919/0.958 the no-TTA score. (Rounds 1-4 had these swapped
# — a SURVEY.md misreading of the loop order, fixed in round 5 and
# pinned by tests/test_cli_movie.py::test_parity_golden_label_mapping.)
_GOLDEN_TTA = (0.976, 1.000, 0.988)  # prec, reca, comb
_GOLDEN_NO_TTA = (0.919, 1.000, 0.958)


def cmd_parity_golden(args):
    """One-command golden-parity check: released Keras weights +
    neurofinder.00.00 -> predict (with and without 8x TTA) -> machine-diff
    the prec/reca/comb scores against the reference README's numbers
    (/root/reference/README.md:23-37, examples/neurons/unet2ds_nf.py:54-64).

    Exit 0 = every score within --tol of expected; exit 1 otherwise. The
    de-facto regression test of the reference (SURVEY section 4) as one
    invocation, pre-staged for the moment network egress exists
    (VERDICT r3 missing #2). ``--paths``/``--model_path``/``--expect-*``
    let an offline test (or a different corpus) drive the same glue.
    """
    import numpy as np

    from deepcalcium_tpu.metrics.neurofinder import nf_mask_metrics
    from deepcalcium_tpu.models.unet_2d_summary import UNet2DSummary

    cpdir = _neurons_cpdir(args.checkpoints_dir)
    model_path = args.model_path
    if model_path is None:
        from deepcalcium_tpu.utils.model_downloads import (
            UNET2DS_MODEL_URL, download_model)

        os.makedirs(cpdir, exist_ok=True)
        model_path = download_model(
            UNET2DS_MODEL_URL, os.path.join(cpdir, "unet2ds_model.hdf5"))
    if args.paths:
        dspaths = args.paths
    else:
        from deepcalcium_tpu.data.nf import nf_load_hdf5

        dspaths = nf_load_hdf5(args.dataset_name)

    model = UNet2DSummary(cpdir=cpdir, compute_dtype=_DTYPES[args.dtype])
    passes = []
    if args.tta in ("both", "off"):
        passes.append((False, tuple(args.expect_no_tta or _GOLDEN_NO_TTA)))
    if args.tta in ("both", "on"):
        passes.append((True, tuple(args.expect_tta or _GOLDEN_TTA)))

    # Ground-truth mask summaries once per dataset (the exact sequential
    # walk is a minutes-scale host cost at 512x512) — not once per pass.
    summaries = [model.mask_summary_func(dsp) for dsp in dspaths]
    failures = []
    for aug, expected in passes:
        Mp, names = model.predict(dspaths, model_path,
                                  window_shape=(args.window, args.window),
                                  augmentation=aug)
        mp_ = mr_ = mc_ = 0.0
        for m, mp in zip(summaries, Mp):
            p, r, _, _, c = nf_mask_metrics(m, np.round(mp))
            mp_ += p / len(dspaths)
            mr_ += r / len(dspaths)
            mc_ += c / len(dspaths)
        label = "TTA" if aug else "no-TTA"
        for got, exp, nm in zip((mp_, mr_, mc_), expected,
                                ("prec", "reca", "comb")):
            status = "ok" if abs(got - exp) <= args.tol else "FAIL"
            print(f"parity-golden [{label}] {nm}: got {got:.4f} "
                  f"expected {exp:.3f} +/-{args.tol} -> {status}")
            if status == "FAIL":
                failures.append((label, nm, got, exp))
    if failures:
        print(f"parity-golden: FAIL ({len(failures)} score(s) out of "
              f"tolerance)")
        raise SystemExit(1)
    print("parity-golden: PASS")


def cmd_predict(args):
    from deepcalcium_tpu.data.nf import nf_load_hdf5, nf_submit
    from deepcalcium_tpu.models.unet_2d_summary import UNet2DSummary

    dspaths = nf_load_hdf5(args.dataset_name)
    model = UNet2DSummary(cpdir=_neurons_cpdir(args.checkpoints_dir),
                          compute_dtype=_DTYPES[args.dtype])
    tic = int(time.time())
    for aug in _tta_passes(args.tta):
        Mp, names = model.predict(dspaths, model_path=args.model_path,
                                  window_shape=(512, 512), augmentation=aug)
        suffix = "_TTA" if aug else ""
        nf_submit(Mp, names, os.path.join(
            model.cpdir, f"submission_{tic}{suffix}.json"))
        nf_submit(Mp, names, os.path.join(
            model.cpdir, f"submission_latest{suffix}.json"))


def cmd_spikes_train(args):
    if args.arch in ("glm", "stm"):
        if args.val_type != "random_split":
            raise SystemExit(
                f"--val_type {args.val_type} is unet1d-only (the GLM/STM "
                f"baseline trains full-batch on one random split)")
        from deepcalcium_tpu.models.glm_spikes import GLMSegmentation

        model = GLMSegmentation(cpdir=args.checkpoints_dir, arch=args.arch)
        # GLM epochs are full-batch passes; the unet default (20) is far too
        # few — keep the model default unless the user set -e explicitly.
        kw = {"nb_epochs": args.epochs} if args.epochs != 20 else {}
        mt, mv, path = model.fit(args.dataset_paths, **kw)
        print(f"best: {path} (val_F2={mv['F2']:.3f})")
        return
    from deepcalcium_tpu.models.unet_1d_segmentation import UNet1DSegmentation

    model = UNet1DSegmentation(cpdir=args.checkpoints_dir)
    out = model.fit(args.dataset_paths, val_type=args.val_type,
                    nb_epochs=args.epochs,
                    steps_per_dispatch=args.steps_per_dispatch,
                    weight_decay=args.weight_decay,
                    prng_impl=args.prng_impl,
                    preset=args.preset)
    print(out if args.val_type == "cross_validate" else f"best: {out[2]}")


def cmd_spikes_predict(args):
    if args.arch in ("glm", "stm"):
        from deepcalcium_tpu.models.glm_spikes import GLMSegmentation

        model = GLMSegmentation(cpdir=args.checkpoints_dir, arch=args.arch)
    else:
        from deepcalcium_tpu.models.unet_1d_segmentation import (
            UNet1DSegmentation)

        model = UNet1DSegmentation(cpdir=args.checkpoints_dir)
    preds, names = model.predict(args.dataset_paths, args.model_path)
    for n, p in zip(names, preds):
        print(f"{n}: {p.shape}, {int(p.sum())} spike samples")


def cmd_ingest(args):
    from deepcalcium_tpu.data.nf import ingest_tiff_dataset

    out = ingest_tiff_dataset(
        args.tiff_dir, os.path.join(args.tiff_dir, "dataset.hdf5"), args.name)
    print(out)


def cmd_evaluate_movie(args):
    """One-dispatch summary->TTA->threshold evaluate of a raw movie file
    (the headline benchmark pipeline as an end-user command)."""
    import numpy as np

    from deepcalcium_tpu.models.unet_2d_summary import UNet2DSummary
    from deepcalcium_tpu.utils.visualization import mask_outlines, save_png

    if args.window % 16 or args.window < 16:
        raise SystemExit(f"--window {args.window} must be a multiple of 16 "
                         f"(4 pooling levels) — failing before the movie "
                         f"summary pass")
    model = UNet2DSummary(cpdir=_neurons_cpdir(args.checkpoints_dir),
                          compute_dtype=_DTYPES[args.dtype])
    mask, prob = model.evaluate_movie(
        args.movie, model_path=args.model_path,
        window_shape=(args.window, args.window), tta=not args.no_tta,
        threshold=args.threshold)
    print(f"mask {mask.shape}: {int(mask.sum())} positive px "
          f"({mask.mean():.2%}); prob range "
          f"[{prob.min():.3f}, {prob.max():.3f}]")
    if args.out:
        np.savez(args.out, mask=mask, prob=prob)
        print(f"wrote {args.out}")
    if args.png:
        # mask_outlines percentile-clips and normalizes internally.
        save_png(args.png, mask_outlines(prob, [mask], ["red"]))
        print(f"wrote {args.png}")


def cmd_segment(args):
    """Per-frame segmentation of a raw movie (the BASELINE stretch config);
    writes a (T, H, W) uint8 mask stack next to the input."""
    import h5py
    import numpy as np

    from deepcalcium_tpu.models.movie_segmentation import segment_movie
    from deepcalcium_tpu.models.unet_2d_summary import UNet2DSummary

    model = UNet2DSummary(cpdir=_neurons_cpdir(args.checkpoints_dir))
    params, state = model._load_params(args.model_path)
    out_path = args.out or (os.path.splitext(args.movie)[0] + "_masks.hdf5")
    with h5py.File(args.movie, "r") as fp:
        masks = segment_movie(params, state, fp["series/raw"],
                              slab=args.slab, threshold=args.threshold,
                              compute_dtype=_DTYPES[args.dtype])
    tmp = out_path + ".tmp"
    with h5py.File(tmp, "w") as fp:
        fp.create_dataset("masks/frames", data=masks,
                          compression="gzip", compression_opts=1)
    os.replace(tmp, out_path)
    print(f"wrote {out_path}: {masks.shape}, "
          f"{float(np.mean(masks)):.2%} positive")


def build_parser():
    ap = argparse.ArgumentParser(
        prog="dc-tpu", description="TPU-native deep-calcium CLI.")
    sp = ap.add_subparsers(title="actions", required=True)

    p = sp.add_parser("train", help="Train UNet2DS on Neurofinder datasets.")
    p.add_argument("dataset_name", nargs="?", default="all_train", type=str)
    p.add_argument("-m", "--model_path")
    p.add_argument("-c", "--checkpoints_dir")
    p.add_argument("-e", "--epochs", type=int, default=10)
    p.add_argument("-w", "--window", type=int, default=128,
                   help="training window side (128 = reference recipe; "
                        "512 trains at full images, auto-enables remat)")
    p.add_argument("-b", "--batch", type=int, default=20)
    p.add_argument("-s", "--steps", type=int, default=100,
                   help="train steps per epoch (reference recipe: 100)")
    p.add_argument("--seed", type=int, default=865,
                   help="RNG seed (reference CLI seeds 865, unet2ds_nf.py:18)")
    p.add_argument("--loss", default="binary_crossentropy",
                   choices=["binary_crossentropy",
                            "weighted_binary_crossentropy", "dice_loss",
                            "dicesq_loss"])
    p.add_argument("--lr-schedule", default="plateau",
                   choices=["plateau", "cosine"])
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="fold K training steps into one lax.scan dispatch "
                        "(cuts per-step dispatch latency ~2x on thin links; "
                        "must divide --steps)")
    p.add_argument("--fast-train", default="auto",
                   choices=["auto", "on", "off"],
                   help="W-packed gradient step (1.21x; score-equivalent, "
                        "different dropout draw order than the parity path)")
    p.add_argument("--weight-decay", type=float, default=0.0,
                   help="AdamW decoupled weight decay on conv kernels "
                        "(the reference search's L2 axis)")
    p.add_argument("--prng-impl", default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="dropout PRNG ('rbg': -17%% step time, different "
                        "random stream than the Keras-faithful default)")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="exponential moving average of params for eval")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="rematerialize conv blocks in the backward pass "
                        "(default: on for window >= 256)")
    p.add_argument("--preset", default=None, choices=["parity", "perf"],
                   help="recipe bundle: 'parity' = Keras-faithful defaults; "
                        "'perf' = measured throughput config (rbg PRNG + "
                        "K=4 scan dispatch, ~16%% vs 13.6%% train MFU; "
                        "overrides --prng-impl/--steps-per-dispatch, logs "
                        "the deviation)")
    p.set_defaults(func=cmd_train)

    p = sp.add_parser("evaluate", help="Evaluate with and without TTA.")
    p.add_argument("dataset_name", nargs="?", default="all_train", type=str)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-c", "--checkpoints_dir")
    _add_dtype_flag(p, "float32")
    p.add_argument("--tta", default="both", choices=["both", "on", "off"],
                   help="'both' runs a TTA pass then a plain pass "
                        "(reference behavior)")
    p.set_defaults(func=cmd_evaluate)

    p = sp.add_parser(
        "parity-golden",
        help="Golden-parity check: released weights + neurofinder.00.00 "
             "vs the reference README scores; exit 1 on mismatch.")
    p.add_argument("dataset_name", nargs="?", default="neurofinder.00.00",
                   type=str)
    p.add_argument("-m", "--model_path",
                   help="checkpoint to use (default: download the released "
                        "unet2ds_model.hdf5)")
    p.add_argument("-c", "--checkpoints_dir")
    p.add_argument("--paths", nargs="+",
                   help="explicit contract-HDF5 paths (bypasses the "
                        "Neurofinder registry/download; offline testing)")
    p.add_argument("--tta", default="both", choices=["both", "on", "off"])
    p.add_argument("--tol", type=float, default=0.005,
                   help="absolute score tolerance (README prints 3 "
                        "decimals; default covers rounding + float "
                        "reassociation)")
    p.add_argument("--window", type=int, default=512,
                   help="inference pad size (512 = the reference golden "
                        "setup; smaller only for offline fixture tests)")
    p.add_argument("--expect-no-tta", nargs=3, type=float, metavar="S",
                   help="expected (prec, reca, comb) for the no-TTA pass "
                        "(default: the README golden 0.919 1.000 0.958 — "
                        "the reference loop runs TTA first, so the "
                        "README's SECOND score block is the no-TTA one)")
    p.add_argument("--expect-tta", nargs=3, type=float, metavar="S",
                   help="expected (prec, reca, comb) for the 8x-TTA pass "
                        "(default: the README golden 0.976 1.000 0.988)")
    _add_dtype_flag(p, "float32")
    p.set_defaults(func=cmd_parity_golden)

    p = sp.add_parser("predict", help="Predict + write submission JSONs.")
    p.add_argument("dataset_name", nargs="?", default="all", type=str)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-c", "--checkpoints_dir")
    _add_dtype_flag(p, "float32")
    p.add_argument("--tta", default="both", choices=["both", "on", "off"])
    p.set_defaults(func=cmd_predict)

    p = sp.add_parser("convert",
                      help="Convert a Keras .hdf5 into a native .ckpt.")
    p.add_argument("src", help="Keras HDF5 checkpoint")
    p.add_argument("dst", help="output .ckpt path")
    p.add_argument("--arch", default="unet2ds", choices=["unet2ds", "unet1d"])
    p.set_defaults(func=cmd_convert)

    p = sp.add_parser("spikes-train", help="Train UNet1D/GLM on spike datasets.")
    p.add_argument("dataset_paths", nargs="+")
    p.add_argument("-c", "--checkpoints_dir")
    p.add_argument("-e", "--epochs", type=int, default=20)
    p.add_argument("--arch", default="unet1d", choices=["unet1d", "glm", "stm"])
    p.add_argument("--val_type", default="random_split",
                   choices=["random_split", "cross_validate"])
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="fold K training steps into one lax.scan dispatch "
                        "(unet1d only; must divide the per-epoch steps)")
    p.add_argument("--weight-decay", type=float, default=0.0,
                   help="AdamW decoupled weight decay (unet1d only)")
    p.add_argument("--prng-impl", default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="dropout PRNG (unet1d only)")
    p.add_argument("--preset", default=None, choices=["parity", "perf"],
                   help="recipe bundle (unet1d only): 'perf' = rbg dropout "
                        "PRNG + auto K-step dispatch (-15%% device step, "
                        "round-5 A/B); overrides --prng-impl/"
                        "--steps-per-dispatch")
    p.set_defaults(func=cmd_spikes_train)

    p = sp.add_parser("spikes-predict", help="Predict spikes on datasets.")
    p.add_argument("dataset_paths", nargs="+")
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-c", "--checkpoints_dir")
    p.add_argument("--arch", default="unet1d", choices=["unet1d", "glm", "stm"])
    p.set_defaults(func=cmd_spikes_predict)

    p = sp.add_parser("ingest", help="Ingest a TIFF tree into contract HDF5.")
    p.add_argument("tiff_dir")
    p.add_argument("name")
    p.set_defaults(func=cmd_ingest)

    p = sp.add_parser(
        "evaluate-movie",
        help="Fused summary->TTA->threshold evaluate of one raw movie.")
    p.add_argument("movie", help="contract HDF5 (series/raw) path")
    p.add_argument("-m", "--model_path", required=True,
                   help=".ckpt or Keras .hdf5")
    p.add_argument("-c", "--checkpoints_dir")
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--threshold", type=float, default=0.5)
    _add_dtype_flag(p, "float32")
    p.add_argument("--no-tta", action="store_true")
    p.add_argument("--out", help="write mask+prob to this .npz")
    p.add_argument("--png", help="write an outlined summary PNG here")
    p.set_defaults(func=cmd_evaluate_movie)

    p = sp.add_parser(
        "segment",
        help="Per-frame segmentation of a raw movie -> uint8 mask stack.")
    p.add_argument("movie", help="contract HDF5 (series/raw) path")
    p.add_argument("-m", "--model_path", required=True,
                   help=".ckpt or Keras .hdf5")
    p.add_argument("-c", "--checkpoints_dir")
    _add_dtype_flag(p, "bfloat16")  # segment_movie's existing default
    p.add_argument("--slab", type=int, default=64,
                   help="frames per device batch")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--out", help="output HDF5 (default <movie>_masks.hdf5)")
    p.set_defaults(func=cmd_segment)
    return ap


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
