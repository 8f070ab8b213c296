"""Analytic per-layer roofline for the UNet1D training step.

Counterpart of train_layer_bench.py's roofline column for the 1-D spike
net (reference hot loop: ``unet_1d_segmentation.py:300-302``) — pure
host-side arithmetic, no device needed. For every conv of
``models/unet1d.py`` at the bench recipe (batch 20, T=4096, nfb=32) it
prints FLOPs, the lane-padding MXU efficiency
``min(max(c,8),128)/128`` per operand (measured basis:
docs/VALIDATION.md "Conv MXU efficiency"), and a 3-pass
(fwd + input-grad + weight-grad) floor of
``max(flops / (peak * eff), bytes / HBM_bw)``.

Output feeds the VALIDATION round-4 "1-D training floor" paragraph:
the conv floor is ~2.3 ms against a measured 6.74 ms step (bench
``train1d_step_ms``), i.e. the 1-D step is glue-dominated like the 2-D
one, NOT lane-floor-limited; the thin-channel L0/L1 rows cost ~0.9 ms
of the floor and are the ceiling on what an ``apply_fast_t``-style
T-packed TRAIN path could reclaim.

Usage: python examples/analysis/unet1d_roofline.py [--batch 20]
         [--t 4096] [--nfb 32] [--step-ms 6.74]
"""

import argparse

PEAK = 197e12
HBM = 810e9


def lane(c):
    return min(max(c, 8), 128) / 128.0


def census(batch, t, f):
    """(name, t, cin, cout, k) for every conv of models/unet1d.py."""
    layers = []
    tt, cin = t, 1
    for i, mult in enumerate([1, 2, 4, 8]):
        cout = f * mult
        layers += [(f"enc{i}a", tt, cin, cout, 5),
                   (f"enc{i}b", tt, cout, cout, 5)]
        cin = cout
        tt //= 2
    layers += [("mida", tt, cin, 16 * f, 5),
               ("midb", tt, 16 * f, 16 * f, 5)]
    cup = 16 * f
    for i, mult in zip([3, 2, 1, 0], [8, 4, 2, 1]):
        tt *= 2
        cout = f * mult
        layers += [(f"dec{i}a", tt, cup + cout, cout, 5),
                   (f"dec{i}b", tt, cout, cout, 5)]
        cup = cout
    layers.append(("head", tt, f, 2, 1))
    return layers


def main():
    pa = argparse.ArgumentParser()
    pa.add_argument("--batch", type=int, default=20)
    pa.add_argument("--t", type=int, default=4096)
    pa.add_argument("--nfb", type=int, default=32)
    pa.add_argument("--step-ms", type=float, default=None,
                    help="measured step for the ceiling comparison "
                         "(bench train1d_step_ms)")
    args = pa.parse_args()

    tot_fl, tot_floor, thin_floor = 0, 0.0, 0.0
    print(f"{'layer':8s} {'t':>5s} {'cin':>4s} {'cout':>4s} {'GFLOP':>7s}"
          f" {'mxu_eff':>7s} {'floor_ms(3p)':>12s}")
    for name, tt, ci, co, k in census(args.batch, args.t, args.nfb):
        fl = 2 * args.batch * tt * k * ci * co
        eff = lane(ci) * lane(co)
        bytes_m = (args.batch * tt * (ci + co) + k * ci * co) * 2
        floor = max(fl / (PEAK * eff), bytes_m / HBM) * 3
        tot_fl += fl
        tot_floor += floor
        if eff < 0.5:
            thin_floor += floor
        bound = "bw" if bytes_m / HBM > fl / (PEAK * eff) else "mxu"
        print(f"{name:8s} {tt:5d} {ci:4d} {co:4d} {fl/1e9:7.2f} "
              f"{eff:7.3f} {floor*1e3:12.4f} {bound}")
    useful = 3 * tot_fl
    ideal = useful / PEAK
    print(f"\nuseful 3x-fwd FLOPs/step: {useful/1e9:.1f} G")
    print(f"analytic conv floor: {tot_floor*1e3:.3f} ms "
          f"-> MFU ceiling {useful/tot_floor/PEAK:.1%}")
    print(f"lane-padding cost at the floor: "
          f"{(tot_floor-ideal)*1e3:.3f} ms "
          f"(thin rows eff<0.5: {thin_floor*1e3:.3f} ms)")
    if args.step_ms:
        print(f"measured {args.step_ms:.2f} ms -> "
              f"{args.step_ms/(tot_floor*1e3):.2f}x the conv floor; "
              f"MFU {useful/(args.step_ms*1e-3)/PEAK:.1%}")


if __name__ == "__main__":
    main()
