#!/usr/bin/env python3
"""
Export AlexNet-LPIPS weights to the .npz format consumed by
playslot_tpu.utils.metrics.LPIPS.

This environment has no network egress, so pretrained AlexNet/LPIPS weights
cannot be downloaded here; run this exporter on a machine that has
torchvision (with its cached `alexnet` weights) and the LPIPS linear heads
(piqa or richzhang/PerceptualSimilarity), then point PLAYSLOT_LPIPS_WEIGHTS
at the resulting file.

Layout written:
  feat{0..4}/kernel  (kh, kw, cin, cout)  - the 5 alexnet conv kernels
  feat{0..4}/bias    (cout,)
  lin{0..4}/kernel   (1, 1, cout, 1)      - LPIPS linear heads
  shift, scale       (3,)                 - input normalization constants
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="lpips_alexnet.npz")
    args = p.parse_args()

    import torch
    import torchvision

    alexnet = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
    conv_idx = [0, 3, 6, 8, 10]
    out = {}
    for i, ci in enumerate(conv_idx):
        w = alexnet[ci].weight.detach().numpy()  # (out, in, kh, kw)
        out[f"feat{i}/kernel"] = w.transpose(2, 3, 1, 0)
        out[f"feat{i}/bias"] = alexnet[ci].bias.detach().numpy()

    # LPIPS linear heads. Preferred source: piqa (what the reference's
    # metric uses, src/lib/metrics.py:280-328) — piqa.lpips.LPIPS(network=
    # "alex") stores them as `weights`, a ParameterList of (1, C, 1, 1)
    # tensors. Fallback: the richzhang/PerceptualSimilarity `lpips` package.
    # Last resort: uniform averaging heads (still a valid perceptual metric,
    # not numerically the published LPIPS).
    heads = None
    try:
        from piqa.lpips import LPIPS as PiqaLPIPS
        net = PiqaLPIPS(network="alex")
        heads = [w.detach().numpy() for w in net.weights]  # (1, C, 1, 1) each
        print("linear heads: piqa")
    except Exception as e:
        print(f"piqa unavailable ({e}); trying lpips package")
        try:
            import lpips as lpips_pkg
            net = lpips_pkg.LPIPS(net="alex")
            heads = [lin.model[-1].weight.detach().numpy() for lin in net.lins]
            print("linear heads: lpips (richzhang)")
        except Exception as e2:
            print(f"lpips package unavailable ({e2}); writing uniform heads")
    if heads is not None:
        for i, w in enumerate(heads):
            out[f"lin{i}/kernel"] = w.transpose(2, 3, 1, 0)
    else:
        dims = [64, 192, 384, 256, 256]
        for i, c in enumerate(dims):
            out[f"lin{i}/kernel"] = np.full((1, 1, c, 1), 1.0 / c, np.float32)

    out["shift"] = np.array([-0.030, -0.088, -0.188], np.float32)
    out["scale"] = np.array([0.458, 0.448, 0.450], np.float32)
    np.savez(args.out, **out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
