#!/usr/bin/env python3
"""
Ad-hoc prediction visualizer: renders seed frames, posterior prediction and
(optionally) N prior-sample rollouts for a few test sequences into GIFs/PNGs.

Mirror of reference visual_inference.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser(description="PlaySlot visual inference")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--name_pred_exp", required=True)
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--pred_ckpt", required=True)
    p.add_argument("--num_seqs", type=int, default=3)
    p.add_argument("--num_seed", type=int, default=6)
    p.add_argument("--num_preds", type=int, default=15)
    p.add_argument("--num_samples", type=int, default=3)
    p.add_argument("--out_dir", default=None)
    args = p.parse_args()

    from playslot_tpu.cli.common import resolve_predictor_variables, resolve_savi_params
    from playslot_tpu.config import Config
    from playslot_tpu.data.loader import build_data_loader, load_data, unwrap_batch_data
    from playslot_tpu.models.factory import setup_model, setup_predictor
    from playslot_tpu.utils import visualizations as viz

    pred_path = os.path.join(args.exp_directory, "predictors", args.name_pred_exp)
    exp_params = Config.load(pred_path)
    savi = setup_model(exp_params["model"])
    savi_vars = resolve_savi_params(args.exp_directory, args.savi_ckpt)
    predictor = setup_predictor(
        exp_params["predictor"], savi_params=exp_params["model"]["model_params"])
    pred_vars = resolve_predictor_variables(
        pred_path, args.pred_ckpt,
        predictor_name=exp_params["predictor"]["predictor_name"])

    exp_params["dataset"]["num_frames"] = args.num_seed + args.num_preds
    ds = load_data(exp_params, split="test")
    loader = build_data_loader(ds, batch_size=1, shuffle=False)
    out_root = args.out_dir or os.path.join(pred_path, "plots", "visual_inference")

    @jax.jit
    def fwd(sp, pv, v, k1, k2):
        slots = savi.apply({"params": sp}, v, decode=False,
                           rngs={"slots": k1})["slot_history"]
        preds = predictor.apply(
            pv, slots, num_samples=args.num_samples, num_seed=args.num_seed,
            num_preds=args.num_preds, use_posterior=True, rngs={"action": k2},
            method=lambda m, *a, **kk: m.forward_multiple_samples(*a, **kk))
        imgs, _, _ = savi.apply({"params": sp}, preds,
                                method=lambda m, s: m.decode_fast(s))
        return jnp.clip(imgs, 0, 1)  # (1, N, num_preds, H, W, C)

    key = jax.random.PRNGKey(0)
    for i, batch in enumerate(loader):
        if i >= args.num_seqs:
            break
        videos, _, _, _ = unwrap_batch_data(exp_params, batch)
        key, k1, k2 = jax.random.split(key, 3)
        imgs = np.asarray(fwd(savi_vars["params"], pred_vars,
                              jnp.asarray(videos), k1, k2))[0]
        seq_dir = os.path.join(out_root, f"seq_{i:03d}")
        viz.make_gif(videos[0, :args.num_seed], os.path.join(seq_dir, "seed.gif"))
        viz.make_gif(videos[0, args.num_seed:], os.path.join(seq_dir, "gt.gif"))
        viz.make_gif(imgs[0], os.path.join(seq_dir, "posterior.gif"))
        for s in range(1, imgs.shape[0]):
            viz.make_gif(imgs[s], os.path.join(seq_dir, f"prior_{s}.gif"))
        viz.visualize_recons(videos[0, args.num_seed:], imgs[0],
                             savepath=os.path.join(seq_dir, "posterior.png"))
        print(f"saved {seq_dir}")


if __name__ == "__main__":
    main()
