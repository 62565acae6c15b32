#!/usr/bin/env python3
"""
Ad-hoc quick evaluation: MSE / PSNR / SSIM of SAVi reconstruction +
PlaySlot prediction on a handful of test sequences.

Mirror of reference quick_eval.py (which is broken as shipped — it imports
compute_lpips/compute_psnr/compute_ssim that don't exist, see SURVEY.md §0.1;
this version works).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser(description="Quick SAVi/PlaySlot evaluation")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--name_pred_exp", default=None)
    p.add_argument("--pred_ckpt", default=None)
    p.add_argument("--num_seqs", type=int, default=4)
    p.add_argument("--num_seed", type=int, default=6)
    p.add_argument("--num_preds", type=int, default=8)
    args = p.parse_args()

    from playslot_tpu.cli.common import resolve_predictor_variables, resolve_savi_params
    from playslot_tpu.config import Config
    from playslot_tpu.data.loader import build_data_loader, load_data, unwrap_batch_data
    from playslot_tpu.models.factory import setup_model, setup_predictor
    from playslot_tpu.utils.metrics import psnr, ssim

    exp_params = Config.load(args.exp_directory)
    savi = setup_model(exp_params["model"])
    savi_vars = resolve_savi_params(args.exp_directory, args.savi_ckpt)

    ds = load_data(exp_params, split="test")
    loader = build_data_loader(ds, batch_size=1, shuffle=False)
    key = jax.random.PRNGKey(0)

    fwd = jax.jit(lambda p_, x, k: savi.apply({"params": p_}, x, rngs={"slots": k}))
    mses, psnrs, ssims = [], [], []
    for i, batch in enumerate(loader):
        if i >= args.num_seqs:
            break
        videos, _, _, _ = unwrap_batch_data(exp_params, batch)
        key, k = jax.random.split(key)
        out = fwd(savi_vars["params"], jnp.asarray(videos), k)
        rec = jnp.clip(out["recons_imgs"], 0, 1)
        tgt = jnp.clip(jnp.asarray(videos), 0, 1)
        mses.append(float(jnp.mean((rec - tgt) ** 2)))
        flat_r = rec.reshape(-1, *rec.shape[2:])
        flat_t = tgt.reshape(-1, *tgt.shape[2:])
        psnrs.append(float(jnp.mean(psnr(flat_r, flat_t))))
        ssims.append(float(jnp.mean(ssim(flat_r, flat_t))))
    print(f"SAVi recon over {len(mses)} seqs: "
          f"MSE={np.mean(mses):.5f} PSNR={np.mean(psnrs):.2f} "
          f"SSIM={np.mean(ssims):.4f}")

    if args.name_pred_exp and args.pred_ckpt:
        pred_path = os.path.join(args.exp_directory, "predictors",
                                 args.name_pred_exp)
        pred_params = Config.load(pred_path)
        predictor = setup_predictor(
            pred_params["predictor"],
            savi_params=pred_params["model"]["model_params"])
        pred_vars = resolve_predictor_variables(
            pred_path, args.pred_ckpt,
            predictor_name=pred_params["predictor"]["predictor_name"])
        pred_params["dataset"]["num_frames"] = args.num_seed + args.num_preds
        ds2 = load_data(pred_params, split="test")
        loader2 = build_data_loader(ds2, batch_size=1, shuffle=False)

        @jax.jit
        def pfwd(sp, pv, v, k1, k2):
            slots = savi.apply({"params": sp}, v, decode=False,
                               rngs={"slots": k1})["slot_history"]
            preds = predictor.apply(
                pv, slots, num_samples=1, num_seed=args.num_seed,
                num_preds=args.num_preds, use_posterior=True,
                rngs={"action": k2},
                method=lambda m, *a, **kk: m.forward_multiple_samples(*a, **kk))
            imgs, _, _ = savi.apply({"params": sp}, preds[:, 0],
                                    method=lambda m, s: m.decode_fast(s))
            return jnp.clip(imgs, 0, 1)

        ppsnrs = []
        for i, batch in enumerate(loader2):
            if i >= args.num_seqs:
                break
            videos, _, _, _ = unwrap_batch_data(pred_params, batch)
            key, k1, k2 = jax.random.split(key, 3)
            imgs = pfwd(savi_vars["params"], pred_vars, jnp.asarray(videos), k1, k2)
            tgt = jnp.clip(jnp.asarray(
                videos[:, args.num_seed:args.num_seed + args.num_preds]), 0, 1)
            ppsnrs.append(float(jnp.mean(psnr(imgs[0], tgt[0]))))
        print(f"PlaySlot prediction PSNR over {len(ppsnrs)} seqs: "
              f"{np.mean(ppsnrs):.2f}")


if __name__ == "__main__":
    main()
