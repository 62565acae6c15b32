#!/usr/bin/env python3
"""
Diagnostic probe for the InvDyn latent-action channel: how much ground-truth
action information do the inferred latents carry?

Reports, over a random-exploration batch:
  * scale of the action-direction mean vs the sampling std (SNR),
  * linear-probe R^2 from sampled latents -> GT actions,
  * linear-probe R^2 from the (noise-free) means -> GT actions,
  * codeword usage histogram.

A healthy PlaySlot run has mean >> std and rising R^2; a noise-dominated
channel (R^2 ~ 0 from samples) means the behavior stage cannot distill
actions yet (train the predictor longer).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--name_pred_exp", default="PlaySlot")
    p.add_argument("--savi_ckpt", default="checkpoint_epoch_final")
    p.add_argument("--pred_ckpt", default="checkpoint_epoch_final")
    p.add_argument("--dataset", default="GridShapesOnDevice_SceneRandom")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--num_frames", type=int, default=8)
    args = p.parse_args()

    from playslot_tpu.cli.common import resolve_predictor_variables, resolve_savi_params
    from playslot_tpu.config import Config
    from playslot_tpu.models.factory import setup_model, setup_predictor

    exp = args.exp_directory
    pred_path = os.path.join(exp, "predictors", args.name_pred_exp)
    cfg = Config.load(exp)
    pcfg = Config.load(pred_path)
    savi = setup_model(cfg["model"])
    pred = setup_predictor(pcfg["predictor"],
                           savi_params=cfg["model"]["model_params"])
    sv = resolve_savi_params(exp, args.savi_ckpt)
    pv = resolve_predictor_variables(pred_path, args.pred_ckpt,
                                     pcfg["predictor"]["predictor_name"])

    from playslot_tpu.data.gridshapes_jax import generate_scene_batch
    out = generate_scene_batch(jax.random.PRNGKey(5), batch=args.batch,
                               num_frames=args.num_frames,
                               img_size=cfg["model"]["model_params"]["encoder"]
                               ["encoder_params"]["resolution"][0],
                               policy="random")
    videos, actions = out["videos"], np.asarray(out["actions"])

    slots = savi.apply({"params": sv["params"]}, videos, decode=False,
                       rngs={"slots": jax.random.PRNGKey(0)})["slot_history"]
    la = pred.apply(pv, slots, rngs={"action": jax.random.PRNGKey(1)},
                    method=lambda m, s: m.latent_action(s, train=False))

    dist = np.asarray(la["action_dist"])
    mu, var = dist[:, :, 0], dist[:, :, 1]
    lat = np.asarray(la["sampled_latent_action"])
    acts = actions[:, :lat.shape[1]]

    def probe_r2(X, Y):
        X1 = np.concatenate([X, np.ones((len(X), 1))], 1)
        W, *_ = np.linalg.lstsq(X1, Y, rcond=None)
        resid = ((Y - X1 @ W) ** 2).sum()
        return 1 - resid / ((Y - Y.mean(0)) ** 2).sum()

    Y = acts.reshape(-1, acts.shape[-1])
    r2_sample = probe_r2(lat.reshape(-1, lat.shape[-1]), Y)
    r2_mean = probe_r2(mu.reshape(-1, mu.shape[-1]), Y)
    usage = np.asarray(pv.get("vq", {}).get("latent_action", {})
                       .get("quantizer", {}).get("usage_bins", []))

    report = {
        "mean_abs_mu": float(np.abs(mu).mean()),
        "mean_std": float(np.sqrt(var).mean()),
        "snr": float((mu ** 2).mean() / max(var.mean(), 1e-12)),
        "r2_sampled_latent_to_action": round(float(r2_sample), 4),
        "r2_mean_to_action": round(float(r2_mean), 4),
        "codebook_usage": np.round(usage, 3).tolist(),
    }
    for k, v in report.items():
        print(f"{k}: {v}")
    return report


if __name__ == "__main__":
    main()
