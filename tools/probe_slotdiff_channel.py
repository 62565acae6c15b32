#!/usr/bin/env python3
"""
Upper-bound probe for the latent-action channel: linear R^2 from raw SAVi
slot DIFFERENCES (slots[t+1] - slots[t], the exact signal InvDyn encodes)
to the ground-truth action, measured on the predictor's own training
distribution (policy="random", static target).

If this upper bound is low for a given SAVi, no InvDyn/VQ tuning can build
a working channel on top of it — the action information is not linearly
present in the differenced representation, and the SAVi (not the predictor)
must be retrained/reselected. Round-3 evidence: seed-2 SAVis pass every
per-frame probe (dedicated slot, position R^2 ~1) yet fail here, which is
why 5 independent predictor runs all landed at channel R^2 ~0.06.

Usage: python tools/probe_slotdiff_channel.py [seed_dirs...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax


def slotdiff_r2(savi, params, img_size=64, batches=2, batch=64,
                num_frames=8, seed=500):
    from playslot_tpu.data.gridshapes_jax import generate_scene_batch

    @jax.jit
    def fwd(videos):
        with jax.default_matmul_precision("highest"):
            return savi.apply({"params": params}, videos, decode=False,
                              rngs={"slots": jax.random.PRNGKey(0)}
                              )["slot_history"]

    Xs, Ys = [], []
    for i in range(batches):
        out = generate_scene_batch(
            jax.random.fold_in(jax.random.PRNGKey(seed), i), batch=batch,
            num_frames=num_frames, img_size=img_size, policy="random",
            target_walk=0.0)
        slots = np.asarray(fwd(out["videos"]))          # (B,T,S,D)
        diff = slots[:, 1:] - slots[:, :-1]             # (B,T-1,S,D)
        acts = np.asarray(out["actions"])[:, :-1]       # (B,T-1,2)
        Xs.append(diff.reshape(-1, diff.shape[2] * diff.shape[3]))
        Ys.append(acts.reshape(-1, 2))
    X = np.concatenate(Xs)
    Y = np.concatenate(Ys)
    X1 = np.concatenate([X, np.ones((len(X), 1))], 1)
    W, *_ = np.linalg.lstsq(X1, Y, rcond=None)
    resid = ((Y - X1 @ W) ** 2).sum()
    r2 = 1 - resid / ((Y - Y.mean(0)) ** 2).sum()
    # noise floor: total slot-difference energy vs the part predictable
    # from the action (reverse probe action -> slotdiff)
    A1 = np.concatenate([Y, np.ones((len(Y), 1))], 1)
    Wa, *_ = np.linalg.lstsq(A1, X, rcond=None)
    explained = 1 - ((X - A1 @ Wa) ** 2).sum() / ((X - X.mean(0)) ** 2).sum()
    return float(r2), float(explained), float(np.abs(X).mean())


def main(dirs):
    from playslot_tpu.config import Config
    from playslot_tpu.models.factory import setup_model
    from playslot_tpu.utils.checkpoint import load_checkpoint

    for exp in dirs:
        cfg = Config.load(exp)
        params = load_checkpoint(
            os.path.join(exp, "models", "checkpoint_epoch_final"))[
            "state"]["params"]
        savi = setup_model(cfg["model"])
        r2, explained, scale = slotdiff_r2(
            savi, params, img_size=cfg["dataset"].get("img_size", 64))
        print(exp, json.dumps({
            "r2_slotdiff_to_action": round(r2, 4),
            "r2_action_to_slotdiff": round(explained, 4),
            "mean_abs_slotdiff": round(scale, 5)}))


if __name__ == "__main__":
    main(sys.argv[1:] or [f"experiments/GridShapesStudy/seed{s}"
                          for s in (0, 1, 2)])
