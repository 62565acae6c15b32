#!/usr/bin/env python3
"""
Slot-binding diagnostic for a trained SAVi checkpoint on the goal-reaching
scene: does each scene entity (agent / target / background) get a dedicated
slot, and is its position decodable from the slot latents?

This is the probe that localized the round-2 closed-loop failure: a SAVi
with healthy PSNR/mIoU can still fold a static object into the background
slot (no motion cue), leaving its position unreadable downstream — the
policy then cannot know where the goal is. Reference has no equivalent
tooling (its visual check is src/06_generate_figs_savi.py figures).

Usage:
    python tools/probe_slot_binding.py -d experiments/GridShapesStudy/seed0 \
        [--checkpoint checkpoint_epoch_final] [--target_walk 0.0]

Prints per-entity slot-ownership fractions, the fraction of frames with a
dedicated target slot, and linear position-probe R^2 per entity.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def collect(savi, savi_params, batches=8, batch=64, num_frames=8, img_size=64,
            target_walk=0.0, seed=100):
    from playslot_tpu.data.gridshapes_jax import generate_scene_batch

    @jax.jit
    def fwd(videos):
        with jax.default_matmul_precision("highest"):
            out = savi.apply({"params": savi_params}, videos,
                             rngs={"slots": jax.random.PRNGKey(0)})
            return out["slot_history"], out["masks"]

    X, Y, assign, gt = [], [], [], []
    for i in range(batches):
        out = generate_scene_batch(
            jax.random.fold_in(jax.random.PRNGKey(seed), i), batch=batch,
            num_frames=num_frames, img_size=img_size, policy="expert",
            target_walk=target_walk)
        slots, masks = fwd(out["videos"])
        X.append(np.asarray(slots))
        assign.append(np.asarray(masks).squeeze(-1).argmax(axis=2))
        gt.append(np.asarray(out["masks"]))
    return (np.concatenate(X), np.concatenate(assign), np.concatenate(gt))


def ownership(assign, gt, num_slots):
    rows = {}
    for cls, name in ((0, "background"), (1, "agent"), (2, "target")):
        sel = gt == cls
        hist = np.bincount(assign[sel], minlength=num_slots) / max(sel.sum(), 1)
        rows[name] = np.round(hist, 3)
    # dedicated target slot: owns >=50% of target pixels, <10% of background
    B, T = gt.shape[:2]
    dedicated = 0
    for b in range(B):
        for t in range(T):
            tgt, bg = gt[b, t] == 2, gt[b, t] == 0
            if not tgt.any():
                continue
            for s in range(num_slots):
                win = assign[b, t] == s
                if (win & tgt).sum() / tgt.sum() > 0.5 \
                        and (win & bg).sum() / max(bg.sum(), 1) < 0.1:
                    dedicated += 1
                    break
    return rows, dedicated / (B * T)


def position_probe(X, gt, img_size):
    """Ridge probe slots -> (agent_yx, target_yx)/R; returns R^2 per target."""
    yy, xx = np.mgrid[0:img_size, 0:img_size]
    feats, targets = [], []
    B, T = gt.shape[:2]
    for b in range(B):
        for t in range(T):
            m = gt[b, t]
            if not (m == 1).any() or not (m == 2).any():
                continue
            feats.append(X[b, t].reshape(-1))
            targets.append([yy[m == 1].mean(), xx[m == 1].mean(),
                            yy[m == 2].mean(), xx[m == 2].mean()])
    F = np.stack(feats).astype(np.float32)
    Yt = np.stack(targets).astype(np.float32) / img_size
    n = len(F)
    tr = np.arange(n) % 5 != 0
    Ft = np.concatenate([F[tr], np.ones((tr.sum(), 1), np.float32)], 1)
    W = np.linalg.solve(Ft.T @ Ft + 1e-3 * np.eye(Ft.shape[1]), Ft.T @ Yt[tr])
    Fv = np.concatenate([F[~tr], np.ones(((~tr).sum(), 1), np.float32)], 1)
    pred = Fv @ W
    res = ((pred - Yt[~tr]) ** 2).sum(0)
    tot = ((Yt[~tr] - Yt[tr].mean(0)) ** 2).sum(0)
    return np.round(1 - res / tot, 3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--checkpoint", default="checkpoint_epoch_final")
    p.add_argument("--target_walk", type=float, default=0.0)
    p.add_argument("--batches", type=int, default=8)
    args = p.parse_args()

    from playslot_tpu.config import Config
    from playslot_tpu.models.factory import setup_model
    from playslot_tpu.utils.checkpoint import load_checkpoint

    cfg = Config.load(args.exp_directory)
    mp = cfg["model"]["model_params"]
    savi = setup_model(cfg["model"])
    savi_params = load_checkpoint(
        os.path.join(args.exp_directory, "models", args.checkpoint)
    )["state"]["params"]
    img = mp["encoder"]["encoder_params"]["resolution"][0]

    X, assign, gt = collect(savi, savi_params, batches=args.batches,
                            img_size=img, target_walk=args.target_walk)
    rows, dedicated = ownership(assign, gt, mp["num_slots"])
    print("slot-ownership fractions (per entity, over its pixels):")
    for name, hist in rows.items():
        print(f"  {name:<11} {hist}")
    print(f"frames with a dedicated target slot: {dedicated:.2f}")
    r2 = position_probe(X, gt, img)
    print(f"linear position-probe R^2 [agent_y agent_x target_y target_x]: {r2}")


if __name__ == "__main__":
    main()
