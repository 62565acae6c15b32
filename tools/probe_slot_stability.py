#!/usr/bin/env python3
"""
Temporal slot-identity stability diagnostic.

The round-3 seed-2 mystery: a SAVi passing every PER-FRAME probe (dedicated
target slot 0.95, position probes R^2 0.91-1.0, oracle success 1.0) still
yields a dead latent-action channel (R^2 0.06 across 5 predictor inits).
InvDyn's action latent is built from slots[t+1] - slots[t] (same slot index
across time) — a SAVi that re-assigns WHICH slot holds the agent mid-sequence
destroys that difference signal while remaining perfect on every per-frame
metric, and the oracle's transformer policy (permutation-robust attention
over slots) never notices.

For each seed's SAVi checkpoint this prints, over expert-policy scenes:
  - per-sequence count of agent-owner switches (majority slot over the
    agent's pixels changing between consecutive frames)
  - same for the target
  - fraction of sequences with ANY switch.

Usage: python tools/probe_slot_stability.py [seed_dirs...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def owner_track(assign, gt, cls):
    """(B,T) majority slot owning gt==cls pixels per frame (-1 if absent)."""
    B, T = gt.shape[:2]
    own = np.full((B, T), -1, np.int64)
    for b in range(B):
        for t in range(T):
            sel = gt[b, t] == cls
            if sel.any():
                own[b, t] = np.bincount(assign[b, t][sel]).argmax()
    return own


def switches(own):
    """Mean # of owner changes per sequence + fraction of seqs with any."""
    valid = own >= 0
    ch = (own[:, 1:] != own[:, :-1]) & valid[:, 1:] & valid[:, :-1]
    per_seq = ch.sum(1)
    return float(per_seq.mean()), float((per_seq > 0).mean())


def main(dirs):
    from playslot_tpu.config import Config
    from playslot_tpu.models.factory import setup_model
    from playslot_tpu.utils.checkpoint import load_checkpoint
    from probe_slot_binding import collect

    report = {}
    for exp in dirs:
        cfg = Config.load(exp)
        params = load_checkpoint(
            os.path.join(exp, "models", "checkpoint_epoch_final"))[
            "state"]["params"]
        savi = setup_model(cfg["model"])
        _, assign, gt = collect(savi, params, batches=2,
                                img_size=cfg["dataset"].get("img_size", 64),
                                target_walk=0.0)
        row = {}
        for cls, name in ((1, "agent"), (2, "target")):
            mean_sw, frac_any = switches(owner_track(assign, gt, cls))
            row[name] = {"mean_switches_per_seq": round(mean_sw, 3),
                         "frac_seqs_with_switch": round(frac_any, 3)}
        report[exp] = row
        print(exp, json.dumps(row))
    return report


if __name__ == "__main__":
    dirs = sys.argv[1:] or [f"experiments/GridShapesStudy/seed{s}"
                            for s in (0, 1, 2)]
    main(dirs)
