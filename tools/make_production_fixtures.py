#!/usr/bin/env python3
"""
Materialize the reference's shipped production experiment trees
(`experiment_params.json` chains only — no weights) under ./experiments/,
so every CLI (03/05/06/10/11) runs against reference-identical
hyperparameters the moment data or checkpoints appear (VERDICT r2 item 7).

The on-disk schema of our Config is deliberately identical to the
reference's (playslot_tpu/config.py), so "conversion" is: load the
reference JSON, round-trip it through Config (which back-fills any
framework-added default keys, e.g. prediction_params.input_buffer_size),
and save. Hyperparameter tables must match numerically for experiment-dir
compatibility — this is the config-registry parity already shipped in
playslot_tpu/configs/** (reference source trees:
/root/reference/experiments/*/experiment_params.json).

Usage: python tools/make_production_fixtures.py [--ref ROOT] [--out ROOT]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from playslot_tpu.config import Config

# the reference's shipped trees (SURVEY.md §2.7); checkpoints were stripped
# upstream (.MISSING_LARGE_BLOBS) — these are pure hyperparameter fixtures
TREES = [
    "BlockPush",
    "BlockPush/predictors/ActCondOCVP",
    "BlockPush/predictors/OCVP",
    "BlockPush/predictors/PlaySlot",
    "BlockPush/predictors/PlaySlot/behaviors/Policy_AllDemos",
    "ButtonPress",
    "ButtonPress/oracle/Oracle",
    "ButtonPress/predictors/ActCondOCVP",
    "ButtonPress/predictors/PlaySlot",
    "ButtonPress/predictors/PlaySlot/behaviors/Policy_AllDemos",
    "GridShapes2Objs",
    "GridShapes2Objs/predictors/PlaySlot",
    "GridShapes5Objs",
    "GridShapes5Objs/predictors/PlaySlot",
    "Sketchy",
    "Sketchy/predictors/PlaySlot",
]

# experiment-dir subfolders created by the reference scaffolding CLIs
# (01_create_experiment.py:48-83); empty dirs keep every CLI's output
# destination present
SUBDIRS = ["models", "plots", "results"]


def convert_tree(ref_root, out_root, rel):
    src = os.path.join(ref_root, rel, Config.FILENAME)
    with open(src) as f:
        params = json.load(f)
    dst = os.path.join(out_root, rel)
    cfg = Config(exp_path=dst, **params)
    cfg._backfill_defaults()
    cfg.save()
    for sub in SUBDIRS:
        os.makedirs(os.path.join(dst, sub), exist_ok=True)
        keep = os.path.join(dst, sub, ".gitkeep")
        if not os.listdir(os.path.join(dst, sub)):
            open(keep, "w").close()
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference/experiments")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "experiments"))
    args = ap.parse_args()
    for rel in TREES:
        dst = convert_tree(args.ref, args.out, rel)
        print(f"wrote {dst}")


if __name__ == "__main__":
    main()
