#!/usr/bin/env python3
"""
Trained-weight parity report (VERDICT r4 item 1): the BASELINE
"PSNR/mIoU within 1% ... converted checkpoints" gate demonstrated on
checkpoints TRAINED by the actual PyTorch reference in-image.

Consumes the artifacts of tools/train_reference_torch.py
(experiments/TrainedParity: reference-trained SAVi_trained.pth +
PlaySlot_trained.pth, frozen eval_frames.npz with GT masks) and runs
tools/parity_eval.py — the torch-side eval mirrors the reference's own
03_evaluate_savi forward_eval (src/03_evaluate_savi.py:21-51: full-sequence
reconstruction scored against targets) and 05_evaluate_PlaySlot posterior
semantics (src/05_evaluate_PlaySlot.py:65-139, deterministic noise injected
identically on both sides); the JAX side converts the same .pth with
utils/convert.py and evaluates the same frozen frames. PSNR uses the
repo's implementation on both sides' outputs (the reference's own metric
classes require piqa, which is not installable in-image — same formula).

Writes docs/TRAINED_PARITY.json: training provenance (steps, loss curves)
+ the two-sided metric report + the 1% strict gate. Exit 1 if the gate
fails. tests/test_trained_parity.py re-runs the convert-and-compare half
against the committed checkpoints.
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EXP = os.path.join(_REPO, "experiments", "TrainedParity")
OUT = os.path.join(_REPO, "docs", "TRAINED_PARITY.json")


def main():
    import parity_eval

    npz = os.path.join(EXP, "eval_frames.npz")
    report_path = os.path.join(EXP, "parity_report.json")
    rc = parity_eval.main([
        "-d", EXP, "--savi_ckpt", "SAVi_trained.pth",
        "--name_pred_exp", "PlaySlotTrained",
        "--pred_ckpt", "PlaySlot_trained.pth",
        "--frames", npz, "--num_seed", "3", "--num_preds", "5",
        "--report", report_path])
    with open(report_path) as f:
        report = json.load(f)

    with open(os.path.join(EXP, "train_log.json")) as f:
        tl = json.load(f)

    def curve(name):
        ent = tl.get(name, [])
        return {"steps": len(ent),
                "loss_head": [e["loss"] for e in ent[:3]],
                "loss_tail": [e["loss"] for e in ent[-3:]]}

    out = {
        "provenance": {
            "trainer": "tools/train_reference_torch.py — the reference's own "
                       "SAVi + SlotSingleActionPredictor/LossTracker/"
                       "LRWarmUp/Adam, single-core torch CPU",
            "scale": "behavior-study SAVi config (3 slots, 64x64, 3x32ch), "
                     "reduced-but-complete cosine schedules",
            "savi": curve("savi"),
            "predictor": curve("predictor"),
            "eval_set": "eval_frames.npz — 16 frozen held-out GridShapes "
                        "sequences x 8 frames + GT instance masks",
        },
        "parity": report,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {OUT}; gate={report.get('strict_gate')}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
