"""
Trained-checkpoint conversion parity (VERDICT r4 item 1, the slow gate).

experiments/TrainedParity holds checkpoints TRAINED in-image by the actual
PyTorch reference (tools/train_reference_torch.py: the reference's own
SAVi/SlotSingleActionPredictor forward+loss, Adam + clip + its own
LRWarmUp/cosine — not random weights, not a resync). This test re-runs the
convert-and-compare half (tools/parity_eval.py) against the committed .pth
and frozen eval set and asserts the BASELINE gate: every shared metric —
SAVi PSNR/SSIM/mIoU and prediction PSNR/SSIM — within 1% between the torch
eval and the JAX eval of the converted weights.
"""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP = os.path.join(REPO, "experiments", "TrainedParity")


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(EXP, "models", "SAVi_trained.pth")),
    reason="trained reference checkpoints not present")
def test_trained_reference_checkpoint_parity(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity_eval

    report_path = str(tmp_path / "report.json")
    rc = parity_eval.main([
        "-d", EXP, "--savi_ckpt", "SAVi_trained.pth",
        "--name_pred_exp", "PlaySlotTrained",
        "--pred_ckpt", "PlaySlot_trained.pth",
        "--frames", os.path.join(EXP, "eval_frames.npz"),
        "--num_seed", "3", "--num_preds", "5",
        "--strict", "--report", report_path])
    with open(report_path) as f:
        report = json.load(f)

    assert rc == 0, f"parity gate failed: {json.dumps(report, indent=2)}"
    assert report["strict_gate"] == "PASS"
    assert report["worst_relative_metric_delta"] <= 0.01
    # the trained SAVi must actually be trained: a random-weight SAVi
    # reconstructs GridShapes at ~11 dB and segments at chance; the
    # committed 1200-step run measured 17.4 dB / mIoU 0.24
    # (docs/TRAINED_PARITY.json)
    assert report["savi"]["torch"]["psnr"] > 15
    assert report["savi"]["torch"]["miou"] > 0.2
    # and the converted weights must reproduce the masks, not only the PSNR
    assert report["savi"]["mask_argmax_agreement"] > 0.999
