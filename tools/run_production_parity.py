#!/usr/bin/env python3
"""
Strict conversion-parity gate at PRODUCTION shapes (VERDICT r2 item 2).

For each shipped PlaySlot production config (the fixture trees materialized
by tools/make_production_fixtures.py — ButtonPress: 4 slots / 128-d SAVi,
predictor 256-d x 4 layers, 8 prototypes, action_dim 24; BlockPush: 8 slots
/ 128-d, action_dim 16), this script:

  1. builds RANDOM-weight torch checkpoints with the reference's own model
     classes at exactly those configs (the pretrained .pth binaries are
     stripped upstream — random weights still exercise every conversion
     class the toy-shape test cannot see: pos-emb sizes at 64 tokens,
     GRU layout at 128-d, staircase mask at ctx 8, 256-d transformer heads),
  2. converts them and runs tools/parity_eval.py --strict at the canonical
     seed-6 / pred-15 BASELINE workload (scripts/05_eval_PlaySlot_*.sh),
  3. writes each JSON report into the fixture tree
     (experiments/<EXP>/predictors/PlaySlot/results/parity_production.json).

Exit code 0 only if every strict 1% gate passes.
Reference being matched: src/05_evaluate_PlaySlot.py:65-139 +
experiments/*/predictors/PlaySlot/experiment_params.json.
"""

import copy
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
REFERENCE_SRC = os.environ.get("PLAYSLOT_REFERENCE_SRC", "/root/reference/src")

# the parity gate is a CPU-f32 exactness check against torch-CPU; force the
# platform BEFORE any backend init (this image's sitecustomize registers the
# remote-TPU backend at interpreter start, so JAX_PLATFORMS alone is too
# late — same pattern as tests/conftest.py)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from playslot_tpu.config import Config

EXPERIMENTS = ["ButtonPress", "BlockPush"]


def build_random_torch_checkpoints(exp_dir, pred_dir, seed=0):
    """Random-weight torch SAVi + PlaySlot predictor at the fixture config."""
    sys.path.insert(0, REFERENCE_SRC)
    import torch
    import CONFIG as ref_CONFIG
    from models.SAVi import SAVi as TorchSAVi
    from lib.setup_model import setup_predictor as torch_setup_predictor

    ref_CONFIG.CONFIG["paths"]["configs_path"] = os.path.join(
        REFERENCE_SRC, "configs")
    torch.manual_seed(seed)

    pcfg = Config.load(pred_dir)
    savi = TorchSAVi(**copy.deepcopy(pcfg["model"]["model_params"]))
    os.makedirs(os.path.join(exp_dir, "models"), exist_ok=True)
    savi_name = "SAVi_production_random.pth"
    torch.save({"model_state_dict": savi.state_dict()},
               os.path.join(exp_dir, "models", savi_name))

    predictor = torch_setup_predictor(copy.deepcopy(dict(pcfg)))
    os.makedirs(os.path.join(pred_dir, "models"), exist_ok=True)
    pred_name = "PlaySlot_production_random.pth"
    torch.save({"model_state_dict": predictor.state_dict()},
               os.path.join(pred_dir, "models", pred_name))
    return savi_name, pred_name


def run_one(exp_name, num_seqs=4, report_path=None):
    import parity_eval

    exp_dir = os.path.join(REPO, "experiments", exp_name)
    pred_dir = os.path.join(exp_dir, "predictors", "PlaySlot")
    savi_name, pred_name = build_random_torch_checkpoints(exp_dir, pred_dir)
    if report_path is None:
        report_path = os.path.join(pred_dir, "results",
                                   "parity_production.json")
    rc = parity_eval.main([
        "-d", exp_dir, "--savi_ckpt", savi_name,
        "--name_pred_exp", "PlaySlot", "--pred_ckpt", pred_name,
        "--num_seqs", str(num_seqs), "--num_seed", "6", "--num_preds", "15",
        "--strict", "--report", report_path])
    # keep the fixture trees weight-free: the .pth files are derivable
    for d, n in ((exp_dir, savi_name), (pred_dir, pred_name)):
        p = os.path.join(d, "models", n)
        if os.path.exists(p):
            os.remove(p)
    with open(report_path) as f:
        rep = json.load(f)
    print(f"[{exp_name}] strict gate: {rep['strict_gate']} "
          f"(worst delta {rep['worst_relative_metric_delta'] * 100:.3f}%)")
    return rc


def main():
    rcs = [run_one(e) for e in EXPERIMENTS]
    return max(rcs)


if __name__ == "__main__":
    raise SystemExit(main())
