#!/usr/bin/env python3
"""
A/B the stage-3 optimizer semantics on the committed production-arch study
seeds (TPU).

Round 4's trajectory-parity harness found our BehaviorTrainer deviated from
the reference's stage-3 update rule (reference
src/10_learn_behavior_from_demos.py:80-137,205-217: two Adams, warmup/cosine
wired to the POLICY optimizer only, NO gradient clipping; we trained one
clipped fully-scheduled Adam over the combined tree). The default was fixed
to the reference-exact semantics (train/schedulers.py
build_behavior_optimizer); this tool measures whether that change shifts the
committed round-3 closed-loop results by retraining ONLY the behavior stage
from the committed SAVi + PlaySlotProd predictor checkpoints
(experiments/GridShapesStudy/seed*) under both optimizers — identical data
stream, training seed, and evaluation episodes — and closed-loop evaluating
both arms.

Arms:
  reference_exact — build_behavior_optimizer (round-4 default)
  fused_r3        — behavior_fused_optimizer: true (the pre-round-4 rule the
                    committed study artifacts were trained with)

Writes experiments/GridShapesStudy/OPTAB_RESULTS.json.
Env: PLAYSLOT_AB_SEEDS (default "0 1 2 3 4"), PLAYSLOT_AB_BC_EPOCHS (12),
PLAYSLOT_AB_SIMS (30).

Run from /root/repo with plain `python` (ONE TPU client at a time).
"""

import copy
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np

from playslot_tpu.config import Config
from playslot_tpu.utils.checkpoint import load_checkpoint

EXP_ROOT = os.environ.get("PLAYSLOT_AB_EXP",
                          os.path.join(_REPO, "experiments/GridShapesStudy"))
SEEDS = [int(s) for s in os.environ.get("PLAYSLOT_AB_SEEDS",
                                        "0 1 2 3 4").split()]
BC_EPOCHS = int(os.environ.get("PLAYSLOT_AB_BC_EPOCHS", "12"))
NUM_SIMS = int(os.environ.get("PLAYSLOT_AB_SIMS", "30"))
MAX_STEPS = int(os.environ.get("PLAYSLOT_AB_MAX_STEPS", "60"))
PRED_NAME = os.environ.get("PLAYSLOT_AB_PRED_NAME", "PlaySlotProd")

# study stage-4 constants (tools/behavior_study_tpu.py defaults used by the
# committed production study, PROD_RESULTS_5SEED_GATED.json)
BEH_CFG = {
    "model_name": "MarkovBehaviorCloner",
    "model_params": {"emb_dim": 128, "num_layers": 2, "num_heads": 4,
                     "head_dim": 32, "mlp_dim": 256}}


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def run_seed(seed):
    from playslot_tpu.train.behavior_trainer import BehaviorTrainer
    from playslot_tpu.train.sim_evaluator import SimulationEvaluator

    exp = os.path.join(EXP_ROOT, f"seed{seed}")
    pred_path = os.path.join(exp, "predictors", PRED_NAME)
    savi_ck = load_checkpoint(
        os.path.join(exp, "models", "checkpoint_epoch_final"))
    savi_params = savi_ck["state"]["params"]
    pred_ck = load_checkpoint(
        os.path.join(pred_path, "models", "checkpoint_epoch_final"))
    pred_vars = {"params": pred_ck["state"]["params"],
                 "vq": pred_ck["state"]["vq"]}
    action_dim = Config.load(pred_path)[
        "predictor"]["predictor_params"]["action_dim"]

    out = {"seed": seed}
    for arm, fused in (("reference_exact", False), ("fused_r3", True)):
        beh_path = os.path.join(pred_path, "behaviors", f"PolicyAB_{arm}")
        os.makedirs(beh_path, exist_ok=True)
        bcfg = Config.load(pred_path)
        bcfg["behavior_model"] = copy.deepcopy(BEH_CFG)
        bcfg["action_decoder"] = {
            "model_name": "MLPDecoder",
            "model_params": {"in_dim": action_dim, "out_dim": 2,
                             "hidden_dim": [64, 64]}}
        bcfg["behavior_distill_target"] = "mean"
        bcfg["behavior_loss"] = [
            {"type": "latent_action_mse", "weight": 1.0},
            {"type": "action_mse", "weight": 1.0}]
        if fused:
            bcfg["behavior_fused_optimizer"] = True
        bcfg.save(beh_path)
        log(f"[seed {seed}] arm {arm}: behavior cloning...")
        btr = BehaviorTrainer(beh_path)
        # same runtime overrides as the study's stage 4
        btr.exp_params["dataset"]["dataset_name"] = \
            "GridShapesOnDevice_ExpertDemos"
        btr.exp_params["dataset"]["num_frames"] = 16
        btr.exp_params["dataset"]["length"] = 4096
        btr.exp_params["training"]["num_epochs"] = BC_EPOCHS
        btr.exp_params["training"]["scheduler_steps"] = BC_EPOCHS * 256
        btr.load_data()
        btr.load_models(savi_params=savi_params,
                        predictor_variables=pred_vars)
        btr.setup_behavior_models()
        btr.training_loop()

        common = dict(num_sims=NUM_SIMS, max_num_steps=MAX_STEPS,
                      sim_name="GridShapes")
        ev_g = SimulationEvaluator(
            beh_path, {"params": savi_params}, pred_vars,
            btr.state.params["policy"], btr.state.params["decoder"],
            ground_with_obs=True, **common)
        grounded = float(ev_g.evaluate()["success_rate"])
        ev_i = SimulationEvaluator(
            beh_path, {"params": savi_params}, pred_vars,
            btr.state.params["policy"], btr.state.params["decoder"], **common)
        imagination = float(ev_i.evaluate()["success_rate"])
        out[arm] = {"grounded": grounded, "imagination": imagination}
        log(f"[seed {seed}] arm {arm}: grounded={grounded:.2f} "
            f"imagination={imagination:.2f}")
    return out


def write_report(per_seed, done):
    def agg(arm, key):
        vals = [s[arm][key] for s in per_seed]
        return {"mean": float(np.mean(vals)), "std": float(np.std(vals)),
                "values": vals}

    report = {
        "config": {"seeds": SEEDS, "bc_epochs": BC_EPOCHS,
                   "num_sims": NUM_SIMS, "pred_name": PRED_NAME},
        "seeds_completed": [s["seed"] for s in per_seed],
        "complete": done,
        "per_seed": per_seed,
        "aggregate": {arm: {k: agg(arm, k)
                            for k in ("grounded", "imagination")}
                      for arm in ("reference_exact", "fused_r3")},
    }
    out_path = os.path.join(EXP_ROOT, "OPTAB_RESULTS.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    log(f"wrote {out_path} ({len(per_seed)}/{len(SEEDS)} seeds)")
    return report


def main():
    # resume: keep already-measured seeds from a previous partial run so the
    # committed report accumulates to the full seed list
    per_seed = []
    out_path = os.path.join(EXP_ROOT, "OPTAB_RESULTS.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        # refuse to mix seeds measured under a different config — a resumed
        # report must not claim the current config for seeds run under
        # different BC_EPOCHS/NUM_SIMS/PRED_NAME overrides
        cur_cfg = {"seeds": SEEDS, "bc_epochs": BC_EPOCHS,
                   "num_sims": NUM_SIMS, "pred_name": PRED_NAME}
        prev_cfg = prev.get("config", {})
        comparable = {k: prev_cfg.get(k) for k in ("bc_epochs", "num_sims",
                                                   "pred_name")}
        want = {k: cur_cfg[k] for k in comparable}
        if comparable != want:
            log(f"config mismatch vs previous report ({comparable} != "
                f"{want}); discarding prior seeds")
        else:
            per_seed = [s for s in prev.get("per_seed", [])
                        if s["seed"] in SEEDS]
            if per_seed:
                log(f"resuming: seeds {[s['seed'] for s in per_seed]} "
                    "already done")
    report = (write_report(per_seed, done=(len(per_seed) == len(SEEDS)))
              if per_seed else None)
    done_seeds = {s["seed"] for s in per_seed}
    for seed in SEEDS:
        if seed in done_seeds:
            continue
        per_seed.append(run_seed(seed))
        per_seed.sort(key=lambda s: s["seed"])
        # checkpoint the report after every seed so a partial run still
        # leaves a usable aggregate on disk
        report = write_report(per_seed, done=(len(per_seed) == len(SEEDS)))
    for arm in ("reference_exact", "fused_r3"):
        a = report["aggregate"][arm]
        log(f"{arm}: imagination {a['imagination']['mean']:.2f} "
            f"± {a['imagination']['std']:.2f}, grounded "
            f"{a['grounded']['mean']:.2f} ± {a['grounded']['std']:.2f}")


if __name__ == "__main__":
    main()
