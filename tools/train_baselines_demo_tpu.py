#!/usr/bin/env python3
"""
Baseline-predictor TPU demo: train OCVPSeq (unconditional, wrapper rollout)
and ActionCondOCVP (GT-action conditioned) on the frozen GridShapesDemo SAVi
and evaluate both — demonstrating every predictor family training on TPU.

Requires experiments/GridShapesDemo (tools/train_demo_tpu.py) to exist.
"""

import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from playslot_tpu.config import Config, DEFAULTS

EXP = "experiments/GridShapesDemo"
EPOCHS = int(os.environ.get("PLAYSLOT_BL_EPOCHS", "8"))
ITERS = int(os.environ.get("PLAYSLOT_BL_ITERS", "400"))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


PREDICTORS = {
    "OCVPSeq": {
        "predictor_name": "OCVPSeq",
        "predictor_params": {"token_dim": 128, "hidden_dim": 256,
                             "num_layers": 2, "n_heads": 4, "residual": True,
                             "pos_enc_dropout": 0.0},
    },
    # GridShapes random-walk actions are discrete per object; the expert
    # scene provides continuous 2-d GT actions for conditioning
    "ActionCondOCVP": {
        "predictor_name": "ActionCondOCVP",
        "predictor_params": {
            "slot_dim": 64, "raw_action_dim": 2, "action_embed_dim": 16,
            "condition_mode": "sum", "autoregressive_dynamics": True,
            "DynamicsModel": {"model_name": "SlotGPTDymamicsModel",
                              "model_params": {"embed_dim": 128, "head_dim": 32,
                                               "num_heads": 4, "mlp_size": 256,
                                               "num_layers": 2,
                                               "context_length": 4,
                                               "pos_enc_dropout": 0.0}}},
    },
}


def main():
    from playslot_tpu.cli.common import resolve_savi_params
    from playslot_tpu.train.predictor_trainer import PredictorTrainer
    from playslot_tpu.train.evaluator import OCVPEvaluator

    savi_vars = resolve_savi_params(EXP, "checkpoint_epoch_final")
    results = {}
    for name, pred_cfg in PREDICTORS.items():
        pred_path = os.path.join(EXP, "predictors", name)
        os.makedirs(pred_path, exist_ok=True)
        cfg = Config.load(EXP)
        cfg["predictor"] = copy.deepcopy(pred_cfg)
        cfg["predictor_loss"] = [{"type": "pred_img_mse", "weight": 1},
                                 {"type": "pred_slot_mse", "weight": 1}]
        cfg["prediction_params"] = {"num_context": 3, "num_preds": 5,
                                    "teacher_force": False, "sample_length": 8,
                                    "input_buffer_size": 8}
        cfg["training"]["num_epochs"] = EPOCHS
        cfg["training"]["train_iters_per_epoch"] = ITERS
        if name == "ActionCondOCVP":
            # continuous GT actions come from the expert scene
            cfg["dataset"]["dataset_name"] = "GridShapesOnDevice_ExpertDemos"
        cfg.save(pred_path)

        log(f"training {name}...")
        tr = PredictorTrainer(EXP, name_predictor_experiment=name)
        tr.load_data()
        tr.load_savi(savi_params=savi_vars["params"])
        tr.setup_predictor()
        t0 = time.time()
        tr.training_loop()
        log(f"{name} trained in {time.time() - t0:.0f}s")

        ev = OCVPEvaluator(pred_path, savi_vars, {"params": tr.state.params},
                           num_seed=3, num_preds=5, batch_size=16,
                           results_name="demo", metrics=("psnr", "ssim"))
        res = ev.evaluate(max_batches=4)
        results[name] = {k: v["mean"] for k, v in res.items()}
        log(f"{name} eval: {results[name]}")

    with open(os.path.join(EXP, "BASELINES_RESULTS.json"), "w") as f:
        json.dump(results, f, indent=2)
    log(f"done: {results}")


if __name__ == "__main__":
    main()
