#!/usr/bin/env python3
"""
End-to-end TPU training demo: SAVi -> PlaySlot predictor on the on-device
GridShapes generator, with quantitative eval after each stage. Produces a
committed experiment tree (experiments/GridShapesDemo) as living proof that
the full framework trains on real TPU hardware.

Run from the repo root with no arguments (one TPU process at a time!).
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

EXP = os.environ.get("PLAYSLOT_DEMO_EXP", "experiments/GridShapesDemo")
SAVI_EPOCHS = int(os.environ.get("PLAYSLOT_DEMO_SAVI_EPOCHS", "4"))
PRED_EPOCHS = int(os.environ.get("PLAYSLOT_DEMO_PRED_EPOCHS", "4"))
ITERS = int(os.environ.get("PLAYSLOT_DEMO_ITERS", "250"))

SAVI_CFG = {
    "num_slots": 5, "slot_dim": 64, "num_iterations_first": 2,
    "num_iterations": 1, "in_channels": 3, "mlp_hidden": 128,
    "mlp_encoder_dim": 64, "initializer": "LearnedRandom",
    "encoder": {"encoder_name": "ConvEncoder",
                "encoder_params": {"num_channels": [32, 32, 32], "kernel_size": 5,
                                   "resolution": [64, 64]}},
    "decoder": {"decoder_name": "ConvDecoder",
                "decoder_params": {"num_channels": [32, 32, 32], "kernel_size": 5,
                                   "resolution": [64, 64], "upsample": 1}},
    "transition_module_params": {"model_name": "TransformerBlock",
                                 "num_heads": 4, "head_dim": 16, "mlp_size": 128},
}

PRED_CFG = {
    "predictor_name": "SlotSingleAction",
    "predictor_params": {
        "num_actions": 5, "action_dim": 16, "slot_dim": 64,
        "condition_mode": "sum", "use_variability": True,
        "autoregressive_dynamics": True,
        "LatentAction": {"model_name": "VQSingleSlotLatentAction",
                         "model_params": {"emb_dim": 128, "num_layers": 2,
                                          "num_heads": 4, "head_dim": 32,
                                          "mlp_dim": 256, "use_ema_vq": True}},
        "DynamicsModel": {"model_name": "SlotGPTDymamicsModel",
                          "model_params": {"embed_dim": 128, "head_dim": 32,
                                           "num_heads": 4, "mlp_size": 256,
                                           "num_layers": 2, "context_length": 4,
                                           "pos_enc_dropout": 0.0}},
    },
}


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    os.makedirs(EXP, exist_ok=True)
    cfg = Config(exp_path=EXP, **copy.deepcopy(DEFAULTS))
    cfg["model"] = {"model_name": "SAVi", "model_params": copy.deepcopy(SAVI_CFG)}
    cfg["dataset"].update({
        "dataset_name": "GridShapesOnDevice", "num_frames": 8, "num_balls": 2,
        "img_size": 64, "shape_size": 15, "length": ITERS * 16})
    cfg["training"].update({
        "num_epochs": SAVI_EPOCHS, "batch_size": 16,
        "train_iters_per_epoch": ITERS, "valid_iters_per_epoch": 8,
        "save_frequency": 2, "lr": 2e-4, "warmup_steps": 100,
        "scheduler_steps": SAVI_EPOCHS * ITERS, "compute_dtype": "bfloat16",
        "gradient_clipping": True, "clipping_max_value": 0.05})
    cfg.save()

    # -------------------------------------------------------- stage 1: SAVi
    from playslot_tpu.train.trainer import SAViTrainer
    log("training SAVi...")
    tr = SAViTrainer(EXP)
    tr.load_data()
    tr.setup_model()
    t0 = time.time()
    tr.training_loop()
    log(f"SAVi trained in {time.time() - t0:.0f}s")

    from playslot_tpu.train.evaluator import SAViEvaluator
    ev = SAViEvaluator(EXP, {"params": tr.state.params},
                       metrics=("psnr", "ssim"), results_name="savi_eval_demo")
    savi_results = ev.evaluate(max_batches=4)
    log(f"SAVi eval: { {k: round(v['mean'], 3) for k, v in savi_results.items()} }")

    # ---------------------------------------------- stage 2: PlaySlot pred
    pred_path = os.path.join(EXP, "predictors", "PlaySlot")
    os.makedirs(pred_path, exist_ok=True)
    pcfg = Config.load(EXP)
    pcfg["predictor"] = copy.deepcopy(PRED_CFG)
    pcfg["predictor_loss"] = copy.deepcopy(DEFAULTS["predictor_loss"])
    pcfg["prediction_params"] = {"num_context": 3, "num_preds": 5,
                                 "teacher_force": False, "sample_length": 8,
                                 "input_buffer_size": 8}
    pcfg["training"]["num_epochs"] = PRED_EPOCHS
    pcfg.save(pred_path)

    from playslot_tpu.train.predictor_trainer import PredictorTrainer
    log("training PlaySlot predictor...")
    ptr = PredictorTrainer(EXP, name_predictor_experiment="PlaySlot")
    ptr.load_data()
    ptr.load_savi(savi_params=tr.state.params)
    ptr.setup_predictor()
    t0 = time.time()
    ptr.training_loop()
    log(f"predictor trained in {time.time() - t0:.0f}s")

    from playslot_tpu.train.evaluator import PlaySlotEvaluator
    pev = PlaySlotEvaluator(
        pred_path, {"params": tr.state.params},
        {"params": ptr.state.params, "vq": ptr.state.vq},
        num_seed=3, num_preds=5, post_only=True, batch_size=16,
        results_name="demo", metrics=("psnr", "ssim"))
    pred_results = pev.evaluate(max_batches=4)
    log(f"PlaySlot eval: {json.dumps(pred_results)[:200]}")

    summary = {
        "savi": {k: v["mean"] for k, v in savi_results.items()},
        "playslot_post": {k: v["mean"]
                          for k, v in pred_results.get("Post", {}).items()},
        "device": str(jax.devices()[0]),
        "savi_epochs": SAVI_EPOCHS, "pred_epochs": PRED_EPOCHS,
        "iters_per_epoch": ITERS,
    }
    with open(os.path.join(EXP, "DEMO_RESULTS.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log(f"done: {summary}")


if __name__ == "__main__":
    main()
