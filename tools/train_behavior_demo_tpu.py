#!/usr/bin/env python3
"""
Stage-3 TPU demo: the FULL PlaySlot pipeline on the hermetic goal-reaching
task — SAVi -> PlaySlot (InvDyn + SlotGPT) -> behavior cloning from expert
demos -> CLOSED-LOOP evaluation in GridShapesSim, all trained on the TPU
with the on-device expert-demo generator.

Produces experiments/GridShapesBehavior with eval metrics + success rate.
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

EXP = os.environ.get("PLAYSLOT_BEH_EXP", "experiments/GridShapesBehavior")
EPOCHS = int(os.environ.get("PLAYSLOT_BEH_EPOCHS", "10"))
ITERS = int(os.environ.get("PLAYSLOT_BEH_ITERS", "400"))
NUM_SIMS = int(os.environ.get("PLAYSLOT_BEH_SIMS", "20"))

SAVI_CFG = {
    "num_slots": 3, "slot_dim": 64, "num_iterations_first": 3,
    "num_iterations": 2, "in_channels": 3, "mlp_hidden": 128,
    "mlp_encoder_dim": 64, "initializer": "LearnedRandom",
    "encoder": {"encoder_name": "ConvEncoder",
                "encoder_params": {"num_channels": [32, 32, 32], "kernel_size": 5,
                                   "resolution": [32, 32]}},
    "decoder": {"decoder_name": "ConvDecoder",
                "decoder_params": {"num_channels": [32, 32, 32], "kernel_size": 5,
                                   "resolution": [32, 32], "upsample": 1}},
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
    # stages 1-2 on the RANDOM-exploration distribution (transitions must be
    # stochastic so the latent actions carry information; mirrors the
    # reference's random-exploration pretraining vs expert-demo distillation)
    cfg["dataset"].update({
        "dataset_name": "GridShapesOnDevice_SceneRandom", "num_frames": 8,
        "img_size": 32, "length": ITERS * 16})
    cfg["training"].update({
        "num_epochs": EPOCHS, "batch_size": 16, "train_iters_per_epoch": ITERS,
        "valid_iters_per_epoch": 8, "save_frequency": 2, "lr": 2e-4,
        "warmup_steps": 100, "scheduler_steps": EPOCHS * ITERS,
        "compute_dtype": "bfloat16"})
    cfg.save()

    # stage 1: SAVi on the expert scene
    from playslot_tpu.train.trainer import SAViTrainer
    log("stage 1: SAVi...")
    tr = SAViTrainer(EXP)
    tr.load_data()
    tr.setup_model()
    tr.training_loop()

    from playslot_tpu.train.evaluator import SAViEvaluator
    savi_res = SAViEvaluator(EXP, {"params": tr.state.params},
                             metrics=("psnr",), results_name="savi_eval"
                             ).evaluate(max_batches=2)
    log(f"SAVi: psnr={savi_res['psnr']['mean']:.2f} "
        f"miou={savi_res.get('miou', {}).get('mean', -1):.3f}")

    # stage 2: PlaySlot predictor
    pred_path = os.path.join(EXP, "predictors", "PlaySlot")
    os.makedirs(pred_path, exist_ok=True)
    pcfg = Config.load(EXP)
    pcfg["predictor"] = copy.deepcopy(PRED_CFG)
    pcfg["predictor_loss"] = copy.deepcopy(DEFAULTS["predictor_loss"])
    pcfg["prediction_params"] = {"num_context": 3, "num_preds": 5,
                                 "teacher_force": False, "sample_length": 8,
                                 "input_buffer_size": 8}
    pcfg.save(pred_path)

    from playslot_tpu.train.predictor_trainer import PredictorTrainer
    log("stage 2: PlaySlot predictor...")
    ptr = PredictorTrainer(EXP, name_predictor_experiment="PlaySlot")
    ptr.load_data()
    ptr.load_savi(savi_params=tr.state.params)
    ptr.setup_predictor()
    ptr.training_loop()

    import numpy as np
    usage = np.asarray(
        ptr.state.vq["latent_action"]["quantizer"]["usage_bins"])
    log(f"codebook usage: {np.round(usage, 3).tolist()}")

    # stage 3: behavior cloning from the expert demos
    beh_path = os.path.join(pred_path, "behaviors", "Policy")
    os.makedirs(beh_path, exist_ok=True)
    bcfg = Config.load(pred_path)
    bcfg["behavior_model"] = {
        "model_name": "MarkovBehaviorCloner",
        "model_params": {"emb_dim": 128, "num_layers": 2, "num_heads": 4,
                         "head_dim": 32, "mlp_dim": 256}}
    bcfg["action_decoder"] = {
        "model_name": "MLPDecoder",
        "model_params": {"in_dim": 16, "out_dim": 2, "hidden_dim": [64, 64]}}
    bcfg["behavior_distill_target"] = "mean"
    bcfg["behavior_loss"] = [
        {"type": "latent_action_mse", "weight": 1.0},
        {"type": "action_mse", "weight": 1.0}]
    bcfg.save(beh_path)

    from playslot_tpu.train.behavior_trainer import BehaviorTrainer
    log("stage 3: behavior cloning...")
    btr = BehaviorTrainer(beh_path)
    # behavior stage trains on EXPERT demos (reference expert-policy swap);
    # longer sequences so the policy also observes stop-at-goal behavior
    btr.exp_params["dataset"]["dataset_name"] = "GridShapesOnDevice_ExpertDemos"
    btr.exp_params["dataset"]["num_frames"] = 16
    btr.load_data()
    btr.load_models(savi_params=tr.state.params,
                    predictor_variables={"params": ptr.state.params,
                                         "vq": ptr.state.vq})
    btr.setup_behavior_models()
    btr.training_loop()

    # stage 4: closed-loop evaluation in GridShapesSim
    from playslot_tpu.train.sim_evaluator import SimulationEvaluator
    log("stage 4: closed-loop simulation...")
    ev = SimulationEvaluator(
        beh_path, {"params": tr.state.params},
        {"params": ptr.state.params, "vq": ptr.state.vq},
        btr.state.params["policy"], btr.state.params["decoder"],
        num_sims=NUM_SIMS, max_num_steps=40, sim_name="GridShapes")
    sim_res = ev.evaluate()
    evg = SimulationEvaluator(
        beh_path, {"params": tr.state.params},
        {"params": ptr.state.params, "vq": ptr.state.vq},
        btr.state.params["policy"], btr.state.params["decoder"],
        num_sims=NUM_SIMS, max_num_steps=40, sim_name="GridShapes",
        ground_with_obs=True)
    sim_res_grounded = evg.evaluate()

    summary = {
        "savi_psnr": savi_res["psnr"]["mean"],
        "savi_miou": savi_res.get("miou", {}).get("mean"),
        "success_rate_imagination": sim_res["success_rate"],
        "success_rate_grounded": sim_res_grounded["success_rate"],
        "num_sims": NUM_SIMS,
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(EXP, "DEMO_RESULTS.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log(f"done: {summary}")


if __name__ == "__main__":
    main()
