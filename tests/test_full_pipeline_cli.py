"""
Full-pipeline CLI test: drives every numbered entry script end-to-end on a
tiny GridShapes config — the hermetic equivalent of the reference's
scripts/*.sh regression suite (SURVEY.md §4).

create experiment -> train SAVi -> evaluate SAVi -> create predictor exp ->
train PlaySlot -> evaluate PlaySlot (post-only + stochastic) -> figures ->
create behavior exp -> learn behavior -> closed-loop sim eval.
"""

import copy
import json
import os

import numpy as np
import pytest

from playslot_tpu.config import Config, DEFAULTS
from tests.test_training import TINY_PRED, TINY_SAVI


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    exp = str(tmp_path / "exp")
    os.makedirs(exp)

    # --- experiment scaffolding (01_*)
    cfg = Config(exp_path=exp, **copy.deepcopy(DEFAULTS))
    cfg["model"] = {"model_name": "SAVi", "model_params": copy.deepcopy(TINY_SAVI)}
    cfg["dataset"].update({
        "dataset_name": "GridShapes", "num_frames": 5, "num_balls": 2,
        "img_size": 16, "shape_size": 5, "length": 8})
    cfg["training"].update({
        "num_epochs": 1, "batch_size": 2, "train_iters_per_epoch": 2,
        "valid_iters_per_epoch": 1, "save_frequency": 1, "warmup_steps": 2,
        "scheduler_steps": 10})
    cfg.save()

    # --- 02: train SAVi
    from playslot_tpu.cli.train_savi import main as train_savi
    train_savi(["-d", exp])
    assert os.path.isdir(os.path.join(exp, "models", "checkpoint_epoch_final"))

    # --- 03: evaluate SAVi (psnr/ssim + mIoU from GridShapes GT masks)
    from playslot_tpu.cli.evaluate_savi import main as eval_savi
    results = eval_savi(["-d", exp, "--checkpoint", "checkpoint_epoch_final",
                         "--max_batches", "1"])
    assert "psnr" in results and np.isfinite(results["psnr"]["mean"])
    assert "miou" in results

    # --- 01b: predictor experiment
    from playslot_tpu.cli.create_experiment import create_predictor_experiment
    pred_cfg = Config.load(exp)
    pred_cfg["predictor"] = copy.deepcopy(TINY_PRED)
    pred_cfg["predictor_loss"] = copy.deepcopy(DEFAULTS["predictor_loss"])
    pred_cfg["prediction_params"] = {"num_context": 2, "num_preds": 2,
                                     "teacher_force": False, "sample_length": 4,
                                     "input_buffer_size": 4}
    pred_path = os.path.join(exp, "predictors", "PlaySlot")
    os.makedirs(pred_path)
    pred_cfg.save(pred_path)

    # --- 04: train PlaySlot
    from playslot_tpu.cli.train_playslot import main as train_playslot
    train_playslot(["-d", exp, "--name_pred_exp", "PlaySlot",
                    "--savi_ckpt", "checkpoint_epoch_final"])
    assert os.path.isdir(os.path.join(pred_path, "models",
                                      "checkpoint_epoch_final"))

    # --- 05: evaluate PlaySlot (post-only, canonical eval shape)
    from playslot_tpu.cli.evaluate_playslot import main as eval_playslot
    res = eval_playslot([
        "-d", exp, "--name_pred_exp", "PlaySlot",
        "--savi_ckpt", "checkpoint_epoch_final",
        "--checkpoint", "checkpoint_epoch_final",
        "--num_seed", "2", "--num_preds", "2", "--post_only",
        "--max_batches", "1"])
    assert "Post" in res and np.isfinite(res["Post"]["psnr"]["mean"])

    # stochastic best-of-N prior path
    res2 = eval_playslot([
        "-d", exp, "--name_pred_exp", "PlaySlot",
        "--savi_ckpt", "checkpoint_epoch_final",
        "--checkpoint", "checkpoint_epoch_final",
        "--num_seed", "2", "--num_preds", "2", "--num_samples", "3",
        "--max_batches", "1"])
    assert "Prior" in res2

    # --- 06: figures
    from playslot_tpu.cli.generate_figs import figs_pred, figs_savi
    figs_savi(["-d", exp, "--checkpoint", "checkpoint_epoch_final",
               "--num_seqs", "1"])
    figs_pred(["-d", exp, "--name_pred_exp", "PlaySlot",
               "--savi_ckpt", "checkpoint_epoch_final",
               "--checkpoint", "checkpoint_epoch_final",
               "--num_seqs", "1", "--num_seed", "2", "--num_preds", "2"])
    plots = os.path.join(exp, "plots")
    assert any("figs" in d for d in os.listdir(plots))
    # the reference's full per-sequence artifact set
    # (src/06_generate_figs_pred.py:153-232)
    pred_plots = os.path.join(exp, "predictors", "PlaySlot", "plots",
                              "figs_pred")
    seq_dir = os.path.join(pred_plots, sorted(os.listdir(pred_plots))[0])
    produced = set(os.listdir(seq_dir))
    assert {"aligned_slots.png", "qual_eval_rgb.png", "gt_GIF_frames.gif",
            "pred_GIF_frames.gif", "masks_GIF_masks.gif", "overlay_GIF.gif",
            "obj_1.gif", "preds.png", "decomp.png"} <= produced

    # --- 10: behavior learning (GridShapes actions as pseudo-demos)
    beh_path = os.path.join(pred_path, "behaviors", "Policy")
    os.makedirs(beh_path)
    beh_cfg = Config.load(pred_path)
    beh_cfg["behavior_model"] = {
        "model_name": "MarkovBehaviorCloner",
        "model_params": {"emb_dim": 16, "num_layers": 1, "num_heads": 2,
                         "head_dim": 8, "mlp_dim": 16}}
    beh_cfg["action_decoder"] = {
        "model_name": "MLPDecoder",
        "model_params": {"in_dim": 8, "out_dim": 2, "hidden_dim": [8]}}
    beh_cfg["behavior_loss"] = [
        {"type": "latent_action_mse", "weight": 1.0},
        {"type": "action_mse", "weight": 0.01}]
    beh_cfg.save(beh_path)

    # GridShapes actions are (T, S) discrete; behavior stage needs (T, A)
    # continuous — use the per-object velocities of object 0 as GT actions.
    from playslot_tpu.train.behavior_trainer import BehaviorTrainer
    from playslot_tpu.cli.common import resolve_predictor_variables, resolve_savi_params

    savi_vars = resolve_savi_params(exp, "checkpoint_epoch_final")
    pred_vars = resolve_predictor_variables(pred_path, "checkpoint_epoch_final",
                                            predictor_name="SlotSingleAction")

    class VelActionsTrainer(BehaviorTrainer):
        def _unpack(self, batch):
            videos, _, metas = batch
            import jax.numpy as jnp
            actions = metas["velocities"][:, :, 0, :]  # (B, T, 2)
            return jnp.asarray(videos), jnp.asarray(actions, jnp.float32)

    tr = VelActionsTrainer(beh_path)
    tr.load_data()
    tr.load_models(savi_params=savi_vars["params"],
                   predictor_variables=pred_vars)
    tr.setup_behavior_models()
    tr.training_loop()
    assert os.path.isdir(os.path.join(beh_path, "models",
                                      "checkpoint_epoch_final"))

    # --- 11: closed-loop sim eval on the hermetic GridShapes simulator
    from playslot_tpu.cli.behavior import evaluate_behavior
    res = evaluate_behavior([
        "-d", exp, "--name_pred_exp", "PlaySlot", "--name_beh_exp", "Policy",
        "--savi_ckpt", "checkpoint_epoch_final",
        "--pred_ckpt", "checkpoint_epoch_final",
        "--behavior_ckpt", "checkpoint_epoch_final",
        "--num_sims", "2", "--max_num_steps", "3", "--sim_name", "GridShapes"])
    assert "success_rate" in res
