"""Train + evaluate the OCVP baselines and ActionCondOCVP end-to-end (tiny)."""

import copy
import json
import os

import numpy as np
import pytest

from playslot_tpu.config import Config, DEFAULTS
from tests.test_training import TINY_SAVI


def _base_cfg(tmp_path, dataset_extra=None):
    cfg = Config(exp_path=str(tmp_path), **copy.deepcopy(DEFAULTS))
    cfg["model"] = {"model_name": "SAVi", "model_params": copy.deepcopy(TINY_SAVI)}
    cfg["dataset"].update({
        "dataset_name": "GridShapes_ExpertDemos", "num_frames": 4,
        "img_size": 16, "length": 8, **(dataset_extra or {})})
    cfg["training"].update({
        "num_epochs": 1, "batch_size": 2, "train_iters_per_epoch": 2,
        "valid_iters_per_epoch": 1, "save_frequency": 1, "warmup_steps": 2,
        "scheduler_steps": 10})
    cfg["prediction_params"] = {"num_context": 2, "num_preds": 2,
                                "teacher_force": False, "sample_length": 4,
                                "input_buffer_size": 4}
    cfg["predictor_loss"] = [{"type": "pred_img_mse", "weight": 1},
                             {"type": "pred_slot_mse", "weight": 1}]
    return cfg


def _savi_params(cfg):
    import jax
    import jax.numpy as jnp
    from playslot_tpu.models.factory import setup_model
    model = setup_model(cfg["model"])
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 2, 16, 16, 3), jnp.float32)
    return model.init({"params": key, "slots": key}, x)["params"]


@pytest.mark.parametrize("pred_cfg", [
    {"predictor_name": "SlotLatentPredictor",
     "predictor_params": {
         "num_actions": 4, "action_dim": 8, "slot_dim": 16,
         "condition_mode": "sum", "use_variability": True,
         "autoregressive_dynamics": True,
         "LatentAction": {"model_name": "VQSimpleMLPSlotLatentAction",
                          "model_params": {"emb_dim": 16, "hidden_dim": 16,
                                           "use_ema_vq": True}},
         "DynamicsModel": {"model_name": "SlotGPTDymamicsModel",
                           "model_params": {"embed_dim": 16, "head_dim": 8,
                                            "num_heads": 2, "mlp_size": 16,
                                            "num_layers": 1,
                                            "context_length": 3,
                                            "pos_enc_dropout": 0.0}}}},
    {"predictor_name": "VanillaTransformer",
     "predictor_params": {"token_dim": 16, "hidden_dim": 16, "num_layers": 1,
                          "n_heads": 2, "residual": True}},
    {"predictor_name": "OCVPSeq",
     "predictor_params": {"token_dim": 16, "hidden_dim": 16, "num_layers": 1,
                          "n_heads": 2, "residual": True}},
    {"predictor_name": "ActionCondOCVP",
     "predictor_params": {"slot_dim": 16, "raw_action_dim": 2,
                          "action_embed_dim": 8, "condition_mode": "sum",
                          "autoregressive_dynamics": True,
                          "DynamicsModel": {
                              "model_name": "SlotGPTDymamicsModel",
                              "model_params": {"embed_dim": 16, "head_dim": 8,
                                               "num_heads": 2, "mlp_size": 16,
                                               "num_layers": 1,
                                               "context_length": 3,
                                               "pos_enc_dropout": 0.0}}}},
])
def test_train_and_eval_ocvp_family(tmp_path, pred_cfg):
    from playslot_tpu.train.predictor_trainer import PredictorTrainer
    from playslot_tpu.train.evaluator import OCVPEvaluator

    cfg = _base_cfg(tmp_path)
    cfg["predictor"] = pred_cfg
    cfg.save()

    savi_params = _savi_params(cfg)
    tr = PredictorTrainer(str(tmp_path))
    tr.load_data()
    tr.load_savi(savi_params=savi_params)
    tr.setup_predictor()
    tr.training_loop()

    losses = json.load(open(tmp_path / "losses.json"))
    assert np.isfinite(losses["0"]["train"]["_total"])

    if pred_cfg["predictor_name"] in ("SlotLatentPredictor", "SlotSingleAction"):
        from playslot_tpu.train.evaluator import PlaySlotEvaluator
        variables = {"params": tr.state.params}
        if tr.state.vq:
            variables["vq"] = tr.state.vq
        ev = PlaySlotEvaluator(str(tmp_path), {"params": savi_params}, variables,
                               num_seed=2, num_preds=2, post_only=True,
                               batch_size=2, metrics=("psnr",))
        res = ev.evaluate(max_batches=1)
        assert np.isfinite(res["Post"]["psnr"]["mean"])
    else:
        ev = OCVPEvaluator(str(tmp_path), {"params": savi_params},
                           {"params": tr.state.params}, num_seed=2, num_preds=2,
                           batch_size=2, metrics=("psnr",))
        res = ev.evaluate(max_batches=1)
        assert np.isfinite(res["psnr"]["mean"])
