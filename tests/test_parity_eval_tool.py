"""
End-to-end test of tools/parity_eval.py: build a reference-layout experiment
dir with a RANDOM-weight torch SAVi + PlaySlot checkpoint (the snapshot's
pretrained .pth files are stripped upstream), run the side-by-side parity
eval, and require the strict 1% gate to PASS — the converted jax models must
reproduce the torch outputs on identical frames.
"""

import copy
import json
import os
import sys

import numpy as np
import pytest

from playslot_tpu.config import Config, DEFAULTS
from tests.reference_util import import_reference

MODEL_KW = dict(
    num_slots=3, slot_dim=16, num_iterations=1, num_iterations_first=2,
    in_channels=3, mlp_hidden=32, mlp_encoder_dim=16,
    initializer="LearnedRandom",
    encoder={"encoder_name": "ConvEncoder",
             "encoder_params": {"num_channels": [8, 8], "kernel_size": 3,
                                "resolution": [16, 16]}},
    decoder={"decoder_name": "ConvDecoder",
             "decoder_params": {"num_channels": [8, 8], "kernel_size": 3,
                                "resolution": [16, 16], "upsample": 1}},
    transition_module_params={"model_name": "TransformerBlock", "num_heads": 2,
                              "head_dim": 8, "mlp_size": 32},
)

PRED_CFG = {
    "predictor_name": "SlotSingleAction",
    "predictor_params": {
        "num_actions": 4, "action_dim": 8, "slot_dim": 16,
        "condition_mode": "sum", "use_variability": True,
        "autoregressive_dynamics": True,
        "LatentAction": {"model_name": "VQSingleSlotLatentAction",
                         "model_params": {"emb_dim": 16, "num_layers": 1,
                                          "num_heads": 2, "head_dim": 8,
                                          "mlp_dim": 16, "use_ema_vq": True}},
        "DynamicsModel": {"model_name": "SlotGPTDymamicsModel",
                          "model_params": {"embed_dim": 16, "head_dim": 8,
                                           "num_heads": 2, "mlp_size": 16,
                                           "num_layers": 1, "context_length": 3,
                                           "pos_enc_dropout": 0.0}},
    },
}


def test_parity_eval_tool_passes_strict_gate(tmp_path):
    torch = import_reference()
    import CONFIG as ref_CONFIG
    from models.SAVi import SAVi as TorchSAVi
    from lib.setup_model import setup_predictor as torch_setup_predictor

    ref_CONFIG.CONFIG["paths"]["configs_path"] = "/root/reference/src/configs"

    exp = str(tmp_path / "exp")
    pred_dir = os.path.join(exp, "predictors", "PlaySlot")
    os.makedirs(os.path.join(exp, "models"))
    os.makedirs(os.path.join(pred_dir, "models"))

    cfg = Config(exp_path=exp, **copy.deepcopy(DEFAULTS))
    cfg["model"] = {"model_name": "SAVi",
                    "model_params": copy.deepcopy(MODEL_KW)}
    cfg["dataset"].update({"dataset_name": "GridShapes", "num_frames": 5,
                           "img_size": 16, "shape_size": 5})
    cfg.save()
    pcfg = Config.load(exp)
    pcfg["predictor"] = copy.deepcopy(PRED_CFG)
    pcfg.save(pred_dir)

    tm = TorchSAVi(**copy.deepcopy(MODEL_KW))
    torch.save({"model_state_dict": tm.state_dict()},
               os.path.join(exp, "models", "SAVi_rand.pth"))
    tp = torch_setup_predictor(pcfg)
    torch.save({"model_state_dict": tp.state_dict()},
               os.path.join(pred_dir, "models", "PlaySlot_rand.pth"))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import parity_eval

    rc = parity_eval.main([
        "-d", exp, "--savi_ckpt", "SAVi_rand.pth",
        "--name_pred_exp", "PlaySlot", "--pred_ckpt", "PlaySlot_rand.pth",
        "--num_seqs", "2", "--num_seed", "2", "--num_preds", "2", "--strict"])
    assert rc == 0


def test_parity_eval_lpips_gate_wiring(tmp_path, monkeypatch):
    """VERDICT r2 item 8: with PLAYSLOT_LPIPS_WEIGHTS set, parity_eval
    includes LPIPS in the strict gate. Uses the random-weight AlexNet golden
    (tests/test_lpips_parity.py layout) — the real pretrained .npz is
    egress-blocked, but the gate wiring is identical."""
    torch = import_reference()
    from models.SAVi import SAVi as TorchSAVi
    from tests.test_lpips_parity import _random_lpips_weights

    # 32px floor: AlexNet's stride-4 conv + two maxpools collapse 16px
    # inputs to zero-sized maps
    model_kw = copy.deepcopy(MODEL_KW)
    model_kw["encoder"]["encoder_params"]["resolution"] = [32, 32]
    model_kw["decoder"]["decoder_params"]["resolution"] = [32, 32]

    exp = str(tmp_path / "exp")
    os.makedirs(os.path.join(exp, "models"))
    cfg = Config(exp_path=exp, **copy.deepcopy(DEFAULTS))
    cfg["model"] = {"model_name": "SAVi", "model_params": model_kw}
    cfg["dataset"].update({"dataset_name": "GridShapes", "num_frames": 3,
                           "img_size": 32, "shape_size": 7})
    cfg.save()

    tm = TorchSAVi(**copy.deepcopy(model_kw))
    torch.save({"model_state_dict": tm.state_dict()},
               os.path.join(exp, "models", "SAVi_rand.pth"))

    npz = str(tmp_path / "lpips_random.npz")
    np.savez(npz, **_random_lpips_weights(seed=3))
    monkeypatch.setenv("PLAYSLOT_LPIPS_WEIGHTS", npz)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import parity_eval
    report_path = str(tmp_path / "report.json")
    rc = parity_eval.main([
        "-d", exp, "--savi_ckpt", "SAVi_rand.pth", "--num_seqs", "2",
        "--strict", "--report", report_path])
    assert rc == 0
    rep = json.load(open(report_path))
    assert "lpips" in rep["savi"]["torch"] and "lpips" in rep["savi"]["jax"]
    assert rep["strict_gate"] == "PASS"


@pytest.mark.slow
@pytest.mark.parametrize("exp_name", ["ButtonPress", "BlockPush"])
def test_production_shape_parity_strict_gate(exp_name, tmp_path):
    """VERDICT r2 item 2: the strict 1% conversion-parity gate at the SHIPPED
    production configs (ButtonPress: 4 slots/128-d SAVi, 256-d x 4-layer
    predictor, 8 prototypes, action_dim 24; BlockPush: 8 slots, action_dim
    16), seed-6/pred-15 — random-weight torch checkpoints exercise every
    conversion class the 16px test cannot see. Committed reports:
    experiments/<EXP>/predictors/PlaySlot/results/parity_production.json."""
    import_reference()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import run_production_parity

    rc = run_production_parity.run_one(
        exp_name, num_seqs=2, report_path=str(tmp_path / "report.json"))
    assert rc == 0
