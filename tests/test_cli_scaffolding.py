"""The 01_create_* CLI scaffolding end-to-end (experiment tree layout)."""

import json
import os

import pytest

from playslot_tpu import config as cfg_mod


@pytest.fixture
def exp_root(tmp_path, monkeypatch):
    monkeypatch.setitem(cfg_mod.CONFIG["paths"], "experiments_path",
                        str(tmp_path / "experiments"))
    return tmp_path / "experiments"


def test_create_experiment_tree(exp_root):
    from playslot_tpu.cli.create_experiment import (
        create_experiment, create_predictor_experiment,
        create_policy_experiment, create_oracle_experiment)

    exp_path = create_experiment([
        "-d", "Suite", "--name", "run1", "--dataset_name", "GridShapes"])
    assert os.path.isfile(os.path.join(exp_path, "experiment_params.json"))
    for sub in ("models", "plots", "results", "tboard_logs"):
        assert os.path.isdir(os.path.join(exp_path, sub))
    params = json.load(open(os.path.join(exp_path, "experiment_params.json")))
    assert params["model"]["model_name"] == "SAVi"
    assert params["model"]["model_params"]["num_slots"] == 8
    assert params["dataset"]["dataset_name"] == "GridShapes"

    # on-device generated datasets get the scene version stamped at creation
    # (provenance across scene generations — data/gridshapes_jax.py changelog)
    from playslot_tpu.data.gridshapes_jax import SCENE_VERSION
    dev_path = create_experiment([
        "-d", "Suite", "--name", "run_dev",
        "--dataset_name", "GridShapesOnDevice_SceneRandom"])
    dparams = json.load(open(os.path.join(dev_path, "experiment_params.json")))
    assert dparams["dataset"]["scene_version"] == SCENE_VERSION

    pred_path = create_predictor_experiment([
        "-d", exp_path, "--name", "PlaySlot",
        "--predictor_name", "SlotSingleAction"])
    assert pred_path == os.path.join(exp_path, "predictors", "PlaySlot")
    pparams = json.load(open(os.path.join(pred_path, "experiment_params.json")))
    assert pparams["predictor"]["predictor_name"] == "SlotSingleAction"
    assert any(l["type"] == "VQLoss" for l in pparams["predictor_loss"])

    beh_path = create_policy_experiment([
        "-d", pred_path, "--name", "Policy"])
    bparams = json.load(open(os.path.join(beh_path, "experiment_params.json")))
    assert bparams["behavior_model"]["model_name"] == "MarkovBehaviorCloner"
    assert bparams["action_decoder"]["model_name"] == "MLPDecoder"

    orc_path = create_oracle_experiment([
        "-d", exp_path, "--name", "Oracle"])
    oparams = json.load(open(os.path.join(orc_path, "experiment_params.json")))
    assert oparams["behavior_loss"] == [{"type": "action_mse", "weight": 1.0}]


def test_available_configs_cover_reference_registry():
    """Every config template family the reference ships is present."""
    from playslot_tpu.config import get_available_configs
    assert "SAVi" in get_available_configs("models")
    preds = get_available_configs("predictors")
    for name in ("SlotSingleAction", "SlotLatentPredictor", "ActionCondOCVP",
                 "OCVPSeq", "OCVPPar", "VanillaTransformer"):
        assert name in preds, name
    for name in ("GridShapes", "BlockPush", "BlockPush_ExpertDemos",
                 "ButtonPress", "ButtonPress_ExpertDemos", "Sketchy"):
        assert name in get_available_configs("datasets"), name
    assert "MarkovBehaviorCloner" in get_available_configs("behavior_models")
    assert "MLPDecoder" in get_available_configs("action_decoders")
