"""
Production fixture trees (tools/make_production_fixtures.py): every shipped
reference experiment chain is committed as an experiment_params.json tree
under experiments/, and every CLI's model-construction path works against
it — so the trees are runnable the moment data or checkpoints appear
(reference fixtures: /root/reference/experiments/*/experiment_params.json).
"""

import os

import jax
import jax.numpy as jnp
import pytest

from playslot_tpu.config import Config
from playslot_tpu.models.factory import (
    setup_action_decoder, setup_behavior_model, setup_model, setup_predictor,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP = os.path.join(REPO, "experiments")

SAVI_TREES = ["BlockPush", "ButtonPress", "Sketchy", "GridShapes2Objs",
              "GridShapes5Objs"]
PRED_TREES = [
    "BlockPush/predictors/ActCondOCVP",
    "BlockPush/predictors/OCVP",
    "BlockPush/predictors/PlaySlot",
    "ButtonPress/predictors/ActCondOCVP",
    "ButtonPress/predictors/PlaySlot",
    "GridShapes2Objs/predictors/PlaySlot",
    "GridShapes5Objs/predictors/PlaySlot",
    "Sketchy/predictors/PlaySlot",
]
BEH_TREES = [
    "BlockPush/predictors/PlaySlot/behaviors/Policy_AllDemos",
    "ButtonPress/predictors/PlaySlot/behaviors/Policy_AllDemos",
]
ORACLE_TREES = ["ButtonPress/oracle/Oracle"]


@pytest.mark.parametrize("tree", SAVI_TREES)
def test_savi_fixture_constructs_and_initializes(tree):
    cfg = Config.load(os.path.join(EXP, tree))
    model = setup_model(cfg["model"])
    mp = cfg["model"]["model_params"]
    img = mp["encoder"]["encoder_params"]["resolution"]
    key = jax.random.PRNGKey(0)
    videos = jnp.zeros((1, 2, img[0], img[1], 3), jnp.float32)
    variables = jax.eval_shape(
        lambda v: model.init({"params": key, "slots": key}, v), videos)
    assert "params" in variables


@pytest.mark.parametrize("tree", PRED_TREES)
def test_predictor_fixture_constructs(tree):
    cfg = Config.load(os.path.join(EXP, tree))
    predictor = setup_predictor(cfg["predictor"],
                                savi_params=cfg["model"]["model_params"])
    assert predictor is not None
    pp = cfg["prediction_params"]
    assert pp["num_context"] >= 1 and pp["num_preds"] >= 1


@pytest.mark.parametrize("tree", BEH_TREES)
def test_behavior_fixture_constructs(tree):
    cfg = Config.load(os.path.join(EXP, tree))
    mp = cfg["model"]["model_params"]
    action_dim = cfg["predictor"]["predictor_params"]["action_dim"]
    policy = setup_behavior_model(cfg["behavior_model"],
                                  slot_dim=mp["slot_dim"],
                                  action_dim=action_dim)
    decoder = setup_action_decoder(cfg["action_decoder"])
    key = jax.random.PRNGKey(0)
    slots = jnp.zeros((1, 2, mp["num_slots"], mp["slot_dim"]), jnp.float32)
    pv = jax.eval_shape(lambda s: policy.init(key, s), slots)
    assert "params" in pv
    lat = jnp.zeros((1, 2, cfg["action_decoder"]["model_params"]["in_dim"]),
                    jnp.float32)
    dv = jax.eval_shape(lambda z: decoder.init(key, z), lat)
    assert "params" in dv


@pytest.mark.parametrize("tree", ORACLE_TREES)
def test_oracle_fixture_constructs(tree):
    cfg = Config.load(os.path.join(EXP, tree))
    mp = cfg["model"]["model_params"]
    policy = setup_behavior_model(cfg["behavior_model"],
                                  slot_dim=mp["slot_dim"], action_dim=4)
    assert policy is not None
    # the reference's oracle tree records its loss under "loss" (as
    # latent_action_mse — an upstream labelling quirk); OracleTrainer
    # defaults behavior_loss to action_mse when absent. Either way every
    # configured loss must resolve in our registry.
    from playslot_tpu.train.losses import LOSS_DICT
    loss_cfg = cfg.get("behavior_loss") or cfg.get("loss")
    assert loss_cfg and all(item["type"] in LOSS_DICT for item in loss_cfg)
