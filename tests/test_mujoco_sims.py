"""
MuJoCo simulator wrappers without MuJoCo (VERDICT r1 item 6).

metaworld/gym are absent in this image, so ButtonPressSim/BlockPushSim are
exercised line-for-line with stub envs injected into sys.modules: the CAM
config application, num_init_random_actions warmup, ACTION_REPEAT stepping,
success-flag extraction, and render-resize-normalize. The full closed-loop
SimulationEvaluator (train/sim_evaluator.py) is then driven through the real
ButtonPressSim class. Reference: src/data/ButtonPress_Sim.py:61-92,
src/data/BlockPush_Sim.py:17-79, src/base/baseSimulation.py:41-85.
"""

import copy
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from playslot_tpu.config import Config, DEFAULTS
from tests.test_training import TINY_PRED, TINY_SAVI


class _FakeActionSpace:
    def __init__(self, dim=4, seed=0):
        self._rng = np.random.RandomState(seed)
        self.dim = dim

    def sample(self):
        return self._rng.uniform(-1, 1, self.dim).astype(np.float32)


class FakeMetaWorldEnv:
    """Mimics a metaworld goal-observable env: gymnasium 5-tuple step() with
    info['success'], rgb_array render, mujoco_renderer attribute."""

    def __init__(self, seed=None, render_mode=None, success_at=10 ** 9):
        self.seed_val = seed
        self.render_mode = render_mode
        self.action_space = _FakeActionSpace()
        self.mujoco_renderer = types.SimpleNamespace()
        self.step_count = 0
        self.reset_count = 0
        self.success_at = success_at
        self.actions_seen = []

    def reset(self):
        self.step_count = 0
        self.reset_count += 1
        return np.zeros(39, np.float32), {}

    def step(self, action):
        self.step_count += 1
        self.actions_seen.append(np.asarray(action))
        info = {"success": 1.0 if self.step_count >= self.success_at else 0.0}
        return np.zeros(39, np.float32), 0.0, False, False, info

    def render(self):
        img = np.zeros((48, 48, 3), np.uint8)
        img[:, :, 0] = min(self.step_count * 5, 255)
        return img


class FakeGymEnv:
    """Mimics the multi-object-fetch env: old-gym 4-tuple step(), render(mode),
    success() method."""

    def __init__(self, success_at=10 ** 9):
        self.step_count = 0
        self.seeded_with = None
        self.success_at = success_at

    def seed(self, s):
        self.seeded_with = s

    def reset(self):
        self.step_count = 0
        return np.zeros(10, np.float32)

    def step(self, action):
        self.step_count += 1
        return np.zeros(10, np.float32), 0.0, False, {}

    def success(self):
        return self.step_count >= self.success_at

    def render(self, mode="rgb_array"):
        assert mode == "rgb_array"
        return np.full((48, 48, 3), 128, np.uint8)


@pytest.fixture
def fake_metaworld(monkeypatch):
    made = []

    def env_cls(seed=None, render_mode=None):
        env = FakeMetaWorldEnv(seed=seed, render_mode=render_mode, success_at=13)
        made.append(env)
        return env

    mw = types.ModuleType("metaworld")
    mw_envs = types.ModuleType("metaworld.envs")
    mw_envs.ALL_V2_ENVIRONMENTS_GOAL_OBSERVABLE = {
        "button-press-v2-goal-observable": env_cls}
    mw.envs = mw_envs
    monkeypatch.setitem(sys.modules, "metaworld", mw)
    monkeypatch.setitem(sys.modules, "metaworld.envs", mw_envs)
    return made


@pytest.fixture
def fake_gym(monkeypatch):
    made = []

    def make(name):
        assert name == "PushOdd_3Distractors_Dense-v1"
        env = FakeGymEnv(success_at=3)
        made.append(env)
        return env

    gym = types.ModuleType("gym")
    gym.make = make
    monkeypatch.setitem(sys.modules, "gym", gym)
    return made


def test_button_press_sim_with_stub_env(fake_metaworld):
    from playslot_tpu.data.simulation import ButtonPressSim

    sim = ButtonPressSim(img_size=(16, 16), seed=7)
    env = fake_metaworld[0]
    assert env.seed_val == 7 and env.render_mode == "rgb_array"
    # CAM_CONFIG applied onto the renderer (ButtonPress_Sim.py:16-21)
    assert env.mujoco_renderer.default_cam_elevation == -25
    assert env.mujoco_renderer.default_cam_azimuth == 145

    img = sim.init_seq()
    # 10 random warmup actions (ButtonPress_Sim.py:61-71)
    assert env.reset_count == 1 and env.step_count == 10
    assert img.shape == (16, 16, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0

    # ACTION_REPEAT=5 env steps per update (ButtonPress_Sim.py:15,81-92)
    img, done = sim.update(np.zeros(4, np.float32))
    assert env.step_count == 15 and done is True  # success_at=13 < 15
    assert sim.success() is True
    assert len(env.actions_seen) == 15

    # a fresh episode resets the success flag
    env.success_at = 10 ** 9
    sim.init_seq()
    _, done = sim.update(np.zeros(4, np.float32))
    assert done is False and sim.success() is False


def test_block_push_sim_with_stub_env(fake_gym):
    from playslot_tpu.data.simulation import BlockPushSim

    sim = BlockPushSim(img_size=(16, 16), seed=3)
    env = fake_gym[0]
    assert env.seeded_with == 3

    img = sim.init_seq()
    assert img.shape == (16, 16, 3)
    assert np.allclose(img, 128 / 255.0, atol=1e-3)

    # ACTION_REPEAT=2 (BlockPush_Sim.py:14); success_at=3 -> not yet
    _, done = sim.update(np.zeros(4, np.float32))
    assert env.step_count == 2 and done is False
    _, done = sim.update(np.zeros(4, np.float32))
    assert env.step_count == 4 and done is True and sim.success() is True


def test_sim_evaluator_through_button_press(tmp_path, fake_metaworld):
    """Closed-loop SimulationEvaluator driven through the real ButtonPressSim
    (policy -> latent -> proto+variability -> action decoder -> sim.update,
    reference 11_evaluate_behavior_on_simulation.py:118-198)."""
    from playslot_tpu.models.factory import (
        setup_action_decoder, setup_behavior_model, setup_model,
        setup_predictor)
    from playslot_tpu.train.sim_evaluator import SimulationEvaluator

    exp = str(tmp_path)
    cfg = Config(exp_path=exp, **copy.deepcopy(DEFAULTS))
    cfg["model"] = {"model_name": "SAVi", "model_params": copy.deepcopy(TINY_SAVI)}
    cfg["predictor"] = copy.deepcopy(TINY_PRED)
    cfg["dataset"].update({"dataset_name": "ButtonPress", "img_size": 16})
    cfg["behavior_model"] = {
        "model_name": "MarkovBehaviorCloner",
        "model_params": {"emb_dim": 16, "num_layers": 1, "num_heads": 2,
                         "head_dim": 8, "mlp_dim": 16}}
    cfg["action_decoder"] = {
        "model_name": "MLPDecoder",
        "model_params": {"in_dim": 8, "out_dim": 4, "hidden_dim": [8]}}
    cfg.save()

    key = jax.random.PRNGKey(0)
    savi = setup_model(cfg["model"])
    savi_vars = jax.jit(lambda v: savi.init({"params": key, "slots": key}, v))(
        jnp.zeros((1, 2, 16, 16, 3)))
    predictor = setup_predictor(cfg["predictor"])
    pred_vars = jax.jit(lambda s: predictor.init(
        {"params": key, "action": key}, s, num_seed=2, num_preds=2))(
        jnp.zeros((1, 4, 3, 16)))
    policy = setup_behavior_model(cfg["behavior_model"], slot_dim=16,
                                  action_dim=8)
    policy_params = jax.jit(lambda s: policy.init(key, s))(
        jnp.zeros((1, 1, 3, 16)))["params"]
    decoder = setup_action_decoder(cfg["action_decoder"])
    decoder_params = jax.jit(lambda z: decoder.init(key, z))(
        jnp.zeros((1, 8)))["params"]

    ev = SimulationEvaluator(exp, savi_vars, pred_vars, policy_params,
                             decoder_params, num_sims=2, max_num_steps=3,
                             seed=100)
    res = ev.evaluate()
    assert res["num_sims"] == 2 and len(res["episodes"]) == 2
    assert 0.0 <= res["success_rate"] <= 1.0
    # both episodes ran the real ButtonPressSim: 10 warmup + 5*steps env steps
    assert len(fake_metaworld) == 2
    for env, epi in zip(fake_metaworld, res["episodes"]):
        assert env.step_count == 10 + 5 * epi["steps"]
    import os
    assert os.path.exists(os.path.join(
        exp, "results", "results_simulation_ButtonPress.json"))
