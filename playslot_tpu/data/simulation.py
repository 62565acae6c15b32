"""
Closed-loop simulators for behavior evaluation.

Capability parity with reference src/data/ButtonPress_Sim.py (MetaWorld
button-press-v2 with custom camera, ACTION_REPEAT=5) and
src/data/BlockPush_Sim.py (multi-object-fetch PushOdd, ACTION_REPEAT=2).
MuJoCo/MetaWorld are optional dependencies — the wrappers raise a clear
error when absent. GridShapesSim is a hermetic pure-numpy stand-in with the
same update(action) -> (img, done) interface, so the whole closed-loop
evaluation harness is testable without MuJoCo.
"""

import numpy as np


class BaseSim:
    """update(action) -> (img (H,W,3) float32 in [0,1], done: bool)."""

    ACTION_REPEAT = 1

    def init_seq(self):
        raise NotImplementedError

    def update(self, action):
        raise NotImplementedError

    def success(self):
        raise NotImplementedError

    def close(self):
        pass


class ButtonPressSim(BaseSim):
    """MetaWorld button-press-v2-goal-observable (ref ButtonPress_Sim.py:25)."""

    ACTION_REPEAT = 5
    CAM_CONFIG = {"elevation": -25, "azimuth": 145, "distance": 0.6,
                  "lookat": np.array([-0.1, 0.7, 0.2])}

    def __init__(self, img_size=(64, 64), seed=None, num_init_random_actions=10):
        try:
            import metaworld  # noqa: F401
            from metaworld.envs import (
                ALL_V2_ENVIRONMENTS_GOAL_OBSERVABLE as ENVS)
        except ImportError as e:
            raise ImportError(
                "MetaWorld is not installed in this environment; use "
                "GridShapesSim for hermetic closed-loop testing") from e
        self.img_size = img_size
        self.num_init_random_actions = num_init_random_actions
        env_cls = ENVS["button-press-v2-goal-observable"]
        self.env = env_cls(seed=seed, render_mode="rgb_array")
        for k, v in self.CAM_CONFIG.items():
            try:
                setattr(self.env.mujoco_renderer, f"default_cam_{k}", v)
            except Exception:
                pass
        self._done = False

    def _render(self):
        from PIL import Image
        img = self.env.render()
        img = np.asarray(Image.fromarray(img).resize(self.img_size), np.float32)
        return img / 255.0

    def init_seq(self):
        self.env.reset()
        for _ in range(self.num_init_random_actions):
            self.env.step(self.env.action_space.sample())
        self._done = False
        return self._render()

    def update(self, action):
        info = {}
        for _ in range(self.ACTION_REPEAT):
            _, _, _, _, info = self.env.step(np.asarray(action))
        self._done = bool(info.get("success", 0.0))
        return self._render(), self._done

    def success(self):
        return self._done


class BlockPushSim(BaseSim):
    """multi-object-fetch PushOdd_3Distractors_Dense-v1 (ref BlockPush_Sim.py:17)."""

    ACTION_REPEAT = 2

    def __init__(self, img_size=(64, 64), seed=None):
        try:
            import gym
        except ImportError as e:
            raise ImportError(
                "gym + multi-object-fetch not installed; use GridShapesSim "
                "for hermetic closed-loop testing") from e
        self.img_size = img_size
        self.env = gym.make("PushOdd_3Distractors_Dense-v1")
        if seed is not None:
            self.env.seed(seed)
        self._done = False

    def _render(self):
        from PIL import Image
        img = self.env.render(mode="rgb_array")
        img = np.asarray(Image.fromarray(img).resize(self.img_size), np.float32)
        return img / 255.0

    def init_seq(self):
        self.env.reset()
        self._done = False
        return self._render()

    def update(self, action):
        for _ in range(self.ACTION_REPEAT):
            self.env.step(np.asarray(action))
        self._done = bool(self.env.success())
        return self._render(), self._done

    def success(self):
        return self._done


class GridShapesSim(BaseSim):
    """
    Hermetic closed-loop environment over GridShapes physics: one agent
    shape is driven by continuous 2-d actions (mapped to grid moves); the
    episode succeeds when the agent overlaps the static target square.
    """

    ACTION_REPEAT = 1

    def __init__(self, img_size=(64, 64), seed=None, shape_size=None,
                 max_steps=100):
        from playslot_tpu.data.gridshapes import _make_shape, COLORS
        self.R = img_size[0]
        self.sz = shape_size if shape_size is not None else max(self.R // 5, 3)
        shape_size = self.sz
        self.rng = np.random.RandomState(seed or 0)
        self.max_steps = max_steps
        self._occ = _make_shape("square", shape_size).astype(bool)
        self._agent_occ = _make_shape("ball", shape_size).astype(bool)
        self._agent_color = np.array(COLORS["red"], np.float32) / 255
        # full-brightness green, matching gridshapes_jax._GREEN (CSS "green"
        # is half-brightness and made the target sub-salient to SAVi)
        self._target_color = np.array([0.0, 1.0, 0.0], np.float32)
        self._done = False

    def init_seq(self):
        lim = self.R - self.sz
        self.agent = self.rng.randint(0, lim, size=2)
        self.target = self.rng.randint(0, lim, size=2)
        self.steps = 0
        self._done = False
        return self._render()

    def _render(self):
        img = np.zeros((self.R, self.R, 3), np.float32)
        ty, tx = self.target
        img[ty:ty + self.sz, tx:tx + self.sz][self._occ] = self._target_color
        ay, ax = self.agent
        img[ay:ay + self.sz, ax:ax + self.sz][self._agent_occ] = self._agent_color
        return img

    def update(self, action):
        action = np.asarray(action, np.float32).reshape(-1)[:2]
        step = np.clip(np.round(action * 3), -3, 3).astype(int)
        self.agent = np.clip(self.agent + step, 0, self.R - self.sz)
        self.steps += 1
        dist = np.abs(self.agent - self.target).max()
        self._done = bool(dist < self.sz // 2)
        return self._render(), self._done or self.steps >= self.max_steps

    def success(self):
        return self._done


SIMULATIONS = {
    "ButtonPress": ButtonPressSim,
    "BlockPush": BlockPushSim,
    "GridShapes": GridShapesSim,
}


def setup_simulation(name, **kwargs):
    """Factory mirroring reference base/baseSimulation.py:23-38."""
    for key, cls in SIMULATIONS.items():
        if name.startswith(key):
            return cls(**kwargs)
    raise ValueError(f"No simulator for dataset {name}. Have: {list(SIMULATIONS)}")
