"""
GridShapes-on-device: the procedural moving-shapes generator as a pure
jax.random program, compiled by XLA and executed ON the TPU.

Rationale (SURVEY.md §7.1 "GridShapes as a pure-jax.random synthetic
generator"): the reference generates training data in a host Python loop and
ships frames to the device every step (GridShapes.py:346-418). Under this
environment's relayed TPU, host->device bandwidth (~30 MB/s) would dominate
the train step; generating on device removes host I/O from the training loop
entirely and keeps CI hermetic.

Semantics match data/gridshapes.py (same shapes/colors/speed-3 grid moves /
direction re-roll probabilities / border bounce / painter's compositing),
with jax.random streams instead of numpy RNG.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from playslot_tpu.data.gridshapes import COLORS, SPEED

_COLOR_TABLE = jnp.asarray(np.array(list(COLORS.values()), np.float32) / 255.0)
_NUM_SHAPES = 3  # ball, triangle, square


def _shape_mask(local_y, local_x, shape_id, sz):
    """Occupancy of a shape at local coords (broadcast over pixels)."""
    h = sz // 2
    inside = (local_y >= 0) & (local_y < sz) & (local_x >= 0) & (local_x < sz)
    ball = ((local_y - h) ** 2 + (local_x - h) ** 2) <= h ** 2
    tri = ((local_x - h) <= (local_y / 2 + 1e-6)) & \
        ((h - local_x) <= (local_y / 2 + 1e-6))
    square = jnp.ones_like(ball)
    sel = jnp.where(shape_id == 0, ball, jnp.where(shape_id == 1, tri, square))
    return inside & sel


@functools.partial(jax.jit, static_argnames=("batch", "num_frames", "num_balls",
                                             "img_size", "shape_size"))
def generate_batch(key, batch=32, num_frames=10, num_balls=2, img_size=64,
                   change_prob=0.25, shape_size=21):
    """
    Returns dict:
      videos (B, T, R, R, 3) f32 in [0,1],
      actions (B, T, S) int32 (discrete grid-move ids, reference encoding),
      masks (B, T, R, R) int32 instance segmentation (0 = background),
      velocities (B, T, S, 2) f32 normalized.
    """
    B, T, S, R, sz = batch, num_frames, num_balls, img_size, shape_size
    k_shape, k_color, k_pos, k_dir, k_roll = jax.random.split(key, 5)

    shape_ids = jax.random.randint(k_shape, (B, S), 0, _NUM_SHAPES)
    color_ids = jax.random.randint(k_color, (B, S), 0, _COLOR_TABLE.shape[0])
    colors = _COLOR_TABLE[color_ids]  # (B, S, 3)
    pos = jax.random.randint(k_pos, (B, S, 2), 0, R - sz).astype(jnp.int32)

    # independent keys per draw (a shared key correlates axis and sign
    # through the underlying threefry bits, skewing the 4-direction
    # distribution; fixing this changes generated streams for identical
    # seed — pre-fix bouncing-ball artifacts are from the old stream)
    k_axis, k_sign = jax.random.split(k_dir)
    axis = jax.random.randint(k_axis, (B, S), 0, 2)
    sign = jnp.where(jax.random.uniform(k_sign, (B, S)) < 0.5, 1, -1)
    speed = jnp.where(jnp.stack([axis == 0, axis == 1], -1),
                      (SPEED * sign)[..., None], 0).astype(jnp.int32)

    yy = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)

    def render(pos, shape_ids, colors):
        """One frame for the whole batch: painter's algorithm over objects."""
        frame = jnp.zeros((B, R, R, 3), jnp.float32)
        seg = jnp.zeros((B, R, R), jnp.int32)
        for j in range(S):  # static tiny loop
            ly = yy[None] - pos[:, j, 0][:, None, None]
            lx = xx[None] - pos[:, j, 1][:, None, None]
            m = _shape_mask(ly, lx, shape_ids[:, j][:, None, None], sz)
            frame = jnp.where(m[..., None], colors[:, j][:, None, None, :], frame)
            seg = jnp.where(m, j + 1, seg)
        return frame, seg

    def reroll(speed, k):
        """Direction re-roll with prob change_prob (5-way: 4 dirs + stop)."""
        k1, k2 = jax.random.split(k)
        do = jax.random.uniform(k1, (B, S)) < change_prob
        mag = jnp.abs(speed).max(axis=-1)
        mag = jnp.where(mag == 0, SPEED, mag)
        r = jax.random.uniform(k2, (B, S))
        sy = jnp.where(r < 0.2, mag, 0) + jnp.where((r >= 0.2) & (r < 0.4), -mag, 0)
        sx = jnp.where((r >= 0.4) & (r < 0.6), mag, 0) \
            + jnp.where((r >= 0.6) & (r < 0.8), -mag, 0)
        new_speed = jnp.stack([sy, sx], axis=-1).astype(jnp.int32)
        return jnp.where(do[..., None], new_speed, speed)

    def action_id(speed):
        sy, sx = speed[..., 0], speed[..., 1]
        return jnp.where((sx > 0) & (sy == 0), 0,
               jnp.where((sx < 0) & (sy == 0), 1,
               jnp.where((sy > 0) & (sx == 0), 2,
               jnp.where((sy < 0) & (sx == 0), 3, 4)))).astype(jnp.int32)

    def step(carry, k):
        pos, speed = carry
        speed = reroll(speed, k)
        act = action_id(speed)
        nxt = pos + speed
        # border bounce (reference _move_shape semantics)
        under = nxt < 0
        over = nxt > (R - sz)
        nxt = jnp.where(under, 0, jnp.where(over, R - sz - 1, nxt))
        speed = jnp.where(under | over, -speed, speed)
        frame, seg = render(nxt, shape_ids, colors)
        return (nxt, speed), (frame, seg, act, speed)

    keys = jax.random.split(k_roll, T)
    (_, _), (frames, segs, acts, speeds) = jax.lax.scan(step, (pos, speed), keys)

    return {
        "videos": jnp.moveaxis(frames, 0, 1),
        "masks": jnp.moveaxis(segs, 0, 1),
        "actions": jnp.moveaxis(acts, 0, 1),
        "velocities": jnp.moveaxis(speeds, 0, 1).astype(jnp.float32) / SPEED,
    }


class GridShapesOnDevice:
    """
    Device-resident dataset: batches are generated by XLA on the accelerator,
    no host I/O. Plugs into build_data_loader via the `is_device_dataset`
    protocol.
    """

    is_device_dataset = True

    def __init__(self, split="train", num_frames=10, num_balls=2, img_size=64,
                 change_prob=0.25, shape_size=21, seed=13, length=None, **kwargs):
        self.split = split
        self.num_frames = num_frames
        self.num_balls = num_balls
        self.img_size = img_size if isinstance(img_size, int) else img_size[0]
        self.change_prob = change_prob
        self.shape_size = shape_size
        base = {"train": 0, "valid": 1, "val": 1, "test": 2}.get(split, 3)
        self.base_key = jax.random.fold_in(jax.random.PRNGKey(seed), base)
        self._length = length if length is not None else (
            10000 if split == "train" else 512)

    def __len__(self):
        return self._length

    def batches(self, batch_size, shuffle=True, seed=0, epoch=0):
        n_batches = max(self._length // batch_size, 1)
        key = jax.random.fold_in(self.base_key, 0 if self.split != "train" else epoch)
        for i in range(n_batches):
            out = generate_batch(
                jax.random.fold_in(key, i), batch=batch_size,
                num_frames=self.num_frames, num_balls=self.num_balls,
                img_size=self.img_size, change_prob=self.change_prob,
                shape_size=self.shape_size)
            meta = {k: out[k] for k in ("actions", "masks", "velocities")}
            yield out["videos"], out["videos"], meta


class DeviceBatchIterator:
    """Adapter exposing GridShapesOnDevice through the BatchIterator API."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        return max(len(self.dataset) // self.batch_size, 1)

    def __iter__(self):
        it = self.dataset.batches(self.batch_size, self.shuffle, self.seed,
                                  epoch=self.epoch)
        self.epoch += 1
        return it


# ---------------------------------------------------------------------------
# expert (goal-directed) variant: red ball agent chases a green square target
# ---------------------------------------------------------------------------

_RED = jnp.asarray(np.array(COLORS["red"], np.float32) / 255.0)

# Scene changelog. The version is stamped into experiment_params["dataset"]
# ["scene_version"] when an on-device GridShapes experiment is created
# (Config.new_experiment) and validated by GridShapesExpertOnDevice.__init__,
# so artifacts trained on different scene generations are identifiable —
# identical config+seed does NOT reproduce across versions. Configs that
# predate the tagging have no key and skip validation:
#   1: CSS "green" target (0, 0.502, 0); no target respawn.
#   2 (current): full-brightness target (0, 1, 0) — CSS green is half the
#      agent's contrast against the black background and slot attention
#      systematically absorbed the target into the background slot while the
#      full-contrast red agent bound reliably (sweep evidence in STATUS.md) —
#      and stationary expert demos (target respawns when reached).
#      GridShapesSim renders the same color.
SCENE_VERSION = 2
_SCENE_TARGET_COLORS = {1: (0.0, 0.50196078, 0.0), 2: (0.0, 1.0, 0.0)}
_GREEN = jnp.asarray(np.array(_SCENE_TARGET_COLORS[SCENE_VERSION], np.float32))


@functools.partial(jax.jit, static_argnames=("batch", "num_frames", "img_size",
                                             "shape_size", "policy",
                                             "target_walk"))
def generate_scene_batch(key, batch=32, num_frames=16, img_size=64,
                         shape_size=None, policy="expert", target_walk=0.0):
    """
    The agent/target goal-reaching scene (red ball agent, green square
    target), generated on device.

    policy="expert": greedy goal-directed moves (behavior-cloning demos,
        matching data/gridshapes.py::GridShapesExpertDemos and GridShapesSim).
        When the agent reaches the target, the target RESPAWNS at a fresh
        random cell, so the demo action distribution is stationary in time.
        Without the respawn, demos end parked on the goal and a policy
        trained on recurrently-encoded slots learns the shortcut "deep in
        the slot recurrence => output ~0" (the slot state implicitly encodes
        time-in-sequence); in closed-loop control — which runs far past the
        demo length — that collapses the decoded actions to zero (measured:
        per-frame action-MSE 0.35 -> 0.01 across demo frames, closed-loop
        actions decaying to ~0.05 by step 6).
    policy="random": random grid moves — the EXPLORATION distribution used to
        train SAVi + PlaySlot so that transitions are stochastic and the
        latent actions must carry the move information (mirrors the
        reference's random-exploration BlockPush vs Expert_BlockPush split).

    target_walk: per-frame probability that the TARGET takes a random grid
        move. SAVi's slot decomposition binds objects through motion cues; a
        never-moving target gets absorbed into the background slot (measured
        on seed0: background slot owned 86% of target pixels, target-position
        probe R^2 0.4 vs agent 1.0), which starves downstream control of the
        goal location. A small walk probability in the SAVi training scene
        restores the motion cue; the closed-loop simulator keeps its target
        static (a static object is in-distribution at inference — binding,
        once learned, does not require motion).

    Returns videos (B,T,R,R,3), actions (B,T,2) continuous in [-1,1],
    masks (B,T,R,R) with agent=1 target=2.
    """
    B, T, R = batch, num_frames, img_size
    sz = shape_size if shape_size is not None else max(R // 5, 3)
    k_a, k_t, k_p = jax.random.split(key, 3)
    agent = jax.random.randint(k_a, (B, 2), 0, R - sz).astype(jnp.int32)
    target = jax.random.randint(k_t, (B, 2), 0, R - sz).astype(jnp.int32)

    yy = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    h = sz // 2

    def render(agent, target):
        ty = yy[None] - target[:, 0][:, None, None]
        tx = xx[None] - target[:, 1][:, None, None]
        tmask = (ty >= 0) & (ty < sz) & (tx >= 0) & (tx < sz)
        ay = yy[None] - agent[:, 0][:, None, None]
        ax = xx[None] - agent[:, 1][:, None, None]
        amask = ((ay - h) ** 2 + (ax - h) ** 2 <= h ** 2) \
            & (ay >= 0) & (ay < sz) & (ax >= 0) & (ax < sz)
        frame = jnp.zeros((B, R, R, 3), jnp.float32)
        frame = jnp.where(tmask[..., None], _GREEN, frame)
        frame = jnp.where(amask[..., None], _RED, frame)
        seg = jnp.where(tmask, 2, 0).astype(jnp.int32)
        seg = jnp.where(amask, 1, seg)
        return frame, seg

    def expert_move(agent, target, _):
        dist = target - agent
        use_y = jnp.abs(dist[:, 0]) >= jnp.abs(dist[:, 1])
        step_y = jnp.clip(dist[:, 0], -SPEED, SPEED) * use_y
        step_x = jnp.clip(dist[:, 1], -SPEED, SPEED) * (~use_y)
        return jnp.stack([step_y, step_x], axis=-1).astype(jnp.int32)

    def random_move(agent, target, k):
        r = jax.random.uniform(k, (B,))
        sy = jnp.where(r < 0.2, SPEED, 0) + jnp.where((r >= 0.2) & (r < 0.4),
                                                      -SPEED, 0)
        sx = jnp.where((r >= 0.4) & (r < 0.6), SPEED, 0) \
            + jnp.where((r >= 0.6) & (r < 0.8), -SPEED, 0)
        return jnp.stack([sy, sx], axis=-1).astype(jnp.int32)

    move_fn = expert_move if policy == "expert" else random_move

    def step(carry, k):
        agent, target = carry
        if policy == "expert":
            # stationary demos: respawn the target once reached (same
            # max-norm success radius as GridShapesSim.update)
            reached = jnp.abs(agent - target).max(axis=-1) < sz // 2
            fresh = jax.random.randint(jax.random.fold_in(k, 1), (B, 2),
                                       0, R - sz).astype(jnp.int32)
            target = jnp.where(reached[:, None], fresh, target)
        if target_walk > 0:
            kw = jax.random.fold_in(k, 2)
            tmove = random_move(target, target, kw)
            walk = jax.random.uniform(jax.random.fold_in(k, 3),
                                      (B,)) < target_walk
            target = jnp.where(walk[:, None],
                               jnp.clip(target + tmove, 0, R - sz), target)
        frame, seg = render(agent, target)
        move = move_fn(agent, target, k)
        action = move.astype(jnp.float32) / SPEED
        nxt = jnp.clip(agent + move, 0, R - sz)
        return (nxt, target), (frame, seg, action)

    keys = jax.random.split(k_p, T)
    _, (frames, segs, acts) = jax.lax.scan(step, (agent, target), keys)
    return {
        "videos": jnp.moveaxis(frames, 0, 1),
        "masks": jnp.moveaxis(segs, 0, 1),
        "actions": jnp.moveaxis(acts, 0, 1),
    }


def generate_expert_batch(key, **kw):
    return generate_scene_batch(key, policy="expert", **kw)


class GridShapesExpertOnDevice(GridShapesOnDevice):
    """Device-resident goal-reaching scene (expert or random policy)."""

    POLICY = "expert"

    def __init__(self, split="train", num_frames=16, img_size=64,
                 shape_size=None, seed=13, length=None, num_expert_demos=-1,
                 target_walk=0.0, scene_version=SCENE_VERSION, **kwargs):
        super().__init__(split=split, num_frames=num_frames, img_size=img_size,
                         seed=seed, length=length, **kwargs)
        if int(scene_version) != SCENE_VERSION:
            raise ValueError(
                f"dataset config requests scene_version={scene_version} but "
                f"this build generates version {SCENE_VERSION} (see the scene "
                f"changelog in data/gridshapes_jax.py); artifacts across "
                f"versions are not comparable")
        self.scene_version = SCENE_VERSION
        self.shape_size = shape_size
        self.target_walk = float(target_walk)
        if length is None:
            self._length = 2048 if split == "train" else 256
        # num_expert_demos caps the demo budget like the on-disk variants
        # (gridshapes.py GridShapesExpertDemos, episodes.py ExpertDemosMixin):
        # the generated set becomes FIXED across epochs (epoch fold pinned)
        # so a capped run really sees only that many distinct demos
        self.num_expert_demos = int(num_expert_demos)
        if self.num_expert_demos > 0:
            self._length = min(self._length, self.num_expert_demos)

    def batches(self, batch_size, shuffle=True, seed=0, epoch=0):
        n_batches = max(self._length // batch_size, 1)
        fixed_set = self.split != "train" or self.num_expert_demos > 0
        key = jax.random.fold_in(self.base_key, 0 if fixed_set else epoch)
        for i in range(n_batches):
            out = generate_scene_batch(
                jax.random.fold_in(key, i), batch=batch_size,
                num_frames=self.num_frames, img_size=self.img_size,
                shape_size=self.shape_size, policy=self.POLICY,
                target_walk=self.target_walk)
            yield out["videos"], out["videos"], {
                "actions": out["actions"], "masks": out["masks"]}


class GridShapesSceneRandomOnDevice(GridShapesExpertOnDevice):
    """Random-exploration distribution of the goal-reaching scene."""

    POLICY = "random"
