"""
GridShapes — procedural moving-shapes dataset with discrete ground-truth
actions, used as the hermetic synthetic benchmark/fixture.

Capability parity with reference src/data/GridShapes.py: 64x64 canvas,
21px shapes (ball / triangle / square, 10 colors), grid moves of speed 3 in
4 directions + stop (actions 0..4), direction re-rolls with `change_prob`,
border bounce, optional colored background. We additionally emit per-frame
instance segmentation masks (the renderer knows object occupancy + depth),
enabling mIoU evaluation that the reference lacks.

Pure numpy, seeded per index — the test split is deterministic without any
pregenerated files (the reference reads frozen .pt tensors instead).
"""

import numpy as np

COLORS = {
    "red": (255, 0, 0), "cyan": (0, 255, 255), "green": (0, 128, 0),
    "blue": (0, 0, 255), "magenta": (255, 0, 255), "yellow": (255, 255, 0),
    "orange": (255, 165, 0), "purple": (128, 0, 128), "white": (255, 255, 255),
    "brown": (165, 42, 42),
}
COLOR_NAMES = list(COLORS)
SHAPES = ["ball", "triangle", "square"]
SPEED = 3

# discrete action ids (reference GridShapes.py:472-487)
ACT_RIGHT, ACT_LEFT, ACT_DOWN, ACT_UP, ACT_STOP = 0, 1, 2, 3, 4


def _make_shape(shape_name, size):
    """Binary (size, size) occupancy map for a shape."""
    h = size // 2
    yy, xx = np.mgrid[0:size, 0:size]
    if shape_name == "ball":
        return ((yy - h) ** 2 + (xx - h) ** 2 <= h ** 2).astype(np.float32)
    if shape_name == "square":
        return np.ones((size, size), np.float32)
    # triangle with apex at top-center
    return ((xx - h) <= (yy / 2 + 1e-6)) & ((h - xx) <= (yy / 2 + 1e-6))


def _action_from_speed(sy, sx):
    if sx > 0 and sy == 0:
        return ACT_RIGHT
    if sx < 0 and sy == 0:
        return ACT_LEFT
    if sy > 0 and sx == 0:
        return ACT_DOWN
    if sy < 0 and sx == 0:
        return ACT_UP
    return ACT_STOP


class GridShapes:
    """
    Args mirror the reference dataset config (configs/datasets/GridShapes.json).
    __getitem__(idx) -> (video (T, H, W, 3) float32 in [0,1], video, meta)
    meta: actions (T, S), positions (T, S, 2), velocities (T, S, 2),
          masks (T, H, W) int32 instance ids (0 = background, i+1 = object i).
    """

    def __init__(self, split="train", num_frames=20, num_balls=1, img_size=64,
                 change_prob=0.25, shape_size=21, use_bkgr=False, seed=13,
                 length=None, **kwargs):
        self.split = split
        self.num_frames = num_frames
        self.num_balls = num_balls
        self.img_size = img_size
        self.change_prob = change_prob
        self.shape_size = shape_size
        self.use_bkgr = use_bkgr
        self.seed = seed
        self._length = length if length is not None else (10000 if split == "train" else 500)

    def __len__(self):
        return self._length

    def _seed_for(self, idx):
        base = {"train": 0, "valid": 1 << 20, "test": 2 << 20}.get(self.split, 3 << 20)
        return self.seed * 1_000_003 + base + idx

    def __getitem__(self, idx):
        rng = np.random.RandomState(self._seed_for(idx))
        T, S, R, sz = self.num_frames, self.num_balls, self.img_size, self.shape_size

        # per-object static properties
        shapes, colors, occ = [], [], []
        for _ in range(S):
            name = SHAPES[rng.randint(len(SHAPES))]
            cname = COLOR_NAMES[rng.randint(len(COLOR_NAMES))]
            shapes.append(name)
            colors.append(np.array(COLORS[cname], np.float32) / 255.0)
            occ.append(_make_shape(name, sz).astype(bool))

        if self.use_bkgr:
            used = set(tuple(c) for c in colors)
            options = [np.array(v, np.float32) / 255 for k, v in COLORS.items()
                       if tuple(np.array(v, np.float32) / 255) not in used]
            options.append(np.zeros(3, np.float32))
            bkgr = options[rng.randint(len(options))]
        else:
            bkgr = np.zeros(3, np.float32)

        pos = np.stack([rng.randint(0, R - sz, size=2) for _ in range(S)]).astype(np.int64)
        speed = np.zeros((S, 2), np.int64)
        for j in range(S):
            axis = rng.randint(2)
            speed[j, axis] = SPEED * (1 if rng.rand() < 0.5 else -1)

        video = np.empty((T, R, R, 3), np.float32)
        seg = np.zeros((T, R, R), np.int32)
        actions = np.zeros((T, S), np.int64)
        positions = np.zeros((T, S, 2), np.float32)
        velocities = np.zeros((T, S, 2), np.float32)

        for t in range(T):
            frame = np.tile(bkgr, (R, R, 1)).astype(np.float32)
            seg_t = np.zeros((R, R), np.int32)
            for j in range(S):
                # random grid-move re-roll (reference random_speed_update)
                if rng.rand() < self.change_prob:
                    mag = speed[j, 0] if speed[j, 0] != 0 else speed[j, 1]
                    if mag == 0:
                        mag = SPEED
                    mag = abs(mag)
                    r = rng.rand()
                    if r < 0.2:
                        speed[j] = (mag, 0)
                    elif r < 0.4:
                        speed[j] = (-mag, 0)
                    elif r < 0.6:
                        speed[j] = (0, mag)
                    elif r < 0.8:
                        speed[j] = (0, -mag)
                    else:
                        speed[j] = (0, 0)
                actions[t, j] = _action_from_speed(speed[j, 0], speed[j, 1])

                # move with border bounce (reference _move_shape)
                nxt = pos[j] + speed[j]
                for d in range(2):
                    if nxt[d] < 0:
                        nxt[d] = 0
                        speed[j, d] *= -1
                    elif nxt[d] > R - sz:
                        nxt[d] = R - sz - 1
                        speed[j, d] *= -1
                pos[j] = nxt

                y, x = int(pos[j, 0]), int(pos[j, 1])
                m = occ[j]
                frame[y:y + sz, x:x + sz][m] = colors[j]
                seg_t[y:y + sz, x:x + sz][m] = j + 1
                positions[t, j] = pos[j]
                velocities[t, j] = speed[j]

            video[t] = np.clip(frame, 0, 1)
            seg[t] = seg_t

        meta = {
            "actions": actions,
            "positions": positions / 43.0,           # reference normalization
            "velocities": velocities / SPEED,
            "masks": seg,
        }
        return video, video, meta


class GridShapesExpertDemos:
    """
    Goal-directed expert demonstrations matching GridShapesSim physics:
    a red ball agent moves toward a static green target square with grid
    moves of speed 3, one axis at a time (largest remaining distance first),
    emitting the continuous (dy, dx)/SPEED actions the simulator consumes.

    Capability parity with the reference's expert GridShapes variant
    (GridShapes.py:428-452 expert_speed_update) and the ExpertDemos datasets
    used for behavior learning — but hermetic: no files, seeded per index.
    """

    def __init__(self, split="train", num_frames=16, img_size=64, shape_size=None,
                 seed=13, length=None, num_expert_demos=-1, **kwargs):
        self.split = split
        self.num_frames = num_frames
        self.R = img_size if isinstance(img_size, int) else img_size[0]
        self.sz = shape_size if shape_size is not None else max(self.R // 5, 3)
        self.seed = seed
        n = length if length is not None else (1000 if split == "train" else 100)
        if split == "train" and num_expert_demos and num_expert_demos > 0:
            n = min(n, num_expert_demos)
        self._length = n
        self._agent_occ = _make_shape("ball", self.sz).astype(bool)
        self._target_occ = _make_shape("square", self.sz).astype(bool)
        self._agent_color = np.array(COLORS["red"], np.float32) / 255
        self._target_color = np.array(COLORS["green"], np.float32) / 255

    def __len__(self):
        return self._length

    def _seed_for(self, idx):
        base = {"train": 0, "valid": 1 << 20, "val": 1 << 20,
                "test": 2 << 20}.get(self.split, 3 << 20)
        return self.seed * 7_368_787 + base + idx

    def _render(self, agent, target):
        img = np.zeros((self.R, self.R, 3), np.float32)
        seg = np.zeros((self.R, self.R), np.int32)
        ty, tx = target
        img[ty:ty + self.sz, tx:tx + self.sz][self._target_occ] = self._target_color
        seg[ty:ty + self.sz, tx:tx + self.sz][self._target_occ] = 2
        ay, ax = agent
        img[ay:ay + self.sz, ax:ax + self.sz][self._agent_occ] = self._agent_color
        seg[ay:ay + self.sz, ax:ax + self.sz][self._agent_occ] = 1
        return img, seg

    def __getitem__(self, idx):
        rng = np.random.RandomState(self._seed_for(idx))
        lim = self.R - self.sz
        agent = rng.randint(0, lim, size=2)
        target = rng.randint(0, lim, size=2)

        T = self.num_frames
        video = np.empty((T, self.R, self.R, 3), np.float32)
        segs = np.zeros((T, self.R, self.R), np.int32)
        actions = np.zeros((T, 2), np.float32)
        for t in range(T):
            video[t], segs[t] = self._render(agent, target)
            # expert policy: close the largest-distance axis first
            dist = target - agent
            move = np.zeros(2, np.int64)
            axis = int(np.argmax(np.abs(dist)))
            if np.abs(dist).max() > 0:
                step = int(np.clip(dist[axis], -SPEED, SPEED))
                move[axis] = step
            actions[t] = move / SPEED
            agent = np.clip(agent + move, 0, lim)

        meta = {"actions": actions, "masks": segs,
                "positions": np.zeros((T, 1, 2), np.float32),
                "velocities": np.zeros((T, 1, 2), np.float32)}
        return video, video, meta
