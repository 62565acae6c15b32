"""
LeRobot-backed ButtonPress loader — the snapshot's rewiring of the original
on-disk ButtonPress dataset (reference src/data/ButtonPress.py:59 loads
`lerobot/aloha_sim_transfer_cube_human_image`; see SURVEY.md §0.1).

Differences from the snapshot, on purpose:
  * the snapshot embeds an UNTRAINED torch projector (14 -> 4 action dims)
    inside the Dataset (ButtonPress.py:52-56) — a random projection applied
    at load time. We reproduce the capability with a seeded numpy projection
    so loading is deterministic and torch-free.
  * gated on the `datasets` package and an already-cached dataset (this
    environment has no network egress).
"""

import numpy as np
from PIL import Image


class ButtonPressLeRobot:
    def __init__(self, split="train", repo_id="lerobot/aloha_sim_transfer_cube_human_image",
                 num_frames=6, sample_rate=1, img_size=(64, 64), random_start=True,
                 action_proj_dims=(14, 4), seed=13, **kwargs):
        try:
            import datasets  # HF datasets
        except ImportError as e:
            raise ImportError("HF `datasets` package required for the LeRobot "
                              "ButtonPress variant") from e
        if split not in ("train", "val", "valid", "validation", "eval", "test"):
            raise ValueError(f"Unknown dataset split {split}")
        # reference ButtonPress.py:34-38: val/valid -> "val", eval -> "test";
        # both non-train splits serve the HELD-OUT tail (never training data)
        self.split = ("val" if split in ("val", "valid", "validation")
                      else "test" if split in ("test", "eval") else "train")
        self.num_frames = num_frames
        self.sample_rate = sample_rate
        self.img_size = tuple(img_size)
        self.random_start = random_start and self.split == "train"
        self.seed = seed

        ds = datasets.load_dataset(repo_id, split="train")
        self.ds = ds
        # episode -> frame-index ranges (reference ButtonPress.py:62-76)
        self.episodes = {}
        for i, ep in enumerate(ds["episode_index"]):
            self.episodes.setdefault(int(ep), []).append(i)
        eps = sorted(self.episodes)
        # reference ButtonPress.py:71-76: first 95% train, last 5% val/test
        thr = int(0.95 * len(eps))
        keep = eps[:thr] if self.split == "train" else eps[thr:]
        self.episode_ids = keep

        # seeded random 14->4 action projection (snapshot parity, sans torch)
        rng = np.random.RandomState(seed)
        d_in, d_out = action_proj_dims
        self.proj_w = (rng.randn(d_in, 64) / np.sqrt(d_in)).astype(np.float32)
        self.proj_w2 = (rng.randn(64, d_out) / np.sqrt(64)).astype(np.float32)

    def __len__(self):
        return len(self.episode_ids)

    def _project(self, actions):
        h = np.maximum(actions @ self.proj_w, 0)
        return h @ self.proj_w2

    def __getitem__(self, index):
        idxs = self.episodes[self.episode_ids[index]]
        span = (self.num_frames - 1) * self.sample_rate + 1
        max_start = max(len(idxs) - span, 0)
        # seeded per index (not the global np.random) so identical
        # config+seed reproduces identical windows, like every other dataset
        start = (np.random.RandomState(self.seed * 100003 + index)
                 .randint(0, max_start + 1) if self.random_start else 0)
        sel = [idxs[min(start + i * self.sample_rate, len(idxs) - 1)]
               for i in range(self.num_frames)]

        frames, actions = [], []
        for i in sel:
            row = self.ds[i]
            img = row["observation.images.top"]
            if not isinstance(img, Image.Image):
                img = Image.fromarray(np.asarray(img))
            frames.append(np.asarray(img.resize(self.img_size), np.float32)[..., :3]
                          / 255.0)
            actions.append(np.asarray(row["action"], np.float32))
        video = np.stack(frames)
        acts = self._project(np.stack(actions))
        return video, video, {"actions": acts, "masks": np.array([])}
