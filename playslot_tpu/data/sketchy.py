"""
Sketchy — DeepMind real-robot dataset loader.

Capability parity with reference src/data/Sketchy.py: episodes hold
front-left/front-right camera crops `fl/fr_*_full/crop_i.png` plus
`actions.npy` (7-d actions); sequences are windowed with a max-overlap
control. Directory layout: <root>/<split>/<episode>/...
"""

import os
import os.path as osp

import numpy as np
from PIL import Image


class Sketchy:
    def __init__(self, split="train", datapath="./datasets/Sketchy", num_frames=6,
                 seq_step=1, img_size=(64, 64), max_overlap=0, mode="all", **kwargs):
        assert mode in ("fl", "fr", "all")
        split = {"valid": "val", "eval": "test"}.get(split, split)
        self.split = split
        self.root = osp.join(datapath, split)
        self.num_frames = num_frames
        self.seq_step = seq_step
        self.img_size = tuple(img_size)
        self.max_overlap = max_overlap
        self.mode = mode
        self.samples = self._index()

    def _index(self):
        if not osp.isdir(self.root):
            raise FileNotFoundError(f"dataset root not found: {self.root}")
        cams = ["fl", "fr"] if self.mode == "all" else [self.mode]
        samples = []
        span = (self.num_frames - 1) * self.seq_step + 1
        stride = max(span - self.max_overlap, 1)
        for ep in sorted(os.listdir(self.root)):
            ep_dir = osp.join(self.root, ep)
            if not osp.isdir(ep_dir):
                continue
            act_path = osp.join(ep_dir, "actions.npy")
            for cam in cams:
                cam_dirs = sorted(d for d in os.listdir(ep_dir)
                                  if d.startswith(cam) and d.endswith("_full"))
                for cd in cam_dirs:
                    frame_dir = osp.join(ep_dir, cd)
                    frames = sorted(
                        (f for f in os.listdir(frame_dir)
                         if f.startswith("crop_") and f.endswith(".png")),
                        key=lambda f: int(f[5:-4]))
                    paths = [osp.join(frame_dir, f) for f in frames]
                    for start in range(0, len(paths) - span + 1, stride):
                        samples.append((paths, start, act_path))
        return samples

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        paths, start, act_path = self.samples[index]
        idxs = [start + i * self.seq_step for i in range(self.num_frames)]
        video = np.stack([
            np.asarray(Image.open(paths[i]).resize(self.img_size), np.float32)[..., :3]
            / 255.0 for i in idxs])
        if osp.exists(act_path):
            actions = np.load(act_path)[idxs].astype(np.float32)
        else:
            actions = np.array([])
        return video, video, {"actions": actions, "masks": np.array([])}
