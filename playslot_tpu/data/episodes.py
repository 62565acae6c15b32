"""
On-disk episode datasets (PNG frame folders + actions.npy).

Capability parity with reference src/data/BlockPush.py (the canonical
episode-loader pattern) and the original on-disk ButtonPress variant:
directory layout `<root>/<split>/<episode_id>/<NN>.png` with a per-episode
`actions.npy`. Continuous (episode, offset) indexing gives
`ep_len - num_frames + 1` training sequences per episode when random_start.

Note: the reference's __len__ returns only the number of episodes even with
continuous indexing (BlockPush.py:55-58), which silently restricts sampling
to the first episodes; we implement the evidently intended
`episodes * seq_per_episode` length.
"""

import os
import os.path as osp

import numpy as np
from PIL import Image, ImageFile

ImageFile.LOAD_TRUNCATED_IMAGES = True


class EpisodeFrameDataset:
    """Base PNG-episode dataset."""

    def __init__(self, split, datapath, ep_len=25, num_frames=20,
                 random_start=True, img_size=(64, 64), sample_rate=1, **kwargs):
        split = {"val": "val", "valid": "val", "eval": "test", "test": "test"}.get(
            split, split)
        self.split = split
        self.datapath = datapath
        self.ep_len = ep_len
        self.num_frames = num_frames
        self.random_start = random_start
        self.img_size = tuple(img_size)
        self.sample_rate = sample_rate
        self.root = self._resolve_root()
        self.episodes = self._scan_episodes()
        self._native_size_ok = None  # lazily probed in _use_native
        span = (num_frames - 1) * sample_rate + 1
        if split == "train" and random_start:
            self.seq_per_episode = max(self.ep_len - span + 1, 1)
        else:
            self.seq_per_episode = 1
        # the offset arithmetic above indexes up to frame ep_len-1 (or span-1
        # without random starts) — validate against the ACTUAL frame counts
        # on disk so a config/disk mismatch fails here with a clear message
        # instead of an IndexError mid-epoch
        if self.episodes:
            shortest = min(len(p) for p in self.episodes)
            needed = self.ep_len if self.seq_per_episode > 1 else span
            if shortest < needed:
                raise ValueError(
                    f"{type(self).__name__}: configured ep_len={self.ep_len} "
                    f"num_frames={num_frames} sample_rate={sample_rate} needs "
                    f"{needed} frames per episode, but the shortest episode "
                    f"under {self.root} has {shortest}")

    # -------------------------------------------------------------- layout
    def _resolve_root(self):
        return osp.join(self.datapath, self.split)

    def _scan_episodes(self):
        if not osp.isdir(self.root):
            raise FileNotFoundError(f"dataset root not found: {self.root}")
        folders = sorted(
            (int(f) for f in os.listdir(self.root) if f.isdigit()))
        episodes = []
        for f in folders:
            d = osp.join(self.root, str(f))
            frames = sorted(
                (p for p in os.listdir(d)
                 if p.endswith(".png") and osp.splitext(p)[0].isdigit()),
                key=lambda p: int(osp.splitext(p)[0]))
            episodes.append([osp.join(d, p) for p in frames])
        return episodes

    # --------------------------------------------------------------- access
    def __len__(self):
        return len(self.episodes) * self.seq_per_episode

    def _load_img(self, path):
        img = Image.open(path).resize(self.img_size)
        arr = np.asarray(img, np.float32)[..., :3] / 255.0
        return arr

    @staticmethod
    def _png_dims(path):
        """(width, height) from the PNG IHDR header, or None if not a PNG."""
        try:
            with open(path, "rb") as f:
                head = f.read(24)
            if head[:8] != b"\x89PNG\r\n\x1a\n" or head[12:16] != b"IHDR":
                return None
            return (int.from_bytes(head[16:20], "big"),
                    int.from_bytes(head[20:24], "big"))
        except OSError:
            return None

    def _use_native(self):
        """Native C++ batch decoder (native/frameloader.cpp) is the default
        production path when buildable; PLAYSLOT_NATIVE_LOADER=0 forces PIL.
        The native resize is bilinear vs PIL's bicubic default, so the
        native path is used ONLY when the stored frame size already equals
        img_size (the shipped-config case — no resample, byte-identical
        output, tested in tests/test_misc_components.py); datasets stored at
        any other resolution take the PIL path, matching the reference's
        bicubic resample exactly."""
        if os.environ.get("PLAYSLOT_NATIVE_LOADER", "1") == "0":
            return False
        from playslot_tpu.data import native_loader
        if not native_loader.available():
            return False
        if self._native_size_ok is None:
            dims = (self._png_dims(self.episodes[0][0])
                    if self.episodes and self.episodes[0] else None)
            self._native_size_ok = dims == tuple(self.img_size)
        return self._native_size_ok

    def __getitem__(self, index):
        ep = index // self.seq_per_episode
        offset = index % self.seq_per_episode
        idxs = [offset + i * self.sample_rate for i in range(self.num_frames)]
        paths = self.episodes[ep]
        seq_paths = [paths[i] for i in idxs]
        if self._use_native():
            from playslot_tpu.data import native_loader
            try:
                video = native_loader.load_frames(
                    seq_paths, self.img_size[1], self.img_size[0])
            except RuntimeError:  # e.g. a non-PNG frame snuck in
                video = np.stack([self._load_img(p) for p in seq_paths], axis=0)
        else:
            video = np.stack([self._load_img(p) for p in seq_paths], axis=0)
        actions = self._load_actions(ep, idxs)
        meta = {"actions": actions, "masks": np.array([])}
        return video, video, meta

    def _load_actions(self, ep, idxs):
        base = osp.dirname(self.episodes[ep][0])
        path = osp.join(base, "actions.npy")
        if not osp.exists(path):
            return np.array([])
        acts = np.load(path)
        return acts[idxs].astype(np.float32)


class BlockPush(EpisodeFrameDataset):
    """Random-exploration BlockPush (reference BlockPush.py:141-178)."""


class ButtonPress(EpisodeFrameDataset):
    """
    Original on-disk ButtonPress (MetaWorld renderings). The snapshot's
    LeRobot rewiring (reference ButtonPress.py:59, see SURVEY.md §0.1) is
    provided separately as ButtonPressLeRobot in lerobot_data.py.
    """


class ExpertDemosMixin:
    """90/10 split over one folder + optional cap on demo count."""

    def __init__(self, *args, num_expert_demos=-1, **kwargs):
        kwargs["random_start"] = False
        super().__init__(*args, **kwargs)
        n = len(self.episodes)
        thr = int(0.9 * n)
        if self.split == "train":
            self.episodes = self.episodes[:thr]
            if num_expert_demos and num_expert_demos > 0:
                self.episodes = self.episodes[:num_expert_demos]
        else:
            self.episodes = self.episodes[thr:]

    def _resolve_root(self):
        return self.datapath  # expert demos live in a single folder


class BlockPushExpertDemos(ExpertDemosMixin, EpisodeFrameDataset):
    pass


class ButtonPressExpertDemos(ExpertDemosMixin, EpisodeFrameDataset):
    pass
