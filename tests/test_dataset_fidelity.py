"""
Byte-level loader fidelity vs the live torch reference (round-1 VERDICT
weakness 7): build ONE on-disk episode tree shaped exactly like the
reference's documented BlockPush layout — integer episode folders (including
a two-digit one to catch lexicographic sorting), digit-named frame PNGs,
distractor `seg_*.png` files, float64 `actions.npy` — and assert our
EpisodeFrameDataset returns the same frames and actions as
reference src/data/BlockPush.py on the same tree.
"""

import os

import numpy as np
import pytest
from PIL import Image

from tests.reference_util import import_reference


EP_LEN = 6
NUM_EPISODES = 11  # forces "10" to sort after "9" only under numeric order


def _build_tree(root):
    """Reference BlockPush layout: <root>/<split>/<ep_int>/<NN>.png +
    actions.npy (float64, (ep_len, 4)) + seg_ distractors."""
    rng = np.random.RandomState(0)
    frames = {}
    actions = {}
    for split in ("train", "val"):
        for ep in range(NUM_EPISODES):
            d = os.path.join(root, split, str(ep))
            os.makedirs(d)
            for t in range(EP_LEN):
                img = rng.randint(0, 255, (64, 64, 3), np.uint8)
                Image.fromarray(img).save(os.path.join(d, f"{t}.png"))
                # distractor segmentation files the loader must skip
                Image.fromarray(img[..., 0]).save(
                    os.path.join(d, f"seg_{t}.png"))
                frames[(split, ep, t)] = img
            # float64 on purpose: np.save's default for python floats — the
            # dtype edge case the round-1 verdict called out
            a = rng.rand(EP_LEN, 4).astype(np.float64)
            np.save(os.path.join(d, "actions.npy"), a)
            actions[(split, ep)] = a
    return frames, actions


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("blockpush")
    frames, actions = _build_tree(str(root))
    return str(root), frames, actions


def test_layout_semantics(tree):
    from playslot_tpu.data.episodes import BlockPush
    root, frames, actions = tree
    ds = BlockPush(split="train", datapath=root, ep_len=EP_LEN, num_frames=4,
                   random_start=True, img_size=(64, 64))
    # numeric episode ordering: episode 10 is the eleventh, not the second
    assert ds.episodes[10][0].endswith(os.path.join("10", "0.png"))
    # seg_ files excluded, frames sorted numerically
    assert all(len(ep) == EP_LEN for ep in ds.episodes)
    assert ds.seq_per_episode == EP_LEN - 4 + 1

    video, _, meta = ds[ds.seq_per_episode * 10 + 2]  # episode 10, offset 2
    assert video.shape == (4, 64, 64, 3)
    np.testing.assert_allclose(
        video[0], frames[("train", 10, 2)].astype(np.float32) / 255.0,
        atol=1e-6)
    assert meta["actions"].dtype == np.float32
    np.testing.assert_allclose(
        meta["actions"], actions[("train", 10)][2:6].astype(np.float32),
        atol=1e-7)


def _ensure_torchvision_stub(torch):
    """The image has torch but not torchvision; the reference loader only
    uses transforms.ToTensor — stub it with the exact semantics (uint8 PIL ->
    float CHW / 255)."""
    import sys
    import types
    if "torchvision" in sys.modules:
        return
    try:
        import torchvision  # noqa: F401
        return
    except ImportError:
        pass

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[..., None]
            return torch.from_numpy(arr).permute(2, 0, 1)

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.ToTensor = ToTensor
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def test_matches_reference_loader(tree):
    torch = import_reference()
    _ensure_torchvision_stub(torch)
    root, frames, actions = tree
    from data.BlockPush import BlockPush as RefBlockPush
    from playslot_tpu.data.episodes import BlockPush

    for split in ("train", "val"):
        ref = RefBlockPush(split=split, dataset_name="BlockPush",
                           datapath=root, ep_len=EP_LEN, num_frames=4,
                           random_start=True, img_size=(64, 64))
        ours = BlockPush(split=split, datapath=root, ep_len=EP_LEN,
                         num_frames=4, random_start=True, img_size=(64, 64))
        n = len(ours)
        assert ref.seq_per_episode == ours.seq_per_episode
        for idx in (0, n // 2, n - 1):
            r_imgs, _, r_reps = ref[idx]
            video, _, meta = ours[idx]
            np.testing.assert_allclose(
                video, r_imgs.permute(0, 2, 3, 1).numpy(), atol=1e-6,
                err_msg=f"{split}[{idx}] frames differ")
            np.testing.assert_allclose(
                meta["actions"], r_reps["actions"].numpy().astype(np.float32),
                atol=1e-7, err_msg=f"{split}[{idx}] actions differ")
