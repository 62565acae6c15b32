"""
Dataset factory + batching pipeline.

Capability parity with reference src/data/load_data.py: name->class dispatch,
batch building, and the `unwrap_batch_data` schema adapter. The loader is a
host-side numpy pipeline (prefetchable) producing channels-last batches that
feed directly into jitted device steps.
"""

import numpy as np

from playslot_tpu.config import CONFIG
from playslot_tpu.data.gridshapes import GridShapes, GridShapesExpertDemos
from playslot_tpu.data.episodes import (
    BlockPush, BlockPushExpertDemos, ButtonPress, ButtonPressExpertDemos,
)


def _make_sketchy(**kw):
    from playslot_tpu.data.sketchy import Sketchy
    return Sketchy(**kw)


def _make_lerobot(**kw):
    from playslot_tpu.data.lerobot_data import ButtonPressLeRobot
    return ButtonPressLeRobot(**kw)


def _make_gridshapes_device(**kw):
    from playslot_tpu.data.gridshapes_jax import GridShapesOnDevice
    return GridShapesOnDevice(**kw)


DATASETS = {
    "GridShapes": lambda **kw: GridShapes(**kw),
    "GridShapes_ExpertDemos": lambda **kw: GridShapesExpertDemos(**kw),
    # XLA-compiled on-device generator (no host I/O in the train loop)
    "GridShapesOnDevice": _make_gridshapes_device,
    "GridShapesOnDevice_ExpertDemos": lambda **kw: __import__(
        "playslot_tpu.data.gridshapes_jax", fromlist=["x"]
    ).GridShapesExpertOnDevice(**kw),
    "GridShapesOnDevice_SceneRandom": lambda **kw: __import__(
        "playslot_tpu.data.gridshapes_jax", fromlist=["x"]
    ).GridShapesSceneRandomOnDevice(**kw),
    "BlockPush": lambda **kw: BlockPush(**kw),
    "BlockPush_ExpertDemos": lambda **kw: BlockPushExpertDemos(**kw),
    "ButtonPress": lambda **kw: ButtonPress(**kw),
    "ButtonPress_ExpertDemos": lambda **kw: ButtonPressExpertDemos(**kw),
    "Sketchy": _make_sketchy,
    # snapshot's LeRobot rewiring of ButtonPress (SURVEY.md §0.1)
    "lerobot/aloha_sim_transfer_cube_human": _make_lerobot,
    "ButtonPress_LeRobot": _make_lerobot,
}


def load_data(exp_params, split="train"):
    """Instantiate the dataset named in exp_params (load_data.py:13-69)."""
    cfg = dict(exp_params["dataset"])
    name = cfg.pop("dataset_name")
    if name not in DATASETS:
        raise ValueError(f"Unknown dataset {name}. Available: {list(DATASETS)}")
    cfg.pop("shuffle_train", None)
    cfg.pop("shuffle_eval", None)
    cfg.pop("use_segmentation", None)
    cfg.pop("target", None)
    cfg.pop("variant", None)
    return DATASETS[name](split=split, **cfg)


class BatchIterator:
    """
    Seeded shuffling batch iterator over an indexable dataset. Collates
    (video, target, meta) samples into stacked numpy arrays.
    """

    def __init__(self, dataset, batch_size, shuffle=True, seed=0, drop_last=True,
                 prefetch=2, process_slice=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = max(prefetch, 1)
        self.epoch = 0
        # multi-process runtime (parallel/distributed.py): (lo, hi) rows of
        # each GLOBAL batch this process loads. The index order is seeded,
        # so every process sees the same global order and materializes only
        # its own contiguous slice; the trainer reassembles the global batch
        # with jax.make_array_from_process_local_data.
        self.process_slice = process_slice

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _collate(self, idxs):
        samples = [self.dataset[int(i)] for i in idxs]
        videos = np.stack([s[0] for s in samples])
        targets = np.stack([s[1] for s in samples])
        metas = {}
        keys = samples[0][2].keys() if isinstance(samples[0][2], dict) else []
        for k in keys:
            vals = [np.asarray(s[2][k]) for s in samples]
            if vals[0].size > 0 and all(v.shape == vals[0].shape for v in vals):
                metas[k] = np.stack(vals)
        return videos, targets, metas

    def __iter__(self):
        """Background-thread prefetch: the next batch is assembled on the
        host while the device crunches the current one."""
        import queue
        import threading

        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        self.epoch += 1

        starts = [s for s in range(0, n, self.batch_size)
                  if len(order[s:s + self.batch_size]) == self.batch_size
                  or not self.drop_last]
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        failure = []

        def producer():
            # a failing __getitem__/collate must surface in the consumer,
            # not silently truncate the epoch at the sentinel
            try:
                for s in starts:
                    idxs = order[s:s + self.batch_size]
                    if self.process_slice is not None:
                        idxs = idxs[self.process_slice[0]:self.process_slice[1]]
                    q.put(self._collate(idxs))
            except BaseException as e:  # noqa: BLE001 — re-raised below
                failure.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if failure:
                    raise failure[0]
                return
            yield item


def build_data_loader(dataset, batch_size=64, shuffle=False, seed=None):
    """Mirror of reference build_data_loader (load_data.py:72-92). Under a
    multi-process runtime each process's iterator loads only its
    process_shard rows of every global batch (parallel/distributed.py)."""
    if getattr(dataset, "is_device_dataset", False):
        from playslot_tpu.data.gridshapes_jax import DeviceBatchIterator
        return DeviceBatchIterator(dataset, batch_size=batch_size,
                                   shuffle=shuffle,
                                   seed=seed if seed is not None
                                   else CONFIG["random_seed"])
    process_slice = None
    import jax
    if jax.process_count() > 1:
        from playslot_tpu.parallel.distributed import process_shard
        process_slice = process_shard(batch_size)
    return BatchIterator(dataset, batch_size=batch_size, shuffle=shuffle,
                         seed=seed if seed is not None else CONFIG["random_seed"],
                         process_slice=process_slice)


def unwrap_batch_data(exp_params, batch_data):
    """
    Adapt a batch to (videos, targets, initializer_kwargs, others)
    (reference load_data.py:95-107).
    """
    videos, targets, metas = batch_data
    initializer_kwargs = {}
    others = {}
    if isinstance(metas, dict) and "actions" in metas:
        others["actions"] = metas["actions"]
    if isinstance(metas, dict) and "masks" in metas:
        others["masks"] = metas["masks"]
    return videos, targets, initializer_kwargs, others
