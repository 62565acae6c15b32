"""
Checkpoint I/O (orbax).

Capability parity with reference src/lib/setup_model.py:192-297
(save_checkpoint / load_checkpoint): checkpoints bundle model params,
mutable VQ state, optimizer state and step/epoch counters, named
`checkpoint_epoch_{N|final}` plus a `checkpoint_last_saved` alias. Legacy
.pth checkpoints are handled by playslot_tpu.utils.convert.
"""

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, state_dict):
    """Save a pytree dict to `path` (directory, orbax StandardCheckpointer)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_numpy_tree(state_dict), force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path, target=None):
    """Load a pytree dict saved by save_checkpoint."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)


def checkpoint_name(epoch=None, final=False, prefix="checkpoint"):
    if final:
        return f"{prefix}_epoch_final"
    return f"{prefix}_epoch_{epoch}"
