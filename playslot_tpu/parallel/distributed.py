"""
Multi-process (multi-host) runtime setup.

The reference is strictly single-process (SURVEY.md §2.5); this is new
TPU-native surface: each host process joins the JAX distributed runtime,
loads its shard of the data, and participates in the global mesh. Gradient
all-reduce and eval gathers are XLA collectives inserted under jit — there
is no hand-written communication code anywhere in the framework.
"""

import os

import jax
import numpy as np


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """
    Join the JAX distributed runtime (no-op for single-process runs).
    Arguments default to the standard JAX env vars / TPU auto-detection.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("PLAYSLOT_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def process_shard(num_items, process_index=None, process_count=None):
    """
    Contiguous [start, end) range of dataset indices owned by this process —
    per-host data sharding for the input pipeline.
    """
    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    per = -(-num_items // pc)
    start = pi * per
    return start, min(start + per, num_items)


def shard_dataset_indices(num_items, seed=0, shuffle=True):
    """Globally-consistent shuffled order, sliced per process."""
    order = np.arange(num_items)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    start, end = process_shard(num_items)
    return order[start:end]
