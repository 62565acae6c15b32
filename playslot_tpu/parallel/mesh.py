"""
Device mesh + sharding rules.

The reference has NO distributed code (SURVEY.md §2.5) — multi-chip scaling
is new surface designed TPU-first: a (data, model) mesh where
  * the batch axis is sharded over 'data' (gradient all-reduce rides ICI via
    XLA-inserted collectives under jit),
  * the wide transformer MLP + attention projection kernels are sharded over
    'model' (tensor parallelism; modest model sizes make this optional, but
    the axis is first-class so larger variants scale without rework).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, model_parallel=1, devices=None):
    """Create a (data, model) mesh over the first n_devices."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, f"{n=} not divisible by {model_parallel=}"
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh):
    """Shard the leading batch axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _param_spec(path, leaf, model_size):
    """
    Rule-based tensor-parallel layout:
      * transformer MLP up-projection kernels: shard output dim over 'model'
      * MLP down-projection kernels: shard input dim over 'model'
      * attention q/k/v kernels: shard heads (output dim) over 'model'
      * attention out_proj kernels: shard input dim over 'model'
      * everything else: replicated
    """
    name = "/".join(str(getattr(p, "key", p)) for p in path)
    if model_size == 1 or leaf.ndim != 2:
        return P()
    d_in, d_out = leaf.shape
    if name.endswith("mlp/Dense_0/kernel") and d_out % model_size == 0:
        return P(None, "model")
    if name.endswith("mlp/Dense_1/kernel") and d_in % model_size == 0:
        return P("model", None)
    if any(name.endswith(f"attn/{q}/kernel") for q in ("q", "k", "v")) \
            and d_out % model_size == 0:
        return P(None, "model")
    if name.endswith("attn/out_proj/kernel") and d_in % model_size == 0:
        return P("model", None)
    return P()


def param_shardings(params, mesh):
    """NamedSharding pytree for a params (or full state) pytree."""
    model_size = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf, model_size)),
        params)


def shard_params(params, mesh):
    """Place a host pytree onto the mesh according to param_shardings."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
