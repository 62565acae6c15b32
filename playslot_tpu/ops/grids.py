"""
Coordinate grids used as positional encodings by SAVi's encoder/decoder.

Capability parity with reference src/models/BlocksUtils/model_utils.py:12-34
(`build_grid`): a 4-channel grid with linear gradients in the (x, -x, y, -y)
directions, values in [vmin, vmax].
"""

import numpy as np
import jax.numpy as jnp


def build_grid(resolution, vmin=-1.0, vmax=1.0, dtype=jnp.float32):
    """
    Returns a (H, W, 4) array with channels [gy, gx, 1-gy, 1-gx] where
    gy/gx are linear ramps from vmin to vmax along each spatial axis.
    Computed host-side once (static) and baked into the program as a constant.
    """
    ranges = [np.linspace(vmin, vmax, num=r) for r in resolution]
    grid = np.stack(np.meshgrid(*ranges, sparse=False, indexing="ij"), axis=-1)
    grid = grid.reshape(resolution[0], resolution[1], -1).astype(np.float32)
    grid = np.concatenate([grid, 1.0 - grid], axis=-1)
    return jnp.asarray(grid, dtype=dtype)
