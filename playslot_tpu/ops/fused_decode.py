"""
Fused spatial-broadcast decode — the SAVi decoder hot path (SURVEY.md §2.4
item 2), rewritten algebraically for TPU.

The naive decode builds, for every (batch x sample x frame x slot) map, the
tensor `broadcast(slot) + pos_emb` of shape (H, W, slot_dim) and convolves
it — at production scale that materializes ~8 GB of activations whose first
conv consumes >60% of all decode FLOPs on *spatially constant* data.

Because the first conv input is `s + e(p)` with `s` constant over space:

    conv1(s + e)(p) = A(p) @ s + conv1(e)(p) + b

where A(p) = sum of kernel taps valid at pixel p (only border pixels differ
— for a k x k kernel there are at most k x k distinct (row, col) clip
classes). So layer 1 collapses to:
  * ONE single-map conv over the position embedding (shared by all maps),
  * a tiny per-slot einsum against the (k x k class) tap-sum table,
  * a gather/broadcast into the output layout.

Exact to float reassociation; parity-tested against the naive decoder.
Requires stride 1, padding k//2, no BN, upsample<=1 (the shipped configs).
"""

import numpy as np
import jax
import jax.numpy as jnp


def _clip_classes(size, k, pad):
    """
    For each spatial position, the class id of its valid-tap interval, plus
    the (lo, hi) tap bounds per class. Returns (class_of_pos [size],
    bounds [n_classes, 2]).
    """
    lo = np.maximum(0, pad - np.arange(size))
    hi = np.minimum(k, size + pad - np.arange(size))
    pairs = sorted({(int(a), int(b)) for a, b in zip(lo, hi)})
    index = {p: i for i, p in enumerate(pairs)}
    cls = np.array([index[(int(a), int(b))] for a, b in zip(lo, hi)])
    return cls, np.array(pairs)


def fused_first_conv(slots, e_map, kernel, bias, H, W):
    """
    Equivalent of conv_k(broadcast(slots) + e_map) for all slot maps.

    Args:
        slots: (M, D) flattened slot vectors (one per decode map).
        e_map: (H, W, D) position-embedding projection (grid term only,
               including the pos-emb bias).
        kernel: (k, k, D, C) first-conv kernel.
        bias: (C,) first-conv bias.

    Returns (M, H, W, C).
    """
    k = kernel.shape[0]
    pad = k // 2
    rcls, rbounds = _clip_classes(H, k, pad)
    ccls, cbounds = _clip_classes(W, k, pad)
    nr, nc = len(rbounds), len(cbounds)

    # tap-sum table A[rc, cc] = sum over valid taps -> (nr, nc, D, C)
    row_sums = jnp.stack([kernel[lo:hi].sum(axis=0) for lo, hi in rbounds])
    table = jnp.stack([row_sums[:, lo:hi].sum(axis=1) for lo, hi in cbounds],
                      axis=1)  # (nr, nc, D, C)

    # per-slot contribution per class: (M, nr, nc, C)
    slot_terms = jnp.einsum("md,rcdo->mrco", slots, table,
                            preferred_element_type=jnp.float32).astype(slots.dtype)
    # classes -> pixels via one-hot contraction (TPU gathers are slow)
    r1h = jax.nn.one_hot(jnp.asarray(rcls), nr, dtype=slots.dtype)  # (H, nr)
    c1h = jax.nn.one_hot(jnp.asarray(ccls), nc, dtype=slots.dtype)  # (W, nc)
    slot_part = jnp.einsum("hr,wc,mrco->mhwo", r1h, c1h, slot_terms,
                           preferred_element_type=jnp.float32).astype(slots.dtype)

    # shared positional part: ONE conv over a single map (+ conv bias)
    dn = ("NHWC", "HWIO", "NHWC")
    e_part = jax.lax.conv_general_dilated(
        e_map[None].astype(slots.dtype), kernel.astype(slots.dtype), (1, 1),
        [(pad, pad), (pad, pad)], dimension_numbers=dn)[0] + bias.astype(slots.dtype)

    return slot_part + e_part[None]


def fused_broadcast_decode(slots, grid, pos_params, dec_params, hidden_dims,
                           kernel_size, out_channels, resolution, dtype=None):
    """
    Full fused decode: slots (..., S, D) -> rgba (..., S, H, W, out_channels).

    pos_params: {"projection": {kernel, bias}} of the decoder SoftPositionEmbed.
    dec_params: ConvDecoder params {"block_i": {"conv": {...}}, "final_conv"}.
    grid: (H, W, 4) coordinate grid.
    """
    H, W = resolution
    lead = slots.shape[:-1]
    D = slots.shape[-1]
    flat = slots.reshape(-1, D)
    if dtype is not None:
        flat = flat.astype(dtype)

    # position-embedding projection of the grid (the only spatially-varying
    # part of the decoder input)
    pk = pos_params["projection"]["kernel"]
    pb = pos_params["projection"]["bias"]
    e_map = jnp.dot(grid.astype(flat.dtype), pk.astype(flat.dtype)) \
        + pb.astype(flat.dtype)

    n = len(hidden_dims)
    # reversed traversal (block_0 corresponds to hidden_dims[-1])
    first = dec_params["block_0"]["conv"]
    x = fused_first_conv(flat, e_map, first["kernel"].astype(flat.dtype),
                         first["bias"].astype(flat.dtype), H, W)
    x = jax.nn.relu(x)

    dn = ("NHWC", "HWIO", "NHWC")
    pad = kernel_size // 2
    for i in range(1, n):
        blk = dec_params[f"block_{i}"]["conv"]
        x = jax.lax.conv_general_dilated(
            x, blk["kernel"].astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=dn) + blk["bias"].astype(x.dtype)
        x = jax.nn.relu(x)
    fin = dec_params["final_conv"]
    x = jax.lax.conv_general_dilated(
        x, fin["kernel"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn) + fin["bias"].astype(x.dtype)
    return x.reshape(*lead, H, W, out_channels)
