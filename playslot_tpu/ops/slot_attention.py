"""
The inverted-attention inner iteration of Slot Attention.

Capability parity with reference src/models/BlocksUtils/attention.py:100-117:
softmax over the SLOT axis (competition between slots for input locations),
epsilon-stabilized re-normalization over locations, weighted-mean update.

The GRU refinement + residual MLP stay in the linen module (they carry
parameters); this op is the fusion target for the Pallas kernel
(playslot_tpu/ops/pallas/slot_attention_kernel.py).
"""

import jax
import jax.numpy as jnp


def slot_attention_iteration(q, k, v, epsilon=1e-8, allow_pallas=False):
    """
    One inverted cross-attention step.

    Args:
        q: (B, S, D) slot queries.
        k: (B, N, D) input keys.
        v: (B, N, D) input values.
        epsilon: stabilizer added to the slot-softmax before renormalization.

    Returns:
        updates: (B, S, D) weighted-mean update per slot.
        attn:    (B, S, N) slot-competition attention (pre-renormalization),
                 matching the reference's stored `attention_masks`.
    """
    if allow_pallas:
        from playslot_tpu.ops.dispatch import pallas_interpret, use_pallas
        if use_pallas("slot_attention"):
            from playslot_tpu.ops.pallas.slot_attention_kernel import (
                slot_attention_iteration_pallas)
            return slot_attention_iteration_pallas(
                q, k, v, epsilon=epsilon, interpret=pallas_interpret())
    scale = q.shape[-1] ** -0.5
    dots = jnp.einsum("bsd,bnd->bsn", q, k, preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(dots, axis=1) + epsilon  # softmax over slots: competition
    attn_renorm = attn / jnp.sum(attn, axis=-1, keepdims=True)
    updates = jnp.einsum(
        "bsn,bnd->bsd", attn_renorm.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    return updates, attn
