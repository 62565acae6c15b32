"""
Attention masking patterns for (frame x slot) token sequences.

Capability parity with reference src/models/BlocksUtils/model_utils.py:115-124
(`build_slot_causal_mask`) and src/models/Downstream/behavior_predictor.py:36-49.
Built with broadcasted iota comparisons (static, XLA-friendly) instead of a
Python fill loop.
"""

import jax.numpy as jnp
import jax


def build_slot_causal_mask(seq_len, num_slots, dtype=jnp.float32):
    """
    Block-'staircase' causal mask over (seq_len * num_slots) tokens:
    the token of frame i may attend to ALL slots of frames <= i
    (including every slot of its own frame).

    Returns a (T, T) array with 1.0 = attend, 0.0 = masked, T = seq_len*num_slots.
    """
    n = seq_len * num_slots
    frame_q = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // num_slots
    frame_k = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // num_slots
    return (frame_k <= frame_q).astype(dtype)


def build_behavior_causal_mask(seq_len, num_slots, dtype=jnp.float32):
    """
    Staircase mask that ADDITIONALLY hides the [ACT] token (slot index 0)
    of all *previous* frames — used by behavior-cloning transformers so the
    policy cannot peek at past action summaries.
    """
    n = seq_len * num_slots
    frame_q = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // num_slots
    frame_k = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // num_slots
    slot_k = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) % num_slots
    staircase = frame_k <= frame_q
    prev_act_token = (slot_k == 0) & (frame_k < frame_q)
    return (staircase & ~prev_act_token).astype(dtype)
