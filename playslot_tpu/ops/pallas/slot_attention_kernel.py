"""
Fused Pallas TPU kernel for the inverted slot-attention iteration
(SURVEY.md §2.4 item 1): QK^T -> softmax over SLOTS -> eps-renormalize over
locations -> weighted-mean update, in one VMEM-resident pass per batch row.

The XLA fallback is ops/slot_attention.slot_attention_iteration; dispatch is
controlled by playslot_tpu.ops.dispatch.use_pallas().
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, upd_ref, attn_ref, *, epsilon):
    q = q_ref[0].astype(jnp.float32)          # (S, D)
    k = k_ref[0].astype(jnp.float32)          # (N, D)
    v = v_ref[0]                               # (N, D)
    scale = q.shape[-1] ** -0.5

    dots = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (S, N)

    # softmax over the SLOT axis (competition), per location
    m = jnp.max(dots, axis=0, keepdims=True)
    e = jnp.exp(dots - m)
    attn = e / jnp.sum(e, axis=0, keepdims=True) + epsilon

    # renormalize each slot over locations -> weighted mean
    attn_n = attn / jnp.sum(attn, axis=1, keepdims=True)
    upd = jax.lax.dot_general(
        attn_n.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    upd_ref[0] = upd.astype(upd_ref.dtype)
    attn_ref[0] = attn.astype(attn_ref.dtype)


def slot_attention_iteration_pallas(q, k, v, epsilon=1e-8, interpret=False):
    """Pallas version of ops.slot_attention.slot_attention_iteration."""
    B, S, D = q.shape
    N = k.shape[1]
    kernel = functools.partial(_kernel, epsilon=epsilon)
    upd, attn = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, D), v.dtype),
            jax.ShapeDtypeStruct((B, S, N), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v)
    return upd, attn
