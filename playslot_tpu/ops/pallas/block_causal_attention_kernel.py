"""
Fused Pallas TPU kernel for block-staircase causal attention over
(frame x slot) token sequences (SURVEY.md §2.4 item 3): the mask
"token of frame i attends to all slots of frames <= i" is computed inline
from iota (never materialized in HBM), and QK^T -> mask -> softmax -> AV
runs in one VMEM-resident pass per (batch*head).

Sequences here are tiny (<= context_length * num_slots ~ 64-80 tokens), so
one block per (batch, head) with everything resident is the right shape.
XLA fallback: the masked MultiHeadAttention in models/blocks.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, num_slots, scale):
    q = q_ref[0].astype(jnp.float32)   # (T, Dh)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    T = q.shape[0]

    # precision pinned: ambient "highest" contexts request fp32 contract
    # precision, which Mosaic rejects on bf16 operands ("Bad lhs type")
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * scale       # (T, T)

    frame_q = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0) // num_slots
    frame_k = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1) // num_slots
    logits = jnp.where(frame_k <= frame_q, logits, jnp.float32(-1e9))

    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=1, keepdims=True)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_forward(q, k, v, num_slots, interpret):
    BH, T, Dh = q.shape
    scale = Dh ** -0.5
    kernel = functools.partial(_kernel, num_slots=num_slots, scale=scale)
    spec = pl.BlockSpec((1, T, Dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, T, Dh), v.dtype),
        interpret=interpret,
    )(q, k, v)


def _xla_reference(q, k, v, num_slots):
    """Staircase-masked attention in plain XLA — the math of the masked
    MultiHeadAttention path, used to derive the backward pass. The mask is
    ops.masks.build_slot_causal_mask (one source of truth with the module
    path), not a local re-derivation."""
    from playslot_tpu.ops.masks import build_slot_causal_mask

    T = q.shape[1]
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("btd,bkd->btk", q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = build_slot_causal_mask(T // num_slots, num_slots, dtype=jnp.bool_)
    logits = jnp.where(mask, logits, jnp.float32(-1e9))
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("btk,bkd->btd", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def block_causal_attention_pallas(q, k, v, num_slots, interpret=False):
    """
    Args: q/k/v (BH, T, Dh) with T = num_frames * num_slots.
    Returns (BH, T, Dh) attention output with the staircase mask applied.

    Differentiable (custom_vjp): the fused kernel runs the forward; the
    backward recomputes intermediates in XLA and applies the analytic VJP, so
    SlotGPT can run this kernel in training as well as AR decode.
    """
    return _pallas_forward(q, k, v, num_slots, interpret)


def _fwd(q, k, v, num_slots, interpret):
    return _pallas_forward(q, k, v, num_slots, interpret), (q, k, v)


def _bwd(num_slots, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, num_slots),
                     q, k, v)
    return vjp(g)


block_causal_attention_pallas.defvjp(_fwd, _bwd)
