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

    # precision pinned: an ambient jax.default_matmul_precision("highest")
    # context would otherwise request fp32 contract precision on bf16
    # operands, which Mosaic rejects ("Bad lhs type")
    dots = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * scale     # (S, N)

    # softmax over the SLOT axis (competition), per location
    m = jnp.max(dots, axis=0, keepdims=True)
    e = jnp.exp(dots - m)
    attn = e / jnp.sum(e, axis=0, keepdims=True) + epsilon

    # renormalize each slot over locations -> weighted mean
    attn_n = attn / jnp.sum(attn, axis=1, keepdims=True)
    upd = jax.lax.dot_general(
        attn_n.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    upd_ref[0] = upd.astype(upd_ref.dtype)
    attn_ref[0] = attn.astype(attn_ref.dtype)


def _pallas_forward(q, k, v, epsilon, interpret):
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


def _xla_reference(q, k, v, epsilon):
    """ops.slot_attention.slot_attention_iteration's XLA math (one source of
    truth — called with allow_pallas=False so it can't recurse here), used to
    derive the backward pass of the custom_vjp below: gradients of the Pallas
    path therefore match the XLA fallback to float tolerance by construction,
    and any future change to the fallback changes this backward with it."""
    from playslot_tpu.ops.slot_attention import slot_attention_iteration

    return slot_attention_iteration(q, k, v, epsilon=epsilon,
                                    allow_pallas=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def slot_attention_iteration_pallas(q, k, v, epsilon=1e-8, interpret=False):
    """Pallas version of ops.slot_attention.slot_attention_iteration.

    Differentiable: the fused kernel runs the forward pass; the backward pass
    recomputes the (tiny) intermediates in XLA and applies the analytic VJP
    of the reference math, so the kernel is live on TRAINING paths too (the
    round-1 version silently fell back during training,
    models/slot_attention.py:67)."""
    return _pallas_forward(q, k, v, epsilon, interpret)


def _fwd(q, k, v, epsilon, interpret):
    out = _pallas_forward(q, k, v, epsilon, interpret)
    return out, (q, k, v)


def _bwd(epsilon, interpret, res, cotangents):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, epsilon),
                     q, k, v)
    return vjp(cotangents)


slot_attention_iteration_pallas.defvjp(_fwd, _bwd)
