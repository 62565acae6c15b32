"""
Decoder-stack Pallas kernel, v2: row-im2col formulation.

v1 (decoder_stack_kernel.py) issues 25 small (H*W, C) @ (C, C) matmuls per
layer — K=N=C=64 underfills the MXU. v2 builds, per kernel row ky, a
(H*W, k*C) block by concatenating the k column-shifted slices in VMEM and
issues ONE (H*W, k*C) @ (k*C, C) matmul — K grows to k*C (320 for the
shipped decoders), trading VMEM copy traffic for much wider MXU feeds.

Same contract as v1: all hidden layers + final conv fused per map, borders
zero-padded in a VMEM scratch, f32 accumulation, bias+ReLU fused.

Status: exact in interpret mode; at production scale (64x64x64 maps) Mosaic
reports a 24.2 MB scoped-VMEM stack (> 16 MB) — the unrolled ky accumulation
keeps several (H*W, k*C) temporaries live. Needs row-strip blocking
(process ~16 rows per inner step) before it can run on-chip; v1 remains the
runnable pallas backend and XLA the production path (docs/PERFORMANCE.md).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, wf_ref, bf_ref, o_ref, pad_ref, cols_ref, *,
            H, W, C, CO, L, k, kf):
    p = k // 2
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[p:p + H, p:p + W, :] = x_ref[0]

    def layer(w_rows, bias, taps, out_c):
        """w_rows: (taps, taps*C, out_c) — per-row tap-concatenated weights."""
        off = p - taps // 2
        acc = jnp.zeros((H * W, out_c), jnp.float32) + bias.astype(jnp.float32)
        for ky in range(taps):
            # build (H, W, taps*C) = concat of column-shifted slices
            for kx in range(taps):
                cols_ref[:, :, kx * C:(kx + 1) * C] = \
                    pad_ref[off + ky:off + ky + H, off + kx:off + kx + W, :]
            acc += jax.lax.dot_general(
                cols_ref[:, :, :taps * C].reshape(H * W, taps * C), w_rows[ky],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        return acc

    for l in range(L):
        acc = layer(w_ref[l], b_ref[l], k, C)
        acc = jnp.maximum(acc, 0.0)
        pad_ref[p:p + H, p:p + W, :] = acc.reshape(H, W, C).astype(pad_ref.dtype)

    acc = layer(wf_ref[...], bf_ref[...], kf, CO)
    o_ref[0] = acc.reshape(H, W, CO).astype(o_ref.dtype)


def decoder_stack_pallas_v2(x, weights, biases, w_final, b_final,
                            kernel_size=5, final_kernel=3, interpret=False):
    """Same signature/semantics as decoder_stack_pallas (v1)."""
    M, H, W, C = x.shape
    L = weights.shape[0]
    CO = w_final.shape[-1]
    k, kf = kernel_size, final_kernel
    p = k // 2
    assert kf // 2 <= p

    # pre-concatenate weights per kernel row: (L, k, k*C, C)
    w_rows = weights.reshape(L, k, k * C, C)
    # final: pad tap-concat width up to k*C-compatible layout
    wf_rows = w_final.reshape(kf, kf * C, CO)

    kern = functools.partial(_kernel, H=H, W=W, C=C, CO=CO, L=L, k=k, kf=kf)
    full = lambda shape: pl.BlockSpec(
        shape, lambda m: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda m: (m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(w_rows.shape),
            full(biases.shape),
            full(wf_rows.shape),
            full(b_final.shape),
        ],
        out_specs=pl.BlockSpec((1, H, W, CO), lambda m: (m, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, H, W, CO), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 2 * p, W + 2 * p, C), x.dtype),
            pltpu.VMEM((H, W, k * C), x.dtype),
        ],
        interpret=interpret,
    )(x, w_rows, biases, wf_rows, b_final)
