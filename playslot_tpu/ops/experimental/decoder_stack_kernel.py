"""
Fused Pallas TPU kernel for the spatial-broadcast decoder conv stack
(SURVEY.md §2.4 item 5): ALL hidden 5x5 conv layers + the final 3x3 conv of
one decode map run in a single kernel with every intermediate resident in
VMEM — the XLA path writes/reads each layer's activations through HBM
(~1 MB per layer per map, thousands of maps per step).

Layout per grid program (= one decode map):
  * padded activation scratch (H+2p, W+2p, C) bf16 — borders stay zero,
    the center is overwritten after each layer;
  * each layer accumulates 25 (H*W, C) @ (C, C) tap-matmuls in f32
    (K=C keeps the MXU pipeline busy; no im2col materialization);
  * bias + ReLU fused; final 3x3 projects to out_channels.

Status (v5e measurements, 1920 maps of 64x64x64, 3 hidden + final):
  * 1.6x faster than the equivalent ISOLATED XLA conv stack (173 vs 275 ms),
    exact in f32 interpret mode, bf16 maxdiff 0.03 vs XLA (accumulation
    order);
  * however XLA's conv lowering inside the full fused decode program reaches
    ~80 TF/s in context, which this kernel's 25-tap small-matmul formulation
    (K=N=64) does not beat yet — so the production decode path stays on XLA
    and this kernel is an alternative backend. Next step: im2col to K=5*C in
    VMEM per row-tap to feed the MXU wider.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, wf_ref, bf_ref, o_ref, pad_ref, *, H, W, C,
            CO, L, k, kf):
    p = k // 2
    pf = kf // 2

    # zero the padded scratch once; borders then stay zero across layers
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[p:p + H, p:p + W, :] = x_ref[0]

    def conv_layer(w, b, taps, out_c, last_pad):
        acc = jnp.zeros((H * W, out_c), jnp.float32) + b.astype(jnp.float32)
        for ky in range(taps):
            for kx in range(taps):
                patch = pad_ref[last_pad - taps // 2 + ky:
                                last_pad - taps // 2 + ky + H,
                                last_pad - taps // 2 + kx:
                                last_pad - taps // 2 + kx + W, :]
                acc += jax.lax.dot_general(
                    patch.reshape(H * W, C), w[ky, kx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
        return acc

    for l in range(L):  # static: hidden 5x5 conv + ReLU layers
        acc = conv_layer(w_ref[l], b_ref[l], k, C, p)
        acc = jnp.maximum(acc, 0.0)
        pad_ref[p:p + H, p:p + W, :] = acc.reshape(H, W, C).astype(pad_ref.dtype)

    # final 3x3 conv (no activation)
    acc = conv_layer(wf_ref[...], bf_ref[...], kf, CO, p)
    o_ref[0] = acc.reshape(H, W, CO).astype(o_ref.dtype)


def decoder_stack_pallas(x, weights, biases, w_final, b_final, kernel_size=5,
                         final_kernel=3, interpret=False):
    """
    Args:
        x: (M, H, W, C) input maps (output of the fused first layer, bf16/f32).
        weights: (L, k, k, C, C) hidden conv kernels.
        biases: (L, C).
        w_final: (kf, kf, C, CO), b_final: (CO,).

    Returns (M, H, W, CO).
    """
    M, H, W, C = x.shape
    L = weights.shape[0]
    CO = w_final.shape[-1]
    k, kf = kernel_size, final_kernel
    p = k // 2
    assert kf // 2 <= p, "final kernel must not need more padding than hidden"

    kernel = functools.partial(_kernel, H=H, W=W, C=C, CO=CO, L=L, k=k, kf=kf)
    full = lambda shape: pl.BlockSpec(
        shape, lambda m: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda m: (m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(weights.shape),
            full(biases.shape),
            full(w_final.shape),
            full(b_final.shape),
        ],
        out_specs=pl.BlockSpec((1, H, W, CO), lambda m: (m, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, H, W, CO), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2 * p, W + 2 * p, C), x.dtype)],
        interpret=interpret,
    )(x, weights, biases, w_final, b_final)
