"""
Fused Pallas TPU kernel for VQ nearest-codeword search
(SURVEY.md §2.4 item 4): pairwise squared-L2 against the codebook + argmin +
codeword gather (as a one-hot matmul — TPU-friendly) in one pass.

XLA fallback: ops/vq.nearest_codeword.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(z_ref, cb_ref, zq_ref, idx_ref):
    z = z_ref[...].astype(jnp.float32)        # (M, D)
    cb = cb_ref[...].astype(jnp.float32)      # (N, D)

    z2 = jnp.sum(z * z, axis=1, keepdims=True)
    c2 = jnp.sum(cb * cb, axis=1, keepdims=True)
    zc = jax.lax.dot_general(z, cb, dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
    dist = z2 - 2.0 * zc + c2.T               # (M, N)

    idx = jnp.argmin(dist, axis=1)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
              == idx[:, None]).astype(jnp.float32)
    zq = jax.lax.dot_general(onehot, cb,
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
    zq_ref[...] = zq.astype(zq_ref.dtype)
    idx_ref[...] = idx.astype(jnp.int32)[:, None]


def _pallas_forward(z, codebook, interpret):
    lead = z.shape[:-1]
    D = z.shape[-1]
    zf = z.reshape(-1, D)
    M = zf.shape[0]
    zq, idx = pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((M, D), z.dtype),
                   jax.ShapeDtypeStruct((M, 1), jnp.int32)),
        interpret=interpret,
    )(zf, codebook)
    return zq.reshape(*lead, D), idx.reshape(lead).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def nearest_codeword_pallas(z, codebook, interpret=False):
    """Pallas version of ops.vq.nearest_codeword; z (..., D), codebook (N, D).

    Differentiable (custom_vjp): the VQ commit loss back-propagates through
    the codeword gather into the codebook (models/quantization.py:92 for the
    non-EMA quantizer), so the backward scatters the z_q cotangent onto the
    selected codewords (argmin itself is piecewise-constant: dz = 0, matching
    XLA's take/argmin gradients).
    """
    return _pallas_forward(z, codebook, interpret)


def _fwd(z, codebook, interpret):
    zq, idx = _pallas_forward(z, codebook, interpret)
    return (zq, idx), (idx, jnp.zeros((codebook.shape[0],), codebook.dtype))


def _bwd(interpret, res, cotangents):
    g_zq, _ = cotangents  # idx is int: no cotangent
    idx, cb_proto = res
    N = cb_proto.shape[0]
    onehot = jax.nn.one_hot(idx.reshape(-1), N, dtype=jnp.float32)
    g_cb = jnp.einsum("mn,md->nd", onehot,
                      g_zq.reshape(-1, g_zq.shape[-1]).astype(jnp.float32))
    return jnp.zeros_like(g_zq), g_cb.astype(cb_proto.dtype)


nearest_codeword_pallas.defvjp(_fwd, _bwd)
