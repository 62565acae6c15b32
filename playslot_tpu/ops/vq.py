"""
Vector-quantization primitives: pairwise L2 search + codeword lookup.

Capability parity with reference src/models/BlocksUtils/quantization.py:256-294
(`VectorQuantizer.forward_one`): nearest codeword under squared-L2.
The straight-through estimator and the EMA codebook update live in
playslot_tpu/models/quantization.py where the state is managed.
"""

import jax.numpy as jnp


def pairwise_sq_dist(x, y):
    """
    Squared euclidean distances between rows of x (M, D) and rows of y (N, D).
    Same expansion as reference quantization.py:18-20 (L2_efficient).
    Returns (M, N).
    """
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    y2 = jnp.sum(y * y, axis=1, keepdims=True).T
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    return x2 - 2.0 * xy + y2


def nearest_codeword(z, codebook, allow_pallas=True):
    """
    Nearest-codeword search.

    Args:
        z: (..., D) embeddings.
        codebook: (N, D) codewords.

    Returns:
        z_q: (..., D) quantized embeddings (gathered codewords).
        idx: (...,) int32 indices of the nearest codeword.
    """
    if allow_pallas:
        from playslot_tpu.ops.dispatch import pallas_interpret, use_pallas
        if use_pallas("vq"):
            from playslot_tpu.ops.pallas.vq_kernel import nearest_codeword_pallas
            return nearest_codeword_pallas(z, codebook,
                                           interpret=pallas_interpret())
    lead_shape = z.shape[:-1]
    zf = z.reshape(-1, z.shape[-1])
    dist = pairwise_sq_dist(zf, codebook)
    idx = jnp.argmin(dist, axis=1)
    z_q = jnp.take(codebook, idx, axis=0)
    return z_q.reshape(*lead_shape, -1), idx.reshape(lead_shape).astype(jnp.int32)
