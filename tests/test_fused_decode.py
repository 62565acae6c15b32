"""Parity: fused spatial-broadcast decode vs the naive decode path."""

import numpy as np
import jax
import jax.numpy as jnp

from playslot_tpu.models.savi import SAVi
from tests.test_savi_forward import MODEL_KW


def test_fused_decode_matches_naive(rng):
    model = SAVi(**MODEL_KW)
    x = jax.random.uniform(rng, (2, 2, 16, 16, 3))
    params = model.init({"params": rng, "slots": rng}, x)
    slots = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 4, 32)) * 0.5

    naive = model.apply(params, slots, method=lambda m, s: m.decode(s))
    fused = model.apply(params, slots, method=lambda m, s: m.decode_fast(s))

    for a, b, name in zip(naive, fused, ("combined", "recons", "masks")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                                   rtol=1e-4, err_msg=name)


def test_fused_decode_jits_and_grads(rng):
    model = SAVi(**MODEL_KW)
    x = jax.random.uniform(rng, (1, 2, 16, 16, 3))
    params = model.init({"params": rng, "slots": rng}, x)
    slots = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 4, 32)) * 0.5

    @jax.jit
    def loss(p, s):
        combined, _, _ = model.apply(p, s, method=lambda m, z: m.decode_fast(z))
        return jnp.mean(combined ** 2)

    g = jax.grad(lambda s: loss(params, s))(slots)
    assert np.all(np.isfinite(np.asarray(g)))


def test_chunked_decode_matches_unchunked(rng):
    """decode_fast_chunked (lax.map over batch chunks) is numerically
    identical to decode_fast — same per-chunk program, different schedule."""
    model = SAVi(**MODEL_KW)
    x = jax.random.uniform(rng, (4, 2, 16, 16, 3))
    params = model.init({"params": rng, "slots": rng}, x)
    slots = jax.random.normal(jax.random.PRNGKey(9), (4, 3, 4, 32)) * 0.5

    full = model.apply(params, slots, method=lambda m, s: m.decode_fast(s))
    for chunks in (2, 4):
        chunked = jax.jit(lambda p, s: model.apply(
            p, s, method=lambda m, z: m.decode_fast_chunked(z, chunks)))(
                params, slots)
        for a, b, name in zip(full, chunked, ("combined", "recons", "masks")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6,
                                       err_msg=f"chunks={chunks} {name}")


def test_chunked_decode_rejects_indivisible(rng):
    import pytest
    model = SAVi(**MODEL_KW)
    x = jax.random.uniform(rng, (3, 2, 16, 16, 3))
    params = model.init({"params": rng, "slots": rng}, x)
    slots = jax.random.normal(jax.random.PRNGKey(9), (3, 3, 4, 32))
    with pytest.raises(ValueError, match="divisible"):
        model.apply(params, slots,
                    method=lambda m, s: m.decode_fast_chunked(s, 2))
