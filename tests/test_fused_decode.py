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


def test_chunked_decode_small_batch_falls_back(rng):
    """A batch smaller than num_chunks cannot be split — the knob becomes a
    no-op (one unchunked call) instead of crashing the B=1 stochastic eval
    (ops/chunked.py fallback)."""
    model = SAVi(**MODEL_KW)
    x = jax.random.uniform(rng, (1, 2, 16, 16, 3))
    params = model.init({"params": rng, "slots": rng}, x)
    slots = jax.random.normal(jax.random.PRNGKey(9), (1, 3, 4, 32)) * 0.5

    full = model.apply(params, slots, method=lambda m, s: m.decode_fast(s))
    chunked = model.apply(params, slots,
                          method=lambda m, s: m.decode_fast_chunked(s, 4))
    for a, b, name in zip(full, chunked, ("combined", "recons", "masks")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_chunked_apply_pytree_and_remat_grads(rng):
    """chunked_apply re-assembles arbitrary output pytrees and its remat
    wrapping leaves gradients identical (incl. through closed-over params)."""
    from playslot_tpu.ops.chunked import chunked_apply

    w = jax.random.normal(rng, (8, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))

    def fn_of(w):
        return lambda v: {"y": v @ w,
                          "z": (jnp.tanh(v), jnp.sum(v * v, axis=-1))}

    ref = fn_of(w)(x)
    for chunks, remat in ((2, False), (2, True), (4, True)):
        out = chunked_apply(fn_of(w), x, chunks, remat=remat)
        np.testing.assert_allclose(np.asarray(out["y"]),
                                   np.asarray(ref["y"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["z"][0]),
                                   np.asarray(ref["z"][0]), atol=1e-6)
        # per-example reductions keep their leading batch dim — shape (B,)
        assert out["z"][1].shape == (4,)

    def loss_plain(w):
        return jnp.sum(fn_of(w)(x)["y"] ** 2)

    def loss_chunked(w):
        return jnp.sum(chunked_apply(fn_of(w), x, 2, remat=True)["y"] ** 2)

    g0 = jax.grad(loss_plain)(w)
    g1 = jax.grad(loss_chunked)(w)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               atol=1e-5, rtol=1e-5)
