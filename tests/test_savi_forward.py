"""Shape/smoke tests for the SAVi forward pass."""

import jax
import jax.numpy as jnp
import pytest

from playslot_tpu.models.savi import SAVi


MODEL_KW = dict(
    num_slots=4, slot_dim=32, num_iterations=1, num_iterations_first=2,
    in_channels=3, mlp_hidden=32, mlp_encoder_dim=32,
    initializer="LearnedRandom",
    encoder={"encoder_name": "ConvEncoder",
             "encoder_params": {"num_channels": [16, 16], "kernel_size": 5,
                                "resolution": [16, 16]}},
    decoder={"decoder_name": "ConvDecoder",
             "decoder_params": {"num_channels": [16, 16], "kernel_size": 5,
                                "resolution": [16, 16], "upsample": 1}},
    transition_module_params={"model_name": "TransformerBlock", "num_heads": 2,
                              "head_dim": 8, "mlp_size": 32},
)


def test_savi_forward_shapes(rng):
    model = SAVi(**MODEL_KW)
    B, T, H, W = 2, 3, 16, 16
    x = jax.random.uniform(rng, (B, T, H, W, 3))
    params = model.init({"params": rng, "slots": rng}, x)
    out = model.apply(params, x, rngs={"slots": rng})
    assert out["slot_history"].shape == (B, T, 4, 32)
    assert out["recons_imgs"].shape == (B, T, 16, 16, 3)
    assert out["recons_objs"].shape == (B, T, 4, 16, 16, 3)
    assert out["masks"].shape == (B, T, 4, 16, 16, 1)
    # masks are a convex combination over slots
    mass = out["masks"].sum(axis=2)
    assert jnp.allclose(mass, jnp.ones_like(mass), atol=1e-5)


def test_savi_decode_false(rng):
    model = SAVi(**MODEL_KW)
    x = jax.random.uniform(rng, (2, 3, 16, 16, 3))
    params = model.init({"params": rng, "slots": rng}, x)
    out = model.apply(params, x, decode=False, rngs={"slots": rng})
    assert set(out.keys()) == {"slot_history"}


def test_savi_jit_and_grad(rng):
    model = SAVi(**MODEL_KW)
    x = jax.random.uniform(rng, (2, 3, 16, 16, 3))
    params = model.init({"params": rng, "slots": rng}, x)

    @jax.jit
    def loss_fn(p, x, key):
        out = model.apply(p, x, rngs={"slots": key})
        return jnp.mean((out["recons_imgs"] - x) ** 2)

    g = jax.grad(loss_fn)(params, x, rng)
    flat = jax.tree_util.tree_leaves(g)
    assert all(jnp.all(jnp.isfinite(l)) for l in flat)
    assert any(jnp.any(l != 0) for l in flat)


def test_attention_mask_introspection(rng):
    """Reference get_attention_masks parity: slot-competition masks are
    retrievable via the 'intermediates' collection (sow)."""
    model = SAVi(**MODEL_KW)
    x = jax.random.uniform(rng, (2, 2, 16, 16, 3))
    params = model.init({"params": rng, "slots": rng}, x)
    out, state = model.apply(params, x, decode=False, rngs={"slots": rng},
                             mutable=["intermediates"])
    masks = state["intermediates"]["slot_attn"]["attn_masks"]
    # one sow per frame; each (B, S, N_locations), normalized over slots
    assert len(masks) == 2
    m = masks[0]
    assert m.shape == (2, 4, 16 * 16)
    sums = m.sum(axis=1)
    assert jnp.allclose(sums, jnp.ones_like(sums), atol=1e-4)
