"""
Production-path tests for the space-to-depth encoder form and the SAVi
k/v-hoisted slot-attention recurrence (round-3 encode-phase optimization).

The s2d path (models/encoders.py, PLAYSLOT_S2D_ENCODER=1) must be a drop-in
for the ConvBlock path: identical parameter tree (checkpoint layout) and
numerically matching outputs (float reassociation only). The k/v hoist
(models/savi.py) must trace the same per-element math as the reference's
per-frame project+iterate (src/models/savi.py forward recurrence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playslot_tpu.models.encoders import SimpleConvEncoder
from playslot_tpu.models.savi import SAVi
from tests.test_savi_forward import MODEL_KW


def _tree_spec(params):
    return jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), params)


def _init_and_apply(monkeypatch, mode, enc_kw, x, params=None):
    monkeypatch.setenv("PLAYSLOT_S2D_ENCODER", mode)
    m = SimpleConvEncoder(**enc_kw)
    if params is None:
        params = m.init(jax.random.PRNGKey(0), x)
    return params, m.apply(params, x)


def test_s2d_encoder_drop_in(monkeypatch):
    """Forced-s2d and ConvBlock paths: same param tree, matching outputs,
    and checkpoints are interchangeable between the two."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    enc_kw = dict(hidden_dims=(8, 8, 8), kernel_size=5)

    p0, y0 = _init_and_apply(monkeypatch, "0", enc_kw, x)
    p1, y1 = _init_and_apply(monkeypatch, "1", enc_kw, x)
    assert _tree_spec(p0) == _tree_spec(p1)

    # cross-apply: params initialized on either path run on the other
    _, y01 = _init_and_apply(monkeypatch, "1", enc_kw, x, params=p0)
    _, y10 = _init_and_apply(monkeypatch, "0", enc_kw, x, params=p1)
    err = float(jnp.max(jnp.abs(y0 - y01)) / (jnp.max(jnp.abs(y0)) + 1e-9))
    assert err < 1e-5, err
    err = float(jnp.max(jnp.abs(y1 - y10)) / (jnp.max(jnp.abs(y1)) + 1e-9))
    assert err < 1e-5, err


def test_s2d_encoder_grad_matches(monkeypatch):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 8, 8, 3), jnp.float32)
    enc_kw = dict(hidden_dims=(8, 8), kernel_size=3)
    p, _ = _init_and_apply(monkeypatch, "0", enc_kw, x)

    def loss(mode, p):
        monkeypatch.setenv("PLAYSLOT_S2D_ENCODER", mode)
        m = SimpleConvEncoder(**enc_kw)
        return jax.grad(lambda q: jnp.sum(m.apply(q, x) ** 2))(p)

    g0, g1 = loss("0", p), loss("1", p)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        assert err < 1e-4, err


@pytest.mark.parametrize("enc_kw,shape", [
    (dict(hidden_dims=(8, 8), kernel_size=5, batch_norm=True), (2, 16, 16, 3)),
    (dict(hidden_dims=(8, 8), kernel_size=5, stride=2), (2, 16, 16, 3)),
    (dict(hidden_dims=(8, 8), kernel_size=5, downsample_encoder=True),
     (2, 16, 16, 3)),
    (dict(hidden_dims=(8, 8), kernel_size=5), (2, 15, 16, 3)),  # odd H
    (dict(hidden_dims=(8, 8), kernel_size=4), (2, 16, 16, 3)),  # even kernel
])
def test_s2d_ineligible_configs_fall_back(monkeypatch, enc_kw, shape):
    """BN / strided / pooled / odd-size stacks must take the ConvBlock path
    even when s2d is forced on — identical params AND output."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(*shape), jnp.float32)
    p0, y0 = _init_and_apply(monkeypatch, "0", enc_kw, x)
    p1, y1 = _init_and_apply(monkeypatch, "1", enc_kw, x, params=p0)
    assert _tree_spec(p0) == _tree_spec(p1)
    assert jnp.array_equal(y0, y1)  # same path, bit-identical


def test_savi_hoisted_recurrence_matches_per_frame_correct(rng):
    """The k/v hoist in SAVi.__call__ must reproduce the per-frame
    project+iterate recurrence (reference semantics, SAVi.correct)."""
    import flax.linen as nn

    model = SAVi(**MODEL_KW)
    B, T = 2, 3
    x = jax.random.uniform(rng, (B, T, 16, 16, 3))
    params = model.init({"params": rng, "slots": rng}, x)
    out = model.apply(params, x, decode=False, rngs={"slots": rng})

    def run(m):
        frames = x.reshape(B * T, *x.shape[2:])
        feats = m.encode(frames)
        feats = feats.reshape(B, T, *feats.shape[1:])
        slots = m.initial_slots(batch_size=B)
        hist = []
        for t in range(T):
            s, _ = m.correct(feats[:, t], slots, first=(t == 0))
            slots = m.predict_next(s)
            hist.append(s)
        return jnp.stack(hist, axis=1)

    ref = nn.apply(run, model)(params, rngs={"slots": rng})
    err = float(jnp.max(jnp.abs(out["slot_history"] - ref))
                / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 1e-5, err
