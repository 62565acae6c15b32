"""
Fused decode on the TRAINING path (VERDICT r3 item 2).

The SAVi train step renders reconstructions through decode_fast
(ops/fused_decode.py) instead of the naive per-map-broadcast decode.
decode_fast is exact to float reassociation in the forward; these tests
prove the LOSS VALUE and the GRADIENTS w.r.t. every parameter (encoder,
slot attention, decoder, position embeddings) match the naive path, that
jax.checkpoint (training.remat="decode") leaves gradients unchanged, and
that the trainer-level jitted steps agree end-to-end.

Reference hot path being optimized: src/models/SAVi.py:220-248 (decode of
all frames inside the train forward).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playslot_tpu.models.factory import setup_model


SAVI_CFG = {
    "num_slots": 4, "slot_dim": 24, "num_iterations": 1,
    "num_iterations_first": 2, "in_channels": 3, "mlp_hidden": 24,
    "mlp_encoder_dim": 24, "initializer": "LearnedRandom",
    "encoder": {"encoder_name": "ConvEncoder",
                "encoder_params": {"num_channels": [8, 8], "kernel_size": 5,
                                   "resolution": [16, 16]}},
    "decoder": {"decoder_name": "ConvDecoder",
                "decoder_params": {"num_channels": [8, 8], "kernel_size": 5,
                                   "resolution": [16, 16], "upsample": 1}},
    "transition_module_params": {"model_name": "TransformerBlock",
                                 "num_heads": 2, "head_dim": 8,
                                 "mlp_size": 16},
}


@pytest.fixture(scope="module")
def savi_setup():
    model = setup_model({"model_name": "SAVi",
                         "model_params": copy.deepcopy(SAVI_CFG)})
    key = jax.random.PRNGKey(7)
    videos = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 16, 16, 3))
    variables = model.init({"params": key, "slots": key}, videos)
    return model, variables["params"], videos


def _loss(model, params, videos, key, fast, remat=False):
    def render(p, slot_history):
        method = (lambda m, s: m.decode_fast(s, train=True)) if fast \
            else (lambda m, s: m.decode(s, train=True))
        return model.apply({"params": p}, slot_history, method=method)[0]

    if remat:
        render = jax.checkpoint(render)
    out = model.apply({"params": params}, videos, train=True, decode=False,
                      rngs={"slots": key})
    recons = render(params, out["slot_history"])
    return jnp.mean((recons - videos) ** 2)


def _rel_err(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))


def test_loss_value_parity(savi_setup):
    model, params, videos = savi_setup
    key = jax.random.PRNGKey(3)
    naive = float(_loss(model, params, videos, key, fast=False))
    fast = float(_loss(model, params, videos, key, fast=True))
    assert abs(naive - fast) / abs(naive) < 1e-5, (naive, fast)


def test_gradient_parity_every_param(savi_setup):
    """Gradients through decode_fast match the naive decode for EVERY
    parameter leaf — decoder convs, decoder pos embedding, and (through the
    reconstruction loss) the encoder / slot-attention / transition params."""
    model, params, videos = savi_setup
    key = jax.random.PRNGKey(3)
    g_naive = jax.grad(lambda p: _loss(model, p, videos, key, fast=False))(params)
    g_fast = jax.grad(lambda p: _loss(model, p, videos, key, fast=True))(params)

    flat_n = jax.tree_util.tree_leaves_with_path(g_naive)
    flat_f = jax.tree_util.tree_leaves(g_fast)
    assert len(flat_n) == len(flat_f)
    # absolute floor at 1e-6 x the global gradient scale: leaves whose true
    # gradient is ~0 (e.g. a LayerNorm bias that cancels analytically) carry
    # only float-reassociation noise and have no meaningful relative error
    gmax = max(float(jnp.max(jnp.abs(g)))
               for g in jax.tree_util.tree_leaves(g_naive))
    checked_decoder = 0
    for (path, gn), gf in zip(flat_n, flat_f):
        name = jax.tree_util.keystr(path)
        diff = float(jnp.max(jnp.abs(gf - gn)))
        tol = max(5e-5 * float(jnp.max(jnp.abs(gn))), 1e-7 * gmax)
        assert diff < tol, f"{name}: grad err {diff} vs tol {tol}"
        # the decoder/pos-embedding grads must be non-trivially exercised
        if "decoder" in name and float(jnp.max(jnp.abs(gn))) > 0:
            checked_decoder += 1
    assert checked_decoder >= 4  # conv kernels+biases + pos embedding


def test_remat_gradients_identical(savi_setup):
    """jax.checkpoint must not change gradients — it only re-schedules the
    forward recompute into the backward pass."""
    model, params, videos = savi_setup
    key = jax.random.PRNGKey(3)
    g = jax.grad(lambda p: _loss(model, p, videos, key, fast=True))(params)
    g_r = jax.grad(
        lambda p: _loss(model, p, videos, key, fast=True, remat=True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_r)):
        assert _rel_err(a, b) < 1e-6


def test_trainer_step_fast_vs_naive(tmp_path):
    """The jitted trainer steps (fast_decode on/off) produce matching losses
    and post-step parameters on identical inputs."""
    from tests.test_training import _tiny_exp
    from playslot_tpu.train.trainer import SAViTrainer

    results = {}
    for fast in (True, False):
        d = tmp_path / ("fast" if fast else "naive")
        d.mkdir()
        cfg = _tiny_exp(d)
        cfg["training"]["fast_decode"] = fast
        cfg.save()
        tr = SAViTrainer(str(d))
        tr.load_data()
        tr.setup_model()
        videos = jnp.asarray(
            np.random.RandomState(0).rand(2, 4, 16, 16, 3), jnp.float32)
        key = jax.random.PRNGKey(5)
        state, ldict = tr._train_step(tr.state, videos, key)
        vdict = tr._valid_step(state, videos, key)
        results[fast] = (float(ldict["_total"]), float(vdict["_total"]),
                         jax.tree_util.tree_leaves(state.params))
    lf, vf, pf = results[True]
    ln, vn, pn = results[False]
    assert abs(lf - ln) / abs(ln) < 1e-5
    assert abs(vf - vn) / abs(vn) < 1e-5
    for a, b in zip(pf, pn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_trainer_remat_step_matches(tmp_path):
    """training.remat='decode' leaves the jitted train step's output
    unchanged (same loss, same post-step params)."""
    from tests.test_training import _tiny_exp
    from playslot_tpu.train.trainer import SAViTrainer

    results = {}
    for remat in (None, "decode"):
        d = tmp_path / f"remat_{remat}"
        d.mkdir()
        cfg = _tiny_exp(d)
        if remat:
            cfg["training"]["remat"] = remat
        cfg.save()
        tr = SAViTrainer(str(d))
        tr.load_data()
        tr.setup_model()
        videos = jnp.asarray(
            np.random.RandomState(0).rand(2, 4, 16, 16, 3), jnp.float32)
        state, ldict = tr._train_step(tr.state, videos, jax.random.PRNGKey(5))
        results[remat] = (float(ldict["_total"]),
                          jax.tree_util.tree_leaves(state.params))
    assert abs(results[None][0] - results["decode"][0]) < 1e-7
    for a, b in zip(results[None][1], results["decode"][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_trainer_chunked_decode_step_matches(tmp_path):
    """training.decode_chunks=2 (sequential lax.map chunks with the body
    rematerialized in the backward — the measured memory lever, see
    docs/PERFORMANCE.md round-4 training section) leaves the jitted train
    AND valid steps' outputs unchanged."""
    from tests.test_training import _tiny_exp
    from playslot_tpu.train.trainer import SAViTrainer

    results = {}
    for chunks in (1, 2):
        d = tmp_path / f"chunks_{chunks}"
        d.mkdir()
        cfg = _tiny_exp(d)
        cfg["training"]["decode_chunks"] = chunks
        cfg.save()
        tr = SAViTrainer(str(d))
        tr.load_data()
        tr.setup_model()
        videos = jnp.asarray(
            np.random.RandomState(0).rand(2, 4, 16, 16, 3), jnp.float32)
        key = jax.random.PRNGKey(5)
        state, ldict = tr._train_step(tr.state, videos, key)
        vdict = tr._valid_step(state, videos, key)
        results[chunks] = (float(ldict["_total"]), float(vdict["_total"]),
                          jax.tree_util.tree_leaves(state.params))
    assert abs(results[1][0] - results[2][0]) < 1e-6
    assert abs(results[1][1] - results[2][1]) < 1e-6
    for a, b in zip(results[1][2], results[2][2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_predictor_trainer_chunked_decode_step_matches(tmp_path):
    """Same invariance for the PlaySlot stage's frozen-SAVi render."""
    import copy
    from playslot_tpu.config import DEFAULTS
    from tests.test_training import TINY_PRED, _tiny_exp
    from playslot_tpu.train.trainer import SAViTrainer
    from playslot_tpu.train.predictor_trainer import PredictorTrainer

    results = {}
    for chunks in (1, 2):
        d = tmp_path / f"pchunks_{chunks}"
        d.mkdir()
        cfg = _tiny_exp(d, num_frames=4)
        cfg["predictor"] = copy.deepcopy(TINY_PRED)
        cfg["predictor_loss"] = copy.deepcopy(DEFAULTS["predictor_loss"])
        cfg["prediction_params"] = {"num_context": 2, "num_preds": 2,
                                    "teacher_force": False,
                                    "sample_length": 4,
                                    "input_buffer_size": 4}
        cfg["training"]["decode_chunks"] = chunks
        cfg.save()
        savi_tr = SAViTrainer(str(d))
        savi_tr.load_data()
        savi_tr.setup_model()
        tr = PredictorTrainer(str(d))
        tr.load_data()
        tr.load_savi(savi_params=savi_tr.state.params)
        tr.setup_predictor()
        videos = jnp.asarray(
            np.random.RandomState(0).rand(2, 4, 16, 16, 3), jnp.float32)
        k = jax.random.PRNGKey(5)
        noise = jnp.asarray(
            np.random.RandomState(1).randn(2, 3, 8), jnp.float32)
        state, ldict = tr._train_step(tr.state, videos, None, k, k, noise)
        results[chunks] = ({n: float(v) for n, v in ldict.items()},
                           jax.tree_util.tree_leaves(state.params))
    for name, v in results[1][0].items():
        assert abs(results[2][0][name] - v) < 1e-6, name
    for a, b in zip(results[1][1], results[2][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
