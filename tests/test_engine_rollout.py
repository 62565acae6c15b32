"""Scan-based rollout engine == in-module unrolled reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from playslot_tpu.engine.rollout import posterior_rollout, scan_rollout
from playslot_tpu.models.predictors import SlotSingleActionPredictor

S, D, A = 3, 16, 8

PRED_KW = dict(
    slot_dim=D, num_actions=4, action_dim=A, condition_mode="sum",
    use_variability=True, autoregressive_dynamics=True,
    LatentAction={"model_name": "VQSingleSlotLatentAction",
                  "model_params": {"emb_dim": 16, "num_layers": 1, "num_heads": 2,
                                   "head_dim": 8, "mlp_dim": 16,
                                   "use_ema_vq": True}},
    DynamicsModel={"model_name": "SlotGPTDymamicsModel",
                   "model_params": {"embed_dim": 16, "head_dim": 8,
                                    "num_heads": 2, "mlp_size": 16,
                                    "num_layers": 1, "context_length": 4,
                                    "pos_enc_dropout": 0.0}},
)


@pytest.fixture(scope="module")
def setup():
    pred = SlotSingleActionPredictor(**PRED_KW)
    key = jax.random.PRNGKey(0)
    T = 8
    slots = jax.random.normal(key, (2, T, S, D)) * 0.5
    variables = pred.init({"params": key, "action": key}, slots,
                          num_seed=2, num_preds=3)
    return pred, variables, slots


@pytest.mark.parametrize("num_seed,num_preds", [(2, 5), (4, 4), (6, 2)])
def test_scan_rollout_matches_module(setup, num_seed, num_preds):
    """Cover: growing window, exactly-full window, seed > context_length."""
    pred, variables, slots = setup
    seed_slots = slots[:, :num_seed]
    T_act = num_seed + num_preds
    key = jax.random.PRNGKey(1)
    protos = jax.random.normal(key, (2, T_act, S, A)) * 0.3
    avars = jax.random.normal(jax.random.PRNGKey(2), (2, T_act, S, A)) * 0.1

    ref = pred.apply(
        variables, slots=seed_slots, action_protos=protos, action_vars=avars,
        num_seed=num_seed, num_preds=num_preds, autoregressive=True,
        get_pred_only=True,
        method=lambda m, **kw: m.dynamics_model(**kw))
    fast = scan_rollout(pred, variables, seed_slots, protos, avars, num_preds)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_posterior_rollout_matches_forward_multiple_samples(setup):
    pred, variables, slots = setup
    num_seed, num_preds = 3, 5
    noise = np.random.RandomState(0).randn(2, slots.shape[1] - 1, A).astype(
        np.float32)
    ref = pred.apply(
        variables, slots, num_samples=1, num_seed=num_seed, num_preds=num_preds,
        use_posterior=True, noise=noise,
        method=lambda m, *a, **k: m.forward_multiple_samples(*a, **k))
    fast = posterior_rollout(pred, variables, slots, num_seed, num_preds,
                             rng=jax.random.PRNGKey(9), noise=noise)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref[:, 0]),
                               atol=2e-5, rtol=1e-4)


def test_batched_prior_rollout(setup):
    from playslot_tpu.engine.rollout import batched_prior_rollout
    pred, variables, slots = setup
    seed = slots[:, :3]
    preds = batched_prior_rollout(pred, variables, seed, num_samples=4,
                                  num_preds=5, rng=jax.random.PRNGKey(3))
    assert preds.shape == (2, 4, 5, S, D)
    assert np.all(np.isfinite(np.asarray(preds)))
    # independent action draws -> samples differ
    a = np.asarray(preds)
    assert not np.allclose(a[:, 0], a[:, 1])
    # deterministic given the key
    preds2 = batched_prior_rollout(pred, variables, seed, num_samples=4,
                                   num_preds=5, rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(a, np.asarray(preds2), atol=1e-6)


def test_kv_cached_rollout_matches_scan(setup):
    """KV-cached incremental decode == windowed recompute while the window
    grows (round-1 VERDICT item 9: the long-context cache experiment)."""
    from playslot_tpu.engine.rollout import kv_cached_rollout
    pred, variables, slots = setup
    num_seed, num_preds = 1, 3  # 1 + 3 <= context_length 4
    seed_slots = slots[:, :num_seed]
    T_act = num_seed + num_preds
    protos = jax.random.normal(jax.random.PRNGKey(4), (2, T_act, S, A)) * 0.3
    avars = jax.random.normal(jax.random.PRNGKey(5), (2, T_act, S, A)) * 0.1

    ref = scan_rollout(pred, variables, seed_slots, protos, avars, num_preds)
    fast = kv_cached_rollout(pred, variables, seed_slots, protos, avars,
                             num_preds)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)

    # jits cleanly (the cache threading is a scan carry)
    jitted = jax.jit(lambda s, p, v: kv_cached_rollout(
        pred, variables, s, p, v, num_preds))
    fast2 = jitted(seed_slots, protos, avars)
    np.testing.assert_allclose(np.asarray(fast2), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)

    # refuses the sliding regime (cache would not match reference semantics)
    with pytest.raises(ValueError):
        kv_cached_rollout(pred, variables, slots[:, :2], protos, avars, 5)


def test_kv_cached_rollout_no_variability():
    from playslot_tpu.engine.rollout import kv_cached_rollout
    kw = dict(PRED_KW)
    kw["use_variability"] = False
    pred = SlotSingleActionPredictor(**kw)
    key = jax.random.PRNGKey(7)
    slots = jax.random.normal(key, (2, 6, S, D)) * 0.5
    variables = pred.init({"params": key, "action": key}, slots,
                          num_seed=2, num_preds=3)
    num_seed, num_preds = 2, 2
    seed_slots = slots[:, :num_seed]
    protos = jax.random.normal(jax.random.PRNGKey(6), (2, 4, S, A)) * 0.3
    ref = scan_rollout(pred, variables, seed_slots, protos, None, num_preds)
    fast = kv_cached_rollout(pred, variables, seed_slots, protos, None,
                             num_preds)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_kv_cached_rollout_bf16_cache_dtype(setup):
    """Under a bf16 model the KV buffers default to the model compute dtype
    (ADVICE r2: fp32 caches silently upcasted and weakened the exactness
    claim); parity vs scan_rollout holds at bf16 tolerances."""
    from playslot_tpu.engine.rollout import init_kv_caches, kv_cached_rollout

    kw = dict(PRED_KW)
    kw["dtype"] = jnp.bfloat16
    pred = SlotSingleActionPredictor(**kw)
    key = jax.random.PRNGKey(11)
    slots = jax.random.normal(key, (2, 6, S, D)) * 0.5
    variables = pred.init({"params": key, "action": key}, slots,
                          num_seed=2, num_preds=3)

    caches = init_kv_caches(pred, batch=2, num_slots=S)
    assert caches[0]["k"].dtype == jnp.bfloat16

    num_seed, num_preds = 1, 3
    seed_slots = slots[:, :num_seed]
    protos = jax.random.normal(jax.random.PRNGKey(12), (2, 4, S, A)) * 0.3
    avars = jax.random.normal(jax.random.PRNGKey(13), (2, 4, S, A)) * 0.1
    ref = scan_rollout(pred, variables, seed_slots, protos, avars, num_preds)
    fast = kv_cached_rollout(pred, variables, seed_slots, protos, avars,
                             num_preds)
    np.testing.assert_allclose(
        np.asarray(fast, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)
