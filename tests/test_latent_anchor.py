"""
Latent-scale anchor (round-3, VERDICT r2 item 1): the latent_norm knob in
InvDyn pins the action-latent scale at O(1) so predictor training cannot
collapse the channel (docs/BEHAVIOR_STUDY.md failure mode 4), and the
ActionDirKLD predictor-loss knob wires through config.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from playslot_tpu.models.invdyn import VQSingleSlotLatentAction

S, D, A = 3, 16, 8

LA_KW = dict(slot_dim=D, emb_dim=16, action_dim=A, num_actions=4,
             num_layers=1, num_heads=2, head_dim=8, mlp_dim=16,
             use_ema_vq=True)


def _init(model, key, T=5):
    slots = jax.random.normal(key, (2, T, S, D)) * 0.5
    variables = model.init({"params": key, "action": key}, slots, train=False)
    return variables, slots


def test_latent_norm_pins_mean_scale():
    """With latent_norm, the action-direction mean entering VQ/the distill
    target has per-vector std == 1 regardless of how small the raw encoder
    outputs are (the measured collapse shrank it 0.024 -> 0.003)."""
    key = jax.random.PRNGKey(0)
    model = VQSingleSlotLatentAction(latent_norm=True, **LA_KW)
    variables, slots = _init(model, key)

    for scale in (1.0, 1e-2, 1e-4):
        # shrink every param that feeds mean_fc by scaling the input slots —
        # emulates the collapse without training
        out = model.apply(variables, slots * scale,
                          rngs={"action": jax.random.PRNGKey(1)}, train=False)
        mu = np.asarray(out["action_dist"][:, :, 0])
        stds = mu.std(axis=-1)
        np.testing.assert_allclose(stds, 1.0, atol=0.05), scale


def test_latent_norm_decompose_is_scale_invariant():
    """Control-time prototype lookup ignores the policy latent's scale:
    decompose(alpha * z) picks the same codeword as decompose(z)."""
    key = jax.random.PRNGKey(2)
    model = VQSingleSlotLatentAction(latent_norm=True, **LA_KW)
    variables, _ = _init(model, key)
    z = jax.random.normal(jax.random.PRNGKey(3), (4, A))

    def decompose(lat):
        return model.apply(variables, lat,
                           method=lambda m, x: m.decompose_action_latent(x))

    p1, v1 = decompose(z)
    p2, v2 = decompose(z * 37.0)
    p3, v3 = decompose(z * 1e-3)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p3), atol=1e-4)


def test_latent_norm_default_off_matches_reference_semantics():
    """latent_norm defaults False: outputs are bit-identical to a module
    without the field set (shipped configs stay parity-exact)."""
    key = jax.random.PRNGKey(4)
    base = VQSingleSlotLatentAction(**LA_KW)
    explicit = VQSingleSlotLatentAction(latent_norm=False, **LA_KW)
    variables, slots = _init(base, key)
    noise = jnp.zeros((2, slots.shape[1] - 1, A))
    out_a = base.apply(variables, slots, noise=noise, train=False)
    out_b = explicit.apply(variables, slots, noise=noise, train=False)
    np.testing.assert_array_equal(np.asarray(out_a["action_proto"]),
                                  np.asarray(out_b["action_proto"]))
    # and the normalized variant actually differs
    normed = VQSingleSlotLatentAction(latent_norm=True, **LA_KW)
    out_c = normed.apply(variables, slots, noise=noise, train=False)
    assert not np.allclose(np.asarray(out_a["action_dist"][:, :, 0]),
                           np.asarray(out_c["action_dist"][:, :, 0]))


def test_action_dir_kld_loss_wires_through_predictor_config(tmp_path):
    """ActionDirKLD added to predictor_loss (the reference ships it in its
    registry, src/lib/loss.py:344-355) trains without error and reports the
    loss component."""
    from playslot_tpu.config import DEFAULTS
    from playslot_tpu.train.predictor_trainer import PredictorTrainer
    from playslot_tpu.train.trainer import SAViTrainer
    from tests.test_training import TINY_PRED, _tiny_exp

    cfg = _tiny_exp(tmp_path, num_frames=4)
    cfg["predictor"] = copy.deepcopy(TINY_PRED)
    cfg["predictor_loss"] = copy.deepcopy(DEFAULTS["predictor_loss"]) + [
        {"type": "ActionDirKLD", "weight": 0.01, "cov": 1.0}]
    # combine both anchors: latent_norm through the LatentAction params
    cfg["predictor"]["predictor_params"]["LatentAction"]["model_params"][
        "latent_norm"] = True
    cfg["prediction_params"] = {"num_context": 2, "num_preds": 2,
                                "teacher_force": False, "sample_length": 4,
                                "input_buffer_size": 4}
    cfg.save()

    savi_tr = SAViTrainer(str(tmp_path))
    savi_tr.load_data()
    savi_tr.setup_model()

    tr = PredictorTrainer(str(tmp_path))
    tr.load_data()
    tr.load_savi(savi_params=savi_tr.state.params)
    tr.setup_predictor()
    videos = jnp.asarray(np.random.RandomState(0).rand(4, 4, 16, 16, 3),
                         jnp.float32)
    ldict = None
    for _ in range(2):
        k0, k1 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
        tr.state, ldict = tr._train_step(tr.state, tr._shard_batch(videos),
                                         None, k0, k1)
    ldict = {k: float(v) for k, v in ldict.items()}
    assert "ActionDirKLD" in ldict and np.isfinite(ldict["ActionDirKLD"])
    assert np.isfinite(ldict["_total"])


def test_dispatch_per_kernel_override_in_forced_mode(monkeypatch):
    """ADVICE r2: PLAYSLOT_PALLAS_<KERNEL>=0 disables one kernel even under
    PLAYSLOT_USE_PALLAS=1/interpret; unknown kernel names raise."""
    from playslot_tpu.ops.dispatch import use_pallas

    monkeypatch.setenv("PLAYSLOT_USE_PALLAS", "1")
    assert use_pallas("vq") is True
    monkeypatch.setenv("PLAYSLOT_PALLAS_VQ", "0")
    assert use_pallas("vq") is False
    assert use_pallas("slot_attention") is True
    monkeypatch.setenv("PLAYSLOT_USE_PALLAS", "0")
    assert use_pallas("slot_attention") is False  # global kill switch wins
    monkeypatch.setenv("PLAYSLOT_USE_PALLAS", "auto")
    with pytest.raises(ValueError):
        use_pallas("no_such_kernel")
