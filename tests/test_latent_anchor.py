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
    # auto mode never dispatches compiled Pallas onto a non-TPU host, even
    # with a per-kernel "1" override (that's what interpret mode is for) —
    # the suite runs on CPU, so the override must NOT flip this to True
    monkeypatch.delenv("PLAYSLOT_PALLAS_VQ", raising=False)
    monkeypatch.setenv("PLAYSLOT_PALLAS_BLOCK_CAUSAL", "1")
    assert use_pallas("block_causal") is False
    monkeypatch.setenv("PLAYSLOT_USE_PALLAS", "interpret")
    assert use_pallas("block_causal") is True
    # mode typos must raise, not silently fall back to auto
    monkeypatch.setenv("PLAYSLOT_USE_PALLAS", "true")
    with pytest.raises(ValueError):
        use_pallas("vq")


def test_action_dir_kld_matches_reference_golden():
    """action_dir_kld == the reference's ActionDirectionGaussKLD numerically
    (src/lib/loss.py:265-310), including its prior/posterior naming quirks."""
    from tests.reference_util import import_reference
    torch = import_reference()
    from lib.loss import ActionDirectionGaussKLD

    from playslot_tpu.train.losses import action_dir_kld

    rng = np.random.RandomState(0)
    for cov in (1.0, 0.5, 2.0):
        mean = rng.randn(2, 4, A).astype(np.float32)
        var = np.abs(rng.randn(2, 4, A)).astype(np.float32) + 0.1
        dist = np.stack([mean, var], axis=2)  # (B, T, 2, A)

        ref = ActionDirectionGaussKLD(cov=cov)
        ref_val = float(ref(action_directions_dist=torch.from_numpy(dist)))
        ours = float(action_dir_kld(
            action_directions_dist=jnp.asarray(dist), cov=cov))
        np.testing.assert_allclose(ours, ref_val, rtol=1e-5), cov


def test_vq_dead_code_revival_on_unit_std_latents():
    """Without revival, unit-std (latent_norm-scale) inputs leave most
    codewords dead (init is +-1/num_embs); with revive_dead_codes every
    cluster claims a codeword within a few EMA updates."""
    from playslot_tpu.models.quantization import VectorQuantizer

    K, dim = 5, 16
    rng = np.random.RandomState(0)
    centers = rng.randn(K, dim).astype(np.float32)
    centers = (centers - centers.mean(-1, keepdims=True)) / \
        centers.std(-1, keepdims=True)  # unit-std like normalized latents

    def batch(i):
        idx = rng.randint(0, K, size=64)
        return centers[idx] + 0.05 * rng.randn(64, dim).astype(np.float32)

    results = {}
    for revive in (False, True):
        q = VectorQuantizer(num_embs=K, emb_dim=dim, use_ema=True,
                            revive_dead_codes=revive)
        variables = q.init({"params": jax.random.PRNGKey(0),
                            "action": jax.random.PRNGKey(1)},
                           jnp.asarray(batch(0)), train=False)
        vq = variables["vq"]
        for i in range(60):
            (_, _, _), upd = q.apply(
                {"params": variables.get("params", {}), "vq": vq},
                jnp.asarray(batch(i)), train=True, mutable=["vq"],
                rngs={"action": jax.random.PRNGKey(100 + i)})
            vq = upd["vq"]
        counts = np.asarray(vq["ema_count"])
        results[revive] = (counts > 0.1 * counts.sum() / K).sum()
    assert results[True] == K, f"revival left dead codes: {results[True]}/{K}"
    assert results[False] < K, \
        "baseline unexpectedly covered all codes; revival test is vacuous"


def test_batch_latent_norm_is_linear_gauge_fix():
    """latent_norm="batch" divides by one EMA scalar: the normalized means
    are an exact scalar multiple of the raw means (information-preserving,
    unlike per-vector standardization), the scalar tracks the input scale
    (O(1) output even for collapsed-scale inputs after EMA convergence),
    and the EMA state lives in the "vq" collection."""
    key = jax.random.PRNGKey(5)
    raw = VQSingleSlotLatentAction(**LA_KW)
    bat = VQSingleSlotLatentAction(latent_norm="batch", **LA_KW)
    slots = jax.random.normal(key, (2, 5, S, D)) * 0.5
    variables = bat.init({"params": key, "action": key}, slots, train=False)
    assert "latent_scale" in variables["vq"], list(variables["vq"])

    noise = jnp.zeros((2, 4, A))
    out_raw = raw.apply({"params": variables["params"],
                         "vq": {k: v for k, v in variables["vq"].items()
                                if k == "quantizer"}},
                        slots, noise=noise, train=False)
    mu_raw = np.asarray(out_raw["action_dist"][:, :, 0], np.float64)

    # run a few train steps so the EMA scalar converges toward the data rms
    vq = variables["vq"]
    for i in range(80):
        out_b, upd = bat.apply({"params": variables["params"], "vq": vq},
                               slots, noise=noise, train=True, mutable=["vq"],
                               rngs={"action": jax.random.PRNGKey(i)})
        vq = upd["vq"]
    scale = float(vq["latent_scale"])
    rms = float(np.sqrt((mu_raw ** 2).mean()))
    np.testing.assert_allclose(scale, rms, rtol=0.01)

    # eval-mode output == raw mean / stored scale exactly (linear map)
    out_e = bat.apply({"params": variables["params"], "vq": vq}, slots,
                      noise=noise, train=False)
    mu_norm = np.asarray(out_e["action_dist"][:, :, 0], np.float64)
    np.testing.assert_allclose(mu_norm, mu_raw / scale, rtol=1e-4, atol=1e-6)
    # normalized rms is O(1)
    np.testing.assert_allclose(float(np.sqrt((mu_norm ** 2).mean())), 1.0,
                               rtol=0.02)


def test_latent_det_quantizes_the_mean():
    """latent_det=True: the quantizer input IS the action-direction mean —
    no reparameterized noise — so the code index is a deterministic function
    of the slots, while default mode still samples."""
    key = jax.random.PRNGKey(7)
    det = VQSingleSlotLatentAction(latent_det=True, **LA_KW)
    variables, slots = _init(det, key)

    out1 = det.apply(variables, slots, rngs={"action": jax.random.PRNGKey(1)},
                     train=False)
    out2 = det.apply(variables, slots, rngs={"action": jax.random.PRNGKey(2)},
                     train=False)
    # deterministic: rng does not change anything
    np.testing.assert_array_equal(np.asarray(out1["sampled_latent_action"]),
                                  np.asarray(out2["sampled_latent_action"]))
    np.testing.assert_array_equal(
        np.asarray(out1["sampled_latent_action"]),
        np.asarray(out1["action_dist"][:, :, 0]))

    # default mode with the same params DOES depend on the rng
    base = VQSingleSlotLatentAction(**LA_KW)
    s1 = base.apply(variables, slots, rngs={"action": jax.random.PRNGKey(1)},
                    train=False)["sampled_latent_action"]
    s2 = base.apply(variables, slots, rngs={"action": jax.random.PRNGKey(2)},
                    train=False)["sampled_latent_action"]
    assert np.abs(np.asarray(s1) - np.asarray(s2)).max() > 1e-4


def test_matmul_precision_knob_reaches_train_steps(tmp_path):
    """training.matmul_precision wires a jax.default_matmul_precision context
    into every trainer's jitted step (regression: the InvDyn latent is a
    difference of O(1) embeddings — default TPU precision noise can exceed
    the whole signal)."""
    from playslot_tpu.train.trainer import BaseTrainer

    class Dummy(BaseTrainer):
        def __init__(self, precision):
            self.exp_params = {"training": ({"matmul_precision": precision}
                                            if precision else {})}

    import jax._src.config as jax_config
    with Dummy("highest")._precision_ctx():
        assert jax_config.config.jax_default_matmul_precision == "highest" \
            or jax.config.jax_default_matmul_precision == "highest"
    # unset -> nullcontext, no error and no change
    with Dummy(None)._precision_ctx():
        pass
