"""
Golden-output parity: reference PlaySlot predictors vs playslot_tpu with
converted parameters — InvDyn latent-action inference, VQ, SlotGPT windowed
AR rollout, both training forward and posterior inference.
"""

import numpy as np
import pytest

from playslot_tpu.models.predictors import (
    SlotLatentPredictor, SlotSingleActionPredictor,
)
from playslot_tpu.utils.convert import convert_latent_predictor
from tests.reference_util import import_reference

SLOT_DIM, NUM_SLOTS, NUM_ACTIONS, ACTION_DIM = 16, 3, 4, 8
NUM_SEED, NUM_PREDS = 2, 3
T = NUM_SEED + NUM_PREDS

DYN_CFG = {
    "model_name": "SlotGPTDymamicsModel",
    "model_params": {"residual": False, "embed_dim": 32, "head_dim": 8,
                     "num_heads": 2, "mlp_size": 64, "num_layers": 2,
                     "context_length": 4, "pos_enc_dropout": 0.0},
}


def _build_pair(single_action, use_variability, use_ema):
    torch = import_reference()
    if single_action:
        la_cfg = {"model_name": "VQSingleSlotLatentAction",
                  "model_params": {"emb_dim": 32, "num_layers": 2, "num_heads": 2,
                                   "head_dim": 8, "mlp_dim": 64,
                                   "use_ema_vq": use_ema}}
        from models.Predictors.LatentActionPredictors import \
            SlotSingleActionPredictor as TorchCls
        ours_cls = SlotSingleActionPredictor
    else:
        la_cfg = {"model_name": "VQSimpleMLPSlotLatentAction",
                  "model_params": {"emb_dim": 32, "hidden_dim": 48,
                                   "use_ema_vq": use_ema}}
        from models.Predictors.LatentActionPredictors import \
            SlotLatentPredictor as TorchCls
        ours_cls = SlotLatentPredictor

    kw = dict(slot_dim=SLOT_DIM, num_actions=NUM_ACTIONS, action_dim=ACTION_DIM,
              condition_mode="sum", use_variability=use_variability,
              autoregressive_dynamics=True)
    import copy
    tm = TorchCls(**kw, LatentAction=copy.deepcopy(la_cfg),
                  DynamicsModel=copy.deepcopy(DYN_CFG))
    tm.eval()
    jm = ours_cls(**kw, LatentAction=la_cfg, DynamicsModel=DYN_CFG)
    variables = convert_latent_predictor(tm.state_dict())
    return torch, tm, jm, variables


def _patch_sample(torch, tm, noise):
    t_noise = torch.from_numpy(noise)

    def fixed_sample(mean, var, eps=1e-6):
        return t_noise * torch.sqrt(var + eps) + mean

    tm.latent_action.sample = fixed_sample


@pytest.mark.parametrize("single_action,use_variability,use_ema", [
    (True, True, True),
    (True, False, True),
    (False, True, True),
    (False, False, False),
])
def test_training_forward_parity(single_action, use_variability, use_ema):
    torch, tm, jm, variables = _build_pair(single_action, use_variability, use_ema)
    rng = np.random.RandomState(1)
    B = 2
    slots = rng.randn(B, T, NUM_SLOTS, SLOT_DIM).astype(np.float32) * 0.5
    noise_shape = (B, T - 1, ACTION_DIM) if single_action \
        else (B, T - 1, NUM_SLOTS, ACTION_DIM)
    noise = rng.randn(*noise_shape).astype(np.float32)

    _patch_sample(torch, tm, noise)
    with torch.no_grad():
        pred_t, out_t = tm(torch.from_numpy(slots), num_seed=NUM_SEED,
                           num_preds=NUM_PREDS)

    pred_j, out_j = jm.apply(variables, slots, num_seed=NUM_SEED,
                             num_preds=NUM_PREDS, noise=noise, train=False)

    np.testing.assert_allclose(np.asarray(pred_j), pred_t.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_j["action_idxs"]).squeeze(),
        out_t["action_idxs"].numpy().squeeze())
    for k in ("quant_loss", "commit_loss"):
        np.testing.assert_allclose(
            float(out_j["vq_losses"][k]), float(out_t["vq_losses"][k]),
            atol=1e-5, rtol=1e-4)


def test_posterior_inference_parity():
    torch, tm, jm, variables = _build_pair(True, True, True)
    rng = np.random.RandomState(2)
    B = 2
    slots = rng.randn(B, T, NUM_SLOTS, SLOT_DIM).astype(np.float32) * 0.5
    noise = rng.randn(B, T - 1, ACTION_DIM).astype(np.float32)

    _patch_sample(torch, tm, noise)
    with torch.no_grad():
        preds_t, _ = tm.forward_multiple_samples(
            torch.from_numpy(slots), num_samples=1, num_seed=NUM_SEED,
            num_preds=NUM_PREDS, use_posterior=True)

    preds_j = jm.apply(
        variables, slots, num_samples=1, num_seed=NUM_SEED, num_preds=NUM_PREDS,
        use_posterior=True, noise=noise,
        method=lambda m, *a, **k: m.forward_multiple_samples(*a, **k))
    np.testing.assert_allclose(np.asarray(preds_j), preds_t.numpy(),
                               atol=3e-5, rtol=1e-4)


def test_ema_update_parity():
    """One training step: EMA codebook update matches the reference exactly."""
    torch, tm, jm, variables = _build_pair(True, False, True)
    rng = np.random.RandomState(3)
    B = 2
    slots = rng.randn(B, T, NUM_SLOTS, SLOT_DIM).astype(np.float32) * 0.5
    noise = rng.randn(B, T - 1, ACTION_DIM).astype(np.float32)

    _patch_sample(torch, tm, noise)
    tm.train()
    with torch.no_grad():
        tm(torch.from_numpy(slots), num_seed=NUM_SEED, num_preds=NUM_PREDS)
    q_t = tm.latent_action.quantizer

    (_, _), new_vars = jm.apply(
        variables, slots, num_seed=NUM_SEED, num_preds=NUM_PREDS, noise=noise,
        train=True, mutable=["vq"])
    q_j = new_vars["vq"]["latent_action"]["quantizer"]
    np.testing.assert_allclose(np.asarray(q_j["ema_count"]),
                               q_t.ema_count.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q_j["ema_weight"]),
                               q_t.ema_weight.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q_j["codebook"]),
                               q_t.vq.embeddings["0"].weight.detach().numpy(),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("single_action", [True, False])
def test_training_mode_forward_parity(single_action):
    """TRAIN-mode forward (EMA VQ updating mid-forward) matches the
    reference — pred_slots AND the variability path.

    Round-4 regression guard: the reference computes the variability by
    RE-QUERYING the codebook (its get_variability call passes no
    action_idxs, quantization.py:365-366), so in EMA training the
    variability is z - POST-update nearest codeword and carries gradient
    into z. Reusing the straight-through protos instead matched every EVAL
    forward but diverged on every EMA TRAINING step (found by
    tools/trajectory_parity.py; pred_slots max diff 0.74 on a tiny config).
    """
    torch, tm, jm, variables = _build_pair(single_action, True, True)
    rng = np.random.RandomState(5)
    B = 2
    slots = rng.randn(B, T, NUM_SLOTS, SLOT_DIM).astype(np.float32) * 0.5
    noise_shape = (B, T - 1, ACTION_DIM) if single_action \
        else (B, T - 1, NUM_SLOTS, ACTION_DIM)
    noise = rng.randn(*noise_shape).astype(np.float32)

    _patch_sample(torch, tm, noise)
    tm.train()
    with torch.no_grad():
        pred_t, out_t = tm(torch.from_numpy(slots), num_seed=NUM_SEED,
                           num_preds=NUM_PREDS)

    import jax
    (pred_j, out_j), _ = jm.apply(
        variables, slots, num_seed=NUM_SEED, num_preds=NUM_PREDS, noise=noise,
        train=True, mutable=["vq"], rngs={"action": jax.random.PRNGKey(0)})

    np.testing.assert_allclose(np.asarray(pred_j), pred_t.detach().numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_j["action_variability"]),
        out_t["action_variability"].detach().numpy(), atol=3e-5, rtol=1e-4)
