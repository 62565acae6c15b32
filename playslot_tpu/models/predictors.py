"""
PlaySlot latent-action predictors — compose InvDyn (latent-action inference)
with a conditional dynamics model — plus the GT-action-conditioned OCVP.

Capability parity with reference src/models/Predictors/LatentActionPredictors.py
(SlotLatentPredictor = InvDynM variant, SlotSingleActionPredictor = InvDynS
variant) and src/models/Predictors/ActionConditional_OCVP.py.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from playslot_tpu.models.blocks import xavier_init, zeros_init
from playslot_tpu.models.dynamics import get_dynamics_model
from playslot_tpu.models.invdyn import LATENT_ACTION_MODELS


def _inflate_per_slot(x, num_slots):
    """(B, T, A) -> (B, T, S, A) by repeating across the slot axis."""
    return jnp.tile(x[:, :, None, :], (1, 1, num_slots, 1))


class BaseSlotLatentPredictor(nn.Module):
    """Shared rollout drivers (LatentActionPredictors.py:27-247)."""

    slot_dim: int
    num_actions: int
    action_dim: int
    condition_mode: str = "sum"
    use_variability: bool = False
    autoregressive_dynamics: bool = True
    LatentAction: Optional[dict] = None
    DynamicsModel: Optional[dict] = None
    dtype: Any = None

    # subclass hooks ------------------------------------------------------
    PER_SLOT_ACTIONS = True  # InvDynM: one action per slot

    def setup(self):
        la_cfg = self.LatentAction or {}
        la_name = la_cfg.get("model_name")
        if la_name not in LATENT_ACTION_MODELS:
            raise ValueError(f"Unknown latent action model {la_name}")
        la_params = dict(la_cfg.get("model_params") or {})
        self.latent_action = LATENT_ACTION_MODELS[la_name](
            slot_dim=self.slot_dim, action_dim=self.action_dim,
            num_actions=self.num_actions, dtype=self.dtype, name="latent_action",
            **la_params)
        self.dynamics_model = get_dynamics_model(
            self.DynamicsModel, slot_dim=self.slot_dim, num_actions=self.num_actions,
            action_dim=self.action_dim, condition_mode=self.condition_mode,
            use_variability=self.use_variability, dtype=self.dtype,
            name="dynamics_model")

    # ---------------------------------------------------------------- train
    def __call__(self, slots, num_seed, num_preds, train=False, noise=None,
                 **kwargs):
        """
        Training forward: infer posterior latent actions from the FULL slot
        sequence, drop the last frame, predict the next slots
        (LatentActionPredictors.py:318-367 / 471-498).

        slots: (B, num_seed + num_preds, S, slot_dim)
        Returns (pred_slots, model_out).
        """
        T = slots.shape[1]
        if T < num_seed + num_preds:
            raise ValueError(f"{T=} must be >= {num_seed + num_preds=}")
        slots = slots[:, :num_seed + num_preds]
        num_slots = slots.shape[2]

        la_out = self.latent_action(slots, noise=noise, train=train)
        action_protos = la_out.pop("action_proto")
        action_vars = la_out.get("action_variability")

        if not self.PER_SLOT_ACTIONS:
            action_protos = _inflate_per_slot(action_protos, num_slots)
            if action_vars is not None:
                action_vars = _inflate_per_slot(action_vars, num_slots)

        pred_slots = self.dynamics_model(
            slots=slots[:, :-1],
            action_protos=action_protos,
            action_vars=action_vars if self.use_variability else None,
            num_seed=num_seed, num_preds=num_preds,
            autoregressive=self.autoregressive_dynamics)

        model_out = {"pred_slots": pred_slots, **la_out}
        return pred_slots, model_out

    # ------------------------------------------------------------ inference
    def autoregressive_inference(self, seed_slots, action_protos=None,
                                 action_vars=None, N=10):
        """
        Predict N future slot sets; random actions/variabilities are sampled
        from the codebook when not given (LatentActionPredictors.py:166-226).
        """
        B, seed_frames, num_slots, slot_dim = seed_slots.shape
        if action_protos is None:
            action_protos, action_idx = self.get_random_actions(seed_slots, N)
        else:
            action_idx = None
            if action_protos.ndim != 4:
                action_protos = _inflate_per_slot(action_protos, num_slots)

        if not self.use_variability:
            action_vars = None
        elif action_vars is None:
            assert action_idx is not None
            action_vars = self.get_random_latents(seed_slots, N,
                                                  src_action_idx=action_idx)
        elif action_vars.ndim != 4:
            action_vars = _inflate_per_slot(action_vars, num_slots)

        pred = self.dynamics_model(
            slots=seed_slots, action_protos=action_protos, action_vars=action_vars,
            num_seed=seed_frames, num_preds=N, autoregressive=True,
            get_pred_only=True)
        return pred.reshape(B, N, num_slots, slot_dim), action_idx

    def forward_multiple_samples(self, slot_history, num_samples, num_seed,
                                 num_preds, use_posterior=False, noise=None):
        """
        N stochastic rollouts; optionally the first uses the InvDyn posterior
        (LatentActionPredictors.py:91-163).
        Returns all_pred_slots (B, num_samples, num_preds, S, slot_dim).
        """
        num_frames, num_slots = slot_history.shape[1], slot_history.shape[2]
        seed_slots = slot_history[:, :num_seed]
        if use_posterior and num_frames < num_seed + num_preds:
            raise ValueError(f"posterior requires {num_seed + num_preds} frames")

        all_preds = []
        if use_posterior:
            la_out = self.latent_action(slot_history, noise=noise, train=False)
            protos = la_out["action_proto"]
            avars = la_out["action_variability"] if self.use_variability else None
            if protos.ndim == 3:  # single-action model
                protos = _inflate_per_slot(protos, num_slots)
                if avars is not None:
                    avars = _inflate_per_slot(avars, num_slots)
            pred, _ = self.autoregressive_inference(
                seed_slots, action_protos=protos, action_vars=avars, N=num_preds)
            all_preds.append(pred)

        n_prior = num_samples - 1 if use_posterior else num_samples
        for _ in range(n_prior):
            pred, _ = self.autoregressive_inference(
                seed_slots, action_protos=None, action_vars=None, N=num_preds)
            all_preds.append(pred)
        return jnp.stack(all_preds, axis=1)

    # ------------------------------------------------------------- sampling
    def get_random_actions(self, slots, num_preds):
        raise NotImplementedError

    def get_random_latents(self, slots, num_preds, src_action_idx):
        """
        Random variability = alpha * (random target codeword - source codeword),
        alpha ~ U[0, 0.5) (LatentActionPredictors.py:377-398 / 511-532).
        """
        size = self._latent_size(slots, num_preds)
        codebook = self.latent_action.quantizer.codebook
        target_idx = jax.random.randint(self.make_rng("action"), size, 0,
                                        self.num_actions)
        target = jnp.take(codebook, target_idx, axis=0)
        src = jnp.asarray(src_action_idx)
        while src.ndim < len(size):  # e.g. (B, T) source ids vs (B, T, 1) size
            src = src[..., None]
        source = jnp.take(codebook, jnp.broadcast_to(src, size), axis=0)
        alpha = jax.random.uniform(self.make_rng("action"), size) / 2.0
        # single-action latents stay (B, T, 1, A) and broadcast over slots in
        # the conditioning sum, exactly like the reference (511-532)
        return (target - source) * alpha[..., None]


class SlotLatentPredictor(BaseSlotLatentPredictor):
    """PlaySlot with InvDynM: per-slot latent actions."""

    PER_SLOT_ACTIONS = True

    def get_random_actions(self, slots, num_preds):
        B, seed_frames, num_slots, _ = slots.shape
        shape = (B, seed_frames + num_preds, num_slots)
        return self.latent_action.get_action(shape=shape)

    def _latent_size(self, slots, num_preds):
        B, seed_frames, num_slots, _ = slots.shape
        return (B, seed_frames + num_preds, num_slots)


class SlotSingleActionPredictor(BaseSlotLatentPredictor):
    """PlaySlot with InvDynS: one latent action per frame, repeated per slot."""

    PER_SLOT_ACTIONS = False

    def get_random_actions(self, slots, num_preds):
        B, seed_frames, num_slots, _ = slots.shape
        embs, idx = self.latent_action.get_action(shape=(B, seed_frames + num_preds))
        return _inflate_per_slot(embs, num_slots), idx

    def _latent_size(self, slots, num_preds):
        B, seed_frames, _, _ = slots.shape
        return (B, seed_frames + num_preds, 1)


class ActionCondOCVP(nn.Module):
    """
    Object-centric video prediction conditioned on GROUND-TRUTH robot actions
    (reference ActionConditional_OCVP.py:23-128).
    """

    slot_dim: int
    raw_action_dim: int
    action_embed_dim: int
    condition_mode: str = "sum"
    autoregressive_dynamics: bool = True
    DynamicsModel: Optional[dict] = None
    dtype: Any = None

    def setup(self):
        self.action_encoder = nn.Dense(
            self.action_embed_dim, kernel_init=xavier_init, bias_init=zeros_init,
            dtype=self.dtype, name="action_encoder")
        self.dynamics_model = get_dynamics_model(
            self.DynamicsModel, slot_dim=self.slot_dim, num_actions=4,
            action_dim=self.action_embed_dim, condition_mode=self.condition_mode,
            use_variability=False, dtype=self.dtype, name="dynamics_model")

    def __call__(self, slot_history, actions, num_seed, num_preds, **kwargs):
        num_frames, num_slots = slot_history.shape[1], slot_history.shape[2]
        if num_frames < num_seed + num_preds - 1:
            raise ValueError(f"{num_frames=} too small for {(num_seed, num_preds)=}")
        if actions.shape[1] < num_seed + num_preds - 1:
            raise ValueError(f"{actions.shape=} too small for {(num_seed, num_preds)=}")
        slot_history = slot_history[:, :num_seed + num_preds - 1]
        actions = actions[:, :num_seed + num_preds - 1]

        action_embs = self.action_encoder(actions)  # (B, T, A_emb)
        action_embs = _inflate_per_slot(action_embs, num_slots)

        pred_slots = self.dynamics_model(
            slots=slot_history, action_protos=action_embs, action_vars=None,
            num_seed=num_seed, num_preds=num_preds,
            autoregressive=self.autoregressive_dynamics)
        return pred_slots, {"pred_slots": pred_slots}
