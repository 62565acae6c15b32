"""
Slot dynamics models — forecast future object slots conditioned on past
slots, action prototypes and variability embeddings.

Capability parity with reference src/models/Predictors/DynamicsModels.py:
  * MarkovTransformerDynamicsModel: p(s_t | s_{t-1}, a_t), per-frame
    attention over slots only (DynamicsModels.py:152-316).
  * SlotGPTDynamicsModel: GPT over flattened (frame x slot) tokens with the
    block-staircase causal mask + time-only positional encoding
    (DynamicsModels.py:321-550).

TPU design notes: autoregressive rollouts are *statically unrolled* — every
step is traced once with static shapes and the whole rollout compiles into a
single XLA program (the reference re-dispatches Python per step). The sliding
`context_length` window is replicated exactly (crop semantics of
DynamicsModels.py:519-527), so outputs match the reference bit-for-bit
modulo float reassociation.
"""

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from playslot_tpu.models.blocks import (
    SlotPositionalEncoding, TransformerDecoderBlock, xavier_init, zeros_init,
)
from playslot_tpu.ops.masks import build_slot_causal_mask

CONDITION_MODES = ("sum", "concat")


class BaseSlotDynamicsModel(nn.Module):
    """Shared conditioning/embedding scaffolding (DynamicsModels.py:24-148)."""

    slot_dim: int = 64
    embed_dim: int = 128
    num_actions: Optional[int] = None
    action_dim: Optional[int] = None
    condition_mode: str = "sum"
    use_variability: bool = False
    residual: bool = False
    head_dim: int = 32
    num_heads: int = 4
    mlp_size: int = 512
    num_layers: int = 4
    dtype: Any = None

    @property
    def predictor_dim(self):
        if self.condition_mode == "sum":
            return self.embed_dim
        if self.use_variability:
            return self.embed_dim + 2 * self.action_dim
        return self.embed_dim + self.action_dim

    def _setup_common(self):
        if self.condition_mode not in CONDITION_MODES:
            raise ValueError(f"{self.condition_mode=} not in {CONDITION_MODES}")
        self.tok_emb = nn.Dense(self.embed_dim, kernel_init=xavier_init,
                                bias_init=zeros_init, dtype=self.dtype, name="tok_emb")
        if self.condition_mode == "sum":
            self.action_emb = nn.Dense(self.embed_dim, kernel_init=xavier_init,
                                       bias_init=zeros_init, dtype=self.dtype,
                                       name="action_emb")
            if self.use_variability:
                self.variability_emb = nn.Dense(
                    self.embed_dim, kernel_init=xavier_init, bias_init=zeros_init,
                    dtype=self.dtype, name="variability_emb")
        self.head_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")
        self.head_out = nn.Dense(self.slot_dim, kernel_init=xavier_init,
                                 bias_init=zeros_init, dtype=self.dtype, name="head_out")
        self.blocks = [
            TransformerDecoderBlock(
                embed_dim=self.predictor_dim, head_dim=self.head_dim,
                num_heads=self.num_heads, mlp_size=self.mlp_size,
                use_cross_attn=False, project_out=True, dtype=self.dtype,
                name=f"block_{i}")
            for i in range(self.num_layers)
        ]

    def condition_slots(self, tokens, action_protos, action_vars=None):
        """Action conditioning: 'sum' (project+add) or 'concat'."""
        assert action_protos is not None
        if self.condition_mode == "sum":
            out = tokens + self.action_emb(action_protos)
            if self.use_variability:
                assert action_vars is not None, "variability latents required"
                out = out + self.variability_emb(action_vars)
            return out
        parts = [tokens, action_protos] + (
            [action_vars] if self.use_variability else [])
        return jnp.concatenate(parts, axis=-1)

    def regression_head(self, x):
        return self.head_out(self.head_norm(x))

    def __call__(self, slots, action_protos, action_vars=None, num_seed=None,
                 num_preds=None, autoregressive=None, get_pred_only=False,
                 deterministic=True):
        """Dispatch to AR or parallel (teacher-forced) mode."""
        if autoregressive is None:
            raise ValueError("autoregressive must be True/False")
        if autoregressive:
            return self.forward_autoregressive(
                slots, action_protos, action_vars=action_vars, num_seed=num_seed,
                num_preds=num_preds, get_pred_only=get_pred_only,
                deterministic=deterministic)
        return self.forward_single(slots, action_protos, action_vars=action_vars,
                                   deterministic=deterministic)


class MarkovTransformerDynamicsModel(BaseSlotDynamicsModel):
    """Markovian dynamics: next slots depend only on current slots + action."""

    def setup(self):
        self._setup_common()

    def forward_single(self, slots, action_protos, action_vars=None,
                       deterministic=True):
        """
        slots: (B, F, S, slot_dim); per-frame self-attention over slots only.
        Ref DynamicsModels.py:270-316.
        """
        assert slots.shape[:-1] == action_protos.shape[:-1], \
            f"{slots.shape=} vs {action_protos.shape=}"
        B, F, S, _ = slots.shape
        x = self.condition_slots(self.tok_emb(slots), action_protos, action_vars)
        x = x.reshape(B * F, S, -1)
        for block in self.blocks:
            x = block(x, deterministic=deterministic)
        pred = self.regression_head(x).reshape(B, F, S, self.slot_dim)
        return pred + slots if self.residual else pred

    def forward_autoregressive(self, slots, action_protos, action_vars=None,
                               num_seed=None, num_preds=None, get_pred_only=False,
                               deterministic=True):
        """Statically-unrolled AR rollout. Ref DynamicsModels.py:221-267."""
        assert num_seed is not None and num_preds is not None
        preds = []
        inp = slots[:, :1]
        for i in range(num_seed + num_preds - 1):
            cur = self.forward_single(
                inp, action_protos[:, i:i + 1],
                action_vars[:, i:i + 1] if self.use_variability else None,
                deterministic=deterministic)
            if not get_pred_only or i >= num_seed - 1:
                preds.append(cur)
            inp = slots[:, i + 1:i + 2] if i < num_seed - 1 else cur
        return jnp.concatenate(preds, axis=1)


class SlotGPTDynamicsModel(BaseSlotDynamicsModel):
    """GPT over (frame x slot) tokens with block-staircase causality."""

    context_length: int = 8
    pos_enc_dropout: float = 0.1

    def setup(self):
        self._setup_common()
        self.pos_emb = SlotPositionalEncoding(
            d_model=self.predictor_dim, max_len=self.context_length,
            dropout=self.pos_enc_dropout, name="pos_emb")

    def forward_single(self, slots, action_protos, action_vars=None,
                       deterministic=True):
        """
        Parallel (teacher-forced) forward over a full window.
        slots: (B, F, S, slot_dim), F <= context_length.
        Ref DynamicsModels.py:457-516.
        """
        assert slots.shape[:-1] == action_protos.shape[:-1], \
            f"{slots.shape=} vs {action_protos.shape=}"
        B, F, S, _ = slots.shape
        if F > self.context_length:
            raise ValueError(f"{F=} cannot exceed {self.context_length=}")
        x = self.condition_slots(self.tok_emb(slots), action_protos, action_vars)
        x = self.pos_emb(x, deterministic=deterministic)
        x = x.reshape(B, F * S, -1)
        mask = build_slot_causal_mask(F, S)[None, None]  # (1, 1, T, T)
        for block in self.blocks:
            # block_causal_slots routes to the fused Pallas staircase-
            # attention kernel on TPU (mask arg is the XLA fallback)
            x = block(x, self_attn_mask=mask, deterministic=deterministic,
                      block_causal_slots=S)
        pred = self.regression_head(x).reshape(B, F, S, self.slot_dim)
        return pred + slots if self.residual else pred

    def forward_cached(self, slots, action_protos, action_vars=None,
                       caches=None, offset=0):
        """
        KV-cached incremental forward: process only the NEW frames given the
        per-layer key/value buffers of all previously-processed frames.

        Exact alternative to the windowed-recompute path while the context
        window is still GROWING (total frames <= context_length): token
        positions never shift, so cached keys/values equal what a full
        recompute would produce (SURVEY.md §7.3 "AR rollout with sliding
        window + KV cache"; the reference has no cache and recomputes —
        DynamicsModels.py:396-454).

        Args:
            slots: (B, F_new, S, slot_dim) new frames (F_new = num_seed when
                priming, 1 per AR step after).
            action_protos/action_vars: conditioning for the new frames only.
            caches: list (one per layer) of {"k","v": (B, Tmax, H, Dh),
                "len": int32} — see engine.rollout.init_kv_caches.
            offset: global frame index of slots[:, 0] (for the time-only PE).

        Returns (pred (B, F_new, S, slot_dim), new_caches).
        """
        assert caches is not None and len(caches) == self.num_layers
        B, F, S, _ = slots.shape
        x = self.condition_slots(self.tok_emb(slots), action_protos, action_vars)
        x = self.pos_emb(x, offset=offset, deterministic=True)
        x = x.reshape(B, F * S, -1)
        new_caches = []
        for block, c in zip(self.blocks, caches):
            x, c = block(x, deterministic=True, block_causal_slots=S, cache=c)
            new_caches.append(c)
        pred = self.regression_head(x).reshape(B, F, S, self.slot_dim)
        if self.residual:
            pred = pred + slots
        return pred, new_caches

    def enforce_window(self, *tensors):
        """Crop trailing context_length frames (DynamicsModels.py:519-527)."""
        out = []
        for t in tensors:
            if t is not None and t.shape[1] > self.context_length:
                t = t[:, -self.context_length:]
            out.append(t)
        return out

    def forward_autoregressive(self, slots, action_protos, action_vars=None,
                               num_seed=None, num_preds=None, get_pred_only=False,
                               deterministic=True):
        """
        Statically-unrolled windowed AR rollout, replicating the reference's
        full-window recompute semantics (DynamicsModels.py:396-454). Each
        step's window shape is static, so XLA compiles one fused program for
        the whole rollout.
        """
        assert num_seed is not None and num_preds is not None
        preds = []
        num_steps = num_preds if get_pred_only else num_seed + num_preds - 1
        inp = slots[:, :num_seed] if get_pred_only else slots[:, :1]
        for i in range(num_steps):
            idx = num_seed + i if get_pred_only else i + 1
            cur_act = action_protos[:, :idx]
            cur_var = action_vars[:, :idx] if action_vars is not None else None
            w_slots, w_act, w_var = self.enforce_window(inp, cur_act, cur_var)
            cur = self.forward_single(w_slots, w_act, w_var,
                                      deterministic=deterministic)[:, -1:]
            preds.append(cur)
            if not get_pred_only and i < num_seed - 1:
                inp = slots[:, :idx + 1]
            else:
                inp = jnp.concatenate([inp, cur], axis=1)
        return jnp.concatenate(preds, axis=1)


DYNAMICS_MODELS = {
    "MarkovTransformerDynamicsModel": MarkovTransformerDynamicsModel,
    # reference class name carries a typo ("Dymamics"); accept both spellings
    "SlotGPTDymamicsModel": SlotGPTDynamicsModel,
    "SlotGPTDynamicsModel": SlotGPTDynamicsModel,
}


def get_dynamics_model(cfg, slot_dim, num_actions, action_dim, condition_mode,
                       use_variability, dtype=None, name="dynamics_model"):
    """Factory mirroring reference _get_dynamics_model."""
    model_name = cfg["model_name"]
    if model_name not in DYNAMICS_MODELS:
        raise ValueError(f"Unknown dynamics model {model_name}")
    p = dict(cfg.get("model_params") or {})
    p.pop("pos_enc_dropout_unused", None)
    cls = DYNAMICS_MODELS[model_name]
    kwargs = dict(
        slot_dim=slot_dim, num_actions=num_actions, action_dim=action_dim,
        condition_mode=condition_mode, use_variability=use_variability,
        residual=p.get("residual", False), embed_dim=p.get("embed_dim", 128),
        head_dim=p.get("head_dim", 32), num_heads=p.get("num_heads", 4),
        mlp_size=p.get("mlp_size", 512), num_layers=p.get("num_layers", 4),
        dtype=dtype, name=name,
    )
    if cls is SlotGPTDynamicsModel:
        kwargs["context_length"] = p.get("context_length", 8)
        kwargs["pos_enc_dropout"] = p.get("pos_enc_dropout", 0.1)
    return cls(**kwargs)
