"""
Downstream behavior-learning heads.

Capability parity with reference src/models/Downstream/:
  * MarkovBehaviorCloner — slots of a frame + [ACT] token -> transformer ->
    latent action (behavior_predictor.py:53-113).
  * MLPActionDecoder — latent action -> robot action (action_decoding.py:9-48).
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from playslot_tpu.models.blocks import TransformerEncoderBlock, xavier_init, zeros_init


class MarkovBehaviorCloner(nn.Module):
    slot_dim: int
    action_dim: int
    emb_dim: int = 128
    num_layers: int = 4
    num_heads: int = 4
    head_dim: int = 32
    mlp_dim: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, slots, deterministic=True):
        """slots (B, T, S, slot_dim) -> latent actions (B, T, action_dim)."""
        assert slots.ndim == 4, f"{slots.shape=} must be (B, T, S, slot_dim)"
        B, T, S, _ = slots.shape
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="slot_norm")(slots)
        h = nn.Dense(self.emb_dim, kernel_init=xavier_init, bias_init=zeros_init,
                     dtype=self.dtype, name="slot_proj")(h)
        act = self.param("act_token", zeros_init, (1, 1, self.emb_dim))
        act = jnp.tile(act[None].astype(h.dtype), (B, T, 1, 1))
        tokens = jnp.concatenate([act, h], axis=2).reshape(B * T, S + 1, -1)
        for i in range(self.num_layers):
            tokens = TransformerEncoderBlock(
                embed_dim=self.emb_dim, head_dim=self.head_dim,
                num_heads=self.num_heads, mlp_size=self.mlp_dim, project_out=True,
                dtype=self.dtype, name=f"block_{i}")(tokens,
                                                     deterministic=deterministic)
        out = tokens[:, 0]
        out = nn.Dense(self.action_dim, kernel_init=xavier_init, bias_init=zeros_init,
                       dtype=self.dtype, name="latent_action_predictor")(out)
        return out.reshape(B, T, self.action_dim)


class MLPActionDecoder(nn.Module):
    out_dim: int
    hidden_dim: Sequence[int] = (128, 128)
    dtype: Any = None

    @nn.compact
    def __call__(self, latent_action):
        h = latent_action
        for i, d in enumerate(self.hidden_dim):
            h = nn.Dense(d, kernel_init=xavier_init, bias_init=zeros_init,
                         dtype=self.dtype, name=f"fc_{i}")(h)
            h = jax.nn.relu(h)
        return nn.Dense(self.out_dim, kernel_init=xavier_init, bias_init=zeros_init,
                        dtype=self.dtype, name="fc_out")(h)


BEHAVIOR_MODELS = {"MarkovBehaviorCloner": MarkovBehaviorCloner}
ACTION_DECODERS = {"MLPDecoder": MLPActionDecoder}
