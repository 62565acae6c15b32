"""
Unconditional OCVP predictor family + the autoregressive PredictorWrapper.

Capability parity with reference src/models/Predictors/transformers.py
(VanillaTransformerPredictor, OCVPSeq, OCVPPar — the reference never
registers OCVPPar in its factory; we register all three) and
src/models/Predictors/predictor_wrappers.py (sliding-buffer AR driver).
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from playslot_tpu.models.blocks import (
    MLP, MultiHeadAttention, SlotPositionalEncoding, TransformerEncoderBlock,
    xavier_init, zeros_init,
)


class VanillaTransformerPredictor(nn.Module):
    """Joint attention over all (frame, slot) tokens. Ref transformers.py:20-151."""

    num_slots: int
    slot_dim: int
    token_dim: int = 128
    hidden_dim: int = 256
    num_layers: int = 2
    n_heads: int = 4
    residual: bool = False
    input_buffer_size: int = 5
    pos_enc_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, deterministic=True):
        """(B, T, S, slot_dim) -> (B, T, S, slot_dim); last frame = prediction."""
        B, T, S, _ = inputs.shape
        x = nn.Dense(self.token_dim, kernel_init=xavier_init, bias_init=zeros_init,
                     dtype=self.dtype, name="mlp_in")(inputs)
        x = SlotPositionalEncoding(
            d_model=self.token_dim, max_len=self.input_buffer_size,
            dropout=self.pos_enc_dropout, name="pe")(x, deterministic=deterministic)
        x = x.reshape(B, T * S, self.token_dim)
        for i in range(self.num_layers):
            x = TransformerEncoderBlock(
                embed_dim=self.token_dim, head_dim=self.token_dim // self.n_heads,
                num_heads=self.n_heads, mlp_size=self.hidden_dim, dtype=self.dtype,
                name=f"block_{i}")(x, deterministic=deterministic)
        x = x.reshape(B, T, S, self.token_dim)
        out = nn.Dense(self.slot_dim, kernel_init=xavier_init, bias_init=zeros_init,
                       dtype=self.dtype, name="mlp_out")(x)
        return out + inputs if self.residual else out


class OCVPSeqLayer(nn.Module):
    """Sequential object-attention then time-attention. Ref transformers.py:275-340."""

    token_dim: int
    hidden_dim: int
    n_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        B, T, S, D = x.shape
        h = x.reshape(B * T, S, D)
        h = TransformerEncoderBlock(
            embed_dim=self.token_dim, head_dim=self.token_dim // self.n_heads,
            num_heads=self.n_heads, mlp_size=self.hidden_dim, dtype=self.dtype,
            name="object_encoder_block")(h, deterministic=deterministic)
        h = h.reshape(B, T, S, D).transpose(0, 2, 1, 3).reshape(B * S, T, D)
        h = TransformerEncoderBlock(
            embed_dim=self.token_dim, head_dim=self.token_dim // self.n_heads,
            num_heads=self.n_heads, mlp_size=self.hidden_dim, dtype=self.dtype,
            name="time_encoder_block")(h, deterministic=deterministic)
        return h.reshape(B, S, T, D).transpose(0, 2, 1, 3)


class OCVPSeq(nn.Module):
    """Alternating object/time attention predictor. Ref transformers.py:155-272."""

    num_slots: int
    slot_dim: int
    token_dim: int = 128
    hidden_dim: int = 256
    num_layers: int = 2
    n_heads: int = 4
    residual: bool = False
    input_buffer_size: int = 5
    pos_enc_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, deterministic=True):
        x = nn.Dense(self.token_dim, kernel_init=xavier_init, bias_init=zeros_init,
                     dtype=self.dtype, name="mlp_in")(inputs)
        x = SlotPositionalEncoding(
            d_model=self.token_dim, max_len=self.input_buffer_size,
            dropout=self.pos_enc_dropout, name="pe")(x, deterministic=deterministic)
        for i in range(self.num_layers):
            x = OCVPSeqLayer(token_dim=self.token_dim, hidden_dim=self.hidden_dim,
                             n_heads=self.n_heads, dtype=self.dtype,
                             name=f"layer_{i}")(x, deterministic=deterministic)
        out = nn.Dense(self.slot_dim, kernel_init=xavier_init, bias_init=zeros_init,
                       dtype=self.dtype, name="mlp_out")(x)
        return out + inputs if self.residual else out


class OCVPParLayer(nn.Module):
    """Parallel object+time attention averaged. Ref transformers.py:462-542."""

    token_dim: int
    hidden_dim: int
    n_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        B, T, S, D = x.shape
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_att")(x)

        obj = MultiHeadAttention(
            emb_dim=self.token_dim, head_dim=self.token_dim // self.n_heads,
            num_heads=self.n_heads, dtype=self.dtype,
            name="object_encoder_block")(h.reshape(B * T, S, D))
        obj = obj.reshape(B, T, S, D)

        tt = h.transpose(0, 2, 1, 3).reshape(B * S, T, D)
        tt = MultiHeadAttention(
            emb_dim=self.token_dim, head_dim=self.token_dim // self.n_heads,
            num_heads=self.n_heads, dtype=self.dtype, name="time_encoder_block")(tt)
        tt = tt.reshape(B, S, T, D).transpose(0, 2, 1, 3)

        # residual is added to the LayerNormed input h, NOT the raw x —
        # this re-normalizes the residual stream every layer, unlike the
        # pre-LN TransformerEncoderBlock, but it is exactly what the
        # reference OCVPParLayer does (transformers.py:523-538:
        # `inputs = self.ln_att(inputs); ... y = y + inputs`)
        y = (obj + tt) / 2 + h
        z = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_mlp")(y)
        z = MLP(hidden_dim=self.hidden_dim, dtype=self.dtype, name="mlp")(z)
        return z + y


class OCVPPar(nn.Module):
    """Parallel-attention OCVP predictor. Ref transformers.py:344-459."""

    num_slots: int
    slot_dim: int
    token_dim: int = 128
    hidden_dim: int = 256
    num_layers: int = 2
    n_heads: int = 4
    residual: bool = False
    input_buffer_size: int = 5
    pos_enc_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, deterministic=True):
        x = nn.Dense(self.token_dim, kernel_init=xavier_init, bias_init=zeros_init,
                     dtype=self.dtype, name="mlp_in")(inputs)
        x = SlotPositionalEncoding(
            d_model=self.token_dim, max_len=self.input_buffer_size,
            dropout=self.pos_enc_dropout, name="pe")(x, deterministic=deterministic)
        for i in range(self.num_layers):
            x = OCVPParLayer(token_dim=self.token_dim, hidden_dim=self.hidden_dim,
                             n_heads=self.n_heads, dtype=self.dtype,
                             name=f"layer_{i}")(x, deterministic=deterministic)
        out = nn.Dense(self.slot_dim, kernel_init=xavier_init, bias_init=zeros_init,
                       dtype=self.dtype, name="mlp_out")(x)
        return out + inputs if self.residual else out


def predictor_wrapper_rollout(apply_fn, slot_history, num_context, num_preds,
                              input_buffer_size, teacher_force=False,
                              get_pred_only=False):
    """
    Sliding-buffer autoregressive rollout driving an unconditional predictor.
    Capability parity with reference predictor_wrappers.py:44-124, as a pure
    function over the applied predictor (statically unrolled; jit-friendly).

    apply_fn: (slots (B, T, S, D), step: int) -> (B, T, S, D) one-step-ahead
    predictions. The static step index lets training callers fold a fresh
    dropout rng per autoregressive step (the reference's PredictorWrapper
    draws fresh noise on every forward; a fixed rngs dict would repeat the
    same mask whenever the sliding buffer shape repeats).
    Returns (B, num_preds_out, S, D).
    """
    buffer_size = max(input_buffer_size or num_context, num_context)
    start = num_context if get_pred_only else 1
    n_steps = num_preds if get_pred_only else num_context + num_preds - 1

    buf = slot_history[:, :start]
    preds = []
    for t in range(n_steps):
        cur = apply_fn(buf, t)[:, -1]
        preds.append(cur)
        nxt = slot_history[:, start + t] if teacher_force else cur
        buf = jnp.concatenate([buf, nxt[:, None]], axis=1)
        if buf.shape[1] > buffer_size:
            buf = buf[:, buf.shape[1] - buffer_size:]
    return jnp.stack(preds, axis=1)


OCVP_MODELS = {
    "VanillaTransformer": VanillaTransformerPredictor,
    "OCVPSeq": OCVPSeq,
    "OCVPPar": OCVPPar,
}
