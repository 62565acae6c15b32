"""
Core neural building blocks (flax.linen).

Capability parity with reference src/models/BlocksUtils/{model_blocks,attention}.py,
re-designed for TPU/XLA: channels-last convs, fused einsum attention, static
masks, erf-GELU to match torch numerics for checkpoint-conversion parity.
"""

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from playslot_tpu.ops.grids import build_grid

Dtype = Any

# torch-compatible initializers: xavier-uniform kernels, zero biases
xavier_init = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros


class MLP(nn.Module):
    """2-layer MLP (Dense -> GELU/ReLU -> Dense). Ref model_blocks.py:278-309."""

    hidden_dim: int
    out_dim: Optional[int] = None
    use_gelu: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim if self.out_dim is not None else x.shape[-1]
        h = nn.Dense(self.hidden_dim, kernel_init=xavier_init, bias_init=zeros_init,
                     dtype=self.dtype)(x)
        # approximate=False = erf GELU, matching torch nn.GELU numerics
        h = jax.nn.gelu(h, approximate=False) if self.use_gelu else jax.nn.relu(h)
        return nn.Dense(out_dim, kernel_init=xavier_init, bias_init=zeros_init,
                        dtype=self.dtype)(h)


class TorchGRUCell(nn.Module):
    """
    GRU cell with the torch parameterization (separate input/hidden biases,
    gate order [reset, update, new]) so reference GRUCell checkpoints convert
    exactly. Ref usage: attention.py:112-116 (slot refinement).
    """

    hidden_dim: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, h):
        d = self.hidden_dim
        wi = self.param("wi", xavier_init, (x.shape[-1], 3 * d))
        wh = self.param("wh", nn.initializers.orthogonal(), (d, 3 * d))
        bi = self.param("bi", zeros_init, (3 * d,))
        bh = self.param("bh", zeros_init, (3 * d,))
        dtype = self.dtype or x.dtype
        gi = jnp.dot(x, wi.astype(dtype)) + bi.astype(dtype)
        gh = jnp.dot(h, wh.astype(dtype)) + bh.astype(dtype)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class MultiHeadAttention(nn.Module):
    """
    Multi-head dot-product attention (self or cross).
    Ref attention.py:144-369 (MetaAttention / MHSA / MHCA). One fused einsum
    path; additive -1e9 masking for `mask == 0` entries.
    """

    emb_dim: int
    head_dim: Optional[int] = None
    num_heads: int = 1
    self_attn: bool = True
    # kv_dim exists for API parity with the reference (attention.py:170,191
    # sizes the k/v Linears by it); flax Dense infers input width from the
    # kv array, so it needs no wiring here
    kv_dim: Optional[int] = None
    project_out: bool = False
    # reference parity: dropout lives INSIDE the out-projection Sequential
    # (attention.py:193-198) and is intentionally skipped when needs_proj is
    # False — the reference's `nn.Identity()` branch has no dropout either
    dropout: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, kv=None, mask=None, deterministic=True,
                 block_causal_slots=None, cache=None):
        head_dim = self.head_dim if self.head_dim is not None else self.emb_dim
        inner = self.num_heads * head_dim
        needs_proj = (inner != self.emb_dim) or self.project_out
        kv = x if self.self_attn else kv
        assert kv is not None, "cross-attention requires kv input"

        dense = lambda name: nn.Dense(inner, use_bias=False, kernel_init=xavier_init,
                                      dtype=self.dtype, name=name)
        q = dense("q")(x)
        k = dense("k")(kv)
        v = dense("v")(kv)

        B, Lq = q.shape[0], q.shape[1]
        Lk = k.shape[1]
        q = q.reshape(B, Lq, self.num_heads, head_dim)
        k = k.reshape(B, Lk, self.num_heads, head_dim)
        v = v.reshape(B, Lk, self.num_heads, head_dim)

        if cache is not None:
            # KV-cached incremental decode (engine/rollout.kv_cached_rollout):
            # append this call's keys/values into the fixed-size buffers at
            # position `len`, then attend the new queries over the whole
            # buffer under the frame-staircase rule. Valid while positions
            # don't slide (window growing phase) — see engine/rollout.py.
            assert self.self_attn and block_causal_slots is not None
            S = int(block_causal_slots)
            cache_len = cache["len"]  # traced int32, multiple of S
            k_buf = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype),
                                                 (0, cache_len, 0, 0))
            v_buf = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype),
                                                 (0, cache_len, 0, 0))
            Tmax = k_buf.shape[1]
            scale = head_dim ** -0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_buf,
                                preferred_element_type=jnp.float32) * scale
            frame_j = jax.lax.broadcasted_iota(jnp.int32, (Lq, Tmax), 1) // S
            frame_i = (cache_len
                       + jax.lax.broadcasted_iota(jnp.int32, (Lq, Tmax), 0)) // S
            allowed = frame_j <= frame_i  # cached frames + own frame
            logits = jnp.where(allowed[None, None], logits, jnp.float32(-1e9))
            attn = jax.nn.softmax(logits, axis=-1)
            self.sow("intermediates", "attn", attn)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v_buf.dtype), v_buf,
                             preferred_element_type=jnp.float32).astype(v.dtype)
            out = out.reshape(B, Lq, inner)
            if needs_proj:
                out = nn.Dense(self.emb_dim, kernel_init=xavier_init,
                               bias_init=zeros_init, dtype=self.dtype,
                               name="out_proj")(out)
            new_cache = {"k": k_buf, "v": v_buf, "len": cache_len + Lq}
            return out, new_cache

        if block_causal_slots is not None and self.self_attn:
            # staircase-mask self-attention (SlotGPT): on TPU, dispatch to the
            # fused Pallas kernel (mask computed inline from iota, QK^T ->
            # softmax -> AV in one VMEM pass; custom_vjp so training works)
            from playslot_tpu.ops.dispatch import pallas_interpret, use_pallas
            if use_pallas("block_causal"):
                from playslot_tpu.ops.pallas.block_causal_attention_kernel \
                    import block_causal_attention_pallas
                qh = q.transpose(0, 2, 1, 3).reshape(B * self.num_heads, Lq,
                                                     head_dim)
                kh = k.transpose(0, 2, 1, 3).reshape(B * self.num_heads, Lk,
                                                     head_dim)
                vh = v.transpose(0, 2, 1, 3).reshape(B * self.num_heads, Lk,
                                                     head_dim)
                out = block_causal_attention_pallas(
                    qh, kh, vh, int(block_causal_slots),
                    interpret=pallas_interpret())
                out = out.reshape(B, self.num_heads, Lq, head_dim) \
                    .transpose(0, 2, 1, 3).reshape(B, Lq, inner)
                if self.is_mutable_collection("intermediates"):
                    # attention maps live inside the kernel; recompute them
                    # (cheap at these token counts) so introspection matches
                    # the XLA fallback when capture_intermediates is on
                    S = int(block_causal_slots)
                    scale = head_dim ** -0.5
                    logits = jnp.einsum(
                        "bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
                    fj = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 1) // S
                    fi = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 0) // S
                    logits = jnp.where((fj <= fi)[None, None], logits,
                                       jnp.float32(-1e9))
                    self.sow("intermediates", "attn",
                             jax.nn.softmax(logits, axis=-1))
                if needs_proj:
                    out = nn.Dense(self.emb_dim, kernel_init=xavier_init,
                                   bias_init=zeros_init, dtype=self.dtype,
                                   name="out_proj")(out)
                    if self.dropout > 0:
                        out = nn.Dropout(self.dropout)(
                            out, deterministic=deterministic)
                return out

        scale = head_dim ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            logits = jnp.where(mask == 0, jnp.float32(-1e9), logits)
        attn = jax.nn.softmax(logits, axis=-1)
        self.sow("intermediates", "attn", attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.reshape(B, Lq, inner)
        if needs_proj:
            out = nn.Dense(self.emb_dim, kernel_init=xavier_init, bias_init=zeros_init,
                           dtype=self.dtype, name="out_proj")(out)
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class TransformerEncoderBlock(nn.Module):
    """Pre-LN encoder block: LN->MHSA->res, LN->MLP->res. Ref attention.py:425-475."""

    embed_dim: int
    head_dim: int = 32
    num_heads: int = 4
    mlp_size: int = 256
    project_out: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_att")(x)
        h = MultiHeadAttention(
            emb_dim=self.embed_dim, head_dim=self.head_dim, num_heads=self.num_heads,
            self_attn=True, project_out=self.project_out, dtype=self.dtype, name="attn",
        )(h, mask=mask, deterministic=deterministic)
        y = h + x
        z = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_mlp")(y)
        z = MLP(hidden_dim=self.mlp_size, dtype=self.dtype, name="mlp")(z)
        return z + y


class TransformerDecoderBlock(nn.Module):
    """
    Decoder block cascading masked self-attention (+ optional cross-attention)
    and an MLP, all pre-LN with residuals. Ref attention.py:479-565.
    """

    embed_dim: int
    head_dim: int
    num_heads: int
    mlp_size: int
    kv_dim: Optional[int] = None
    use_cross_attn: bool = False
    dropout: float = 0.0
    project_out: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, queries, feats=None, self_attn_mask=None, cross_attn_mask=None,
                 deterministic=True, block_causal_slots=None, cache=None):
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_att")(queries)
        x = MultiHeadAttention(
            emb_dim=self.embed_dim, head_dim=self.head_dim, num_heads=self.num_heads,
            self_attn=True, project_out=self.project_out, dropout=self.dropout,
            dtype=self.dtype, name="attn",
        )(x, mask=self_attn_mask, deterministic=deterministic,
          block_causal_slots=block_causal_slots, cache=cache)
        if cache is not None:
            x, new_cache = x
        y = x + queries

        if self.use_cross_attn:
            assert feats is not None, "cross-attention requires encoder feats"
            q = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_cross_att_q")(y)
            f = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_cross_att_kv")(feats)
            z = MultiHeadAttention(
                emb_dim=self.embed_dim, head_dim=self.head_dim, num_heads=self.num_heads,
                self_attn=False, kv_dim=self.kv_dim, dropout=self.dropout,
                dtype=self.dtype, name="cross_attn",
            )(q, kv=f, mask=cross_attn_mask, deterministic=deterministic)
            y = z + y

        out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_mlp")(y)
        out = MLP(hidden_dim=self.mlp_size, dtype=self.dtype, name="mlp")(out)
        if cache is not None:
            return out + y, new_cache
        return out + y


class SoftPositionEmbed(nn.Module):
    """
    4-direction coordinate grid projected by a 1x1 conv (== Dense over the
    channel axis) and added to channels-last features. Ref model_blocks.py:85-119.
    """

    hidden_size: int
    resolution: Sequence[int]
    vmin: float = -1.0
    vmax: float = 1.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, inputs):
        grid = build_grid(self.resolution, self.vmin, self.vmax,
                          dtype=self.dtype or inputs.dtype)
        proj = nn.Dense(self.hidden_size, kernel_init=xavier_init, bias_init=zeros_init,
                        dtype=self.dtype, name="projection")(grid)
        return inputs + proj


def sinusoidal_table(max_len, d_model):
    """Standard sin/cos positional table, shape (max_len, d_model). Host-side."""
    position = np.arange(max_len)[:, None].astype(np.float64)
    div_term = np.exp(np.arange(0, d_model, 2).astype(np.float64)
                      * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype=jnp.float32)


class SlotPositionalEncoding(nn.Module):
    """
    Time-only sinusoidal PE shared by all slots of a frame — preserves slot
    permutation equivariance. Ref model_blocks.py:153-216.
    Input: (B, T, S, D); PE of frame t+offset added to every slot of frame t.
    """

    d_model: int
    max_len: int = 50
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, offset=0, deterministic=True):
        assert x.ndim == 4, f"{x.shape=} must be (B, T, S, D)"
        T = x.shape[1]
        pe = sinusoidal_table(self.max_len, self.d_model)
        pe = jax.lax.dynamic_slice_in_dim(pe, offset, T, axis=0) if not isinstance(offset, int) \
            else pe[offset:offset + T]
        y = x + pe[None, :, None, :].astype(x.dtype)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y


class SinusoidalPositionalEncoding(nn.Module):
    """Standard per-token sinusoidal PE. Ref model_blocks.py:220-274."""

    d_model: int
    max_len: int = 5000
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        pe = sinusoidal_table(self.max_len, self.d_model)
        T = x.shape[1]
        if x.ndim == 3:
            y = x + pe[None, :T, :].astype(x.dtype)
        elif x.ndim == 4:
            y = x + pe[None, :T, None, :].astype(x.dtype)
        else:
            raise ValueError(f"{x.shape=} must have 3 or 4 dims")
        if self.dropout > 0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y


class LearnedPositionalEncoding(nn.Module):
    """Learned 1-D positional embedding table. Ref model_blocks.py:123-149."""

    max_len: int
    token_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, offset=0, deterministic=True):
        pe = self.param("pe", nn.initializers.truncated_normal(stddev=1.0),
                        (1, self.max_len, self.token_dim))
        T = x.shape[1]
        y = x + pe[:, offset:offset + T].astype(x.dtype)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y


class ConvBlock(nn.Module):
    """
    Conv -> (BN) -> (MaxPool | Upsample) -> (ReLU), channels-last (NHWC).
    Ref model_blocks.py:22-81. BatchNorm running stats live in `batch_stats`.
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: Optional[int] = None
    batch_norm: bool = False
    max_pool: Optional[int] = None
    upsample: Optional[int] = None
    activation: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.padding if self.padding is not None else self.kernel_size // 2
        y = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_init=xavier_init, bias_init=zeros_init,
            dtype=self.dtype, name="conv",
        )(x)
        if self.batch_norm:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        if self.max_pool:
            y = nn.max_pool(y, window_shape=(self.max_pool, self.max_pool),
                            strides=(self.max_pool, self.max_pool))
        if self.upsample is not None and self.upsample != 1:
            B, H, W, C = y.shape
            y = jax.image.resize(y, (B, H * self.upsample, W * self.upsample, C),
                                 method="nearest")
        if self.activation:
            y = jax.nn.relu(y)
        return y


class ResidualBlock(nn.Module):
    """
    ResNet-style residual conv block. Parity for reference
    src/models/BlocksUtils/residual_block.py:19-66, which is dead code there
    (never imported); provided for inventory completeness and available for
    custom encoders.
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.kernel_size // 2
        y = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], kernel_init=xavier_init,
                    bias_init=zeros_init, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(1, 1), padding=[(pad, pad), (pad, pad)],
                    kernel_init=xavier_init, bias_init=zeros_init,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn2")(y)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            x = nn.Conv(self.out_channels, (1, 1),
                        strides=(self.stride, self.stride),
                        kernel_init=xavier_init, bias_init=zeros_init,
                        dtype=self.dtype, name="proj")(x)
        return jax.nn.relu(y + x)
