"""
SAVi — slot-attention video decomposition (TPU-native).

Capability parity with reference src/models/SAVi.py:21-267, re-architected
for XLA:
  * all frames are conv-encoded in ONE batched call (B*T on the MXU), only
    the slot-attention corrector runs recurrently over time;
  * all frames are decoded in ONE batched spatial-broadcast call
    (B*T*S decode maps) followed by fused alpha-softmax compositing;
  * the time recurrence is a static unrolled loop (T <= ~30) — every step
    has static shapes, no host round-trips.

Inputs/outputs are channels-last (NHWC): videos are (B, T, H, W, C).
"""

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn
import jax

from playslot_tpu.models.blocks import SoftPositionEmbed, xavier_init, zeros_init
from playslot_tpu.models.encoders import get_encoder
from playslot_tpu.models.decoders import get_decoder
from playslot_tpu.models.initializers import get_initializer
from playslot_tpu.models.slot_attention import SlotAttention
from playslot_tpu.models.transitions import get_transition_module
from playslot_tpu.ops.compositing import alpha_composite


class SAVi(nn.Module):
    num_slots: int
    slot_dim: int
    num_iterations: int = 3
    num_iterations_first: Optional[int] = None
    in_channels: int = 3
    mlp_hidden: int = 128
    mlp_encoder_dim: int = 128
    initializer: str = "LearnedRandom"
    encoder: Optional[dict] = None
    decoder: Optional[dict] = None
    transition_module_params: Optional[dict] = None
    dtype: Any = None

    def setup(self):
        enc_cfg = self.encoder or {
            "encoder_name": "ConvEncoder",
            "encoder_params": {"num_channels": [32, 32, 32, 32], "kernel_size": 5,
                               "resolution": [64, 64]},
        }
        dec_cfg = self.decoder or {
            "decoder_name": "ConvDecoder",
            "decoder_params": {"num_channels": [64, 64, 64, 64], "kernel_size": 5,
                               "resolution": [64, 64], "upsample": 1},
        }
        self.encoder_resolution = tuple(enc_cfg["encoder_params"]["resolution"])
        self.decoder_resolution = tuple(dec_cfg["decoder_params"]["resolution"])

        self.initializer_mod = get_initializer(
            mode=self.initializer, slot_dim=self.slot_dim, num_slots=self.num_slots)
        self.encoder_mod = get_encoder(enc_cfg, dtype=self.dtype)
        enc_out = self.encoder_mod.out_features
        self.encoder_pos_embedding = SoftPositionEmbed(
            hidden_size=enc_out, resolution=self.encoder_resolution, dtype=self.dtype,
            name="encoder_pos_embedding")
        self.encoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                         name="encoder_norm")
        self.encoder_mlp_0 = nn.Dense(self.mlp_encoder_dim, kernel_init=xavier_init,
                                      bias_init=zeros_init, dtype=self.dtype,
                                      name="encoder_mlp_0")
        self.encoder_mlp_1 = nn.Dense(self.mlp_encoder_dim, kernel_init=xavier_init,
                                      bias_init=zeros_init, dtype=self.dtype,
                                      name="encoder_mlp_1")

        self.slot_attention = SlotAttention(
            dim_feats=self.mlp_encoder_dim, dim_slots=self.slot_dim,
            num_slots=self.num_slots,
            num_iters_first=(self.num_iterations_first or self.num_iterations),
            num_iters=self.num_iterations, mlp_hidden=self.mlp_hidden,
            dtype=self.dtype, name="slot_attn")

        tparams = dict(self.transition_module_params or {"model_name": None})
        tname = tparams.pop("model_name", None)
        tparams.pop("num_slots", None)
        self.transition_module = get_transition_module(
            tname, slot_dim=self.slot_dim, dtype=self.dtype, **tparams)

        self.decoder_pos_embedding = SoftPositionEmbed(
            hidden_size=self.slot_dim, resolution=self.decoder_resolution,
            dtype=self.dtype, name="decoder_pos_embedding")
        self.decoder_mod = get_decoder(dec_cfg, out_channels=self.in_channels + 1,
                                       dtype=self.dtype)

    # ------------------------------------------------------------ components
    def encode(self, x, train=False):
        """(B, H, W, C) images -> (B, H*W, mlp_encoder_dim) features."""
        feats = self.encoder_mod(x, train=train)
        feats = self.encoder_pos_embedding(feats)
        B, H, W, C = feats.shape
        feats = feats.reshape(B, H * W, C)
        feats = self.encoder_norm(feats)
        feats = self.encoder_mlp_1(jax.nn.relu(self.encoder_mlp_0(feats)))
        return feats

    def initial_slots(self, batch_size, **kwargs):
        return self.initializer_mod(batch_size=batch_size, **kwargs)

    def correct(self, feats, slots, first=False, train=False):
        """One slot-attention correction step. Returns (slots, attn_masks)."""
        return self.slot_attention(feats, slots, first=first, train=train)

    def predict_next(self, slots):
        return self.transition_module(slots)

    def decode(self, slots, train=False):
        """
        Spatial-broadcast decode + alpha-softmax compositing, batched over all
        leading dims. slots: (..., S, slot_dim) ->
          combined (..., H, W, C), recons (..., S, H, W, C), masks (..., S, H, W, 1).
        """
        lead = slots.shape[:-1]  # (..., S)
        H, W = self.decoder_resolution
        maps = jnp.tile(slots.reshape(-1, 1, 1, self.slot_dim), (1, H, W, 1))
        maps = self.decoder_pos_embedding(maps)
        y = self.decoder_mod(maps, train=train)  # (prod(lead), H', W', C+1)
        Ho, Wo = y.shape[1], y.shape[2]
        y = y.reshape(*lead, Ho, Wo, self.in_channels + 1)
        return alpha_composite(y, self.num_slots)

    def decode_fast(self, slots, train=False):
        """
        Fused spatial-broadcast decode (ops/fused_decode.py): removes the
        per-map broadcast materialization and the first-conv FLOPs on
        spatially-constant data. Exact to float reassociation vs decode();
        falls back to decode() for decoder configs it cannot fuse. Fully
        differentiable — the SAVi train step uses it (trainer.py), with
        value+gradient parity vs decode() CI-tested
        (tests/test_train_fast_decode.py).
        """
        from playslot_tpu.ops.fused_decode import fused_broadcast_decode
        from playslot_tpu.ops.grids import build_grid

        dec = self.decoder_mod
        fusable = (getattr(dec, "stride", 1) == 1
                   and not getattr(dec, "batch_norm", False)
                   and (dec.upsample is None or dec.upsample <= 1))
        if not fusable:
            return self.decode(slots, train=train)
        rgba = fused_broadcast_decode(
            slots,
            grid=build_grid(self.decoder_resolution),
            pos_params=self.decoder_pos_embedding.variables["params"],
            dec_params=self.decoder_mod.variables["params"],
            hidden_dims=dec.hidden_dims,
            kernel_size=dec.kernel_size,
            out_channels=self.in_channels + 1,
            resolution=self.decoder_resolution,
            dtype=self.dtype,
        )
        return alpha_composite(rgba, self.num_slots)

    def decode_fast_chunked(self, slots, num_chunks=1, train=False):
        """
        Chunked fused decode for eval-side HBM ceilings: splits the leading
        (batch) axis into num_chunks pieces rendered sequentially by ONE
        lax.map body, dividing the decode conv-stack working set — the
        (B*T*S, H, W, C) activation tensors that dominate eval memory — by
        num_chunks at the cost of num_chunks sequential launches. Exact same
        numerics as decode_fast (identical per-chunk program). Batch must be
        divisible by num_chunks; a batch smaller than num_chunks falls back
        to one unchunked call (ops/chunked.py).
        """
        from playslot_tpu.ops.chunked import chunked_apply
        return chunked_apply(lambda s: self.decode_fast(s, train=train),
                             slots, num_chunks)

    # ------------------------------------------------------------ full video
    def __call__(self, x, num_imgs=None, decode=True, train=False,
                 initializer_kwargs=None, **kwargs):
        """
        Args:
            x: (B, T, H, W, C) video.
            num_imgs: number of frames to process (default: T).
            decode: if False, skip the decoder (predictor training mode).

        Returns dict with keys mirroring the reference SAVi.forward:
            recons_imgs (B,T,H,W,C), recons_objs (B,T,S,H,W,C),
            masks (B,T,S,H,W,1), slot_history (B,T,S,slot_dim).
        """
        B, T = x.shape[0], x.shape[1]
        num_imgs = num_imgs if num_imgs is not None else T
        initializer_kwargs = initializer_kwargs or {}

        # one batched conv encode over all frames (MXU-friendly)
        frames = x[:, :num_imgs].reshape(B * num_imgs, *x.shape[2:])
        feats = self.encode(frames, train=train)

        # slot-attention input projections (LayerNorm + k/v) depend only on
        # the features — hoist them out of the recurrence and project all
        # frames in one batched matmul: same per-element math as per-frame
        # projection (parity-tested, tests/test_encoder_s2d_path.py), 21x
        # fewer dispatched matmuls; bench-neutral latency (XLA already
        # pipelines the unrolled loop well — docs/PERFORMANCE.md encode)
        k, v = self.slot_attention.project_inputs(feats)
        k = k.reshape(B, num_imgs, *k.shape[1:])
        v = v.reshape(B, num_imgs, *v.shape[1:])

        # recurrent slot correction (static unrolled loop)
        predicted_slots = self.initial_slots(batch_size=B, **initializer_kwargs)
        slot_history = []
        for t in range(num_imgs):
            slots, _ = self.slot_attention.iterate(
                k[:, t], v[:, t], predicted_slots, first=(t == 0), train=train)
            predicted_slots = self.predict_next(slots)
            slot_history.append(slots)
        slot_history = jnp.stack(slot_history, axis=1)  # (B, T, S, D)

        out = {"slot_history": slot_history}
        if decode:
            combined, recons, masks = self.decode(slot_history, train=train)
            out.update({"recons_imgs": combined, "recons_objs": recons, "masks": masks})
        return out
