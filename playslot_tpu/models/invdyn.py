"""
InvDyn — inverse-dynamics modules inferring latent actions from slots of
consecutive frames.

Capability parity with reference src/models/Predictors/LatentAction.py:
  * VQSingleSlotLatentAction (InvDynS): transformer + [ACT] token aggregates
    all slots into ONE latent action per timestep (LatentAction.py:129-249).
  * VQSimpleMLPSlotLatentAction (InvDynM): per-slot MLP -> one latent action
    PER SLOT per timestep (LatentAction.py:254-359).

Latent action = VQ prototype + continuous variability residual. The action
distribution is parameterized as the DIFFERENCE of consecutive frame
embeddings (LatentAction.py:78-87).
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from playslot_tpu.models.blocks import TransformerEncoderBlock, xavier_init, zeros_init
from playslot_tpu.models.quantization import VectorQuantizer


class BaseSlotLatentAction(nn.Module):
    """Shared scaffolding: gaussian head + quantizer + sampling."""

    # which reference get_variability branch the variant executes — see
    # _quantize_and_pack (True: InvDynS re-query; False: InvDynM hints)
    VARIABILITY_REQUERY = True

    slot_dim: int
    emb_dim: int
    action_dim: int
    num_actions: int
    use_ema_vq: bool = False
    # Latent-scale anchor (docs/BEHAVIOR_STUDY.md failure mode 4: nothing in
    # the reference's PlaySlot objective anchors the action-latent scale, and
    # the channel co-shrinks with predictor training until the control-time
    # prototype lookup falls below the policy's approximation error).
    # Modes (default False == exact reference semantics,
    # LatentAction.py:65-125):
    #   "vector" (or True): per-vector standardization of the action-
    #       direction mean. Pins per-sample std at 1 but is NONLINEAR across
    #       samples — it erases the magnitude channel (the zero-action
    #       difference vector becomes amplified noise). Measured round 3:
    #       kills the action information (probe R^2 0.53 -> 0.1); kept for
    #       the study record.
    #   "batch": divide by an EMA of the GLOBAL rms of the action-direction
    #       mean — a scalar gauge fix, linear over the dataset, so per-sample
    #       geometry (including magnitudes) is preserved exactly while the
    #       interface scale seen by VQ / the dynamics model / the policy
    #       stays O(1) no matter how far the raw encoder output shrinks.
    #       The EMA scalar lives in the "vq" collection (threaded through
    #       jitted train steps like the codebook).
    latent_norm: Any = False
    # enable VQ dead-code revival (see VectorQuantizer.revive_dead_codes);
    # default off == reference EMA semantics
    vq_revive_dead: bool = False
    # latent_det=True quantizes the action-direction MEAN instead of the
    # reparameterized sample (LatentAction.py:71-75 always samples). Why this
    # knob exists: at init the mean is a difference of two nearly identical
    # frame embeddings (scale ~1e-2) while the sampling noise is O(sqrt(var))
    # = O(1), so the VQ assignment is noise-dominated, the dynamics model
    # learns to ignore the channel, and nothing ever pressures the mean to
    # become informative (the measured collapse, docs/BEHAVIOR_STUDY.md
    # failure mode 4). Deterministic quantization is the LAPO/Genie-style
    # bottleneck: the code index depends only on the informative signal, so
    # channel usefulness is never hidden behind noise. Default False ==
    # exact reference semantics.
    latent_det: bool = False
    dtype: Any = None

    def _norm_mode(self):
        if self.latent_norm is True:
            return "vector"
        return self.latent_norm or None

    def _setup_common(self):
        if self._norm_mode() == "batch":
            self.latent_scale = self.variable(
                "vq", "latent_scale", lambda *_: jnp.ones((), jnp.float32),
                None)
        self.mean_fc = nn.Dense(self.action_dim, kernel_init=xavier_init,
                                bias_init=zeros_init, dtype=self.dtype, name="mean_fc")
        self.variance_fc = nn.Dense(self.action_dim, kernel_init=xavier_init,
                                    bias_init=zeros_init, dtype=self.dtype,
                                    name="variance_fc")
        self.quantizer = VectorQuantizer(
            num_embs=self.num_actions, emb_dim=self.action_dim,
            use_ema=self.use_ema_vq, revive_dead_codes=self.vq_revive_dead,
            dtype=self.dtype, name="quantizer")

    # ----------------------------------------------------------- primitives
    def sample(self, mean, var, noise=None, eps=1e-6):
        """Reparameterized gaussian sample (LatentAction.py:71-75)."""
        if noise is None:
            noise = jax.random.normal(self.make_rng("action"), mean.shape, jnp.float32)
        return noise.astype(mean.dtype) * jnp.sqrt(var + eps) + mean

    def compute_action_dist(self, tokens):
        """
        Action-direction distribution from per-frame embeddings
        (LatentAction.py:78-87): mean_t = mu_{t+1} - mu_t, var_t = v_{t+1} + v_t.
        tokens: (B, T, ..., emb_dim), time on axis 1.
        """
        mean_tok = self.mean_fc(tokens)
        var_tok = jnp.abs(self.variance_fc(tokens))
        action_dir_mean = mean_tok[:, 1:] - mean_tok[:, :-1]
        action_dir_var = var_tok[:, 1:] + var_tok[:, :-1]
        return action_dir_mean, action_dir_var

    def _standardize(self, x, eps=1e-6):
        """Parameter-free per-vector standardization over action_dim."""
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps)

    def _quantize_and_pack(self, action_dir_mean, action_dir_var, noise, train):
        """Sample -> VQ -> variability; shared output packing."""
        mode = self._norm_mode()
        if mode == "vector":
            action_dir_mean = self._standardize(action_dir_mean)
        elif mode == "batch":
            rms = jnp.sqrt(jnp.mean(
                action_dir_mean.astype(jnp.float32) ** 2) + 1e-12)
            if train:
                scale = 0.95 * self.latent_scale.value + 0.05 * rms
                self.latent_scale.value = scale
            else:
                scale = self.latent_scale.value
            action_dir_mean = (action_dir_mean
                               / jnp.maximum(scale, 1e-6).astype(
                                   action_dir_mean.dtype))
        action_dist = jnp.stack([action_dir_mean, action_dir_var], axis=2)
        if self.latent_det:
            sampled = action_dir_mean  # deterministic bottleneck (see field doc)
        else:
            sampled = self.sample(action_dir_mean, action_dir_var, noise=noise)
        action_proto, vq_loss, action_idxs = self.quantizer(sampled, train=train)
        # The two reference InvDyn variants compute the variability
        # DIFFERENTLY (found by tools/trajectory_parity.py — the hint path
        # matched every eval forward but diverged on every EMA training
        # step, pred_slots max diff 0.74 on a tiny config):
        #   * InvDynS (LatentAction.py:232-236) passes no action_idxs, so
        #     get_variability (quantization.py:365-366) RE-QUERIES the
        #     codebook — which the EMA update just modified — giving
        #     v = z - POST-update nearest codeword (indices may change) with
        #     gradient flowing into z (raw codeword, no straight-through);
        #   * InvDynM (LatentAction.py:341-346) passes action_embs AND
        #     action_idxs, reusing the straight-through PRE-update protos —
        #     v = z - straight_through(z_q), which has ZERO gradient to z.
        # Both quirks mirrored faithfully via VARIABILITY_REQUERY.
        if self.VARIABILITY_REQUERY:
            action_var, _ = self.quantizer.get_variability(z=sampled)
        else:
            action_var, _ = self.quantizer.get_variability(
                z=sampled, action_embs=action_proto, action_idxs=action_idxs)
        vq_losses = {k: jnp.mean(v) for k, v in vq_loss.items()}
        return {
            "action_dist": action_dist,
            "sampled_latent_action": sampled,
            "action_variability": action_var,
            "action_proto": action_proto,
            "action_idxs": action_idxs[..., None],
            "vq_losses": vq_losses,
        }

    # ------------------------------------------------------------- helpers
    def compute_actions(self, slots, noise=None, train=False):
        return self(slots, noise=noise, train=train)

    def get_action(self, shape, action_idx=None):
        """
        Codebook lookup; random indices of `shape` if none given
        (LatentAction.py:95-113).
        """
        if action_idx is None:
            action_idx = jax.random.randint(
                self.make_rng("action"), shape, 0, self.num_actions)
        else:
            action_idx = jnp.broadcast_to(jnp.asarray(action_idx), shape)
        return self.quantizer.get_codebook_entry(action_idx), action_idx

    def decompose_action_latent(self, action_latent):
        """Latent -> (prototype, variability) (LatentAction.py:115-125)."""
        if self._norm_mode() == "vector":
            # same transform the training-time latents went through; also
            # makes the control-time prototype lookup scale-invariant
            # (standardization is idempotent). "batch" mode needs NO
            # transform here: the policy regresses already-normalized
            # targets, so its latents live in the normalized space.
            action_latent = self._standardize(action_latent)
        protos, _, idxs = self.quantizer(action_latent, train=False)
        variability, _ = self.quantizer.get_variability(
            z=action_latent, action_embs=protos, action_idxs=idxs)
        return protos, variability


class VQSingleSlotLatentAction(BaseSlotLatentAction):
    """InvDynS: one latent action per frame via [ACT]-token transformer."""

    num_layers: int = 4
    num_heads: int = 4
    head_dim: int = 32
    mlp_dim: int = 512

    def setup(self):
        self._setup_common()
        self.slot_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="slot_norm")
        self.slot_proj = nn.Dense(self.emb_dim, kernel_init=xavier_init,
                                  bias_init=zeros_init, dtype=self.dtype,
                                  name="slot_proj")
        self.act_token = self.param("act_token", zeros_init, (1, 1, self.emb_dim))
        self.transformer = [
            TransformerEncoderBlock(
                embed_dim=self.emb_dim, head_dim=self.head_dim,
                num_heads=self.num_heads, mlp_size=self.mlp_dim, project_out=True,
                dtype=self.dtype, name=f"block_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, slots, noise=None, train=False):
        """
        slots: (B, T, S, slot_dim) ->
            action_proto (B, T-1, action_dim), action_variability (B, T-1, action_dim),
            action_idxs (B, T-1, 1), action_dist (B, T-1, 2, action_dim), vq_losses.
        """
        assert slots.ndim == 4, f"{slots.shape=} must be (B, T, S, slot_dim)"
        B, T, S, _ = slots.shape
        embs = self.slot_proj(self.slot_norm(slots))  # (B, T, S, emb)
        act = jnp.tile(self.act_token[None].astype(embs.dtype), (B, T, 1, 1))
        tokens = jnp.concatenate([act, embs], axis=2).reshape(B * T, S + 1, -1)
        for block in self.transformer:
            tokens = block(tokens)
        out_token = tokens[:, 0].reshape(B, T, -1)

        mean, var = self.compute_action_dist(out_token)
        return self._quantize_and_pack(mean, var, noise, train)


class VQSimpleMLPSlotLatentAction(BaseSlotLatentAction):
    """InvDynM: one latent action per slot via a per-slot MLP encoder."""

    VARIABILITY_REQUERY = False  # LatentAction.py:341-346 passes idx hints

    hidden_dim: int = 256

    def setup(self):
        self._setup_common()
        self.slot_fc0 = nn.Dense(self.hidden_dim, kernel_init=xavier_init,
                                 bias_init=zeros_init, dtype=self.dtype, name="slot_fc0")
        self.slot_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="slot_norm")
        self.slot_fc1 = nn.Dense(self.emb_dim, kernel_init=xavier_init,
                                 bias_init=zeros_init, dtype=self.dtype, name="slot_fc1")

    def __call__(self, slots, noise=None, train=False):
        """
        slots: (B, T, S, slot_dim) ->
            action_proto (B, T-1, S, action_dim), variability same,
            action_idxs (B, T-1, S, 1), action_dist (B, T-1, 2, S, action_dim).
        """
        assert slots.ndim == 4, f"{slots.shape=} must be (B, T, S, slot_dim)"
        embs = self.slot_fc1(self.slot_norm(jax.nn.relu(self.slot_fc0(slots))))
        mean, var = self.compute_action_dist(embs)
        return self._quantize_and_pack(mean, var, noise, train)


LATENT_ACTION_MODELS = {
    "VQSingleSlotLatentAction": VQSingleSlotLatentAction,
    "VQSimpleMLPSlotLatentAction": VQSimpleMLPSlotLatentAction,
}
