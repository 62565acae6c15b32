"""
Vector quantization for latent-action prototypes.

Capability parity with reference src/models/BlocksUtils/quantization.py:
  * VectorQuantizer: nearest-codeword under L2, straight-through estimator,
    quant/commit losses, usage histogram tracking (quantization.py:177-372).
  * EMA variant: codebook updated with an exponential moving average instead
    of gradients (quantization.py:87-173), including the reference's exact
    count-normalization and the EmaCodebookMeter warmup
    `alpha = max(ema_alpha, 1/(iters+1))` (quantization.py:71-79).

TPU-first design: all codebook/EMA statistics are explicit flax variables in
the "vq" collection, threaded functionally through jitted train steps
(`mutable=["vq"]`) — no in-place buffer mutation.
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from playslot_tpu.ops.vq import nearest_codeword


class VectorQuantizer(nn.Module):
    """
    Single-codebook VQ (the reference only supports nbooks=1).

    If `use_ema` the codebook lives in the "vq" variable collection and is
    updated by EMA during training; otherwise it is a trainable parameter
    updated through the commit-loss gradient path.
    """

    num_embs: int
    emb_dim: int
    use_ema: bool = False
    ema_alpha: float = 0.05
    epsilon: float = 1e-6
    # Dead-code revival (default off == exact reference EMA semantics,
    # quantization.py:136-151): when a codeword's EMA count starves below
    # revive_threshold x the uniform share, re-seed it from a random encoder
    # sample of the current batch (standard VQ-VAE "random restart"). Needed
    # when the encoder output distribution sits far from the +-1/num_embs
    # codebook init — e.g. under the latent_norm anchor, whose unit-std
    # latents (norm ~ sqrt(emb_dim)) otherwise leave most codes dead
    # (measured: usage [0.48, 0.001, 0.001, 0.52, 0.001] vs the healthy
    # near-uniform spread; docs/BEHAVIOR_STUDY.md round 3).
    revive_dead_codes: bool = False
    revive_threshold: float = 0.1
    dtype: Any = None

    def setup(self):
        init = lambda k, s: jax.random.uniform(
            k, s, minval=-1.0 / self.num_embs, maxval=1.0 / self.num_embs)
        if self.use_ema:
            self.codebook_var = self.variable(
                "vq", "codebook", init, self.make_rng("params") if self.is_initializing()
                else None, (self.num_embs, self.emb_dim))
            self.ema_count = self.variable(
                "vq", "ema_count", lambda *_: jnp.zeros(self.num_embs), None)
            self.ema_weight = self.variable(
                "vq", "ema_weight", init,
                self.make_rng("params") if self.is_initializing() else None,
                (self.num_embs, self.emb_dim))
        else:
            self.codebook_param = self.param("codebook", init,
                                             (self.num_embs, self.emb_dim))
        # usage histogram (diagnostics; reference EmaCodebookMeter)
        self.usage_bins = self.variable(
            "vq", "usage_bins", lambda *_: jnp.ones(self.num_embs) / self.num_embs, None)
        self.usage_iters = self.variable(
            "vq", "usage_iters", lambda *_: jnp.zeros((), jnp.int32), None)

    @property
    def codebook(self):
        return self.codebook_var.value if self.use_ema else self.codebook_param

    def _track_usage(self, idx):
        """EmaCodebookMeter.update (quantization.py:71-79)."""
        flat = idx.reshape(-1)
        count = jnp.zeros(self.num_embs).at[flat].add(1.0) / flat.shape[0]
        iters = self.usage_iters.value + 1
        alpha = jnp.maximum(self.ema_alpha, 1.0 / iters.astype(jnp.float32))
        self.usage_bins.value = (1.0 - alpha) * self.usage_bins.value + alpha * count
        self.usage_iters.value = iters

    def __call__(self, z, train=False):
        """
        Quantize z (..., emb_dim).

        Returns:
            z_q: straight-through quantized embeddings, same shape as z.
            losses: {"quant_loss", "commit_loss"} with shape z.shape[:-1]
                    (per-element, matching the reference pre-.mean() values).
            idx: (...,) int32 codeword indices.
        """
        assert z.shape[-1] == self.emb_dim
        codebook = self.codebook
        z_q, idx = nearest_codeword(z, codebook)

        quant_loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2, axis=-1)
        commit_loss = jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2, axis=-1)
        losses = {"quant_loss": quant_loss, "commit_loss": commit_loss}

        if train:
            self._track_usage(idx)
            if self.use_ema:
                self._ema_update(z, idx)

        # straight-through estimator
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, losses, idx

    def _ema_update(self, z, idx):
        """Exact EMA schedule of reference EmaVectorQuantizer (136-151).

        NB the reference uses ema_alpha as the weight of the OLD state here
        (a*old + (1-a)*new — at the default 0.05 only 5% history survives a
        step) while its EmaCodebookMeter uses the SAME name as the weight of
        the NEW value (see _track_usage). Both conventions are mirrored
        faithfully; do not 'fix' either."""
        B = z.shape[0]
        a = self.ema_alpha
        eps = self.epsilon
        zf = jax.lax.stop_gradient(z.reshape(-1, self.emb_dim))
        enc = jax.nn.one_hot(idx.reshape(-1), self.num_embs, dtype=zf.dtype)

        ema_count = a * self.ema_count.value + (1 - a) * jnp.sum(enc, axis=0)
        ema_count = (ema_count + eps) / (B + self.num_embs * eps) * B
        dw = jnp.dot(enc.T, zf, preferred_element_type=jnp.float32)
        ema_weight = a * self.ema_weight.value + (1 - a) * dw

        if self.revive_dead_codes:
            # starving codes jump to a random batch sample with unit count,
            # so the next assignments can reach them; healthy codes untouched
            dead = ema_count < self.revive_threshold * (
                jnp.sum(ema_count) / self.num_embs)
            picks = jax.random.randint(self.make_rng("action"),
                                       (self.num_embs,), 0, zf.shape[0])
            candidates = jnp.take(zf, picks, axis=0).astype(ema_weight.dtype)
            ema_count = jnp.where(dead, jnp.ones_like(ema_count), ema_count)
            ema_weight = jnp.where(dead[:, None], candidates, ema_weight)

        self.ema_count.value = ema_count
        self.ema_weight.value = ema_weight
        self.codebook_var.value = ema_weight / (ema_count[:, None] + 1e-8)

    # ------------------------------------------------------------- lookups
    def get_codebook_entry(self, indices):
        """Codewords for given indices (quantization.py:324-340)."""
        return jnp.take(self.codebook, indices, axis=0)

    def get_variability(self, z, action_embs=None, action_idxs=None):
        """
        Variability = z minus its nearest codeword (quantization.py:342-372).
        If `action_embs`+`action_idxs` were already computed (the straight-
        through output), they are reused — matching reference gradient flow.
        """
        if action_embs is None or action_idxs is None:
            action_embs, action_idxs = nearest_codeword(z, self.codebook)
        v = z - action_embs
        return v, action_idxs
