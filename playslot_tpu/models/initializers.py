"""
Slot initializer modules.

Capability parity with reference src/models/BlocksUtils/initializers.py:
Learned fixed slots, LearnedRandom gaussian sampling, CoordInit (CoM/BBox)
coordinate encoders.
"""

import math
import jax
import jax.numpy as jnp
import flax.linen as nn

from playslot_tpu.models.blocks import xavier_init, zeros_init


def _slot_uniform(slot_dim):
    limit = math.sqrt(6.0 / (1 + slot_dim))
    return nn.initializers.uniform(scale=2 * limit), limit


class Learned(nn.Module):
    """Directly learned slot bank. Ref initializers.py:54-83."""

    num_slots: int
    slot_dim: int

    @nn.compact
    def __call__(self, batch_size, **kwargs):
        init, limit = _slot_uniform(self.slot_dim)
        slots = self.param(
            "slots",
            lambda k, s: jax.random.uniform(k, s, minval=-limit, maxval=limit),
            (1, self.num_slots, self.slot_dim),
        )
        return jnp.tile(slots, (batch_size, 1, 1))


class LearnedRandom(nn.Module):
    """
    Slots sampled from a learned gaussian N(mu, sigma^2) shared across slots.
    Ref initializers.py:87-124. Noise comes from the 'slots' RNG collection,
    or can be passed explicitly for deterministic parity tests.
    """

    num_slots: int
    slot_dim: int

    @nn.compact
    def __call__(self, batch_size, noise=None, **kwargs):
        _, limit = _slot_uniform(self.slot_dim)
        u_init = lambda k, s: jax.random.uniform(k, s, minval=-limit, maxval=limit)
        mu = self.param("slots_mu", u_init, (1, 1, self.slot_dim))
        sigma = self.param("slots_sigma", u_init, (1, 1, self.slot_dim))
        shape = (batch_size, self.num_slots, self.slot_dim)
        if noise is None:
            noise = jax.random.normal(self.make_rng("slots"), shape)
        return mu + sigma * noise


class CoordInit(nn.Module):
    """
    Slots initialized by encoding per-object CoM ([y, x]) or BBox
    ([y_min, x_min, y_max, x_max]) coordinates with a small MLP; missing
    objects are padded with -1 vectors. Ref initializers.py:128-196
    (note: the reference pads along the wrong axis — dim=2 instead of the
    slot axis; we implement the intended behavior of padding slots).
    """

    num_slots: int
    slot_dim: int
    mode: str  # "CoM" | "BBox"

    IN_FEATS = {"CoM": 2, "BBox": 4}

    @nn.compact
    def __call__(self, batch_size, com_coords=None, bbox_coords=None, **kwargs):
        coords = com_coords if self.mode == "CoM" else bbox_coords
        if coords is None:
            raise ValueError(f"{self.mode} initializer requires coordinate input")
        if coords.ndim == 4:  # (B, T, N, F) -> first frame
            coords = coords[:, 0]
        B, num_coords, in_feats = coords.shape
        assert in_feats == self.IN_FEATS[self.mode]
        if num_coords > self.num_slots:
            raise ValueError(f"{num_coords=} exceeds {self.num_slots=}")
        if num_coords < self.num_slots:
            pad = -jnp.ones((B, self.num_slots - num_coords, in_feats), coords.dtype)
            coords = jnp.concatenate([coords, pad], axis=1)
        h = nn.Dense(256, kernel_init=xavier_init, bias_init=zeros_init)(coords)
        h = jax.nn.relu(h)
        return nn.Dense(self.slot_dim, kernel_init=xavier_init, bias_init=zeros_init)(h)


INITIALIZERS = ["Learned", "LearnedRandom", "CoM", "BBox"]


def get_initializer(mode, slot_dim, num_slots) -> nn.Module:
    """Factory mirroring reference get_initializer (initializers.py:19-50)."""
    if mode == "Learned":
        return Learned(num_slots=num_slots, slot_dim=slot_dim, name="initializer")
    if mode == "LearnedRandom":
        return LearnedRandom(num_slots=num_slots, slot_dim=slot_dim, name="initializer")
    if mode in ("CoM", "BBox"):
        return CoordInit(num_slots=num_slots, slot_dim=slot_dim, mode=mode,
                         name="initializer")
    raise ValueError(f"Unknown initializer {mode=}. Available: {INITIALIZERS}")
