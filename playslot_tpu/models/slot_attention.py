"""
Slot Attention corrector module (Locatello et al. 2020, SAVi variant).

Capability parity with reference src/models/BlocksUtils/attention.py:23-135.
The inner inverted-attention step is `ops.slot_attention_iteration` (the
Pallas fusion target); GRU refinement + residual MLP live here because they
carry parameters. Iteration counts are static (unrolled) — TPU-friendly.

The input-side work (LayerNorm + k/v projections) depends only on the frame
features, not on the slot state, so `project_inputs` is exposed separately:
SAVi hoists it out of the per-frame recurrence and projects ALL frames in
one batched matmul (same per-element math, 21x fewer dispatched matmuls;
bench-neutral latency — docs/PERFORMANCE.md encode section). `__call__`
keeps the reference per-frame semantics (project + iterate) for
single-frame callers; both paths trace identical per-element ops
(tests/test_encoder_s2d_path.py).
"""

from typing import Any

import jax
import flax.linen as nn

from playslot_tpu.models.blocks import TorchGRUCell, xavier_init
from playslot_tpu.ops.slot_attention import slot_attention_iteration


class SlotAttention(nn.Module):
    dim_feats: int
    dim_slots: int
    num_slots: int
    num_iters_first: int = 2
    num_iters: int = 2
    mlp_hidden: int = 128
    epsilon: float = 1e-8
    dtype: Any = None

    def setup(self):
        # attribute names = param scope names — identical tree to the
        # previous @nn.compact layout (checkpoint-compatible).
        self.norm_input = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        dense = lambda: nn.Dense(self.dim_slots, use_bias=False,
                                 kernel_init=xavier_init, dtype=self.dtype)
        self.to_k = dense()
        self.to_v = dense()
        self.to_q = dense()
        self.norm_slot = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm_mlp = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.gru = TorchGRUCell(hidden_dim=self.dim_slots, dtype=self.dtype)
        self.mlp_0 = nn.Dense(self.mlp_hidden, kernel_init=xavier_init,
                              dtype=self.dtype)
        self.mlp_1 = nn.Dense(self.dim_slots, kernel_init=xavier_init,
                              dtype=self.dtype)

    def project_inputs(self, inputs):
        """LayerNorm + k/v projections — slot-independent input-side work.

        inputs: (..., N_locations, dim_feats); batched over any leading dims
        so the SAVi recurrence can project all frames in one call.
        Returns (k, v), each (..., N_locations, dim_slots).
        """
        inputs = self.norm_input(inputs)
        return self.to_k(inputs), self.to_v(inputs)

    def iterate(self, k, v, slots, first=False, train=False):
        """Iterative slot refinement against precomputed k/v."""
        B = k.shape[0]
        num_iters = self.num_iters_first if first else self.num_iters
        attn = None
        for _ in range(num_iters):  # static unroll: 1-3 iterations
            slots_prev = slots
            q = self.to_q(self.norm_slot(slots))
            # the Pallas kernel carries a custom_vjp (backward = analytic XLA
            # VJP), so it is live on both training and inference paths
            updates, attn = slot_attention_iteration(
                q, k, v, epsilon=self.epsilon, allow_pallas=True)
            flat = lambda t: t.reshape(-1, self.dim_slots)
            slots = self.gru(flat(updates),
                             flat(slots_prev)).reshape(B, -1, self.dim_slots)
            slots = slots + self.mlp_1(jax.nn.relu(self.mlp_0(
                self.norm_mlp(slots))))
        self.sow("intermediates", "attn_masks", attn)
        return slots, attn

    def __call__(self, inputs, slots, first=False, train=False):
        """
        Args:
            inputs: (B, N_locations, dim_feats) encoder features.
            slots:  (B, num_slots, dim_slots) slot state from the previous
                    frame (or the initializer).
            first:  static flag — frame 0 uses `num_iters_first` iterations.

        Returns:
            slots: (B, num_slots, dim_slots) refined slots.
            attn:  (B, num_slots, N_locations) final slot-competition masks.
        """
        k, v = self.project_inputs(inputs)
        return self.iterate(k, v, slots, first=first, train=train)
