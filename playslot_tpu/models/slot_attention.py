"""
Slot Attention corrector module (Locatello et al. 2020, SAVi variant).

Capability parity with reference src/models/BlocksUtils/attention.py:23-135.
The inner inverted-attention step is `ops.slot_attention_iteration` (the
Pallas fusion target); GRU refinement + residual MLP live here because they
carry parameters. Iteration counts are static (unrolled) — TPU-friendly.
"""

from typing import Any

import jax
import flax.linen as nn

from playslot_tpu.models.blocks import MLP, TorchGRUCell, xavier_init
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

    @nn.compact
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
        B = inputs.shape[0]
        inputs = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_input")(inputs)
        dense = lambda name: nn.Dense(self.dim_slots, use_bias=False,
                                      kernel_init=xavier_init, dtype=self.dtype, name=name)
        k = dense("to_k")(inputs)
        v = dense("to_v")(inputs)

        norm_slot = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_slot")
        norm_mlp = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_mlp")
        to_q = dense("to_q")
        gru = TorchGRUCell(hidden_dim=self.dim_slots, dtype=self.dtype, name="gru")
        mlp = nn.Sequential([
            nn.Dense(self.mlp_hidden, kernel_init=xavier_init, dtype=self.dtype,
                     name="mlp_0"),
            jax.nn.relu,
            nn.Dense(self.dim_slots, kernel_init=xavier_init, dtype=self.dtype,
                     name="mlp_1"),
        ])

        num_iters = self.num_iters_first if first else self.num_iters
        attn = None
        for _ in range(num_iters):  # static unroll: 1-3 iterations
            slots_prev = slots
            q = to_q(norm_slot(slots))
            # the Pallas kernel carries a custom_vjp (backward = analytic XLA
            # VJP), so it is live on both training and inference paths
            updates, attn = slot_attention_iteration(
                q, k, v, epsilon=self.epsilon, allow_pallas=True)
            flat = lambda t: t.reshape(-1, self.dim_slots)
            slots = gru(flat(updates), flat(slots_prev)).reshape(B, -1, self.dim_slots)
            slots = slots + mlp(norm_mlp(slots))
        self.sow("intermediates", "attn_masks", attn)
        return slots, attn
