"""
Transition modules predicting the slot initialization for the next frame.

Capability parity with reference src/models/BlocksUtils/transition_models.py:
Identity, or a single SAVi-style TransformerEncoderBlock.
"""

import flax.linen as nn

from playslot_tpu.models.blocks import TransformerEncoderBlock


class IdentityTransition(nn.Module):
    @nn.compact
    def __call__(self, slots):
        return slots


TRANSITION_MODULES = [None, "", "None", "none", "TransformerBlock"]


def get_transition_module(model_name, slot_dim, num_heads=4, head_dim=32,
                          mlp_size=512, dtype=None, **kwargs) -> nn.Module:
    """Factory mirroring reference get_transition_module (transition_models.py:19-53)."""
    if model_name in (None, "", "None", "none"):
        return IdentityTransition(name="transition")
    if model_name == "TransformerBlock":
        return TransformerEncoderBlock(
            embed_dim=slot_dim, head_dim=head_dim, num_heads=num_heads,
            mlp_size=mlp_size, dtype=dtype, name="transition",
        )
    raise ValueError(f"Unknown transition module {model_name=}. Use {TRANSITION_MODULES}")
