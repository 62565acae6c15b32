"""
Alpha-softmax compositing of per-slot RGBA decodes into a full frame.

Capability parity with reference src/models/SAVi.py:220-234: per-slot decoder
output is split into RGB + alpha-logit; alphas are softmaxed over the slot
axis and used as mixing weights.
"""

import jax
import jax.numpy as jnp


def alpha_composite(rgba, num_slots):
    """
    Args:
        rgba: (..., S, H, W, C+1) per-slot decodes, channels-last,
              last channel = alpha logit. The S axis is `-4`.
        num_slots: static number of slots S (for shape checking only).

    Returns:
        combined: (..., H, W, C) composited frame.
        recons:   (..., S, H, W, C) per-slot RGB.
        masks:    (..., S, H, W, 1) softmaxed alpha masks.
    """
    assert rgba.shape[-4] == num_slots, f"{rgba.shape=} vs {num_slots=}"
    recons, alpha_logits = rgba[..., :-1], rgba[..., -1:]
    masks = jax.nn.softmax(alpha_logits, axis=-4)  # softmax over slot axis
    combined = jnp.sum(recons * masks, axis=-4)
    return combined, recons, masks
