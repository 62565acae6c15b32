"""
playslot_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for object-centric
video prediction with unsupervised latent actions, re-implementing the full
capability surface of PlaySlot (ICML 2025) with a TPU-first design.

Pipeline stages (mirrors reference /root/reference README):
  1. SAVi       — slot-attention video decomposition (encode -> correct -> decode)
  2. PlaySlot   — InvDyn latent-action inference + conditional SlotGPT dynamics
  3. Behavior   — behavior cloning policy + action decoder, closed-loop control

Design (TPU-first, NOT a port):
  * flax.linen modules = parameters + math; rollout drivers are pure functions
    over `module.apply`, jit/pjit-compiled with static shapes.
  * Frame recurrences and autoregressive rollouts run under XLA with static
    unrolling or `lax.scan`; no per-step Python dispatch on the hot path.
  * VQ codebooks + EMA statistics live in an explicit `vq` variable collection
    threaded functionally through the train step.
  * Hot ops (slot attention step, alpha compositing, block-causal attention,
    VQ nearest-codeword) have fused Pallas TPU kernels with XLA fallbacks.
  * Multi-chip scaling via `jax.sharding.Mesh` (data/model axes) + collectives.
"""

__version__ = "0.1.0"

from playslot_tpu import config  # noqa: F401
