"""
Functional compute ops for playslot_tpu.

Every op has a pure-XLA implementation (works on CPU/TPU, differentiable)
and — for the hot ones — a fused Pallas TPU kernel selected via
`playslot_tpu.ops.dispatch`. Reference hot-loop inventory: SURVEY.md §2.4.
"""

from playslot_tpu.ops.grids import build_grid  # noqa: F401
from playslot_tpu.ops.masks import build_slot_causal_mask, build_behavior_causal_mask  # noqa: F401
from playslot_tpu.ops.slot_attention import slot_attention_iteration  # noqa: F401
from playslot_tpu.ops.compositing import alpha_composite  # noqa: F401
from playslot_tpu.ops.vq import nearest_codeword, pairwise_sq_dist  # noqa: F401
