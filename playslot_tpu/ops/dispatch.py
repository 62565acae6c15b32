"""
Pallas-vs-XLA dispatch: fused TPU kernels on TPU backends, XLA fallbacks
elsewhere (CPU tests run the kernels in interpret mode via the parity suite).
Controlled by PLAYSLOT_USE_PALLAS = auto|1|0|interpret ("interpret" forces
the Pallas code paths in the Pallas interpreter — hermetic CPU testing of
the full production wiring, including the custom_vjp training paths).
"""

import os

import jax


# measured production defaults per kernel on TPU (docs/PERFORMANCE.md,
# tools/bench_kernels_tpu.py part B, v5e): slot-attention and VQ kernels are
# end-to-end neutral vs XLA (within ±0.4%) and stay live; the block-causal
# kernel costs +4% on the bench step (608 vs 586 ms) — XLA's fused attention
# wins at these tiny token counts, so it defaults off and remains
# flag-selectable (PLAYSLOT_PALLAS_BLOCK_CAUSAL=1) + parity-tested.
# Values apply when PLAYSLOT_USE_PALLAS=auto and no per-kernel override
# (PLAYSLOT_PALLAS_<KERNEL>=0|1) is set.
_AUTO_DEFAULTS = {
    "slot_attention": True,
    "block_causal": False,
    "vq": True,
}


def use_pallas(kernel=None):
    """Whether the given kernel (or any kernel, if None) should dispatch to
    its Pallas implementation. Global switch PLAYSLOT_USE_PALLAS=auto|1|0|
    interpret; per-kernel override PLAYSLOT_PALLAS_<KERNEL>=0|1. "0"
    overrides win in every mode except the global "0" kill switch; "1"
    overrides win in forced modes and on TPU in auto mode (auto never
    dispatches compiled Pallas onto a non-TPU host)."""
    mode = os.environ.get("PLAYSLOT_USE_PALLAS", "auto")
    if mode not in ("auto", "0", "1", "interpret"):
        raise ValueError(
            f"PLAYSLOT_USE_PALLAS={mode!r} is not a valid mode; "
            f"use auto|0|1|interpret")
    if mode == "0":
        return False
    if kernel is not None and kernel not in _AUTO_DEFAULTS:
        raise ValueError(f"Unknown Pallas kernel name {kernel!r}; "
                         f"known: {sorted(_AUTO_DEFAULTS)}")
    override = (os.environ.get(f"PLAYSLOT_PALLAS_{kernel.upper()}")
                if kernel is not None else None)
    if override == "0":
        return False
    if mode in ("1", "interpret"):
        return True
    # auto mode: Pallas only on TPU backends — a per-kernel "1" override
    # selects the kernel there but must not force compiled-Pallas onto a
    # CPU/GPU host (use PLAYSLOT_USE_PALLAS=interpret for hermetic CPU runs)
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    if not on_tpu:
        return False
    if override == "1":
        return True
    if kernel is not None:
        return _AUTO_DEFAULTS[kernel]
    return True


def pallas_interpret():
    """True when the kernels should run in the Pallas interpreter (CPU)."""
    return os.environ.get("PLAYSLOT_USE_PALLAS") == "interpret"
