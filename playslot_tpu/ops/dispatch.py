"""
Pallas-vs-XLA dispatch: fused TPU kernels on TPU backends, XLA fallbacks
elsewhere (CPU tests run the kernels in interpret mode via the parity suite).
Controlled by PLAYSLOT_USE_PALLAS = auto|1|0.
"""

import os

import jax


def use_pallas():
    mode = os.environ.get("PLAYSLOT_USE_PALLAS", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
