"""
Shared measurement methodology for the TPU bench/probe tools.

One definition of the timing protocol so every ledger stays comparable
(`bench_breakdown_tpu.py`, `bench_encode_tpu.py`, `probe_encoder_s2d.py`):
persistent compile cache, scalar-fetch forced execution (the relay makes
`block_until_ready` a no-op), median of `iters` wall-clock samples, and a
trivial-program baseline for the per-call relay overhead.
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def setup(repo_on_path=True):
    """Repo on sys.path + persistent jax compile cache. Import-order safe:
    call before any jit. Returns the jax module."""
    if repo_on_path and _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return jax


def timed(fn, *args, iters=8):
    """Median wall time (ms) of fn(*args); fn must return a device scalar
    (fetching it forces execution through the relay)."""
    out = float(fn(*args))  # compile + warm
    assert np.isfinite(out), out
    ts = []
    for _ in range(iters):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1000.0


def relay_overhead_ms(iters=8):
    """Cost of dispatching a trivial jitted program + fetching its scalar —
    subtract from each timed() phase to get device-time nets."""
    import jax
    import jax.numpy as jnp

    return timed(jax.jit(lambda x: jnp.sum(x)), jnp.ones((8, 8)), iters=iters)
