#!/usr/bin/env python3
"""
Encode-phase internals ledger (round 3): the reconciled bench breakdown
(docs/BENCH_BREAKDOWN.json) puts encode at ~90 ms net — the largest
non-decode slice of the 549 ms step — and docs/PERFORMANCE.md notes the
encoder convs run at ~6 % MXU. This tool splits the encode phase of
bench.py's headline workload (B=128, 21 frames, SAVi 8 slots x 128-d)
into its internal slices, each measured as its own jitted program on
device-resident inputs (same methodology as tools/bench_breakdown_tpu.py:
scalar-fetch forced execution, median of 8, relay overhead reported
separately):

  conv        — the 4-layer ConvEncoder on all B*T frames (one batched call)
  feats       — full encode(): conv + SoftPositionEmbed + LayerNorm + MLP
  recurrence  — initial_slots + 21 sequential correct()/predict_next() steps
                on precomputed features (the sequential part of SAVi)
  encode_e2e  — the full __call__(decode=False) program (what bench.py runs)

plus marginals:
  posmlp      = feats - conv            (positional embed + norm + MLP)
  one OPTIONAL deeper split of the recurrence into slot-attention vs
  transition cost via a no-transition variant.

Writes docs/ENCODE_BREAKDOWN.json and prints the ledger.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_util import relay_overhead_ms, setup, timed

jax = setup()
import jax.numpy as jnp

from bench import BATCH, COMPUTE_DTYPE, NUM_PREDS, NUM_SEED, build_models


def main():
    savi, _ = build_models(COMPUTE_DTYPE)
    T = NUM_SEED + NUM_PREDS
    key = jax.random.PRNGKey(0)
    videos = jnp.asarray(np.random.RandomState(0).rand(BATCH, T, 64, 64, 3),
                         jnp.float32)
    savi_vars = jax.jit(lambda v: savi.init({"params": key, "slots": key}, v))(
        videos[:1, :2])
    sp = savi_vars["params"]
    frames = videos.reshape(BATCH * T, 64, 64, 3)

    ledger = {}
    ledger["relay_overhead_ms"] = relay_overhead_ms()

    # ---- conv stack only, all frames in one batched call
    @jax.jit
    def ph_conv(sp, f):
        y = savi.apply({"params": sp}, f,
                       method=lambda m, x: m.encoder_mod(x, train=False))
        return jnp.sum(y.astype(jnp.float32))

    ledger["conv_ms"] = timed(ph_conv, sp, frames)

    # ---- full per-frame featurization (conv + pos-embed + LN + MLP)
    @jax.jit
    def ph_feats(sp, f):
        y = savi.apply({"params": sp}, f,
                       method=lambda m, x: m.encode(x, train=False))
        return jnp.sum(y.astype(jnp.float32)), y

    s, feats = ph_feats(sp, frames)
    feats = jax.block_until_ready(feats)
    ledger["feats_ms"] = timed(lambda a, b: ph_feats(a, b)[0], sp, frames)
    ledger["posmlp_marginal_ms"] = max(
        ledger["feats_ms"] - ledger["conv_ms"], 0.0)

    feats_t = feats.reshape(BATCH, T, *feats.shape[1:])

    # ---- the sequential slot recurrence on precomputed features
    def recur(m, ft, with_transition=True):
        slots = m.initial_slots(batch_size=ft.shape[0])
        hist = []
        for t in range(T):
            s, _ = m.correct(ft[:, t], slots, first=(t == 0), train=False)
            slots = m.predict_next(s) if with_transition else s
            hist.append(s)
        return jnp.stack(hist, axis=1)

    @jax.jit
    def ph_recur(sp, ft):
        y = savi.apply({"params": sp}, ft,
                       method=lambda m, x: recur(m, x),
                       rngs={"slots": key})
        return jnp.sum(y.astype(jnp.float32))

    ledger["recurrence_ms"] = timed(ph_recur, sp, feats_t)

    # ---- recurrence without the transition transformer (marginal)
    @jax.jit
    def ph_recur_notrans(sp, ft):
        y = savi.apply({"params": sp}, ft,
                       method=lambda m, x: recur(m, x, with_transition=False),
                       rngs={"slots": key})
        return jnp.sum(y.astype(jnp.float32))

    recur_notrans_ms = timed(ph_recur_notrans, sp, feats_t)
    ledger["transition_marginal_ms"] = max(
        ledger["recurrence_ms"] - recur_notrans_ms, 0.0)
    ledger["slot_attention_ms"] = recur_notrans_ms

    # ---- one correct() step in isolation (per-step dispatch floor)
    f0 = jax.block_until_ready(feats_t[:, 0])
    slots0 = jax.block_until_ready(jax.jit(
        lambda sp: savi.apply({"params": sp}, BATCH,
                              method=lambda m, b: m.initial_slots(batch_size=b),
                              rngs={"slots": key}))(sp))

    @jax.jit
    def ph_step(sp, f, s):
        y, _ = savi.apply({"params": sp}, f, s,
                          method=lambda m, a, b: m.correct(a, b, first=False,
                                                           train=False))
        return jnp.sum(y.astype(jnp.float32))

    ledger["one_correct_step_ms"] = timed(ph_step, sp, f0, slots0)

    # ---- the full encode program bench.py runs
    @jax.jit
    def ph_encode(sp, v):
        slots = savi.apply({"params": sp}, v, decode=False,
                           rngs={"slots": key})["slot_history"]
        return jnp.sum(slots.astype(jnp.float32))

    ledger["encode_e2e_ms"] = timed(ph_encode, sp, videos)

    ov = ledger["relay_overhead_ms"]
    ledger["sum_feats_recur_net_ms"] = (
        ledger["feats_ms"] + ledger["recurrence_ms"] - 2 * ov)
    ledger["encode_e2e_net_ms"] = ledger["encode_e2e_ms"] - ov
    ledger["config"] = {"batch": BATCH, "frames": T,
                        "dtype": str(COMPUTE_DTYPE.__name__),
                        "device": str(jax.devices()[0])}
    ledger = {k: (round(v, 2) if isinstance(v, float) else v)
              for k, v in ledger.items()}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "ENCODE_BREAKDOWN.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=2)
    print(json.dumps(ledger, indent=2))


if __name__ == "__main__":
    main()
