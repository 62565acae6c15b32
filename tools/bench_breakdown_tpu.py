#!/usr/bin/env python3
"""
Per-phase ledger for the headline bench workload (VERDICT r2 item 3): the
round-2 breakdown (encode 68 + InvDyn/rollout 40 + decode 241 = 349 ms)
did not sum to the 439 ms step — ~90 ms was unaccounted. This tool measures
every phase of bench.py's forward at the SAME batch, each as its own jitted
program on device-resident inputs, plus the relay's per-call scalar-fetch
overhead, and reconciles against the end-to-end step:

  phases: encode (SAVi conv+slot attention over all 21 frames),
          invdyn (posterior latent actions), rollout (15-step SlotGPT scan),
          decode_rgba (fused broadcast decode to per-slot RGBA),
          composite (alpha-softmax compositing), clip+checksum epilogue.

Every timed call fetches a device-reduced scalar (the relay makes
block_until_ready a no-op). `relay_overhead_ms` — the cost of fetching a
scalar from a trivial program — is reported separately. The four direct
phases (encode/invdyn/rollout/decode_rgba) include one overhead each;
composite and clip_checksum are marginals of nested programs whose
differencing nets the overhead out; the per-slot RGBA tensor is never
materialized outside jit (doing so OOMs the chip — the e2e program consumes
it fused into compositing). Accounting:
  sum(phases) - 4 * relay_overhead  ≈  e2e - relay_overhead
within fusion differences. The residual is printed as `unaccounted_ms`.

Writes docs/BENCH_BREAKDOWN.json and prints the ledger.
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
    savi, predictor = build_models(COMPUTE_DTYPE)
    T = NUM_SEED + NUM_PREDS
    key = jax.random.PRNGKey(0)
    videos = jnp.asarray(np.random.RandomState(0).rand(BATCH, T, 64, 64, 3),
                         jnp.float32)
    savi_vars = jax.jit(lambda v: savi.init({"params": key, "slots": key}, v))(
        videos[:1, :2])
    slots0 = jnp.zeros((1, T, 8, 128), jnp.float32)
    pred_vars = jax.jit(lambda s: predictor.init(
        {"params": key, "action": key}, s, num_seed=NUM_SEED,
        num_preds=NUM_PREDS))(slots0)
    sp, pv = savi_vars["params"], pred_vars

    from playslot_tpu.engine.rollout import posterior_rollout, scan_rollout
    from playslot_tpu.ops.compositing import alpha_composite

    ledger = {}

    ledger["relay_overhead_ms"] = relay_overhead_ms()

    # ---- phase 1: encode
    @jax.jit
    def ph_encode(sp, v):
        slots = savi.apply({"params": sp}, v, decode=False)["slot_history"]
        return jnp.sum(slots.astype(jnp.float32)), slots

    s, slots = ph_encode(sp, videos)
    slots = jax.block_until_ready(slots)
    ledger["encode_ms"] = timed(lambda a, b: ph_encode(a, b)[0], sp, videos)

    # ---- phase 2: InvDyn posterior actions
    @jax.jit
    def ph_invdyn(pv, sl, k):
        la = predictor.apply(pv, sl, method=lambda m, x: m.latent_action(
            x, train=False), rngs={"action": k})
        protos = la["action_proto"]
        avars = la["action_variability"]
        return (jnp.sum(protos.astype(jnp.float32)), protos, avars)

    _, protos, avars = ph_invdyn(pv, slots, key)
    protos, avars = jax.block_until_ready((protos, avars))
    ledger["invdyn_ms"] = timed(lambda a, b, c: ph_invdyn(a, b, c)[0],
                                pv, slots, key)

    # ---- phase 3: rollout (inflate per-slot conditioning like
    # posterior_rollout does for single-action models)
    num_slots = slots.shape[2]
    protos_s = jnp.tile(protos[:, :, None, :], (1, 1, num_slots, 1))
    avars_s = jnp.tile(avars[:, :, None, :], (1, 1, num_slots, 1))

    @jax.jit
    def ph_rollout(pv, sl, p, v):
        preds = scan_rollout(predictor, pv, sl[:, :NUM_SEED], p, v, NUM_PREDS)
        return jnp.sum(preds.astype(jnp.float32)), preds

    _, preds = ph_rollout(pv, slots, protos_s, avars_s)
    preds = jax.block_until_ready(preds)
    ledger["rollout_ms"] = timed(lambda *a: ph_rollout(*a)[0],
                                 pv, slots, protos_s, avars_s)

    # ---- end-to-end (bench.py's exact program) — measured before the
    # decode phases so `videos` can be freed for their working set
    @jax.jit
    def e2e(sp, pv, v, k):
        sl = savi.apply({"params": sp}, v, decode=False)["slot_history"]
        pr = posterior_rollout(predictor, pv, sl, NUM_SEED, NUM_PREDS, rng=k)
        imgs, _, _ = savi.apply({"params": sp}, pr,
                                method=lambda m, s: m.decode_fast(s))
        return jnp.sum(jnp.clip(imgs.astype(jnp.float32), 0, 1))

    ledger["e2e_ms"] = timed(e2e, sp, pv, videos, key)
    del slots, protos, avars, protos_s, avars_s

    # ---- phase 4: fused broadcast decode to per-slot RGBA (no compositing)
    from playslot_tpu.ops.fused_decode import fused_broadcast_decode
    from playslot_tpu.ops.grids import build_grid

    def rgba_of(sp, s):
        bound = savi.bind({"params": sp})
        dec = bound.decoder_mod
        return fused_broadcast_decode(
            s, grid=build_grid(bound.decoder_resolution),
            pos_params=bound.decoder_pos_embedding.variables["params"],
            dec_params=dec.variables["params"],
            hidden_dims=dec.hidden_dims, kernel_size=dec.kernel_size,
            out_channels=savi.in_channels + 1,
            resolution=bound.decoder_resolution, dtype=savi.dtype)

    # The per-slot RGBA tensor (B·T·S maps) is never materialized outside
    # jit — retaining it OOMs the chip on top of the decode working set, and
    # the e2e program consumes it fused into compositing anyway. Composite
    # and clip phase costs are therefore measured as marginals of nested
    # programs (each difference re-adds one relay overhead).
    del videos  # e2e already measured; free HBM for the decode phases

    @jax.jit
    def ph_decode_rgba(sp, s):
        return jnp.sum(rgba_of(sp, s).astype(jnp.float32))

    ledger["decode_rgba_ms"] = timed(ph_decode_rgba, sp, preds)

    # ---- phase 5: alpha compositing (marginal over decode)
    @jax.jit
    def ph_decode_composite(sp, s):
        imgs, _, _ = alpha_composite(rgba_of(sp, s), num_slots)
        return jnp.sum(imgs.astype(jnp.float32))

    decode_composite_ms = timed(ph_decode_composite, sp, preds)
    ledger["composite_ms"] = max(
        decode_composite_ms - ledger["decode_rgba_ms"]
        + ledger["relay_overhead_ms"], 0.0)

    # ---- phase 6: clip + checksum epilogue on the decoded frames
    @jax.jit
    def ph_full_decode(sp, s):
        imgs, _, _ = savi.apply({"params": sp}, s,
                                method=lambda m, x: m.decode_fast(x))
        return jnp.sum(jnp.clip(imgs.astype(jnp.float32), 0, 1))

    ledger["decode_composite_clip_ms"] = timed(ph_full_decode, sp, preds)
    ledger["clip_checksum_ms"] = max(
        ledger["decode_composite_clip_ms"] - decode_composite_ms
        + ledger["relay_overhead_ms"], 0.0)

    # ---- end-to-end (bench.py's exact program)
    # encode/invdyn/rollout/decode_rgba each include one relay-overhead
    # scalar fetch; composite and clip_checksum are marginals whose
    # differencing already netted the overhead out.
    ov = ledger["relay_overhead_ms"]
    parts = (ledger["encode_ms"] + ledger["invdyn_ms"] + ledger["rollout_ms"]
             + ledger["decode_rgba_ms"] + ledger["composite_ms"]
             + ledger["clip_checksum_ms"] - 4 * ov)
    ledger["sum_of_phases_ms"] = parts
    ledger["unaccounted_ms"] = ledger["e2e_ms"] - ov - parts
    ledger["unaccounted_pct_of_e2e"] = round(
        100 * ledger["unaccounted_ms"] / ledger["e2e_ms"], 2)
    ledger["config"] = {"batch": BATCH, "num_seed": NUM_SEED,
                        "num_preds": NUM_PREDS,
                        "dtype": str(COMPUTE_DTYPE.__name__),
                        "device": str(jax.devices()[0])}
    ledger = {k: (round(v, 2) if isinstance(v, float) else v)
              for k, v in ledger.items()}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "BENCH_BREAKDOWN.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=2)
    print(json.dumps(ledger, indent=2))


if __name__ == "__main__":
    main()
