#!/usr/bin/env python3
"""
Per-phase ledger + HBM batch sweep for the TRAINING steps (VERDICT r3
item 2): the eval path has a reconciled ledger and speed-of-light ruling
(bench_breakdown_tpu.py); this gives the two training stages the same
treatment at production scale (bench.py's BlockPush-shipped dims).

Phases, each its own jitted program on device-resident inputs, scalar-fetch
forced (relay makes block_until_ready a no-op), median of `iters`:

  SAVi stage:    fwd_encode (conv encode + slot attention, decode=False)
                 fwd_full   (+ fused decode + MSE loss)
                 fwd_bwd    (value_and_grad)
                 full_step  (+ global-norm clip + Adam)
    variants:    full_step with the naive decode (the pre-round-4 path),
                 full_step with remat ("decode" rematerialization)

  PlaySlot stage: fwd_slots (frozen SAVi encode)
                  fwd_pred  (+ InvDyn + VQ + dynamics forward)
                  fwd_full  (+ frozen-SAVi fused decode + full loss)
                  fwd_bwd / full_step (+ remat variant)

Marginals (decode = fwd_full - fwd_encode + overhead, backward = fwd_bwd -
fwd_full + overhead, optimizer = full_step - fwd_bwd + overhead) net out the
per-fetch relay overhead by differencing.

The batch sweep runs full_step for B in PLAYSLOT_TRAINSWEEP_BATCHES
(default 32..256) with remat off and on, recording step ms, videos/s and
the XLA-reported peak temp allocation (compiled.memory_analysis()), until
the chip OOMs — the measured training-side HBM ceiling.

Writes docs/TRAIN_BREAKDOWN.json and prints the ledger.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_util import relay_overhead_ms, setup, timed

jax = setup()
import jax.numpy as jnp
import optax

from bench import COMPUTE_DTYPE, build_models
from playslot_tpu.ops.chunked import chunked_apply
from playslot_tpu.train.losses import compute_losses

BATCH = int(os.environ.get("PLAYSLOT_TRAINBENCH_BATCH", "32"))
T_SAVI = 8
NUM_CONTEXT, NUM_PREDS = 6, 8
SWEEP = [int(b) for b in os.environ.get(
    "PLAYSLOT_TRAINSWEEP_BATCHES", "32,64,96,128,160,192,224,256").split(",")]
ITERS = int(os.environ.get("PLAYSLOT_TRAINBENCH_ITERS", "6"))


def _savi_losses(savi, params, videos, key, fast=True, remat=False, chunks=1):
    def render_chunk(p, slot_history):
        method = (lambda m, s: m.decode_fast(s, train=True)) if fast \
            else (lambda m, s: m.decode(s, train=True))
        return savi.apply({"params": p}, slot_history, method=method)[0]

    def render(p, slot_history):
        return chunked_apply(lambda s: render_chunk(p, s), slot_history,
                             chunks, remat=remat or chunks > 1)

    out = savi.apply({"params": params}, videos, train=True, decode=False,
                     rngs={"slots": key})
    recons = render(params, out["slot_history"])
    return jnp.mean((recons - videos) ** 2)


def savi_programs(savi, params, tx, fast=True, remat=False, chunks=1):
    """Returns dict of jitted programs, each -> device scalar."""
    def loss_fn(p, videos, key):
        return _savi_losses(savi, p, videos, key, fast=fast, remat=remat,
                            chunks=chunks)

    @jax.jit
    def fwd_encode(p, videos, key):
        out = savi.apply({"params": p}, videos, train=True, decode=False,
                         rngs={"slots": key})
        return jnp.sum(out["slot_history"].astype(jnp.float32))

    @jax.jit
    def fwd_full(p, videos, key):
        return loss_fn(p, videos, key)

    @jax.jit
    def fwd_bwd(p, videos, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, videos, key)
        return loss + sum(jnp.sum(jnp.abs(g).astype(jnp.float32)) * 0
                          for g in jax.tree_util.tree_leaves(grads)) \
            + jnp.sum(jax.tree_util.tree_leaves(grads)[0].astype(jnp.float32))

    @jax.jit
    def full_step(p, opt_state, videos, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, videos, key)
        updates, opt_state = tx.update(grads, opt_state, p)
        new_p = optax.apply_updates(p, updates)
        return loss + jnp.sum(
            jax.tree_util.tree_leaves(new_p)[0].astype(jnp.float32))

    return {"fwd_encode": fwd_encode, "fwd_full": fwd_full,
            "fwd_bwd": fwd_bwd, "full_step": full_step}


def playslot_programs(savi, predictor, savi_params, tx, remat=False, chunks=1):
    loss_cfg = [{"type": "pred_slot_mse", "weight": 1},
                {"type": "pred_img_mse", "weight": 1},
                {"type": "VQLoss", "weight": 1, "beta": 0.25}]

    def slots_of(videos, key):
        return jax.lax.stop_gradient(savi.apply(
            {"params": savi_params}, videos, decode=False,
            rngs={"slots": key})["slot_history"])

    def render_chunk(pred_slots):
        imgs, _, _ = savi.apply({"params": savi_params}, pred_slots,
                                method=lambda m, s: m.decode_fast(s))
        return imgs

    def render_preds(pred_slots):
        return chunked_apply(render_chunk, pred_slots, chunks,
                             remat=remat or chunks > 1)

    def loss_fn(p, vq, slots, videos, ka):
        (pred_slots, out), new_vars = predictor.apply(
            {"params": p, "vq": vq}, slots, num_seed=NUM_CONTEXT,
            num_preds=NUM_PREDS, train=True, rngs={"action": ka},
            mutable=["vq"])
        pred_imgs = render_preds(pred_slots)
        total, _ = compute_losses(
            loss_cfg, preds=pred_slots, targets=slots[:, 1:],
            pred_imgs=pred_imgs, target_imgs=videos[:, 1:],
            **out["vq_losses"])
        return total, new_vars["vq"]

    @jax.jit
    def fwd_slots(videos, key):
        return jnp.sum(slots_of(videos, key).astype(jnp.float32))

    @jax.jit
    def fwd_pred(p, vq, videos, k):
        ks, ka = jax.random.split(k)
        slots = slots_of(videos, ks)
        (pred_slots, out), _ = predictor.apply(
            {"params": p, "vq": vq}, slots, num_seed=NUM_CONTEXT,
            num_preds=NUM_PREDS, train=True, rngs={"action": ka},
            mutable=["vq"])
        return jnp.sum(pred_slots.astype(jnp.float32))

    @jax.jit
    def fwd_full(p, vq, videos, k):
        ks, ka = jax.random.split(k)
        slots = slots_of(videos, ks)
        total, _ = loss_fn(p, vq, slots, videos, ka)
        return total

    @jax.jit
    def fwd_bwd(p, vq, videos, k):
        ks, ka = jax.random.split(k)
        slots = slots_of(videos, ks)
        (loss, _), grads = jax.value_and_grad(
            lambda q: loss_fn(q, vq, slots, videos, ka), has_aux=True)(p)
        return loss + jnp.sum(
            jax.tree_util.tree_leaves(grads)[0].astype(jnp.float32))

    @jax.jit
    def full_step(p, vq, opt_state, videos, k):
        ks, ka = jax.random.split(k)
        slots = slots_of(videos, ks)
        (loss, _), grads = jax.value_and_grad(
            lambda q: loss_fn(q, vq, slots, videos, ka), has_aux=True)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        new_p = optax.apply_updates(p, updates)
        return loss + jnp.sum(
            jax.tree_util.tree_leaves(new_p)[0].astype(jnp.float32))

    return {"fwd_slots": fwd_slots, "fwd_pred": fwd_pred, "fwd_full": fwd_full,
            "fwd_bwd": fwd_bwd, "full_step": full_step}


def _mem_gb(jitted, *args):
    """XLA-reported peak temp allocation of the compiled program, GiB."""
    try:
        mem = jitted.lower(*args).compile().memory_analysis()
        return round((mem.temp_size_in_bytes + mem.output_size_in_bytes)
                     / 2**30, 2)
    except Exception:
        return None


def main():
    savi, predictor = build_models(COMPUTE_DTYPE)
    key = jax.random.PRNGKey(0)
    ledger = {"relay_overhead_ms": relay_overhead_ms()}
    ov = ledger["relay_overhead_ms"]

    videos = jnp.asarray(np.random.RandomState(0).rand(
        BATCH, T_SAVI, 64, 64, 3), jnp.float32)
    savi_vars = jax.jit(lambda v: savi.init({"params": key, "slots": key}, v))(
        videos[:1, :2])
    sp = savi_vars["params"]
    tx = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(1e-4))
    opt = tx.init(sp)

    # ---------------- SAVi stage ledger @ BATCH
    progs = savi_programs(savi, sp, tx, fast=True)
    sl = {}
    sl["fwd_encode_ms"] = timed(progs["fwd_encode"], sp, videos, key,
                                iters=ITERS)
    sl["fwd_full_ms"] = timed(progs["fwd_full"], sp, videos, key, iters=ITERS)
    sl["fwd_bwd_ms"] = timed(progs["fwd_bwd"], sp, videos, key, iters=ITERS)
    sl["full_step_ms"] = timed(progs["full_step"], sp, opt, videos, key,
                               iters=ITERS)
    sl["decode_fwd_marginal_ms"] = sl["fwd_full_ms"] - sl["fwd_encode_ms"] + ov
    sl["backward_marginal_ms"] = sl["fwd_bwd_ms"] - sl["fwd_full_ms"] + ov
    sl["optimizer_marginal_ms"] = sl["full_step_ms"] - sl["fwd_bwd_ms"] + ov
    # variants
    naive = savi_programs(savi, sp, tx, fast=False)
    sl["full_step_naive_decode_ms"] = timed(naive["full_step"], sp, opt,
                                            videos, key, iters=ITERS)
    rem = savi_programs(savi, sp, tx, fast=True, remat=True)
    sl["full_step_remat_ms"] = timed(rem["full_step"], sp, opt, videos, key,
                                     iters=ITERS)
    sl["speedup_vs_naive"] = round(
        sl["full_step_naive_decode_ms"] / sl["full_step_ms"], 3)
    sl["mem_gb"] = _mem_gb(progs["full_step"], sp, opt, videos, key)
    sl["mem_gb_naive"] = _mem_gb(naive["full_step"], sp, opt, videos, key)
    sl["mem_gb_remat"] = _mem_gb(rem["full_step"], sp, opt, videos, key)
    ledger["savi"] = {k: (round(v, 1) if isinstance(v, float) else v)
                      for k, v in sl.items()}

    # ---------------- PlaySlot stage ledger @ BATCH
    T = NUM_CONTEXT + NUM_PREDS
    videos2 = jnp.asarray(np.random.RandomState(1).rand(
        BATCH, T, 64, 64, 3), jnp.float32)
    slots0 = jnp.zeros((1, T, 8, 128), jnp.float32)
    pred_vars = jax.jit(lambda s: predictor.init(
        {"params": key, "action": key}, s, num_seed=NUM_CONTEXT,
        num_preds=NUM_PREDS))(slots0)
    pp, vq = pred_vars["params"], pred_vars["vq"]
    tx2 = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(1e-4))
    opt2 = tx2.init(pp)

    pprogs = playslot_programs(savi, predictor, sp, tx2)
    pl = {}
    pl["fwd_slots_ms"] = timed(pprogs["fwd_slots"], videos2, key, iters=ITERS)
    pl["fwd_pred_ms"] = timed(pprogs["fwd_pred"], pp, vq, videos2, key,
                              iters=ITERS)
    pl["fwd_full_ms"] = timed(pprogs["fwd_full"], pp, vq, videos2, key,
                              iters=ITERS)
    pl["fwd_bwd_ms"] = timed(pprogs["fwd_bwd"], pp, vq, videos2, key,
                             iters=ITERS)
    pl["full_step_ms"] = timed(pprogs["full_step"], pp, vq, opt2, videos2,
                               key, iters=ITERS)
    pl["predictor_fwd_marginal_ms"] = pl["fwd_pred_ms"] - pl["fwd_slots_ms"] + ov
    pl["decode_loss_marginal_ms"] = pl["fwd_full_ms"] - pl["fwd_pred_ms"] + ov
    pl["backward_marginal_ms"] = pl["fwd_bwd_ms"] - pl["fwd_full_ms"] + ov
    pl["optimizer_marginal_ms"] = pl["full_step_ms"] - pl["fwd_bwd_ms"] + ov
    prem = playslot_programs(savi, predictor, sp, tx2, remat=True)
    pl["full_step_remat_ms"] = timed(prem["full_step"], pp, vq, opt2, videos2,
                                     key, iters=ITERS)
    pl["mem_gb"] = _mem_gb(pprogs["full_step"], pp, vq, opt2, videos2, key)
    pl["mem_gb_remat"] = _mem_gb(prem["full_step"], pp, vq, opt2, videos2, key)
    ledger["playslot"] = {k: (round(v, 1) if isinstance(v, float) else v)
                          for k, v in pl.items()}

    del videos, videos2

    # ---------------- batch sweep to the HBM ceiling
    # variants: plain, whole-render remat (measured worse round 4 — kept so
    # the refutation stays reproducible), chunked render (the memory lever)
    variants = [{"remat": False, "chunks": 1}]
    if os.environ.get("PLAYSLOT_TRAINSWEEP_REMAT", "0") == "1":
        variants.append({"remat": True, "chunks": 1})
    variants += [{"remat": False, "chunks": c} for c in
                 (int(x) for x in os.environ.get(
                     "PLAYSLOT_TRAINSWEEP_CHUNKS", "2,4").split(",") if x)]
    if os.environ.get("PLAYSLOT_TRAINSWEEP", "1") == "1":
        sweep = {"savi": [], "playslot": []}
        for stage, T_stage, make in (
                ("savi", T_SAVI,
                 lambda kw: savi_programs(savi, sp, tx, fast=True,
                                          **kw)["full_step"]),
                ("playslot", T,
                 lambda kw: playslot_programs(savi, predictor, sp, tx2,
                                              **kw)["full_step"])):
            for kw in variants:
                for B in SWEEP:
                    v = jnp.asarray(np.random.RandomState(2).rand(
                        B, T_stage, 64, 64, 3), jnp.float32)
                    fn = make(kw)
                    args = (sp, tx.init(sp), v, key) if stage == "savi" \
                        else (pp, vq, tx2.init(pp), v, key)
                    row = {"batch": B, **kw, "mem_gb": _mem_gb(fn, *args)}
                    try:
                        ms = timed(fn, *args, iters=4)
                        row.update(step_ms=round(ms, 1),
                                   videos_per_sec=round(B / (ms / 1000), 1))
                    except Exception as e:  # noqa: BLE001 — record OOM
                        row["error"] = str(e).splitlines()[0][:160]
                        sweep[stage].append(row)
                        del v
                        break
                    sweep[stage].append(row)
                    del v
        ledger["sweep"] = sweep

    ledger["config"] = {"batch": BATCH, "savi_frames": T_SAVI,
                        "playslot_frames": T,
                        "dtype": str(COMPUTE_DTYPE.__name__),
                        "device": str(jax.devices()[0])}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "TRAIN_BREAKDOWN.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=2)
    print(json.dumps(ledger, indent=2))


if __name__ == "__main__":
    main()
