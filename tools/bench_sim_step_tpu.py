#!/usr/bin/env python3
"""
KV-cache ruling for the closed-loop sim path (VERDICT r4 item 6).

The lockstep sim evaluator advances all episodes with one device call per
control step (train/sim_evaluator.py _control_step): policy -> latent
decompose -> action decoder -> SlotGPT `forward_single` over the FULL slot
window (windowed recompute, the reference's semantics —
src/models/Predictors/DynamicsModels.py:519-527 + 457-516). 60 sequential
steps/episode make this exactly the regime a KV cache targets, so measure
it like every other dispatch decision in this repo:

  A. windowed  — the production `_control_step` math at steady-state window
     L = context_length;
  B. cached    — same policy/decompose/decoder work, dynamics advanced by
     `forward_cached` on ONE new frame against a primed cache. Only valid
     while the window GROWS (first L steps of an episode; positions never
     shift — models/dynamics.py:189-224); past window-fill the reference
     re-bases positions each step so a cache needs a ring buffer + PE
     offset to stay equivalent. The measurement is therefore the UPPER
     BOUND of what that extension could save on every step.
  C. dynamics-only marginal of each (policy/decoder excluded), attributing
     the step's cost.

Study scale (the shapes the production studies run): N=30 lockstep
episodes, 3 slots x 64-d, predictor 256-emb x 4 layers, context_length 8,
action_dim 24 — 24-token windows. Writes docs/SIM_STEP_LATENCY.json;
docs/PERFORMANCE.md carries the ruling.

Run on TPU from the repo root: python tools/bench_sim_step_tpu.py
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

N = int(os.environ.get("PLAYSLOT_SIMSTEP_N", "30"))
NUM_SLOTS, SLOT_DIM = 3, 64
ACTION_DIM = 24
CONTEXT = 8
ITERS = int(os.environ.get("PLAYSLOT_SIMSTEP_ITERS", "30"))

PRED_CFG = {
    "predictor_name": "SlotSingleAction",
    "predictor_params": {
        "num_actions": 8, "action_dim": ACTION_DIM, "slot_dim": SLOT_DIM,
        "condition_mode": "sum", "use_variability": True,
        "autoregressive_dynamics": True,
        "LatentAction": {"model_name": "VQSingleSlotLatentAction",
                         "model_params": {"emb_dim": 256, "num_layers": 4,
                                          "num_heads": 4, "head_dim": 64,
                                          "mlp_dim": 1024,
                                          "use_ema_vq": True}},
        "DynamicsModel": {"model_name": "SlotGPTDymamicsModel",
                          "model_params": {"embed_dim": 256, "head_dim": 64,
                                           "num_heads": 8, "mlp_size": 1024,
                                           "num_layers": 4,
                                           "context_length": CONTEXT,
                                           "pos_enc_dropout": 0.0}}}}
BEH_CFG = {"model_name": "MarkovBehaviorCloner",
           "model_params": {"emb_dim": 128, "num_layers": 2, "num_heads": 4,
                            "head_dim": 32, "mlp_dim": 256}}


def _median_ms(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)  # compile + force
    times = []
    for _ in range(ITERS):
        t0 = time.time()
        out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a), out)
        times.append(time.time() - t0)
    return float(np.median(times) * 1000)


def main():
    from playslot_tpu.engine.rollout import init_kv_caches
    from playslot_tpu.models.factory import (setup_action_decoder,
                                             setup_behavior_model,
                                             setup_predictor)

    key = jax.random.PRNGKey(0)
    predictor = setup_predictor(
        PRED_CFG, savi_params={"num_slots": NUM_SLOTS, "slot_dim": SLOT_DIM})
    policy = setup_behavior_model(BEH_CFG, slot_dim=SLOT_DIM,
                                  action_dim=ACTION_DIM)
    decoder = setup_action_decoder({
        "model_name": "MLPDecoder",
        "model_params": {"in_dim": ACTION_DIM, "out_dim": 2,
                         "hidden_dim": [64, 64]}})

    window = jnp.asarray(
        np.random.RandomState(0).randn(N, CONTEXT, NUM_SLOTS, SLOT_DIM) * .5,
        jnp.float32)
    slots0 = jnp.zeros((1, CONTEXT, NUM_SLOTS, SLOT_DIM), jnp.float32)
    pred_vars = jax.jit(lambda s: predictor.init(
        {"params": key, "action": key}, s, num_seed=2, num_preds=2))(slots0)
    pred_vars = {"params": pred_vars["params"], "vq": pred_vars["vq"]}
    policy_params = jax.jit(lambda s: policy.init(key, s))(
        window[:1, :1])["params"]
    dec_params = jax.jit(lambda z: decoder.init(key, z))(
        jnp.zeros((1, ACTION_DIM)))["params"]
    protos_hist = jnp.asarray(
        np.random.RandomState(1).randn(N, CONTEXT - 1, ACTION_DIM) * .1,
        jnp.float32)
    vars_hist = jnp.zeros_like(protos_hist)

    def heads(slots_window):
        """policy -> decompose -> robot action (shared by both variants)."""
        cur = slots_window[:, -1:]
        latent = policy.apply({"params": policy_params}, cur)[:, -1]
        protos, variability = predictor.apply(
            pred_vars, latent,
            method=lambda m, z: m.latent_action.decompose_action_latent(z))
        robot = decoder.apply({"params": dec_params}, latent)
        return robot, protos, variability

    def tiled(h):
        return jnp.tile(h[:, :, None, :], (1, 1, NUM_SLOTS, 1))

    @jax.jit
    def step_windowed(slots_window, ph, vh):
        """The production _control_step math (sim_evaluator.py:137-172)."""
        with jax.default_matmul_precision("highest"):
            robot, protos, variability = heads(slots_window)
            ph = jnp.concatenate([ph, protos[:, None]], axis=1)
            vh = jnp.concatenate([vh, variability[:, None]], axis=1)
            pred = predictor.apply(
                pred_vars, slots_window, tiled(ph), tiled(vh),
                method=lambda m, s, p, v: m.dynamics_model.forward_single(
                    s, p, action_vars=v))
            return robot, pred[:, -1]

    @jax.jit
    def step_cached(slots_window, ph, vh, caches):
        """Same heads; dynamics advanced incrementally on ONE new frame."""
        with jax.default_matmul_precision("highest"):
            robot, protos, variability = heads(slots_window)
            pred, caches = predictor.apply(
                pred_vars, slots_window[:, -1:], tiled(protos[:, None]),
                tiled(variability[:, None]), caches, CONTEXT - 1,
                method=lambda m, s, p, v, c, off:
                    m.dynamics_model.forward_cached(s, p, v, caches=c,
                                                    offset=off))
            return robot, pred[:, -1], caches

    @jax.jit
    def dyn_windowed(slots_window, ph, vh):
        with jax.default_matmul_precision("highest"):
            return predictor.apply(
                pred_vars, slots_window, tiled(ph), tiled(vh),
                method=lambda m, s, p, v: m.dynamics_model.forward_single(
                    s, p, action_vars=v))[:, -1]

    @jax.jit
    def dyn_cached(slots_window, p1, v1, caches):
        with jax.default_matmul_precision("highest"):
            pred, caches = predictor.apply(
                pred_vars, slots_window[:, -1:], tiled(p1), tiled(v1),
                caches, CONTEXT - 1,
                method=lambda m, s, p, v, c, off:
                    m.dynamics_model.forward_cached(s, p, v, caches=c,
                                                    offset=off))
            return pred[:, -1], caches

    @jax.jit
    def prime(slots_window, ph, vh, caches):
        with jax.default_matmul_precision("highest"):
            return predictor.apply(
                pred_vars, slots_window[:, :-1], tiled(ph), tiled(vh),
                caches, 0,
                method=lambda m, s, p, v, c, off:
                    m.dynamics_model.forward_cached(s, p, v, caches=c,
                                                    offset=off))[1]

    caches = init_kv_caches(predictor, N, NUM_SLOTS)
    caches = prime(window, protos_hist, vars_hist, caches)

    full_ph = jnp.concatenate(
        [protos_hist, jnp.zeros((N, 1, ACTION_DIM))], axis=1)
    report = {
        "config": {"episodes": N, "slots": NUM_SLOTS, "slot_dim": SLOT_DIM,
                   "context_length": CONTEXT, "pred_emb": 256,
                   "pred_layers": 4, "window_tokens": CONTEXT * NUM_SLOTS,
                   "iters": ITERS, "device": str(jax.devices()[0])},
        "control_step_windowed_ms": _median_ms(
            step_windowed, window, protos_hist, vars_hist),
        "control_step_cached_ms": _median_ms(
            step_cached, window, protos_hist, vars_hist, caches),
        "dynamics_only_windowed_ms": _median_ms(
            dyn_windowed, window, full_ph, full_ph),
        "dynamics_only_cached_ms": _median_ms(
            dyn_cached, window, full_ph[:, -1:], full_ph[:, -1:], caches),
    }
    d = report
    d["cached_saving_ms"] = round(
        d["control_step_windowed_ms"] - d["control_step_cached_ms"], 3)
    for k, v in report.items():
        if isinstance(v, float):
            report[k] = round(v, 3)
    print(json.dumps(report, indent=2))
    out = os.path.join(_REPO, "docs", "SIM_STEP_LATENCY.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
