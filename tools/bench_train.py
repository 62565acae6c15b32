#!/usr/bin/env python3
"""
Training-throughput benchmark (secondary to bench.py): jitted train-step
latency and steps/s for the two training stages at production scale
(BlockPush-shipped hyperparameters, reference
experiments/BlockPush/predictors/PlaySlot/experiment_params.json), with the
on-device data generator so host I/O is out of the picture.

Prints one JSON line with both stages.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import optax

from bench import build_models
from playslot_tpu.train.losses import compute_losses

BATCH = int(os.environ.get("PLAYSLOT_TRAINBENCH_BATCH", "32"))
T_SAVI = 8
NUM_CONTEXT, NUM_PREDS = 6, 8  # reference training defaults (CONFIG.py:80-86)


def timeit(fn, *args, n=5):
    state = fn(*args)
    jax.tree_util.tree_leaves(state)
    # force completion via a scalar fetch on the loss
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        float(out[-1])
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    savi, predictor = build_models(jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    # ---------------- stage 1: SAVi train step (MSE recon, Adam, clip)
    videos = jnp.asarray(np.random.RandomState(0).rand(
        BATCH, T_SAVI, 64, 64, 3), jnp.float32)
    savi_vars = jax.jit(lambda v: savi.init({"params": key, "slots": key}, v))(
        videos[:1, :2])
    tx = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(1e-4))
    opt = tx.init(savi_vars["params"])

    @jax.jit
    def savi_step(params, opt_state, videos, k):
        # trainer-shaped step: fused decode on the training path
        # (train/trainer.py fast_decode default; grad parity CI-tested)
        def loss_fn(p):
            out = savi.apply({"params": p}, videos, train=True, decode=False,
                             rngs={"slots": k})
            recons, _, _ = savi.apply(
                {"params": p}, out["slot_history"],
                method=lambda m, s: m.decode_fast(s, train=True))
            return jnp.mean((recons - videos) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    dt_savi = timeit(savi_step, savi_vars["params"], opt, videos, key)

    # ---------------- stage 2: PlaySlot predictor train step
    T = NUM_CONTEXT + NUM_PREDS
    videos2 = jnp.asarray(np.random.RandomState(1).rand(
        BATCH, T, 64, 64, 3), jnp.float32)
    slots0 = jnp.zeros((1, T, 8, 128), jnp.float32)
    pred_vars = jax.jit(lambda s: predictor.init(
        {"params": key, "action": key}, s, num_seed=NUM_CONTEXT,
        num_preds=NUM_PREDS))(slots0)
    tx2 = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(1e-4))
    opt2 = tx2.init(pred_vars["params"])
    loss_cfg = [{"type": "pred_slot_mse", "weight": 1},
                {"type": "pred_img_mse", "weight": 1},
                {"type": "VQLoss", "weight": 1, "beta": 0.25}]

    @jax.jit
    def pred_step(params, vq, opt_state, videos, k):
        ks, ka = jax.random.split(k)
        slots = jax.lax.stop_gradient(savi.apply(
            {"params": savi_vars["params"]}, videos, decode=False,
            rngs={"slots": ks})["slot_history"])

        def loss_fn(p):
            (pred_slots, out), new_vars = predictor.apply(
                {"params": p, "vq": vq}, slots, num_seed=NUM_CONTEXT,
                num_preds=NUM_PREDS, train=True, rngs={"action": ka},
                mutable=["vq"])
            pred_imgs, _, _ = savi.apply(
                {"params": savi_vars["params"]}, pred_slots,
                method=lambda m, s: m.decode_fast(s))
            total, _ = compute_losses(
                loss_cfg, preds=pred_slots, targets=slots[:, 1:],
                pred_imgs=pred_imgs, target_imgs=videos[:, 1:],
                **out["vq_losses"])
            return total, new_vars["vq"]

        (loss, new_vq), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx2.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_vq, opt_state, loss

    dt_pred = timeit(pred_step, pred_vars["params"], pred_vars["vq"], opt2,
                     videos2, key)

    result = {
        "metric": "train_step_latency",
        "savi": {"batch": BATCH, "frames": T_SAVI,
                 "step_ms": round(dt_savi * 1000, 1),
                 "videos_per_sec": round(BATCH / dt_savi, 1)},
        "playslot": {"batch": BATCH, "frames": T,
                     "step_ms": round(dt_pred * 1000, 1),
                     "videos_per_sec": round(BATCH / dt_pred, 1)},
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
