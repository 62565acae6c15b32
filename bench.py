"""
Headline benchmark: PlaySlot stochastic video prediction on TPU.

Workload = the reference's canonical eval config (BASELINE.md): posterior
rollout with num_seed=6, num_preds=15 at BlockPush production scale
(SAVi 8 slots x 128-d, 64x64 frames; InvDynS + SlotGPT 256-d x 4 layers,
reference experiments/BlockPush/predictors/PlaySlot/experiment_params.json),
end-to-end: SAVi encode of all 21 frames -> InvDyn posterior latent actions
-> 15-step autoregressive SlotGPT rollout -> spatial-broadcast decode +
alpha compositing of all predicted frames.

Prints ONE JSON line: predicted frames/sec/chip vs the 2500/chip target
(20k aggregate on a v5e-8).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# persistent compilation cache: repeat bench runs skip the ~40s compile
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


NUM_SEED, NUM_PREDS = 6, 15
# round-5 sweep peak (docs/BENCH_SWEEP_R5.json): B=256, per-frame streaming
# encode, 4 decode chunks, fused epilogue -> 3664 f/s/chip (1.47x target)
BATCH = int(os.environ.get("PLAYSLOT_BENCH_BATCH", "256"))
COMPUTE_DTYPE = jnp.bfloat16 if os.environ.get(
    "PLAYSLOT_BENCH_DTYPE", "bfloat16") == "bfloat16" else jnp.float32
# decode in N sequential chunks (lax.map) — divides the decode working set,
# lifting the HBM batch ceiling (B=160 OOMs unchunked; docs/PERFORMANCE.md)
DECODE_CHUNKS = int(os.environ.get("PLAYSLOT_BENCH_DECODE_CHUNKS", "4"))
# encode memory lever (engine/streaming.py): 0 = hoisted all-frame batched
# encode (models/savi.py); N > 0 = scan the encode through the recurrence in
# N-frame groups, shrinking encoder live memory ~T/N-fold — the lever that
# lifted the B>=256 non-decode HBM ceiling (docs/PERFORMANCE.md)
ENCODE_CHUNK = int(os.environ.get("PLAYSLOT_BENCH_ENCODE_CHUNK", "1"))
# fuse the composite+clip+checksum epilogue into the decode chunk bodies
# (ops/chunked.py chunked_apply_reduce): per-slot recons/masks and full
# pred frames never round-trip HBM at full batch
FUSED_EPILOGUE = os.environ.get("PLAYSLOT_BENCH_FUSED_EPILOGUE", "1") == "1"


def build_models(dtype):
    from playslot_tpu.models.factory import setup_model, setup_predictor

    savi = setup_model({"model_name": "SAVi", "model_params": {
        "num_slots": 8, "slot_dim": 128, "num_iterations_first": 3,
        "num_iterations": 1, "in_channels": 3, "mlp_hidden": 256,
        "mlp_encoder_dim": 128, "initializer": "Learned",
        "transition_module_params": {"model_name": "TransformerBlock",
                                     "num_heads": 4, "head_dim": 32,
                                     "mlp_size": 512},
        "encoder": {"encoder_name": "ConvEncoder",
                    "encoder_params": {"num_channels": [32, 32, 32, 32],
                                       "kernel_size": 5, "resolution": [64, 64]}},
        "decoder": {"decoder_name": "ConvDecoder",
                    "decoder_params": {"num_channels": [64, 64, 64, 64],
                                       "kernel_size": 5, "resolution": [64, 64],
                                       "upsample": 1}},
    }}, dtype=dtype)
    predictor = setup_predictor({
        "predictor_name": "SlotSingleAction",
        "predictor_params": {
            "num_actions": 8, "action_dim": 16, "slot_dim": 128,
            "condition_mode": "sum", "use_variability": True,
            "autoregressive_dynamics": True,
            "LatentAction": {"model_name": "VQSingleSlotLatentAction",
                             "model_params": {"emb_dim": 256, "num_layers": 4,
                                              "num_heads": 4, "head_dim": 64,
                                              "mlp_dim": 1024, "use_ema_vq": True}},
            "DynamicsModel": {"model_name": "SlotGPTDymamicsModel",
                              "model_params": {"embed_dim": 256, "head_dim": 64,
                                               "num_heads": 8, "mlp_size": 1024,
                                               "num_layers": 4, "context_length": 8,
                                               "pos_enc_dropout": 0.0}},
        }}, dtype=dtype)
    return savi, predictor


def main():
    savi, predictor = build_models(COMPUTE_DTYPE)
    T = NUM_SEED + NUM_PREDS
    key = jax.random.PRNGKey(0)
    videos = jnp.asarray(np.random.RandomState(0).rand(BATCH, T, 64, 64, 3),
                         jnp.float32)
    # inits MUST be jitted: on relayed TPU backends an eager init dispatches
    # thousands of tiny ops with full round-trip latency each (minutes)
    savi_vars = jax.jit(lambda v: savi.init({"params": key, "slots": key}, v))(
        videos[:1, :2])
    slots0 = jnp.zeros((1, T, 8, 128), jnp.float32)
    pred_vars = jax.jit(lambda s: predictor.init(
        {"params": key, "action": key}, s, num_seed=NUM_SEED,
        num_preds=NUM_PREDS))(slots0)

    from playslot_tpu.engine.rollout import posterior_rollout

    from playslot_tpu.engine.streaming import streaming_slot_history
    from playslot_tpu.ops.chunked import chunked_apply_reduce

    @jax.jit
    def forward(savi_params, pred_variables, videos, key):
        if ENCODE_CHUNK > 0:
            slots = streaming_slot_history(savi, {"params": savi_params},
                                           videos, frame_chunk=ENCODE_CHUNK)
        else:
            slots = savi.apply({"params": savi_params}, videos, decode=False
                               )["slot_history"]
        preds = posterior_rollout(predictor, pred_variables, slots,
                                  NUM_SEED, NUM_PREDS, rng=key)
        # device-side checksum: fetching this scalar is the only reliable way
        # to force full execution on relayed TPU backends where
        # block_until_ready returns immediately
        if FUSED_EPILOGUE:
            parts = chunked_apply_reduce(
                lambda s: savi.apply({"params": savi_params}, s,
                                     method=lambda m, c: m.decode_fast(c))[0],
                preds, DECODE_CHUNKS,
                lambda imgs: jnp.sum(jnp.clip(imgs.astype(jnp.float32), 0, 1)))
            return jnp.sum(parts)
        pred_imgs, _, _ = savi.apply(
            {"params": savi_params}, preds,
            method=lambda m, s: m.decode_fast_chunked(s, DECODE_CHUNKS))
        pred_imgs = jnp.clip(pred_imgs.astype(jnp.float32), 0, 1)
        return jnp.sum(pred_imgs)

    args = (savi_vars["params"], pred_vars, videos, key)
    t0 = time.time()
    checksum = float(forward(*args))
    compile_s = time.time() - t0
    assert np.isfinite(checksum)

    # steady state: each iteration fetches the scalar -> true step latency
    iters = 8
    times = []
    for _ in range(iters):
        t0 = time.time()
        float(forward(*args))
        times.append(time.time() - t0)
    dt = float(np.median(times))

    frames_per_sec = BATCH * NUM_PREDS / dt
    result = {
        "metric": "predicted_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec / 2500.0, 3),
        "detail": {
            "batch": BATCH, "num_seed": NUM_SEED, "num_preds": NUM_PREDS,
            "step_ms": round(dt * 1000, 2), "compile_s": round(compile_s, 1),
            "dtype": str(COMPUTE_DTYPE.__name__),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
