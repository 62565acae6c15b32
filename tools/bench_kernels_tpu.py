#!/usr/bin/env python3
"""
Hardware measurement harness for the round-2 perf questions (VERDICT items
5, 9, 10):

  A. Pallas kernel parity (fwd + grad) vs XLA at production shapes, on the
     real TPU: slot-attention, block-causal attention, VQ nearest-codeword.
  B. End-to-end bench step with each kernel toggled on/off -> the production
     dispatch defaults in ops/dispatch._AUTO_DEFAULTS.
  C. KV-cached AR decode vs windowed recompute at context_length 8/16/32
     (the long-context crossover experiment).
  D. Marginal cost of alpha-softmax compositing in the decode epilogue
     (the "fuse compositing into the final conv" candidate).

Prints a JSON summary; findings land in docs/PERFORMANCE.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

RESULTS = {}


def timeit(fn, *args, iters=6):
    """Median latency; forces execution via the returned device scalar."""
    out = float(fn(*args))
    assert np.isfinite(out), out
    ts = []
    for _ in range(iters):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


# --------------------------------------------------------------------- A
def part_a_parity():
    from playslot_tpu.ops.slot_attention import slot_attention_iteration
    from playslot_tpu.ops.pallas.slot_attention_kernel import (
        slot_attention_iteration_pallas)
    from playslot_tpu.ops.pallas.block_causal_attention_kernel import (
        block_causal_attention_pallas, _xla_reference as bc_xla)
    from playslot_tpu.ops.pallas.vq_kernel import nearest_codeword_pallas
    from playslot_tpu.ops.vq import nearest_codeword

    rng = np.random.RandomState(0)
    res = {}

    # slot attention at encode shape: (B*T, S, D) x (B*T, 4096, D)
    q = jnp.asarray(rng.randn(64, 8, 128), jnp.float32)
    k = jnp.asarray(rng.randn(64, 4096, 128), jnp.float32)
    v = jnp.asarray(rng.randn(64, 4096, 128), jnp.float32)

    def sa_loss_p(q, k, v):
        u, a = slot_attention_iteration_pallas(q, k, v)
        return jnp.sum(u ** 2) + jnp.sum(a)

    def sa_loss_x(q, k, v):
        u, a = slot_attention_iteration(q, k, v, allow_pallas=False)
        return jnp.sum(u ** 2) + jnp.sum(a)

    gp = jax.jit(jax.grad(sa_loss_p, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(sa_loss_x, argnums=(0, 1, 2)))(q, k, v)
    err = max(float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(b))) + 1e-9)
              for a, b in zip(gp, gx))
    res["slot_attention_grad_relerr"] = err
    log(f"A slot-attention grad rel-err {err:.2e}")

    fp = jax.jit(lambda q, k, v: jnp.sum(
        slot_attention_iteration_pallas(q, k, v)[0]))
    fx = jax.jit(lambda q, k, v: jnp.sum(
        slot_attention_iteration(q, k, v, allow_pallas=False)[0]))
    res["slot_attention_pallas_ms"] = timeit(fp, q, k, v) * 1e3
    res["slot_attention_xla_ms"] = timeit(fx, q, k, v) * 1e3

    # block-causal at rollout shape: BH=128*8 heads, T=64 tokens, Dh=64
    q2 = jnp.asarray(rng.randn(1024, 64, 64), jnp.float32) * 0.3
    k2 = jnp.asarray(rng.randn(1024, 64, 64), jnp.float32) * 0.3
    v2 = jnp.asarray(rng.randn(1024, 64, 64), jnp.float32) * 0.3

    bp = jax.jit(lambda q, k, v: jnp.sum(
        block_causal_attention_pallas(q, k, v, 8) ** 2))
    bx = jax.jit(lambda q, k, v: jnp.sum(bc_xla(q, k, v, 8) ** 2))
    vp, vx = float(bp(q2, k2, v2)), float(bx(q2, k2, v2))
    res["block_causal_fwd_relerr"] = abs(vp - vx) / (abs(vx) + 1e-9)
    gbp = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        block_causal_attention_pallas(q, k, v, 8) ** 2), argnums=(0, 1, 2)))
    gbx = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        bc_xla(q, k, v, 8) ** 2), argnums=(0, 1, 2)))
    gp2, gx2 = gbp(q2, k2, v2), gbx(q2, k2, v2)
    res["block_causal_grad_relerr"] = max(
        float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(b))) + 1e-9)
        for a, b in zip(gp2, gx2))
    res["block_causal_pallas_ms"] = timeit(bp, q2, k2, v2) * 1e3
    res["block_causal_xla_ms"] = timeit(bx, q2, k2, v2) * 1e3
    log(f"A block-causal fwd {res['block_causal_fwd_relerr']:.2e} "
        f"grad {res['block_causal_grad_relerr']:.2e}")

    # VQ at latent-action shape
    z = jnp.asarray(rng.randn(128 * 20, 16), jnp.float32)
    cb = jnp.asarray(rng.randn(8, 16), jnp.float32)
    zq_p, idx_p = jax.jit(
        lambda z, c: nearest_codeword_pallas(z, c))(z, cb)
    zq_x, idx_x = jax.jit(
        lambda z, c: nearest_codeword(z, c, allow_pallas=False))(z, cb)
    res["vq_idx_mismatches"] = int(jnp.sum(idx_p != idx_x))
    res["vq_zq_maxerr"] = float(jnp.max(jnp.abs(zq_p - zq_x)))
    qp = jax.jit(lambda z, c: jnp.sum(nearest_codeword_pallas(z, c)[0]))
    qx = jax.jit(lambda z, c: jnp.sum(
        nearest_codeword(z, c, allow_pallas=False)[0]))
    res["vq_pallas_ms"] = timeit(qp, z, cb) * 1e3
    res["vq_xla_ms"] = timeit(qx, z, cb) * 1e3
    log(f"A vq mismatches={res['vq_idx_mismatches']}")
    RESULTS["A_parity"] = res


# --------------------------------------------------------------------- B
def bench_step(batch=128):
    """One fresh-traced bench forward (reads PLAYSLOT_* env at trace time)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    ".."))
    import bench as benchmod
    savi, predictor = benchmod.build_models(jnp.bfloat16)
    T = benchmod.NUM_SEED + benchmod.NUM_PREDS
    key = jax.random.PRNGKey(0)
    videos = jnp.asarray(np.random.RandomState(0).rand(batch, T, 64, 64, 3),
                         jnp.float32)
    savi_vars = jax.jit(lambda v: savi.init({"params": key, "slots": key}, v))(
        videos[:1, :2])
    slots0 = jnp.zeros((1, T, 8, 128), jnp.float32)
    pred_vars = jax.jit(lambda s: predictor.init(
        {"params": key, "action": key}, s, num_seed=benchmod.NUM_SEED,
        num_preds=benchmod.NUM_PREDS))(slots0)
    from playslot_tpu.engine.rollout import posterior_rollout

    @jax.jit
    def forward(savi_params, pred_variables, videos, key):
        slots = savi.apply({"params": savi_params}, videos, decode=False
                           )["slot_history"]
        preds = posterior_rollout(predictor, pred_variables, slots,
                                  benchmod.NUM_SEED, benchmod.NUM_PREDS, rng=key)
        pred_imgs, _, _ = savi.apply({"params": savi_params}, preds,
                                     method=lambda m, s: m.decode_fast(s))
        return jnp.sum(jnp.clip(pred_imgs.astype(jnp.float32), 0, 1))

    args = (savi_vars["params"], pred_vars, videos, key)
    return timeit(forward, *args)


def part_b_dispatch():
    res = {}
    for name, env in [
        ("all_xla", {"PLAYSLOT_USE_PALLAS": "0"}),
        ("all_pallas", {"PLAYSLOT_USE_PALLAS": "1"}),
        ("sa_only", {"PLAYSLOT_USE_PALLAS": "auto", "PLAYSLOT_PALLAS_SLOT_ATTENTION": "1",
                     "PLAYSLOT_PALLAS_BLOCK_CAUSAL": "0", "PLAYSLOT_PALLAS_VQ": "0"}),
        ("bc_only", {"PLAYSLOT_USE_PALLAS": "auto", "PLAYSLOT_PALLAS_SLOT_ATTENTION": "0",
                     "PLAYSLOT_PALLAS_BLOCK_CAUSAL": "1", "PLAYSLOT_PALLAS_VQ": "0"}),
        ("vq_only", {"PLAYSLOT_USE_PALLAS": "auto", "PLAYSLOT_PALLAS_SLOT_ATTENTION": "0",
                     "PLAYSLOT_PALLAS_BLOCK_CAUSAL": "0", "PLAYSLOT_PALLAS_VQ": "1"}),
    ]:
        os.environ.update(env)
        dt = bench_step()
        res[name + "_ms"] = dt * 1e3
        log(f"B {name}: {dt * 1e3:.1f} ms")
    for k in ("PLAYSLOT_PALLAS_SLOT_ATTENTION", "PLAYSLOT_PALLAS_BLOCK_CAUSAL",
              "PLAYSLOT_PALLAS_VQ"):
        os.environ.pop(k, None)
    os.environ["PLAYSLOT_USE_PALLAS"] = "auto"
    RESULTS["B_dispatch"] = res


# --------------------------------------------------------------------- C
def part_c_kv_cache():
    from playslot_tpu.models.predictors import SlotSingleActionPredictor
    from playslot_tpu.engine.rollout import kv_cached_rollout, scan_rollout

    res = {}
    B, S, D, A = 64, 8, 128, 16
    for ctx in (8, 16, 32):
        num_seed = 6
        num_preds = ctx - num_seed  # stay in the growing phase: cache exact
        pred = SlotSingleActionPredictor(
            slot_dim=D, num_actions=8, action_dim=A, condition_mode="sum",
            use_variability=True, autoregressive_dynamics=True,
            LatentAction={"model_name": "VQSingleSlotLatentAction",
                          "model_params": {"emb_dim": 256, "num_layers": 4,
                                           "num_heads": 4, "head_dim": 64,
                                           "mlp_dim": 1024, "use_ema_vq": True}},
            DynamicsModel={"model_name": "SlotGPTDymamicsModel",
                           "model_params": {"embed_dim": 256, "head_dim": 64,
                                            "num_heads": 8, "mlp_size": 1024,
                                            "num_layers": 4,
                                            "context_length": ctx,
                                            "pos_enc_dropout": 0.0}},
            dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        slots0 = jnp.zeros((1, num_seed + num_preds, S, D), jnp.float32)
        variables = jax.jit(lambda s: pred.init(
            {"params": key, "action": key}, s, num_seed=num_seed,
            num_preds=num_preds))(slots0)
        seed = jax.random.normal(key, (B, num_seed, S, D)) * 0.5
        T_act = num_seed + num_preds
        protos = jax.random.normal(key, (B, T_act, S, A)) * 0.3
        avars = jax.random.normal(key, (B, T_act, S, A)) * 0.1

        f_scan = jax.jit(lambda s, p, v: jnp.sum(scan_rollout(
            pred, variables, s, p, v, num_preds).astype(jnp.float32)))
        f_kv = jax.jit(lambda s, p, v: jnp.sum(kv_cached_rollout(
            pred, variables, s, p, v, num_preds,
            dtype=jnp.bfloat16).astype(jnp.float32)))
        v_scan, v_kv = float(f_scan(seed, protos, avars)), float(
            f_kv(seed, protos, avars))
        relerr = abs(v_scan - v_kv) / (abs(v_scan) + 1e-9)
        t_scan = timeit(f_scan, seed, protos, avars)
        t_kv = timeit(f_kv, seed, protos, avars)
        res[f"ctx{ctx}"] = {
            "num_preds": num_preds,
            "scan_ms": t_scan * 1e3, "kv_ms": t_kv * 1e3,
            "checksum_relerr": relerr,
        }
        log(f"C ctx={ctx} preds={num_preds}: recompute {t_scan*1e3:.1f} ms, "
            f"kv-cache {t_kv*1e3:.1f} ms, relerr {relerr:.2e}")
    RESULTS["C_kv_cache"] = res


# --------------------------------------------------------------------- D
def part_d_composite():
    import bench as benchmod
    savi, _ = benchmod.build_models(jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    videos = jnp.asarray(np.random.RandomState(0).rand(1, 2, 64, 64, 3),
                         jnp.float32)
    savi_vars = jax.jit(lambda v: savi.init({"params": key, "slots": key}, v))(
        videos)
    slots = jax.random.normal(key, (128, 15, 8, 128)) * 0.5

    from playslot_tpu.ops.fused_decode import fused_broadcast_decode
    from playslot_tpu.ops.compositing import alpha_composite
    from playslot_tpu.ops.grids import build_grid

    def rgba_m(m, s):
        dec = m.decoder_mod
        return fused_broadcast_decode(
            s, build_grid(m.decoder_resolution),
            m.decoder_pos_embedding.variables["params"],
            dec.variables["params"], dec.hidden_dims, dec.kernel_size,
            m.in_channels + 1, m.decoder_resolution, dtype=jnp.bfloat16)

    f1 = jax.jit(lambda s: jnp.sum(savi.apply(
        {"params": savi_vars["params"]}, s,
        method=rgba_m).astype(jnp.float32)))

    def comp_m(m, s):
        return alpha_composite(rgba_m(m, s), m.num_slots)[0]

    f2 = jax.jit(lambda s: jnp.sum(savi.apply(
        {"params": savi_vars["params"]}, s,
        method=comp_m).astype(jnp.float32)))
    t1 = timeit(f1, slots)
    t2 = timeit(f2, slots)
    RESULTS["D_composite"] = {"rgba_only_ms": t1 * 1e3,
                              "with_composite_ms": t2 * 1e3,
                              "composite_marginal_ms": (t2 - t1) * 1e3}
    log(f"D decode {t1*1e3:.1f} ms -> +composite {t2*1e3:.1f} ms "
        f"(marginal {(t2-t1)*1e3:.1f} ms)")


if __name__ == "__main__":
    parts = sys.argv[1] if len(sys.argv) > 1 else "abcd"
    if "a" in parts:
        part_a_parity()
    if "b" in parts:
        part_b_dispatch()
    if "c" in parts:
        part_c_kv_cache()
    if "d" in parts:
        part_d_composite()
    print(json.dumps(RESULTS, indent=2, default=float))
