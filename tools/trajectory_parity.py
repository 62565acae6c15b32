#!/usr/bin/env python3
"""
Torch-vs-JAX N-step TRAINING-TRAJECTORY parity harness (VERDICT r3 item 1).

Forward/eval parity is proven to 0.000% at production shapes and the VQ-EMA
update is unit-parity-tested, but nothing compared an N-step *training
trajectory* — the optimizer/scheduler integration (reference
src/lib/setup_model.py:347-391 setup_optimizer + src/lib/schedulers.py:141-168
WarmupVSScehdule vs our optax chain in playslot_tpu/train/schedulers.py) is
exactly where silent drift hides. This harness runs the REFERENCE training
loop (importing the reference's own LRWarmUp / WarmupVSScehdule / LossTracker
classes and replicating baseTrainer.py:143-253 batch semantics — never
copying code) against OUR production jitted trainer steps
(SAViTrainer._train_step / PredictorTrainer._train_step) from the same
converted initialization on an identical batch stream, and reports three
instruments per stage:

  1. lr-sequence equivalence — the actual per-step learning rate the torch
     optimizer sees (linear warmup -> deactivation -> per-batch cosine) vs
     our optax schedule evaluated at the same step index.
  2. coupled free-running trajectories — per-step total-loss curves from the
     same init on the same batches; reports the per-step relative loss delta
     (float noise is chaotically amplified by training, so this curve is a
     drift MEASUREMENT, not a tight gate).
  3. step-local resync checks — every `resync_every` steps, the torch
     model's CURRENT params AND Adam moments (exp_avg/exp_avg_sq/step) are
     converted into our layout, ONE step is taken by our jitted train step,
     and the updated params are compared leaf-by-leaf against torch's next
     params. This isolates per-step optimizer+scheduler+clip(+VQ-EMA)
     equivalence from chaotic accumulation and is the tight gate.

Determinism: SAVi uses the `Learned` initializer (deterministic, a shipped
reference capability — src/models/BlocksUtils/initializers.py:54-83); the
PlaySlot stage injects the SAME per-step reparameterization noise into both
frameworks (torch: patching BaseSlotLatentAction.sample as in
tests/test_predictor_parity.py; ours: the `noise` operand of
PredictorTrainer._train_step). All dropout is 0 (reference defaults).
Everything runs f32 on CPU with matmul precision "highest" on the JAX side.

Writes docs/TRAJECTORY_PARITY.json. The slow test
tests/test_training_trajectory_parity.py drives the same functions at
reduced step counts with argued tolerances.
"""

import copy
import json
import math
import os
import sys

# CPU: this is a torch-vs-jax numerics instrument, not a TPU benchmark.
# NOTE: the JAX_PLATFORMS env var is IGNORED in this image (the TPU plugin is
# registered at interpreter start); only jax.config works — same workaround
# as tests/conftest.py. Without this the tool would silently become a second
# TPU relay client and deadlock any concurrent TPU job.
import jax as _jax_mod  # noqa: E402

_jax_mod.config.update("jax_platforms", "cpu")
_jax_mod.config.update("jax_default_matmul_precision", "highest")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
REFERENCE_SRC = "/root/reference/src"

import numpy as np


# --------------------------------------------------------------------- setup
def _import_reference():
    if not os.path.isdir(REFERENCE_SRC):
        raise RuntimeError("reference repo not available")
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import torch
    torch.manual_seed(0)
    return torch


def _jax():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    return jax


# ------------------------------------------------------- shared configuration
SAVI_CFG = {
    "num_slots": 4, "slot_dim": 32, "num_iterations": 1,
    "num_iterations_first": 2, "in_channels": 3, "mlp_hidden": 64,
    "mlp_encoder_dim": 32,
    "initializer": "Learned",  # deterministic (reference initializers.py:54)
    "encoder": {"encoder_name": "ConvEncoder",
                "encoder_params": {"num_channels": [16, 16], "kernel_size": 5,
                                   "resolution": [16, 16]}},
    "decoder": {"decoder_name": "ConvDecoder",
                "decoder_params": {"num_channels": [16, 16], "kernel_size": 5,
                                   "resolution": [16, 16], "upsample": 1}},
    "transition_module_params": {"model_name": "TransformerBlock",
                                 "num_heads": 2, "head_dim": 16,
                                 "mlp_size": 64},
}

PRED_LA_CFG = {"model_name": "VQSingleSlotLatentAction",
               "model_params": {"emb_dim": 32, "num_layers": 2, "num_heads": 2,
                                "head_dim": 8, "mlp_dim": 64,
                                "use_ema_vq": True}}
PRED_DYN_CFG = {"model_name": "SlotGPTDymamicsModel",
                "model_params": {"residual": False, "embed_dim": 32,
                                 "head_dim": 8, "num_heads": 2, "mlp_size": 64,
                                 "num_layers": 2, "context_length": 4,
                                 "pos_enc_dropout": 0.0}}
PRED_KW = dict(slot_dim=SAVI_CFG["slot_dim"], num_actions=4, action_dim=8,
               condition_mode="sum", use_variability=True,
               autoregressive_dynamics=True)

PRED_LOSS = [{"type": "pred_img_mse", "weight": 1},
             {"type": "pred_slot_mse", "weight": 1},
             {"type": "VQLoss", "weight": 1, "beta": 0.25}]


def _training_cfg(lr, warmup, sched_steps):
    return {"lr": lr, "scheduler": "cosine_annealing",
            "scheduler_steps": sched_steps, "lr_warmup": True,
            "warmup_steps": warmup, "gradient_clipping": True,
            "clipping_max_value": 0.05, "matmul_precision": "highest",
            "batch_size": 8, "num_epochs": 1, "train_iters_per_epoch": 1,
            "valid_iters_per_epoch": 1, "save_frequency": 100}


def _make_batches(num_steps, B, T, res=16, seed=0):
    """Identical batch stream for both frameworks: our GridShapes dataset."""
    from playslot_tpu.data.gridshapes import GridShapes
    ds = GridShapes(split="train", num_frames=T, num_balls=2,
                    length=B * num_steps, img_size=res, shape_size=5,
                    seed=seed)
    out = []
    for t in range(num_steps):
        vids = np.stack([np.asarray(ds[t * B + i][0]) for i in range(B)])
        out.append(vids.astype(np.float32))
    return out


def _torch_warmup_scheduler(torch, optimizer, lr, warmup, sched_steps):
    """The reference's own warmup/scheduler orchestration objects."""
    from lib.schedulers import LRWarmUp, WarmupVSScehdule
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        optimizer=optimizer, T_max=sched_steps)
    lr_warmup = LRWarmUp(init_lr=lr, warmup_steps=warmup)
    return WarmupVSScehdule(optimizer=optimizer, lr_warmup=lr_warmup,
                            scheduler=scheduler)


EXP_PARAMS_SCHED = {"training": {"scheduler": "cosine_annealing"}}


def _assert_no_active_dropout(torch, model):
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            assert m.p == 0.0, f"active dropout {m.p} breaks determinism"


# ------------------------------------------------------------ lr comparison
def compare_lr_sequences(num_steps=300, lr=1e-3, warmup=25, sched_steps=400):
    """
    Reference per-step lr (driving the reference's real LRWarmUp +
    WarmupVSScehdule + torch CosineAnnealingLR per baseTrainer semantics:
    orchestrator on_batch_start, then optimizer.step) vs our
    build_lr_schedule evaluated at the same global step index.
    """
    torch = _import_reference()
    from playslot_tpu.train.schedulers import build_lr_schedule

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr)
    orch = _torch_warmup_scheduler(torch, opt, lr, warmup, sched_steps)
    ref_lrs = []
    for t in range(num_steps):
        orch(iter=t, epoch=0, exp_params=EXP_PARAMS_SCHED, end_epoch=False)
        ref_lrs.append(float(opt.param_groups[0]["lr"]))
        p.grad = torch.ones(1)
        opt.step()

    sched = build_lr_schedule(_training_cfg(lr, warmup, sched_steps))
    ours = [float(sched(t)) for t in range(num_steps)]

    diffs = [abs(a - b) / lr for a, b in zip(ref_lrs, ours)]
    # within the cosine's T_max window our schedule replicates the reference
    # EXACTLY (incl. the one-step deactivation hold). BEYOND t = w+1+steps
    # torch CosineAnnealingLR oscillates back UP (period 2*T_max) while we
    # clamp at 0 — a documented deviation (no shipped reference run's logged
    # history crosses scheduler_steps; a bouncing lr is almost certainly not
    # the intended behavior).
    horizon = min(num_steps, warmup + 1 + sched_steps)
    return {
        "num_steps": num_steps, "lr": lr, "warmup_steps": warmup,
        "scheduler_steps": sched_steps,
        "max_rel_diff_within_T_max": max(diffs[:horizon]),
        "max_rel_diff_incl_post_T_max_bounce": max(diffs),
        "max_rel_diff_warmup_region": max(diffs[:warmup + 2]),
        "ref_head": [round(v, 8) for v in ref_lrs[:6]],
        "ours_head": [round(v, 8) for v in ours[:6]],
    }


# --------------------------------------------------- optimizer-state surgery
def _torch_moments(torch, model, opt):
    """exp_avg / exp_avg_sq keyed like state_dict (buffers -> zeros)."""
    mom1, mom2, step = {}, {}, 0
    named = dict(model.named_parameters())
    for k, v in model.state_dict().items():
        pp = named.get(k)
        st = opt.state.get(pp, {}) if pp is not None else {}
        mom1[k] = st.get("exp_avg", torch.zeros_like(v)).clone()
        mom2[k] = st.get("exp_avg_sq", torch.zeros_like(v)).clone()
        if "step" in st:
            step = max(step, int(st["step"]))
    return mom1, mom2, step


def _with_adam_state(jax, tx, params, mu, nu, count):
    """Build an optax state for `tx` with the given moments and count."""
    import jax.numpy as jnp

    state = tx.init(params)

    def rebuild(node):
        if hasattr(node, "_fields"):
            fields = node._fields
            kw = {f: rebuild(getattr(node, f)) for f in fields}
            if {"count", "mu", "nu"} <= set(fields):
                kw.update(count=jnp.asarray(count, jnp.int32), mu=mu, nu=nu)
            elif fields == ("count",):
                kw["count"] = jnp.asarray(count, jnp.int32)
            return type(node)(**kw)
        if isinstance(node, tuple):
            return type(node)(rebuild(x) for x in node)
        return node
    return rebuild(state)


def _leaf_rel_errs(jax, got_tree, want_tree, base_tree=None):
    """
    Per-leaf max |got - want| relative to scale. Without base_tree, the scale
    is max|want| (floored by the global magnitude). With base_tree, the scale
    is the leaf's actual CHANGE max|want - base| (floored by the global
    change) — the right denominator for "did our step/trajectory move the
    params the same way": a near-zero LayerNorm bias measured against its
    own ~0 magnitude would otherwise report pure noise as huge rel error.
    """
    got = jax.tree_util.tree_leaves_with_path(got_tree)
    want = jax.tree_util.tree_leaves(want_tree)
    base = jax.tree_util.tree_leaves(base_tree) if base_tree is not None \
        else [None] * len(want)
    if base_tree is not None:
        scales = [float(np.max(np.abs(np.asarray(w, np.float64)
                                      - np.asarray(b, np.float64))))
                  for w, b in zip(want, base)]
    else:
        scales = [float(np.max(np.abs(np.asarray(w)))) for w in want]
    gscale = max(scales) if scales else 1.0
    errs = {}
    for (path, g), w, s in zip(got, want, scales):
        g, w = np.asarray(g, np.float64), np.asarray(w, np.float64)
        # a leaf whose own change is <5% of the global change is judged
        # against 5% of the global change: near-static leaves (e.g. a
        # LayerNorm bias the clipped update barely moves) otherwise report
        # f32 grad noise as huge "relative" error
        denom = max(s, 0.05 * gscale, 1e-12)
        errs[jax.tree_util.keystr(path)] = float(np.max(np.abs(g - w)) / denom)
    return errs


def _torch_backed_vq(vq_tree):
    """Drop the usage histogram (usage_bins / usage_iters) — OUR diagnostic
    extension of the vq collection; the reference EmaCodebookMeter tracks it
    with a different reset lifecycle, so it is not part of the parity
    surface. codebook / ema_count / ema_weight are compared."""
    def prune(node):
        if isinstance(node, dict):
            return {k: prune(v) for k, v in node.items()
                    if k not in ("usage_bins", "usage_iters")}
        return node
    return prune(dict(vq_tree) if not isinstance(vq_tree, dict) else vq_tree)


def _tree_abs_err(jax, got_tree, want_tree, base_tree):
    """(max |got-want| over all leaves) / (max |want-base| over all leaves):
    the worst absolute discrepancy measured against the global magnitude of
    the actual change — the headline gate for step-local equivalence."""
    got = jax.tree_util.tree_leaves(got_tree)
    want = jax.tree_util.tree_leaves(want_tree)
    base = jax.tree_util.tree_leaves(base_tree)
    abs_err = max(float(np.max(np.abs(np.asarray(g, np.float64)
                                      - np.asarray(w, np.float64))))
                  for g, w in zip(got, want))
    gscale = max(float(np.max(np.abs(np.asarray(w, np.float64)
                                     - np.asarray(b, np.float64))))
                 for w, b in zip(want, base))
    return abs_err / max(gscale, 1e-12)


# ------------------------------------------------------------- SAVi stage
def _savi_torch_setup(torch, lr, warmup, sched_steps):
    from models.SAVi import SAVi as TorchSAVi
    tm = TorchSAVi(**copy.deepcopy(SAVI_CFG))
    tm.train()
    _assert_no_active_dropout(torch, tm)
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    orch = _torch_warmup_scheduler(torch, opt, lr, warmup, sched_steps)
    return tm, opt, orch


def _savi_jax_trainer(tmp_dir, lr, warmup, sched_steps, B, T):
    from playslot_tpu.config import Config, DEFAULTS
    from playslot_tpu.train.trainer import SAViTrainer
    cfg = Config(exp_path=str(tmp_dir), **copy.deepcopy(DEFAULTS))
    cfg["model"] = {"model_name": "SAVi",
                    "model_params": copy.deepcopy(SAVI_CFG)}
    cfg["dataset"].update({"dataset_name": "GridShapes", "num_frames": T,
                           "num_balls": 2, "img_size": 16, "shape_size": 5,
                           "length": B})
    cfg["loss"] = [{"type": "mse", "weight": 1}]
    cfg["training"].update(_training_cfg(lr, warmup, sched_steps))
    cfg.save()
    tr = SAViTrainer(str(tmp_dir))
    tr.load_data()
    tr.setup_model()
    return tr


def run_savi_trajectory(tmp_dir, num_steps=200, resync_every=50, B=8, T=3,
                        lr=1e-3, warmup=25, sched_steps=400):
    """Coupled SAVi trajectories + step-local resync checks."""
    torch = _import_reference()
    jax = _jax()
    import jax.numpy as jnp
    from playslot_tpu.utils.convert import convert_savi

    tm, opt, orch = _savi_torch_setup(torch, lr, warmup, sched_steps)
    tr = _savi_jax_trainer(tmp_dir, lr, warmup, sched_steps, B, T)
    init_params = convert_savi(tm.state_dict())
    tr.state = tr.state.replace(params=init_params,
                                opt_state=tr.tx.init(init_params))
    init_flat = [np.asarray(x, np.float64)
                 for x in jax.tree_util.tree_leaves(init_params)]

    batches = _make_batches(num_steps, B, T)
    key = jax.random.PRNGKey(0)  # unused: Learned initializer is rng-free
    mse = torch.nn.functional.mse_loss

    def torch_video(x):
        return torch.from_numpy(x).permute(0, 1, 4, 2, 3).contiguous()

    losses_t, losses_j, resyncs = [], [], []
    for t, vids in enumerate(batches):
        # ---- step-local resync check BEFORE both sides advance
        if resync_every and t % resync_every == 0:
            sync_params = convert_savi(tm.state_dict())
            m1, m2, step_cnt = _torch_moments(torch, tm, opt)
            mu = convert_savi({k: v for k, v in m1.items()})
            nu = convert_savi({k: v for k, v in m2.items()})
            sync_state = tr.state.replace(
                step=jnp.asarray(t, jnp.int32), params=sync_params,
                opt_state=_with_adam_state(jax, tr.tx, sync_params, mu, nu,
                                           step_cnt))
            next_state, _ = tr._train_step(sync_state, jnp.asarray(vids), key)

        # ---- torch step (reference semantics)
        orch(iter=t, epoch=0, exp_params=EXP_PARAMS_SCHED, end_epoch=False)
        out = tm(torch_video(vids), num_imgs=T)
        loss = mse(out["recons_imgs"],
                   torch_video(vids).clamp(0, 1))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 0.05)
        opt.step()
        losses_t.append(float(loss))

        if resync_every and t % resync_every == 0:
            want = convert_savi(tm.state_dict())
            errs = _leaf_rel_errs(jax, next_state.params, want,
                                  base_tree=sync_params)
            resyncs.append({
                "step": t,
                "err_vs_global_update": _tree_abs_err(
                    jax, next_state.params, want, sync_params),
                "max_param_rel_err": max(errs.values()),
                "worst_leaf": max(errs, key=errs.get)})

        # ---- our production jitted step
        tr.state, ldict = tr._train_step(tr.state, jnp.asarray(vids), key)
        losses_j.append(float(ldict["_total"]))

    final_want = convert_savi(tm.state_dict())
    # drift relative to how far each leaf actually moved over the run
    drift = _leaf_rel_errs(jax, tr.state.params, final_want,
                           base_tree=init_params)
    moved = max(
        float(np.max(np.abs(np.asarray(a, np.float64) - b)))
        for a, b in zip(jax.tree_util.tree_leaves(final_want), init_flat))
    rel = [abs(a - b) / abs(a) for a, b in zip(losses_t, losses_j)]
    return {
        "num_steps": num_steps, "batch": B, "frames": T,
        "lr": lr, "warmup_steps": warmup, "scheduler_steps": sched_steps,
        "loss_torch_head": [round(v, 6) for v in losses_t[:5]],
        "loss_jax_head": [round(v, 6) for v in losses_j[:5]],
        "loss_torch_tail": [round(v, 6) for v in losses_t[-3:]],
        "loss_jax_tail": [round(v, 6) for v in losses_j[-3:]],
        "loss_rel_diff_per_step": [round(v, 8) for v in rel],
        "loss_rel_diff_max_first_quarter":
            max(rel[:max(1, num_steps // 4)]),
        "loss_rel_diff_max": max(rel),
        "resync_checks": resyncs,
        "resync_max_err_vs_global_update": max(
            r["err_vs_global_update"] for r in resyncs) if resyncs else None,
        "resync_max_param_rel_err": max(r["max_param_rel_err"]
                                        for r in resyncs) if resyncs else None,
        "final_param_max_rel_err": max(drift.values()),
        "final_param_worst_leaf": max(drift, key=drift.get),
        "max_param_movement": moved,
    }


# ------------------------------------------------------------ PlaySlot stage
def run_playslot_trajectory(tmp_dir, num_steps=150, resync_every=50, B=4,
                            num_context=2, num_preds=3, lr=1e-3, warmup=25,
                            sched_steps=400):
    """Coupled PlaySlot (cOCVP+InvDyn, VQ-EMA on) trajectories + resyncs."""
    torch = _import_reference()
    jax = _jax()
    import jax.numpy as jnp
    from models.Predictors.LatentActionPredictors import \
        SlotSingleActionPredictor as TorchPred
    from models.SAVi import SAVi as TorchSAVi
    from lib.loss import LossTracker
    from playslot_tpu.config import Config, DEFAULTS
    from playslot_tpu.train.predictor_trainer import PredictorTrainer
    from playslot_tpu.utils.convert import (convert_latent_predictor,
                                            convert_savi)

    T = num_context + num_preds

    # frozen SAVi, converted into both frameworks
    savi_t = TorchSAVi(**copy.deepcopy(SAVI_CFG))
    savi_t.eval()
    for p in savi_t.parameters():
        p.requires_grad_(False)
    savi_params = convert_savi(savi_t.state_dict())

    tm = TorchPred(**copy.deepcopy(PRED_KW),
                   LatentAction=copy.deepcopy(PRED_LA_CFG),
                   DynamicsModel=copy.deepcopy(PRED_DYN_CFG))
    tm.train()
    _assert_no_active_dropout(torch, tm)
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    orch = _torch_warmup_scheduler(torch, opt, lr, warmup, sched_steps)
    tracker = LossTracker(copy.deepcopy(PRED_LOSS))

    # our trainer on the same config
    cfg = Config(exp_path=str(tmp_dir), **copy.deepcopy(DEFAULTS))
    cfg["model"] = {"model_name": "SAVi",
                    "model_params": copy.deepcopy(SAVI_CFG)}
    cfg["dataset"].update({"dataset_name": "GridShapes", "num_frames": T,
                           "num_balls": 2, "img_size": 16, "shape_size": 5,
                           "length": B})
    cfg["predictor"] = {
        "predictor_name": "SlotSingleAction",
        "predictor_params": {**copy.deepcopy(PRED_KW),
                             "LatentAction": copy.deepcopy(PRED_LA_CFG),
                             "DynamicsModel": copy.deepcopy(PRED_DYN_CFG)}}
    cfg["predictor_loss"] = copy.deepcopy(PRED_LOSS)
    cfg["prediction_params"] = {"num_context": num_context,
                                "num_preds": num_preds, "teacher_force": False,
                                "sample_length": T, "input_buffer_size": T}
    cfg["training"].update(_training_cfg(lr, warmup, sched_steps))
    cfg.save()
    tr = PredictorTrainer(str(tmp_dir))
    tr.load_data()
    tr.load_savi(savi_params=savi_params)
    tr.setup_predictor()

    variables = convert_latent_predictor(tm.state_dict())
    tr.state = tr.state.replace(params=variables["params"],
                                vq=variables["vq"],
                                opt_state=tr.tx.init(variables["params"]))

    batches = _make_batches(num_steps, B, T, seed=1)
    rs = np.random.RandomState(123)
    noises = [rs.randn(B, T - 1, PRED_KW["action_dim"]).astype(np.float32)
              for _ in range(num_steps)]
    key = jax.random.PRNGKey(0)

    def torch_video(x):
        return torch.from_numpy(x).permute(0, 1, 4, 2, 3).contiguous()

    def patch_sample(noise):
        t_noise = torch.from_numpy(noise)

        def fixed_sample(mean, var, eps=1e-6):
            return t_noise * torch.sqrt(var + eps) + mean
        tm.latent_action.sample = fixed_sample

    def torch_loss(vids, noise):
        """Reference 04_train_PlaySlot.py:32-122 training forward."""
        patch_sample(noise)
        videos = torch_video(vids)
        with torch.no_grad():
            slot_history = savi_t(videos, num_imgs=T,
                                  decode=False)["slot_history"]
        pred_slots, pred_others = tm(slot_history, num_seed=num_context,
                                     num_preds=num_preds)
        Bv, _, C, H, W = videos.shape
        ns, sd = SAVI_CFG["num_slots"], SAVI_CFG["slot_dim"]
        dec_in = pred_slots.reshape(Bv * (T - 1), ns, sd)
        img_recons, _ = savi_t.decode(dec_in)
        pred_imgs = img_recons.view(Bv, T - 1, C, H, W)
        tracker(preds=pred_slots[:, :T - 1],
                targets=slot_history[:, 1:T],
                pred_imgs=pred_imgs[:, :T - 1],
                target_imgs=videos[:, 1:T],
                **pred_others.pop("vq_losses", {}))
        return tracker.get_last_losses(total_only=True)

    losses_t, losses_j, resyncs = [], [], []
    for t, (vids, noise) in enumerate(zip(batches, noises)):
        if resync_every and t % resync_every == 0:
            sync_vars = convert_latent_predictor(tm.state_dict())
            m1, m2, step_cnt = _torch_moments(torch, tm, opt)
            mu = convert_latent_predictor(m1)["params"]
            nu = convert_latent_predictor(m2)["params"]
            sync_state = tr.state.replace(
                step=jnp.asarray(t, jnp.int32), params=sync_vars["params"],
                vq=sync_vars["vq"],
                opt_state=_with_adam_state(jax, tr.tx, sync_vars["params"],
                                           mu, nu, step_cnt))
            next_state, _ = tr._train_step(
                sync_state, jnp.asarray(vids), None, key, key,
                jnp.asarray(noise))

        orch(iter=t, epoch=0, exp_params=EXP_PARAMS_SCHED, end_epoch=False)
        loss = torch_loss(vids, noise)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 0.05)
        opt.step()
        losses_t.append(float(loss))

        if resync_every and t % resync_every == 0:
            want = convert_latent_predictor(tm.state_dict())
            perr = _leaf_rel_errs(jax, next_state.params, want["params"],
                                  base_tree=sync_vars["params"])
            verr = _leaf_rel_errs(jax, _torch_backed_vq(next_state.vq),
                                  _torch_backed_vq(want["vq"]))
            resyncs.append({
                "step": t,
                "err_vs_global_update": _tree_abs_err(
                    jax, next_state.params, want["params"],
                    sync_vars["params"]),
                "max_param_rel_err": max(perr.values()),
                "worst_leaf": max(perr, key=perr.get),
                "max_vq_rel_err": max(verr.values()),
            })

        tr.state, ldict = tr._train_step(tr.state, jnp.asarray(vids), None,
                                         key, key, jnp.asarray(noise))
        losses_j.append(float(ldict["_total"]))

    want = convert_latent_predictor(tm.state_dict())
    drift = _leaf_rel_errs(jax, tr.state.params, want["params"],
                           base_tree=variables["params"])
    vq_drift = _leaf_rel_errs(jax, _torch_backed_vq(tr.state.vq),
                              _torch_backed_vq(want["vq"]))
    rel = [abs(a - b) / abs(a) for a, b in zip(losses_t, losses_j)]
    return {
        "num_steps": num_steps, "batch": B,
        "num_context": num_context, "num_preds": num_preds,
        "lr": lr, "warmup_steps": warmup, "scheduler_steps": sched_steps,
        "loss_torch_head": [round(v, 6) for v in losses_t[:5]],
        "loss_jax_head": [round(v, 6) for v in losses_j[:5]],
        "loss_torch_tail": [round(v, 6) for v in losses_t[-3:]],
        "loss_jax_tail": [round(v, 6) for v in losses_j[-3:]],
        "loss_rel_diff_per_step": [round(v, 8) for v in rel],
        "loss_rel_diff_max_first_quarter":
            max(rel[:max(1, num_steps // 4)]),
        "loss_rel_diff_max": max(rel),
        "resync_checks": resyncs,
        "resync_max_err_vs_global_update": max(
            r["err_vs_global_update"] for r in resyncs) if resyncs else None,
        "resync_max_param_rel_err": max(r["max_param_rel_err"]
                                        for r in resyncs) if resyncs else None,
        "resync_max_vq_rel_err": max(r["max_vq_rel_err"]
                                     for r in resyncs) if resyncs else None,
        "final_param_max_rel_err": max(drift.values()),
        "final_param_worst_leaf": max(drift, key=drift.get),
        "final_vq_max_rel_err": max(vq_drift.values()),
    }


# ------------------------------------------------------------ behavior stage
BEH_CFG = {"model_name": "MarkovBehaviorCloner",
           "model_params": {"emb_dim": 32, "num_layers": 2, "num_heads": 2,
                            "head_dim": 8, "mlp_dim": 64}}
ACTDEC_CFG = {"model_name": "MLPDecoder",
              "model_params": {"in_dim": PRED_KW["action_dim"], "out_dim": 4,
                               "hidden_dim": [32, 32]}}
BEH_LOSS = [{"type": "latent_action_mse", "weight": 1},
            {"type": "action_mse", "weight": 0.01}]


def _behavior_config(tmp_dir, lr, warmup, sched_steps, B, T):
    from playslot_tpu.config import Config, DEFAULTS
    cfg = Config(exp_path=str(tmp_dir), **copy.deepcopy(DEFAULTS))
    cfg["model"] = {"model_name": "SAVi",
                    "model_params": copy.deepcopy(SAVI_CFG)}
    cfg["dataset"].update({"dataset_name": "GridShapes", "num_frames": T,
                           "num_balls": 2, "img_size": 16, "shape_size": 5,
                           "length": B})
    cfg["predictor"] = {
        "predictor_name": "SlotSingleAction",
        "predictor_params": {**copy.deepcopy(PRED_KW),
                             "LatentAction": copy.deepcopy(PRED_LA_CFG),
                             "DynamicsModel": copy.deepcopy(PRED_DYN_CFG)}}
    cfg["behavior_model"] = copy.deepcopy(BEH_CFG)
    cfg["action_decoder"] = copy.deepcopy(ACTDEC_CFG)
    cfg["behavior_loss"] = copy.deepcopy(BEH_LOSS)
    cfg["training"].update(_training_cfg(lr, warmup, sched_steps))
    return cfg


def run_behavior_trajectory(tmp_dir, num_steps=150, resync_every=50, B=4,
                            T=5, lr=1e-3, warmup=25, sched_steps=400):
    """
    Stage-3 (behavior cloning) coupled trajectories + step-local resyncs.

    The reference's stage-3 optimization semantics DIFFER from stages 1/2
    (10_learn_behavior_from_demos.py): it builds TWO Adams (policy + action
    decoder), wires the warmup/cosine callback to the POLICY optimizer only
    (131-137: `self.optimizer = optimizer` after the policy setup — the
    decoder trains at CONSTANT base lr), and its forward override backprops
    with NO gradient clipping (205-217). The torch side below replicates
    exactly that; ours is BehaviorTrainer._train_step with
    build_behavior_optimizer (shared Adam moments + per-branch lr scale).
    The InvDyn target latents use the SAME injected reparameterization
    noise on both sides.
    """
    torch = _import_reference()
    jax = _jax()
    import jax.numpy as jnp
    from models.Downstream.action_decoding import \
        MLPActionDecoder as TorchActDec
    from models.Downstream.behavior_predictor import \
        MarkovBehaviorCloner as TorchCloner
    from models.Predictors.LatentActionPredictors import \
        SlotSingleActionPredictor as TorchPred
    from models.SAVi import SAVi as TorchSAVi
    from lib.loss import LossTracker
    from playslot_tpu.train.behavior_trainer import BehaviorTrainer
    from playslot_tpu.utils.convert import (convert_action_decoder,
                                            convert_behavior_cloner,
                                            convert_latent_predictor,
                                            convert_savi)

    act_dim = PRED_KW["action_dim"]
    out_dim = ACTDEC_CFG["model_params"]["out_dim"]

    # frozen SAVi + frozen predictor (InvDyn source), converted to our side
    savi_t = TorchSAVi(**copy.deepcopy(SAVI_CFG))
    savi_t.eval()
    pred_t = TorchPred(**copy.deepcopy(PRED_KW),
                       LatentAction=copy.deepcopy(PRED_LA_CFG),
                       DynamicsModel=copy.deepcopy(PRED_DYN_CFG))
    pred_t.eval()
    for m in (savi_t, pred_t):
        for p in m.parameters():
            p.requires_grad_(False)
    savi_params = convert_savi(savi_t.state_dict())
    pred_vars = convert_latent_predictor(pred_t.state_dict())

    # trainable downstream models (reference trains them in .eval() mode —
    # dropout-free here, asserted below)
    bp = BEH_CFG["model_params"]
    policy_t = TorchCloner(slot_dim=SAVI_CFG["slot_dim"], action_dim=act_dim,
                           **bp)
    actdec_t = TorchActDec(**ACTDEC_CFG["model_params"])
    policy_t.eval()
    actdec_t.eval()
    _assert_no_active_dropout(torch, policy_t)
    _assert_no_active_dropout(torch, actdec_t)
    policy_opt = torch.optim.Adam(policy_t.parameters(), lr=lr)
    act_opt = torch.optim.Adam(actdec_t.parameters(), lr=lr)
    # scheduler orchestration drives the POLICY optimizer ONLY
    orch = _torch_warmup_scheduler(torch, policy_opt, lr, warmup, sched_steps)
    tracker = LossTracker(copy.deepcopy(BEH_LOSS))

    # our trainer from the same converted init
    cfg = _behavior_config(tmp_dir, lr, warmup, sched_steps, B, T)
    cfg.save()
    tr = BehaviorTrainer(str(tmp_dir))
    tr.load_models(savi_params=savi_params, predictor_variables=pred_vars)
    tr.setup_behavior_models()
    init_params = {
        "policy": convert_behavior_cloner(policy_t.state_dict())["params"],
        "decoder": convert_action_decoder(actdec_t.state_dict())["params"]}
    tr.state = tr.state.replace(params=init_params,
                                opt_state=tr.tx.init(init_params))

    batches = _make_batches(num_steps, B, T, seed=2)
    rs = np.random.RandomState(321)
    noises = [rs.randn(B, T - 1, act_dim).astype(np.float32)
              for _ in range(num_steps)]
    gt_actions = [np.clip(rs.randn(B, T - 1, out_dim), -1, 1)
                  .astype(np.float32) for _ in range(num_steps)]
    key = jax.random.PRNGKey(0)

    def torch_video(x):
        return torch.from_numpy(x).permute(0, 1, 4, 2, 3).contiguous()

    def patch_sample(noise):
        t_noise = torch.from_numpy(noise)

        def fixed_sample(mean, var, eps=1e-6):
            return t_noise * torch.sqrt(var + eps) + mean
        pred_t.latent_action.sample = fixed_sample

    def torch_step(vids, noise, gt):
        """Reference 10_learn_behavior_from_demos.py:163-217 forward +
        optimize: InvDyn targets under no_grad, policy on slots[:, :-1],
        decoder on detached policy latents, one backward, both Adams step,
        NO clipping."""
        patch_sample(noise)
        videos = torch_video(vids)
        with torch.no_grad():
            slot_history = savi_t(videos, num_imgs=T,
                                  decode=False)["slot_history"]
            target_latents = pred_t.latent_action.compute_actions(
                slot_history)["sampled_latent_action"]
        pred_latents = policy_t(slot_history[:, :-1].detach())
        pred_actions = actdec_t(pred_latents.detach())
        tracker(pred_action_embs=pred_latents,
                target_action_embs=target_latents.detach(),
                pred_actions=pred_actions,
                target_actions=torch.from_numpy(gt))
        loss = tracker.get_last_losses(total_only=True)
        act_opt.zero_grad()
        policy_opt.zero_grad()
        loss.backward()
        act_opt.step()
        policy_opt.step()
        return float(loss)

    def torch_params():
        return {
            "policy": convert_behavior_cloner(policy_t.state_dict())["params"],
            "decoder": convert_action_decoder(actdec_t.state_dict())["params"]}

    def torch_adam_moments():
        m1p, m2p, cp = _torch_moments(torch, policy_t, policy_opt)
        m1d, m2d, cd = _torch_moments(torch, actdec_t, act_opt)
        mu = {"policy": convert_behavior_cloner(m1p)["params"],
              "decoder": convert_action_decoder(m1d)["params"]}
        nu = {"policy": convert_behavior_cloner(m2p)["params"],
              "decoder": convert_action_decoder(m2d)["params"]}
        assert cp == cd, (cp, cd)
        return mu, nu, cp

    losses_t, losses_j, resyncs = [], [], []
    for t, (vids, noise, gt) in enumerate(zip(batches, noises, gt_actions)):
        if resync_every and t % resync_every == 0:
            sync_params = torch_params()
            mu, nu, step_cnt = torch_adam_moments()
            sync_state = tr.state.replace(
                step=jnp.asarray(t, jnp.int32), params=sync_params,
                opt_state=_with_adam_state(jax, tr.tx, sync_params, mu, nu,
                                           step_cnt))
            next_state, _ = tr._train_step(sync_state, jnp.asarray(vids),
                                           jnp.asarray(gt), key, key,
                                           jnp.asarray(noise))

        orch(iter=t, epoch=0, exp_params=EXP_PARAMS_SCHED, end_epoch=False)
        losses_t.append(torch_step(vids, noise, gt))

        if resync_every and t % resync_every == 0:
            want = torch_params()
            errs = _leaf_rel_errs(jax, next_state.params, want,
                                  base_tree=sync_params)
            resyncs.append({
                "step": t,
                "err_vs_global_update": _tree_abs_err(
                    jax, next_state.params, want, sync_params),
                "max_param_rel_err": max(errs.values()),
                "worst_leaf": max(errs, key=errs.get)})

        tr.state, ldict = tr._train_step(tr.state, jnp.asarray(vids),
                                         jnp.asarray(gt), key, key,
                                         jnp.asarray(noise))
        losses_j.append(float(ldict["_total"]))

    final_want = torch_params()
    drift = _leaf_rel_errs(jax, tr.state.params, final_want,
                           base_tree=init_params)
    rel = [abs(a - b) / abs(a) for a, b in zip(losses_t, losses_j)]
    return {
        "num_steps": num_steps, "batch": B, "frames": T,
        "lr": lr, "warmup_steps": warmup, "scheduler_steps": sched_steps,
        "loss_torch_head": [round(v, 6) for v in losses_t[:5]],
        "loss_jax_head": [round(v, 6) for v in losses_j[:5]],
        "loss_torch_tail": [round(v, 6) for v in losses_t[-3:]],
        "loss_jax_tail": [round(v, 6) for v in losses_j[-3:]],
        "loss_rel_diff_per_step": [round(v, 8) for v in rel],
        "loss_rel_diff_max_first_quarter":
            max(rel[:max(1, num_steps // 4)]),
        "loss_rel_diff_max": max(rel),
        "resync_checks": resyncs,
        "resync_max_err_vs_global_update": max(
            r["err_vs_global_update"] for r in resyncs) if resyncs else None,
        "resync_max_param_rel_err": max(r["max_param_rel_err"]
                                        for r in resyncs) if resyncs else None,
        "final_param_max_rel_err": max(drift.values()),
        "final_param_worst_leaf": max(drift, key=drift.get),
    }


def run_oracle_trajectory(tmp_dir, num_steps=100, resync_every=25, B=4,
                          T=4, lr=1e-3, warmup=25, sched_steps=400):
    """
    Oracle-BC coupled trajectories + resyncs (10_train_oracle.py): a SINGLE
    Adam with the standard warmup/cosine orchestration, gradient clipping ON
    per training.gradient_clipping (136-141), and BOTH sides of the action
    regression clamped to [-1, 1] before the MSE (128-131).
    """
    torch = _import_reference()
    jax = _jax()
    import jax.numpy as jnp
    from models.Downstream.behavior_predictor import \
        MarkovBehaviorCloner as TorchCloner
    from models.SAVi import SAVi as TorchSAVi
    from playslot_tpu.train.behavior_trainer import OracleTrainer
    from playslot_tpu.utils.convert import (convert_behavior_cloner,
                                            convert_savi)

    out_dim = ACTDEC_CFG["model_params"]["out_dim"]

    savi_t = TorchSAVi(**copy.deepcopy(SAVI_CFG))
    savi_t.eval()
    for p in savi_t.parameters():
        p.requires_grad_(False)
    savi_params = convert_savi(savi_t.state_dict())

    bp = BEH_CFG["model_params"]
    oracle_t = TorchCloner(slot_dim=SAVI_CFG["slot_dim"], action_dim=out_dim,
                           **bp)
    oracle_t.eval()
    _assert_no_active_dropout(torch, oracle_t)
    opt = torch.optim.Adam(oracle_t.parameters(), lr=lr)
    orch = _torch_warmup_scheduler(torch, opt, lr, warmup, sched_steps)

    cfg = _behavior_config(tmp_dir, lr, warmup, sched_steps, B, T)
    del cfg["predictor"], cfg["action_decoder"], cfg["behavior_loss"]
    cfg["action_dim"] = out_dim
    cfg.save()
    tr = OracleTrainer(str(tmp_dir))
    tr.load_models(savi_params=savi_params)
    tr.setup_behavior_models()
    init_params = {
        "policy": convert_behavior_cloner(oracle_t.state_dict())["params"]}
    tr.state = tr.state.replace(params=init_params,
                                opt_state=tr.tx.init(init_params))

    batches = _make_batches(num_steps, B, T, seed=3)
    rs = np.random.RandomState(99)
    # 1.5x range so the [-1, 1] clamp is ACTIVE on a fraction of targets
    gt_actions = [(1.5 * rs.randn(B, T, out_dim)).astype(np.float32)
                  for _ in range(num_steps)]
    key = jax.random.PRNGKey(0)
    mse = torch.nn.functional.mse_loss

    def torch_video(x):
        return torch.from_numpy(x).permute(0, 1, 4, 2, 3).contiguous()

    def torch_step(vids, gt):
        videos = torch_video(vids)
        with torch.no_grad():
            slot_history = savi_t(videos, num_imgs=T,
                                  decode=False)["slot_history"]
        pred = oracle_t(slot_history)
        loss = mse(pred.clamp(-1, 1), torch.from_numpy(gt).clamp(-1, 1))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(oracle_t.parameters(), 0.05)
        opt.step()
        return float(loss)

    losses_t, losses_j, resyncs = [], [], []
    for t, (vids, gt) in enumerate(zip(batches, gt_actions)):
        if resync_every and t % resync_every == 0:
            sync_params = {"policy": convert_behavior_cloner(
                oracle_t.state_dict())["params"]}
            m1, m2, step_cnt = _torch_moments(torch, oracle_t, opt)
            mu = {"policy": convert_behavior_cloner(m1)["params"]}
            nu = {"policy": convert_behavior_cloner(m2)["params"]}
            sync_state = tr.state.replace(
                step=jnp.asarray(t, jnp.int32), params=sync_params,
                opt_state=_with_adam_state(jax, tr.tx, sync_params, mu, nu,
                                           step_cnt))
            next_state, _ = tr._train_step(sync_state, jnp.asarray(vids),
                                           jnp.asarray(gt), key, key)

        orch(iter=t, epoch=0, exp_params=EXP_PARAMS_SCHED, end_epoch=False)
        losses_t.append(torch_step(vids, gt))

        if resync_every and t % resync_every == 0:
            want = {"policy": convert_behavior_cloner(
                oracle_t.state_dict())["params"]}
            errs = _leaf_rel_errs(jax, next_state.params, want,
                                  base_tree=sync_params)
            resyncs.append({
                "step": t,
                "err_vs_global_update": _tree_abs_err(
                    jax, next_state.params, want, sync_params),
                "max_param_rel_err": max(errs.values()),
                "worst_leaf": max(errs, key=errs.get)})

        tr.state, ldict = tr._train_step(tr.state, jnp.asarray(vids),
                                         jnp.asarray(gt), key, key)
        losses_j.append(float(ldict["_total"]))

    final_want = {"policy": convert_behavior_cloner(
        oracle_t.state_dict())["params"]}
    drift = _leaf_rel_errs(jax, tr.state.params, final_want,
                           base_tree=init_params)
    rel = [abs(a - b) / abs(a) for a, b in zip(losses_t, losses_j)]
    return {
        "num_steps": num_steps, "batch": B, "frames": T,
        "lr": lr, "warmup_steps": warmup, "scheduler_steps": sched_steps,
        "loss_torch_head": [round(v, 6) for v in losses_t[:5]],
        "loss_jax_head": [round(v, 6) for v in losses_j[:5]],
        "loss_torch_tail": [round(v, 6) for v in losses_t[-3:]],
        "loss_jax_tail": [round(v, 6) for v in losses_j[-3:]],
        "loss_rel_diff_per_step": [round(v, 8) for v in rel],
        "loss_rel_diff_max_first_quarter":
            max(rel[:max(1, num_steps // 4)]),
        "loss_rel_diff_max": max(rel),
        "resync_checks": resyncs,
        "resync_max_err_vs_global_update": max(
            r["err_vs_global_update"] for r in resyncs) if resyncs else None,
        "resync_max_param_rel_err": max(r["max_param_rel_err"]
                                        for r in resyncs) if resyncs else None,
        "final_param_max_rel_err": max(drift.values()),
        "final_param_worst_leaf": max(drift, key=drift.get),
    }


def main():
    import tempfile
    report = {"lr_schedule": compare_lr_sequences()}
    print("[lr] within T_max:",
          report["lr_schedule"]["max_rel_diff_within_T_max"],
          "incl. post-T_max bounce:",
          report["lr_schedule"]["max_rel_diff_incl_post_T_max_bounce"],
          flush=True)
    with tempfile.TemporaryDirectory() as d:
        report["savi"] = run_savi_trajectory(d)
    print("[savi] resync max (vs global update):",
          report["savi"]["resync_max_err_vs_global_update"],
          "loss max rel:", report["savi"]["loss_rel_diff_max"], flush=True)
    with tempfile.TemporaryDirectory() as d:
        report["playslot"] = run_playslot_trajectory(d)
    print("[playslot] resync max (vs global update):",
          report["playslot"]["resync_max_err_vs_global_update"],
          "vq:", report["playslot"]["resync_max_vq_rel_err"],
          "loss max rel:", report["playslot"]["loss_rel_diff_max"], flush=True)
    with tempfile.TemporaryDirectory() as d:
        report["behavior"] = run_behavior_trajectory(d)
    print("[behavior] resync max (vs global update):",
          report["behavior"]["resync_max_err_vs_global_update"],
          "loss max rel:", report["behavior"]["loss_rel_diff_max"], flush=True)
    with tempfile.TemporaryDirectory() as d:
        report["oracle"] = run_oracle_trajectory(d)
    print("[oracle] resync max (vs global update):",
          report["oracle"]["resync_max_err_vs_global_update"],
          "loss max rel:", report["oracle"]["loss_rel_diff_max"], flush=True)
    out = os.path.join(_REPO, "docs", "TRAJECTORY_PARITY.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
