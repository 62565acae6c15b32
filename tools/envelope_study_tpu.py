#!/usr/bin/env python3
"""
Reference-exact recipe envelope study (VERDICT r3 item 3).

The round-3 flagship result (imagination 0.85 +- 0.06 at the production
predictor architecture) uses a MODIFIED recipe: deterministic VQ bottleneck
(latent_det) + use_variability=false. The reference's shipped ButtonPress
PlaySlot config trains a STOCHASTIC latent with variability ON
(/root/reference/experiments/ButtonPress/predictors/PlaySlot/
experiment_params.json: use_variability true; reparam sampling at
/root/reference/src/models/Predictors/LatentAction.py:71-75), and at the
schedules tried so far (8 epochs x 500 iters = 4k steps) that recipe
collapses (0.21 +- 0.07). The builder's round-3 analysis predicts the
reference recipe bootstraps only once training shrinks the posterior sigma
below the latent signal scale (bootstrap SNR = latent_std / sigma_mean
crossing ~1) — which the reference's 167k-step schedule may reach and our
4k-step schedule does not. This tool MEASURES that boundary:

  * per seed, reuse the committed round-3 SAVi checkpoint (the perception
    stack is recipe-independent), train the REFERENCE-EXACT predictor
    (stochastic latent + use_variability=true, no anchors) at 4x the round-3
    schedule (32 epochs x 500 iters = 16k steps, warmup+cosine stretched to
    match), probing the latent channel every PROBE_EVERY epochs:
    bootstrap SNR (latent_std/sigma_mean), R^2 mean->action,
    R^2 sampled->action, R^2 code-index->action, codeword usage entropy;
  * then run the full behavior-cloning + closed-loop stage with the final
    predictor, imagination + grounded protocols, plus intermediate
    checkpoints' closed-loop if PLAYSLOT_ENVELOPE_EVAL_MID=1.

Numerics are pinned f32/"highest" like the round-3 production study — the
boundary being measured is the RECIPE (stochastic + variability), not TPU
bf16 rounding (that axis was already measured and documented in
docs/BEHAVIOR_STUDY.md).

Outputs experiments/GridShapesStudy/ENVELOPE_RESULTS.json with the
steps-vs-channel curve and the closed-loop results per seed.
"""

import copy
import json
import os
import sys

# reference-exact knobs at the production architecture — set BEFORE the
# study module is imported (it reads env at import time). setdefault so a
# caller can still override any of them.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEFAULTS = {
    "PLAYSLOT_STUDY_EXP": os.path.join(_REPO, "experiments/GridShapesStudy"),
    "PLAYSLOT_STUDY_USE_VARIABILITY": "1",   # reference default
    "PLAYSLOT_STUDY_ANCHOR": "none",         # stochastic latent, no anchors
    "PLAYSLOT_STUDY_PRED_EMB": "256",        # shipped ButtonPress dims
    "PLAYSLOT_STUDY_PRED_LAYERS": "4",
    "PLAYSLOT_STUDY_PRED_HEADS": "8",
    "PLAYSLOT_STUDY_PRED_LA_HEADS": "4",
    "PLAYSLOT_STUDY_PRED_HEAD_DIM": "64",
    "PLAYSLOT_STUDY_PRED_MLP": "1024",
    "PLAYSLOT_STUDY_NUM_ACTIONS": "8",
    "PLAYSLOT_STUDY_ACTION_DIM": "24",
    "PLAYSLOT_STUDY_PRED_DTYPE": "float32",
    "PLAYSLOT_STUDY_PRECISION": "highest",
    "PLAYSLOT_STUDY_PRED_NAME": "PlaySlotEnvelope",
}
for k, v in _DEFAULTS.items():
    os.environ.setdefault(k, v)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

import behavior_study_tpu as study
from behavior_study_tpu import log

import jax

from playslot_tpu.config import Config, DEFAULTS
from playslot_tpu.utils.checkpoint import load_checkpoint

EPOCHS = int(os.environ.get("PLAYSLOT_ENVELOPE_EPOCHS", "32"))
PROBE_EVERY = int(os.environ.get("PLAYSLOT_ENVELOPE_PROBE_EVERY", "2"))
SEEDS = [int(s) for s in os.environ.get(
    "PLAYSLOT_ENVELOPE_SEEDS", "0 1 2").split()]
RESULTS = os.environ.get("PLAYSLOT_ENVELOPE_RESULTS", "ENVELOPE_RESULTS.json")
# closed-loop eval at intermediate checkpoints (expensive: one BC train +
# 2x30 sims per probe point listed, comma-separated epoch numbers)
EVAL_MID = [int(e) for e in os.environ.get(
    "PLAYSLOT_ENVELOPE_EVAL_MID", "").split(",") if e]
# --- gate protocol (VERDICT r4 item 3): the shipped recipe's 5-seed result
# used (a) SNR-gated SAVi selection and (b) best-of-k predictor selection on
# the latent-channel probe; the reference-exact arm ran ungated. This run
# applies both gates: the committed per-seed SAVi checkpoints are the GATED
# selections (all pass the 0.005 slot-difference SNR bar — re-probed and
# recorded in PROD_RESULTS_5SEED_GATED.json by tools/backfill_5seed_probe.py),
# and the predictor gets up to PRED_ATTEMPTS trainings per seed (fresh
# training seed each), keeping the best r2_mean_to_action and stopping early
# once it clears CHANNEL_BAR (the bar behavior_study_tpu.py:130-137 uses).
PRED_ATTEMPTS = int(os.environ.get("PLAYSLOT_ENVELOPE_PRED_ATTEMPTS", "2"))
CHANNEL_BAR = float(os.environ.get("PLAYSLOT_ENVELOPE_CHANNEL_BAR", "0.5"))
SAVI_SNR_BAR = 0.005


def _savi_gate(seed):
    """SNR-gate record for the committed SAVi checkpoint: prefer the
    committed backfilled probe values (same checkpoints, same instrument),
    probe live only if absent."""
    gated = os.path.join(study.EXP_ROOT, "PROD_RESULTS_5SEED_GATED.json")
    if os.path.isfile(gated):
        with open(gated) as f:
            rows = json.load(f).get("per_seed", [])
        for r in rows:
            if r.get("seed") == seed and r.get("savi_channel_snr") is not None:
                snr = float(r["savi_channel_snr"])
                return {"savi_channel_snr": snr, "bar": SAVI_SNR_BAR,
                        "passes": snr >= SAVI_SNR_BAR,
                        "source": "PROD_RESULTS_5SEED_GATED.json"}
    from playslot_tpu.models.factory import setup_model
    from probe_slotdiff_channel import slotdiff_r2
    exp = os.path.join(study.EXP_ROOT, f"seed{seed}")
    cfg = Config.load(exp)
    params = load_checkpoint(
        os.path.join(exp, "models", "checkpoint_epoch_final"))["state"]["params"]
    img = cfg["dataset"].get("img_size", 64)
    snr = float(slotdiff_r2(setup_model(cfg["model"]), params,
                            img_size=img if isinstance(img, int) else img[0])[1])
    return {"savi_channel_snr": round(snr, 4), "bar": SAVI_SNR_BAR,
            "passes": snr >= SAVI_SNR_BAR, "source": "live probe"}


def _flush(per_seed):
    out_path = os.path.join(study.EXP_ROOT, RESULTS)
    with open(out_path, "w") as f:
        json.dump({
            "config": {
                "epochs": EPOCHS, "iters": study.ITERS,
                "probe_every": PROBE_EVERY, "seeds": SEEDS,
                "recipe": "reference-exact (stochastic latent + variability, "
                          "no anchors), production ButtonPress predictor "
                          "dims, f32/highest",
                "use_variability": study.USE_VARIABILITY,
                "anchor": study.ANCHOR, "pred_emb": study.PRED_EMB,
                "pred_layers": study.PRED_LAYERS,
                "num_actions": study.NUM_ACTIONS,
                "action_dim": study.ACTION_DIM,
                "baseline_schedule_steps": 8 * 500,
                "schedule_steps": EPOCHS * study.ITERS,
                "gate": {"savi_snr_bar": SAVI_SNR_BAR,
                         "pred_attempts": PRED_ATTEMPTS,
                         "channel_r2_bar": CHANNEL_BAR},
            },
            "per_seed": per_seed,
        }, f, indent=2)


def closed_loop(exp, pred_path, cfg, savi_params, ptr_state, tag):
    """Stage-4 behavior cloning + closed-loop eval (mirrors
    behavior_study_tpu.run_seed stage 4) for the CURRENT predictor state."""
    from playslot_tpu.train.behavior_trainer import BehaviorTrainer
    from playslot_tpu.train.sim_evaluator import SimulationEvaluator

    beh_path = os.path.join(pred_path, "behaviors", f"Policy_{tag}")
    os.makedirs(beh_path, exist_ok=True)
    bcfg = Config.load(pred_path)
    bcfg["behavior_model"] = copy.deepcopy(study.BEH_CFG)
    bcfg["action_decoder"] = {
        "model_name": "MLPDecoder",
        "model_params": {"in_dim": study.ACTION_DIM, "out_dim": 2,
                         "hidden_dim": [64, 64]}}
    bcfg["behavior_distill_target"] = "mean"
    bcfg["behavior_loss"] = [
        {"type": "latent_action_mse", "weight": 1.0},
        {"type": "action_mse", "weight": 1.0}]
    bcfg.save(beh_path)
    btr = BehaviorTrainer(beh_path)
    btr.exp_params["dataset"]["dataset_name"] = "GridShapesOnDevice_ExpertDemos"
    btr.exp_params["dataset"]["num_frames"] = 16
    btr.exp_params["dataset"]["length"] = 4096
    btr.exp_params["training"]["num_epochs"] = study.BC_EPOCHS
    btr.exp_params["training"]["scheduler_steps"] = study.BC_EPOCHS * 256
    btr.load_data()
    btr.load_models(savi_params=savi_params,
                    predictor_variables={"params": ptr_state.params,
                                         "vq": ptr_state.vq})
    btr.setup_behavior_models()
    btr.training_loop()

    common = dict(num_sims=study.NUM_SIMS, max_num_steps=study.MAX_STEPS,
                  sim_name="GridShapes")
    ev_g = SimulationEvaluator(
        beh_path, {"params": savi_params},
        {"params": ptr_state.params, "vq": ptr_state.vq},
        btr.state.params["policy"], btr.state.params["decoder"],
        ground_with_obs=True, **common)
    grounded = float(ev_g.evaluate()["success_rate"])
    ev_i = SimulationEvaluator(
        beh_path, {"params": savi_params},
        {"params": ptr_state.params, "vq": ptr_state.vq},
        btr.state.params["policy"], btr.state.params["decoder"], **common)
    imagination = float(ev_i.evaluate()["success_rate"])
    return {"grounded": grounded, "imagination": imagination}


def train_attempt(seed, attempt, exp, cfg, savi_params, per_seed, out):
    """One reference-exact predictor training (stage-3 of the study) under
    training seed `seed*100 + attempt` — the study's fresh-candidate
    convention (behavior_study_tpu.py:78-84)."""
    from playslot_tpu.train.predictor_trainer import PredictorTrainer

    name = study.PRED_NAME if attempt == 0 else f"{study.PRED_NAME}_a{attempt}"
    pred_path = os.path.join(exp, "predictors", name)
    os.makedirs(pred_path, exist_ok=True)
    pcfg = Config.load(exp)
    pcfg["dataset"]["target_walk"] = 0.0
    pcfg["predictor"] = copy.deepcopy(study.PRED_CFG)
    pcfg["predictor_loss"] = copy.deepcopy(DEFAULTS["predictor_loss"])
    pcfg["training"]["compute_dtype"] = study.PRED_DTYPE
    if study.PRECISION:
        pcfg["training"]["matmul_precision"] = study.PRECISION
    pcfg["prediction_params"] = {"num_context": 3, "num_preds": 5,
                                 "teacher_force": False, "sample_length": 8,
                                 "input_buffer_size": 8}
    pcfg["training"]["num_epochs"] = EPOCHS
    pcfg["training"]["scheduler_steps"] = EPOCHS * study.ITERS
    pcfg["training"]["seed"] = seed * 100 + attempt
    pcfg.save(pred_path)

    log(f"[seed {seed}] envelope attempt {attempt}: reference-exact "
        f"predictor, {EPOCHS}x{study.ITERS} steps (4x round-3 schedule)")
    ptr = PredictorTrainer(exp, name_predictor_experiment=name)
    ptr.load_data()
    ptr.load_savi(savi_params=savi_params)
    ptr.setup_predictor()

    curve = []
    rec = {"attempt": attempt, "pred_name": name,
           "training_seed": seed * 100 + attempt, "curve": curve}
    out["attempts"].append(rec)
    for epoch in range(EPOCHS):
        ptr.epoch = epoch
        tl = ptr.run_epoch(ptr.train_loader, train=True,
                           max_iters=study.ITERS)
        if (epoch + 1) % PROBE_EVERY == 0 or epoch == EPOCHS - 1:
            ch = study.probe_channel(
                cfg, pcfg, savi_params,
                {"params": ptr.state.params, "vq": ptr.state.vq})
            snr = (ch["latent_std"] / ch["sigma_mean"]
                   if ch["sigma_mean"] else None)
            point = {"epoch": epoch + 1, "steps": (epoch + 1) * study.ITERS,
                     "train_loss": round(float(tl.get("_total", -1)), 4),
                     "bootstrap_snr": None if snr is None else round(snr, 4),
                     **ch}
            curve.append(point)
            log(f"[seed {seed}] step {point['steps']}: "
                f"snr={point['bootstrap_snr']} "
                f"r2_mean={ch['r2_mean_to_action']} "
                f"r2_idx={ch['r2_idx_to_action']} "
                f"usage_H={ch['usage_entropy']}")
            _flush(per_seed + [out])
        if (epoch + 1) in EVAL_MID:
            res = closed_loop(exp, pred_path, cfg, savi_params, ptr.state,
                              tag=f"e{epoch + 1}")
            # attach to THIS epoch's curve point; when the eval epoch is
            # not a probe epoch, append a dedicated entry rather than
            # mislabeling the previous probe point
            if curve and curve[-1]["epoch"] == epoch + 1:
                curve[-1]["closed_loop"] = res
            else:
                curve.append({"epoch": epoch + 1,
                              "steps": (epoch + 1) * study.ITERS,
                              "closed_loop": res})
            log(f"[seed {seed}] mid closed-loop @ {epoch + 1}: {res}")
            _flush(per_seed + [out])

    ptr.save("checkpoint_epoch_final")
    probes = [p for p in curve if "r2_mean_to_action" in p]
    rec["final_r2_mean"] = probes[-1]["r2_mean_to_action"] if probes else None
    rec["final_snr"] = probes[-1].get("bootstrap_snr") if probes else None
    return rec, ptr, pred_path


def run_seed(seed, per_seed):
    exp = os.path.join(study.EXP_ROOT, f"seed{seed}")
    savi_ckpt = os.path.join(exp, "models", "checkpoint_epoch_final")
    assert os.path.isdir(savi_ckpt), \
        f"committed round-3 SAVi checkpoint required at {savi_ckpt}"
    out = {"seed": seed, "savi_reused": savi_ckpt,
           "savi_gate": _savi_gate(seed), "attempts": []}
    log(f"[seed {seed}] savi gate: {out['savi_gate']}")
    cfg = Config.load(exp)
    savi_params = load_checkpoint(savi_ckpt)["state"]["params"]

    best = None
    for attempt in range(PRED_ATTEMPTS):
        rec, ptr, pred_path = train_attempt(
            seed, attempt, exp, cfg, savi_params, per_seed, out)
        r2 = rec["final_r2_mean"] if rec["final_r2_mean"] is not None else -1.0
        rec["passes_channel_bar"] = r2 >= CHANNEL_BAR
        if best is None or r2 > (best[0]["final_r2_mean"] or -1.0):
            best = (rec, ptr, pred_path)
        _flush(per_seed + [out])
        if r2 >= CHANNEL_BAR:
            break
        log(f"[seed {seed}] attempt {attempt} r2_mean={r2:.3f} < "
            f"{CHANNEL_BAR} channel bar")

    rec, ptr, pred_path = best
    rec["selected"] = True
    out["pred_gate"] = {"channel_r2_bar": CHANNEL_BAR,
                        "attempts_run": len(out["attempts"]),
                        "selected_attempt": rec["attempt"],
                        "selected_r2_mean": rec["final_r2_mean"]}
    out["curve"] = rec["curve"]  # legacy schema: the selected attempt's curve
    usage = np.asarray(
        ptr.state.vq["latent_action"]["quantizer"]["usage_bins"])
    out["vq_usage"] = np.round(usage, 3).tolist()

    log(f"[seed {seed}] final closed loop (attempt {rec['attempt']})...")
    res = closed_loop(exp, pred_path, cfg, savi_params, ptr.state, tag="final")
    out["policy_success_grounded"] = res["grounded"]
    out["policy_success_imagination"] = res["imagination"]
    log(f"[seed {seed}] FINAL: imagination={res['imagination']:.2f} "
        f"grounded={res['grounded']:.2f}")
    return out


def main():
    per_seed = []
    for seed in SEEDS:
        per_seed.append(run_seed(seed, per_seed))
        _flush(per_seed)
    imag = [r.get("policy_success_imagination") for r in per_seed
            if r.get("policy_success_imagination") is not None]
    log(f"ENVELOPE DONE: imagination mean={np.mean(imag):.3f} "
        f"({[round(v, 2) for v in imag]})")


if __name__ == "__main__":
    main()
