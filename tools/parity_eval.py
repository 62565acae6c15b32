#!/usr/bin/env python3
"""
Side-by-side parity evaluation: torch reference vs playslot_tpu on the SAME
frames with a CONVERTED reference checkpoint (VERDICT r1 item 7; the artifact
the BASELINE "PSNR/LPIPS within 1%" claim needs once real checkpoints exist).

Runs the reference SAVi (and optionally the PlaySlot predictor with
deterministic sampling-noise injection on both sides, matching reference
src/05_evaluate_PlaySlot.py:65-139 semantics) and the playslot_tpu models on
identical inputs, then prints:
  * each implementation's PSNR/SSIM (and LPIPS when PLAYSLOT_LPIPS_WEIGHTS
    is set) against ground truth, with relative deltas,
  * direct output deltas (max/mean |recons_jax - recons_torch|, slot-mask
    argmax agreement).

Usage:
  python tools/parity_eval.py -d <reference-layout exp dir> \
      --savi_ckpt <SAVi .pth> \
      [--name_pred_exp PlaySlot --pred_ckpt <PlaySlot .pth>] \
      [--frames videos.npz] [--num_seqs 8] [--num_seed 6 --num_preds 15] \
      [--strict]

With --strict, exits 1 if any shared metric differs by more than 1%.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE_SRC = os.environ.get("PLAYSLOT_REFERENCE_SRC", "/root/reference/src")

import jax  # noqa: E402

# exact f32 matmuls: required for bit-comparable outputs vs torch
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402


def _load_frames(args, exp_params):
    gt_masks = None
    if args.frames:
        data = np.load(args.frames)
        videos = np.asarray(data["videos"], np.float32)
        if "masks" in data:
            # GT instance segmentation -> the report gains Hungarian mIoU
            # for both sides (the BASELINE gate's SAVi segmentation metric)
            gt_masks = np.asarray(data["masks"])
        return videos, gt_masks
    else:
        from playslot_tpu.data.gridshapes import GridShapes
        img = exp_params["dataset"].get("img_size", 64)
        if isinstance(img, (list, tuple)):
            img = img[0]
        T = args.num_seed + args.num_preds if args.pred_ckpt \
            else exp_params["dataset"].get("num_frames", 8)
        ds = GridShapes(split="test", num_frames=T, num_balls=3,
                        img_size=img, shape_size=max(img // 5, 3),
                        length=max(args.num_seqs, 8), seed=0)
        videos = np.stack([np.asarray(ds[i][0]) for i in range(args.num_seqs)])
    return videos.astype(np.float32), gt_masks


def _slot_noise(exp_params, batch):
    """Shared slot-init noise so LearnedRandom draws identically on both
    sides (same trick as tests/test_savi_parity.py:68-78)."""
    mp = exp_params["model"]["model_params"]
    if mp.get("initializer", "LearnedRandom") != "LearnedRandom":
        return None
    return np.random.RandomState(7).randn(
        batch, mp["num_slots"], mp["slot_dim"]).astype(np.float32)


def _torch_savi(exp_params, ckpt_path, videos_np, noise):
    sys.path.insert(0, REFERENCE_SRC)
    import torch
    from models.SAVi import SAVi

    import copy
    # the reference factories destructively .pop() keys out of the config
    # dicts (encoders.py:31-32) — hand them a deep copy
    model = SAVi(**copy.deepcopy(exp_params["model"]["model_params"]))
    ck = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ck.get("model_state_dict", ck)
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    model.load_state_dict(sd)
    model.eval()
    if noise is not None:
        t_noise = torch.from_numpy(noise)
        num_slots = noise.shape[1]

        def fixed_init(batch_size, **kwargs):
            m = model.initializer.slots_mu.expand(batch_size, num_slots, -1)
            s = model.initializer.slots_sigma.expand(batch_size, num_slots, -1)
            return m + s * t_noise

        model.initializer.forward = fixed_init
    x = torch.from_numpy(videos_np).permute(0, 1, 4, 2, 3).contiguous()
    with torch.no_grad():
        out = model(x, num_imgs=x.shape[1])
    recons = out["recons_imgs"].permute(0, 1, 3, 4, 2).numpy()
    masks = out["masks"].numpy()  # (B, T, S, 1, H, W)
    return sd, recons, masks.squeeze(3)


def _jax_savi(exp_params, sd, videos_np, noise):
    from playslot_tpu.models.factory import setup_model
    from playslot_tpu.utils.convert import convert_savi

    model = setup_model(exp_params["model"])
    params = convert_savi(sd)
    init_kw = {"noise": jnp.asarray(noise)} if noise is not None else {}
    out = jax.jit(lambda p, v: model.apply(
        {"params": p}, v, initializer_kwargs=init_kw,
        rngs={"slots": jax.random.PRNGKey(0)}))(params, jnp.asarray(videos_np))
    recons = np.asarray(out["recons_imgs"])
    masks = np.asarray(out["masks"])[..., 0]  # (B, T, S, H, W)
    return params, recons, masks


def _metrics(recons, videos):
    from playslot_tpu.utils.metrics import MetricTracker
    names = ["psnr", "ssim"]
    if os.environ.get("PLAYSLOT_LPIPS_WEIGHTS"):
        names.append("lpips")
    tracker = MetricTracker(metrics=tuple(names))
    tracker.accumulate(np.clip(recons, 0, 1), videos)
    return {k: v["mean"] for k, v in tracker.aggregate().items()}


def _torch_predictor(exp_params, pred_ckpt, slots_t_np, num_seed, num_preds,
                     noise):
    import torch
    import CONFIG as ref_CONFIG
    from lib.setup_model import setup_predictor

    # the reference resolves its config registry from os.getcwd(); repoint
    # it at the reference tree so its factory works from any cwd
    import copy
    ref_CONFIG.CONFIG["paths"]["configs_path"] = os.path.join(
        REFERENCE_SRC, "configs")
    predictor = setup_predictor(copy.deepcopy(dict(exp_params)))
    ck = torch.load(pred_ckpt, map_location="cpu", weights_only=False)
    sd = ck.get("model_state_dict", ck)
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    # pos-embedding shape patch (reference setup_model.py:277-279)
    for k in ["dynamics_model.pos_emb.pe", "predictor.pe.pe"]:
        if k in sd:
            sd[k] = predictor.state_dict()[k]
    predictor.load_state_dict(sd)
    predictor.eval()

    t_noise = torch.from_numpy(noise)
    predictor.latent_action.sample = \
        lambda mean, var, eps=1e-6: t_noise * torch.sqrt(var + eps) + mean
    with torch.no_grad():
        preds, _ = predictor.forward_multiple_samples(
            torch.from_numpy(slots_t_np), num_samples=1, num_seed=num_seed,
            num_preds=num_preds, use_posterior=True)
    return sd, preds.numpy()


def _jax_predictor(exp_params, sd, slots_np, num_seed, num_preds, noise):
    from playslot_tpu.models.factory import setup_predictor
    from playslot_tpu.utils.convert import convert_latent_predictor

    predictor = setup_predictor(
        exp_params["predictor"],
        savi_params=exp_params["model"]["model_params"])
    variables = convert_latent_predictor(sd)
    preds = predictor.apply(
        variables, jnp.asarray(slots_np), num_samples=1, num_seed=num_seed,
        num_preds=num_preds, use_posterior=True, noise=jnp.asarray(noise),
        method=lambda m, *a, **k: m.forward_multiple_samples(*a, **k))
    return np.asarray(preds)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--name_pred_exp")
    p.add_argument("--pred_ckpt")
    p.add_argument("--frames", help=".npz with a 'videos' (B,T,H,W,C) array")
    p.add_argument("--num_seqs", type=int, default=8)
    p.add_argument("--num_seed", type=int, default=6)
    p.add_argument("--num_preds", type=int, default=15)
    p.add_argument("--strict", action="store_true")
    p.add_argument("--report", help="write the parity report JSON here")
    args = p.parse_args(argv)

    from playslot_tpu.config import Config
    exp_dir = args.exp_directory
    pred_dir = os.path.join(exp_dir, "predictors", args.name_pred_exp) \
        if args.name_pred_exp else exp_dir
    exp_params = Config.load(pred_dir if args.pred_ckpt else exp_dir)

    videos, gt_masks = _load_frames(args, exp_params)
    print(f"frames: {videos.shape}"
          + (f" gt_masks: {gt_masks.shape}" if gt_masks is not None else ""))

    savi_ckpt = args.savi_ckpt if os.path.isabs(args.savi_ckpt) else \
        os.path.join(exp_dir, "models", args.savi_ckpt)
    noise = _slot_noise(exp_params, videos.shape[0])
    sd, recons_t, masks_t = _torch_savi(exp_params, savi_ckpt, videos, noise)
    _, recons_j, masks_j = _jax_savi(exp_params, sd, videos, noise)

    report = {"savi": {
        "torch": _metrics(recons_t, videos),
        "jax": _metrics(recons_j, videos),
        "max_abs_recons_delta": float(np.abs(recons_j - recons_t).max()),
        "mean_abs_recons_delta": float(np.abs(recons_j - recons_t).mean()),
        "mask_argmax_agreement": float(
            (masks_j.argmax(2) == masks_t.argmax(2)).mean()),
    }}
    if gt_masks is not None:
        from playslot_tpu.utils.metrics import miou_framewise
        num_gt = int(gt_masks.max()) + 1
        S = masks_t.shape[2]

        def miou(pred_masks):
            seg = pred_masks.argmax(2)  # (B, T, H, W)
            vals = [miou_framewise(seg[b, t], gt_masks[b, t], S, num_gt)
                    for b in range(seg.shape[0]) for t in range(seg.shape[1])]
            return float(np.mean(vals))

        report["savi"]["torch"]["miou"] = miou(masks_t)
        report["savi"]["jax"]["miou"] = miou(masks_j)

    if args.pred_ckpt:
        sys.path.insert(0, REFERENCE_SRC)
        import torch
        from models.SAVi import SAVi as TorchSAVi  # noqa: F401 (already loaded)
        # slots from the torch SAVi drive BOTH predictors (isolates the
        # predictor comparison from any SAVi-side differences)
        import copy
        model_params = exp_params["model"]["model_params"]
        action_dim = exp_params["predictor"]["predictor_params"]["action_dim"]
        tm = TorchSAVi(**copy.deepcopy(model_params))
        tm.load_state_dict(sd)
        tm.eval()
        with torch.no_grad():
            x = torch.from_numpy(videos).permute(0, 1, 4, 2, 3).contiguous()
            slots = tm(x, num_imgs=x.shape[1],
                       decode=False)["slot_history"].numpy()
        B, T = slots.shape[:2]
        single = exp_params["predictor"]["predictor_name"] in (
            "SlotSingleAction", "SlotSingleActionPredictor")
        noise_shape = (B, T - 1, action_dim) if single \
            else (B, T - 1, slots.shape[2], action_dim)
        noise = np.random.RandomState(0).randn(*noise_shape).astype(np.float32)

        pred_ckpt = args.pred_ckpt if os.path.isabs(args.pred_ckpt) else \
            os.path.join(pred_dir, "models", args.pred_ckpt)
        psd, preds_t = _torch_predictor(exp_params, pred_ckpt, slots,
                                        args.num_seed, args.num_preds, noise)
        preds_j = _jax_predictor(exp_params, psd, slots,
                                 args.num_seed, args.num_preds, noise)
        # (B, num_samples=1, num_preds, S, D) -> (B, num_preds, S, D)
        preds_t, preds_j = preds_t[:, 0], preds_j[:, 0]

        # decode predicted slots with the jax SAVi for image metrics
        from playslot_tpu.models.factory import setup_model
        from playslot_tpu.utils.convert import convert_savi
        jsavi = setup_model(exp_params["model"])
        jparams = convert_savi(sd)
        dec = jax.jit(lambda p, s: jsavi.apply(
            {"params": p}, s, method=lambda m, sl: m.decode_fast(sl)))
        imgs_j = np.asarray(dec(jparams, jnp.asarray(preds_j))[0])
        imgs_t = np.asarray(dec(jparams, jnp.asarray(preds_t))[0])
        tgt = videos[:, 1:args.num_seed + args.num_preds]
        n = min(imgs_j.shape[1], tgt.shape[1])
        report["predictor"] = {
            "torch": _metrics(imgs_t[:, :n], tgt[:, :n]),
            "jax": _metrics(imgs_j[:, :n], tgt[:, :n]),
            "max_abs_slot_delta": float(np.abs(preds_j - preds_t).max()),
        }

    print(json.dumps(report, indent=2))

    worst = 0.0
    for section in report.values():
        for k in section["torch"]:
            t, j = section["torch"][k], section["jax"][k]
            if abs(t) > 1e-9:
                worst = max(worst, abs(j - t) / abs(t))
    print(f"worst relative metric delta: {worst * 100:.3f}%")
    report["worst_relative_metric_delta"] = worst
    report["strict_gate"] = "PASS" if worst <= 0.01 else "FAIL"
    if args.report:
        os.makedirs(os.path.dirname(os.path.abspath(args.report)), exist_ok=True)
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)
    if args.strict and worst > 0.01:
        print("FAIL: metric delta exceeds 1%")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
