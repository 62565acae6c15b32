"""
Figure/GIF generation CLIs.

Capability parity with reference src/06_generate_figs_savi.py,
src/06_generate_figs_pred.py and src/06_generate_action_figs.py:
decomposition strips, prediction GIFs with per-sequence metrics in the
directory name, action-prototype-conditioned rollouts and codebook
diagnostics.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from playslot_tpu.cli.common import resolve_predictor_variables, resolve_savi_params
from playslot_tpu.config import Config
from playslot_tpu.data.loader import build_data_loader, load_data, unwrap_batch_data
from playslot_tpu.models.factory import setup_model, setup_predictor
from playslot_tpu.utils import visualizations as viz
from playslot_tpu.utils.logger import Logger, log_function, print_
from playslot_tpu.utils.metrics import psnr, segmentation_from_masks


@log_function
def figs_savi(argv=None):
    p = argparse.ArgumentParser(description="Generate SAVi decomposition figures")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num_seqs", type=int, default=10)
    args = p.parse_args(argv)

    Logger(args.exp_directory)
    exp_params = Config.load(args.exp_directory)
    savi = setup_model(exp_params["model"])
    savi_vars = resolve_savi_params(args.exp_directory, args.checkpoint)

    ds = load_data(exp_params, split="test")
    loader = build_data_loader(ds, batch_size=1, shuffle=False)
    out_dir = os.path.join(args.exp_directory, "plots",
                           f"figs_{args.checkpoint.replace('/', '_')}")

    fwd = jax.jit(lambda p_, x, k: savi.apply({"params": p_}, x,
                                              rngs={"slots": k}))
    key = jax.random.PRNGKey(0)
    for i, batch in enumerate(loader):
        if i >= args.num_seqs:
            break
        videos, _, _, _ = unwrap_batch_data(exp_params, batch)
        key, k = jax.random.split(key)
        out = fwd(savi_vars["params"], jnp.asarray(videos), k)
        seq_dir = os.path.join(out_dir, f"seq_{i:03d}")
        viz.visualize_recons(videos[0], np.asarray(out["recons_imgs"][0]),
                             savepath=os.path.join(seq_dir, "recons.png"))
        viz.visualize_decomp(np.asarray(out["recons_objs"][0]),
                             masks=np.asarray(out["masks"][0]),
                             savepath=os.path.join(seq_dir, "decomp.png"))
        seg = np.asarray(segmentation_from_masks(out["masks"][0]))
        overlay = viz.overlay_segmentations(videos[0], seg)
        viz.make_gif(np.asarray(out["recons_imgs"][0]),
                     os.path.join(seq_dir, "recons.gif"))
        viz.make_gif(overlay, os.path.join(seq_dir, "segmentation.gif"))
        print_(f"saved figures for seq {i} -> {seq_dir}")


def _load_pred_setup(args):
    pred_path = os.path.join(args.exp_directory, "predictors", args.name_pred_exp)
    Logger(pred_path)
    exp_params = Config.load(pred_path)
    savi = setup_model(exp_params["model"])
    savi_vars = resolve_savi_params(args.exp_directory, args.savi_ckpt)
    predictor = setup_predictor(
        exp_params["predictor"], savi_params=exp_params["model"]["model_params"])
    pred_vars = resolve_predictor_variables(
        pred_path, args.checkpoint,
        predictor_name=exp_params["predictor"]["predictor_name"])
    return pred_path, exp_params, savi, savi_vars, predictor, pred_vars


@log_function
def figs_pred(argv=None):
    p = argparse.ArgumentParser(description="Generate prediction figures/GIFs")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--name_pred_exp", required=True)
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num_seqs", type=int, default=10)
    p.add_argument("--num_seed", type=int, default=6)
    p.add_argument("--num_preds", type=int, default=15)
    args = p.parse_args(argv)

    pred_path, exp_params, savi, savi_vars, predictor, pred_vars = \
        _load_pred_setup(args)
    exp_params["dataset"]["num_frames"] = args.num_seed + args.num_preds
    ds = load_data(exp_params, split="test")
    loader = build_data_loader(ds, batch_size=1, shuffle=False)
    out_root = os.path.join(pred_path, "plots", "figs_pred")

    @jax.jit
    def fwd(savi_p, pred_v, videos, k1, k2):
        out = savi.apply({"params": savi_p}, videos, decode=True,
                         rngs={"slots": k1})
        preds = predictor.apply(
            pred_v, out["slot_history"], num_samples=1, num_seed=args.num_seed,
            num_preds=args.num_preds, use_posterior=True, rngs={"action": k2},
            method=lambda m, *a, **k: m.forward_multiple_samples(*a, **k))
        imgs, objs, masks = savi.apply({"params": savi_p}, preds[:, 0],
                                       method=lambda m, s: m.decode_fast(s))
        return (jnp.clip(imgs, 0, 1), objs, masks,
                out["recons_objs"], out["masks"])

    key = jax.random.PRNGKey(0)
    for i, batch in enumerate(loader):
        if i >= args.num_seqs:
            break
        videos, _, _, _ = unwrap_batch_data(exp_params, batch)
        key, k1, k2 = jax.random.split(key, 3)
        imgs, objs, masks, rec_objs, rec_masks = fwd(
            savi_vars["params"], pred_vars, jnp.asarray(videos), k1, k2)
        seed = videos[0, :args.num_seed]
        target = videos[0, args.num_seed:args.num_seed + args.num_preds]
        seq_psnr = float(np.mean(np.asarray(psnr(imgs[0], jnp.asarray(target)))))
        seq_dir = os.path.join(out_root, f"seq_{i:03d}_psnr={seq_psnr:.2f}")
        pred_imgs = np.asarray(imgs[0])
        objs, masks = np.asarray(objs[0]), np.asarray(masks[0])
        seed_objs = np.asarray(rec_objs[0, :args.num_seed])
        seed_masks = np.asarray(rec_masks[0, :args.num_seed])

        viz.visualize_recons(target, pred_imgs,
                             savepath=os.path.join(seq_dir, "preds.png"))
        viz.visualize_decomp(objs, masks=masks,
                             savepath=os.path.join(seq_dir, "decomp.png"))
        # the reference's per-sequence artifact set
        # (06_generate_figs_pred.py:153-232)
        all_objs = np.concatenate([
            np.stack([[viz.add_border(o, "green") for o in frame]
                      for frame in seed_objs * seed_masks]),
            np.stack([[viz.add_border(o, "red") for o in frame]
                      for frame in objs * masks])], axis=0)
        viz.visualize_aligned_slots(
            all_objs, savepath=os.path.join(seq_dir, "aligned_slots.png"))
        viz.visualize_qualitative_eval(
            seed, target, pred_imgs,
            savepath=os.path.join(seq_dir, "qual_eval_rgb.png"))
        seg = np.asarray(segmentation_from_masks(
            np.concatenate([seed_masks[None], masks[None]], axis=1)))[0]
        gt_frames = np.concatenate([seed, target], axis=0)
        pred_frames = np.concatenate([seed, pred_imgs], axis=0)
        viz.make_gif(gt_frames, os.path.join(seq_dir, "gt_GIF_frames.gif"),
                     n_seed=len(gt_frames), use_border=True)
        viz.make_gif(pred_frames, os.path.join(seq_dir, "pred_GIF_frames.gif"),
                     n_seed=args.num_seed, use_border=True)
        viz.make_gif(viz.masks_to_rgb(seg),
                     os.path.join(seq_dir, "masks_GIF_masks.gif"),
                     n_seed=args.num_seed, use_border=True)
        viz.make_gif(viz.overlay_segmentations(pred_frames, seg),
                     os.path.join(seq_dir, "overlay_GIF.gif"),
                     n_seed=args.num_seed, use_border=True)
        for obj_id in range(all_objs.shape[1]):
            viz.make_gif(all_objs[:, obj_id],
                         os.path.join(seq_dir, f"obj_{obj_id + 1}.gif"))
        print_(f"saved prediction figures for seq {i} (psnr {seq_psnr:.2f})")


@log_function
def figs_action(argv=None):
    p = argparse.ArgumentParser(
        description="Rollouts conditioned on each action prototype")
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--name_pred_exp", required=True)
    p.add_argument("--savi_ckpt", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num_seqs", type=int, default=3)
    p.add_argument("--num_seed", type=int, default=1)
    p.add_argument("--num_preds", type=int, default=10)
    args = p.parse_args(argv)

    pred_path, exp_params, savi, savi_vars, predictor, pred_vars = \
        _load_pred_setup(args)
    num_actions = exp_params["predictor"]["predictor_params"]["num_actions"]
    exp_params["dataset"]["num_frames"] = max(
        args.num_seed + args.num_preds, exp_params["dataset"].get("num_frames", 0))
    ds = load_data(exp_params, split="test")
    loader = build_data_loader(ds, batch_size=1, shuffle=False)
    out_root = os.path.join(pred_path, "plots", "figs_action")

    # codebook diagnostics
    cb = np.asarray(
        pred_vars.get("vq", {}).get("latent_action", {}).get("quantizer", {})
        .get("codebook",
             pred_vars["params"]["latent_action"]["quantizer"].get("codebook")))
    viz.visualize_distance_between_centroids(
        cb, os.path.join(out_root, "codebook_distances.png"))

    num_slots = exp_params["model"]["model_params"]["num_slots"]

    @jax.jit
    def rollout_with_action(savi_p, pred_v, videos, action_idx, k1):
        slots = savi.apply({"params": savi_p}, videos, decode=False,
                           rngs={"slots": k1})["slot_history"]
        seed_slots = slots[:, :args.num_seed]
        L = args.num_seed + args.num_preds
        protos = predictor.apply(
            pred_v, action_idx,
            method=lambda m, ai: m.latent_action.quantizer.get_codebook_entry(ai))
        protos = jnp.tile(protos[None, None, None, :], (1, L, num_slots, 1))
        use_var = getattr(predictor, "use_variability", False)
        avars = jnp.zeros_like(protos) if use_var else None
        preds, _ = predictor.apply(
            pred_v, seed_slots, protos, avars, args.num_preds,
            method=lambda m, s, pr, av, n: m.autoregressive_inference(
                s, action_protos=pr, action_vars=av, N=n))
        imgs, _, _ = savi.apply({"params": savi_p}, preds,
                                method=lambda m, s: m.decode_fast(s))
        return jnp.clip(imgs, 0, 1)

    key = jax.random.PRNGKey(0)
    for i, batch in enumerate(loader):
        if i >= args.num_seqs:
            break
        videos, _, _, _ = unwrap_batch_data(exp_params, batch)
        for a in range(num_actions):
            key, k1 = jax.random.split(key)
            imgs = rollout_with_action(savi_vars["params"], pred_vars,
                                       jnp.asarray(videos), jnp.int32(a), k1)
            seq_dir = os.path.join(out_root, f"seq_{i:03d}")
            viz.make_gif(np.asarray(imgs[0]),
                         os.path.join(seq_dir, f"action_{a}.gif"))
        print_(f"saved action rollouts for seq {i}")


if __name__ == "__main__":
    figs_savi()
