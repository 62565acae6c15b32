"""
Evaluators: SAVi reconstruction eval + stochastic PlaySlot video-prediction
eval (posterior + best-of-N prior).

Capability parity with reference src/base/baseEvaluator.py,
src/03_evaluate_savi.py and src/05_evaluate_PlaySlot.py. The model forward
(SAVi encode -> N stochastic rollouts -> batched decode) is ONE jitted
function; metric accumulation happens host-side.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from playslot_tpu.config import Config
from playslot_tpu.data.loader import build_data_loader, load_data, unwrap_batch_data
from playslot_tpu.models.factory import setup_model, setup_predictor
from playslot_tpu.utils.logger import print_
from playslot_tpu.utils.metrics import MetricTracker, miou_framewise, segmentation_from_masks


DEFAULT_METRICS = ("psnr", "ssim", "lpips")


class SAViEvaluator:
    """Full-sequence SAVi reconstruction eval (03_evaluate_savi.py)."""

    def __init__(self, exp_path, savi_params, batch_size=None, results_name="savi_eval",
                 metrics=DEFAULT_METRICS, compute_miou=True):
        self.exp_path = exp_path
        self.exp_params = Config.load(exp_path)
        if batch_size:
            self.exp_params["training"]["batch_size"] = batch_size
        self.savi_params = savi_params
        self.results_name = results_name
        self.metrics = metrics
        self.compute_miou = compute_miou
        self.model = setup_model(self.exp_params["model"])
        self.rng = jax.random.PRNGKey(13)

        model = self.model

        @jax.jit
        def forward(params, videos, key):
            out = model.apply({"params": params}, videos, rngs={"slots": key})
            return (jnp.clip(out["recons_imgs"], 0, 1), out["masks"])

        self._forward = forward

    def evaluate(self, max_batches=None):
        ds = load_data(self.exp_params, split="test")
        loader = build_data_loader(
            ds, batch_size=self.exp_params["training"]["batch_size"], shuffle=False)
        tracker = MetricTracker(self.metrics)
        miou_scores = []
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            videos, _, _, others = unwrap_batch_data(self.exp_params, batch)
            videos = jnp.asarray(videos)
            self.rng, key = jax.random.split(self.rng)
            recons, masks = self._forward(self.savi_params["params"], videos, key)
            tracker.accumulate(np.asarray(recons), np.clip(np.asarray(videos), 0, 1))
            gt_masks = others.get("masks")
            if self.compute_miou and gt_masks is not None and gt_masks.size:
                pred_seg = np.asarray(segmentation_from_masks(masks))
                B, T = pred_seg.shape[:2]
                S = masks.shape[2]
                n_gt = int(gt_masks.max()) + 1
                for b in range(B):
                    for t in range(T):
                        miou_scores.append(miou_framewise(
                            pred_seg[b, t], gt_masks[b, t], S, n_gt))
        results = tracker.aggregate()
        if miou_scores:
            results["miou"] = {"mean": float(np.mean(miou_scores)), "framewise": []}
        out_dir = os.path.join(self.exp_path, "results", self.results_name)
        os.makedirs(out_dir, exist_ok=True)
        import json
        with open(os.path.join(out_dir, "results.json"), "w") as f:
            json.dump({"results": results}, f, indent=4)
        print_(f"SAVi eval results: { {k: v['mean'] for k, v in results.items()} }")
        return results


class PlaySlotEvaluator:
    """
    Stochastic video-prediction eval: posterior + best-of-(N-1) prior samples
    (05_evaluate_PlaySlot.py). post_only=True -> single posterior sample.
    """

    def __init__(self, exp_path, savi_params, pred_variables, num_seed=6,
                 num_preds=15, num_samples=10, post_only=False, batch_size=None,
                 results_name="eval", metrics=DEFAULT_METRICS,
                 data_parallel_devices=None, decode_chunks=None):
        self.exp_path = exp_path
        self.exp_params = Config.load(exp_path)
        self.savi_params = savi_params
        self.pred_variables = pred_variables
        self.num_seed = num_seed
        self.num_preds = num_preds
        self.post_only = post_only
        self.num_samples = 1 if post_only else num_samples
        # full stochastic eval (num_samples rollouts, all decoded) defaults
        # to batch 1 for its working-set size, but an explicit batch_size
        # always wins; post_only defaults to the training batch size
        if batch_size:
            self.batch_size = batch_size
        else:
            self.batch_size = (self.exp_params["training"]["batch_size"]
                               if post_only else 1)
        self.results_name = results_name
        self.metrics = metrics
        # dataset must produce enough frames
        self.exp_params["dataset"]["num_frames"] = num_seed + num_preds

        self.savi = setup_model(self.exp_params["model"])
        self.predictor = setup_predictor(
            self.exp_params["predictor"],
            savi_params=self.exp_params["model"]["model_params"])

        savi, predictor = self.savi, self.predictor
        ns, npred, nsamp = self.num_seed, self.num_preds, self.num_samples
        # chunked decode (decode_fast_chunked) divides the eval decode
        # working set — lifts the large-batch HBM ceiling (PERFORMANCE.md)
        chunks = int(decode_chunks
                     or os.environ.get("PLAYSLOT_DECODE_CHUNKS", "1"))

        @jax.jit
        def forward(savi_p, pred_v, videos, k_slots, k_action):
            from playslot_tpu.engine.rollout import (
                batched_prior_rollout, posterior_rollout)
            out = savi.apply({"params": savi_p}, videos, decode=False,
                             rngs={"slots": k_slots})
            slots = out["slot_history"]
            k_post, k_prior = jax.random.split(k_action)
            post = posterior_rollout(predictor, pred_v, slots, ns, npred,
                                     rng=k_post)  # (B, npred, S, D)
            parts = [post[:, None]]
            if nsamp > 1:
                # all priors batched into one rollout (sample axis folded
                # into batch; the reference loops them in Python)
                priors = batched_prior_rollout(
                    predictor, pred_v, slots[:, :ns], nsamp - 1, npred,
                    rng=k_prior)
                parts.append(priors)
            preds = jnp.concatenate(parts, axis=1)  # (B, nsamp, npred, S, D)
            # fold the sample axis into the chunked leading dim so chunking
            # helps the full stochastic eval too (its default batch is 1 —
            # the memory-dominant axis there is B*nsamp, not B); snap the
            # requested chunk count to a divisor of B*nsamp (gcd) so the
            # env knob never crashes an eval it cannot split evenly
            flat = preds.reshape(-1, *preds.shape[2:])
            eff_chunks = math.gcd(chunks, flat.shape[0])
            pred_imgs, _, _ = savi.apply(
                {"params": savi_p}, flat,
                method=lambda m, s: m.decode_fast_chunked(s, eff_chunks))
            pred_imgs = pred_imgs.reshape(*preds.shape[:2],
                                          *pred_imgs.shape[1:])
            return jnp.clip(pred_imgs, 0, 1)  # (B, nsamp, npred, H, W, C)

        self._forward = forward
        self.rng = jax.random.PRNGKey(13)

        # optional multi-chip eval: batch sharded over the 'data' axis,
        # params replicated; jit propagates shardings into the forward
        self.mesh = None
        if data_parallel_devices and int(data_parallel_devices) > 1:
            from playslot_tpu.parallel.mesh import make_mesh
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.mesh = make_mesh(int(data_parallel_devices), model_parallel=1)
            rep = NamedSharding(self.mesh, P())
            self.savi_params = jax.device_put(self.savi_params, rep)
            self.pred_variables = jax.device_put(self.pred_variables, rep)

    def _shard(self, videos):
        if self.mesh is None:
            return videos
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(videos, NamedSharding(self.mesh, P("data")))

    def evaluate(self, max_batches=None, expert_policy=False):
        # swap in the expert-demo dataset WITHOUT mutating the shared config
        # (a later evaluate() on this instance must see the original dataset)
        data_params = self.exp_params
        if expert_policy:
            name = data_params["dataset"]["dataset_name"]
            if not name.endswith("_ExpertDemos"):
                data_params = {**dict(self.exp_params),
                               "dataset": {**self.exp_params["dataset"],
                                           "dataset_name":
                                               name + "_ExpertDemos"}}
        ds = load_data(data_params, split="test")
        loader = build_data_loader(ds, batch_size=self.batch_size, shuffle=False)

        post_tracker = MetricTracker(self.metrics)
        prior_tracker = MetricTracker(self.metrics)
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            videos, _, _, _ = unwrap_batch_data(self.exp_params, batch)
            videos = jnp.asarray(videos)
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            preds = np.asarray(self._forward(
                self.savi_params["params"], self.pred_variables,
                self._shard(videos), k1, k2))
            targets = np.clip(np.asarray(
                videos[:, self.num_seed:self.num_seed + self.num_preds]), 0, 1)

            if not self.post_only and self.num_samples > 1:
                prior = preds[:, 1:].reshape(-1, *preds.shape[2:])
                tiled_targets = np.repeat(targets, self.num_samples - 1, axis=0)
                prior_tracker.accumulate(prior, tiled_targets)
                prior_tracker.get_best_trial(self.num_samples - 1)
            post_tracker.accumulate(preds[:, 0], targets)

        results = {}
        pairs = [("Post", post_tracker)]
        if not self.post_only and self.num_samples > 1:
            pairs.append(("Prior", prior_tracker))
        import json
        for name, tracker in pairs:
            res = tracker.aggregate()
            results[name] = res
            out_dir = os.path.join(self.exp_path, "results",
                                   f"{name}_{self.results_name}")
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "results.json"), "w") as f:
                json.dump({"results": res}, f, indent=4)
            try:
                from playslot_tpu.utils.visualizations import plot_metric_framewise
                for mk, mv in res.items():
                    if mv.get("framewise"):
                        plot_metric_framewise(
                            mv["framewise"], mk,
                            os.path.join(out_dir, f"{mk}_framewise.png"),
                            start_idx=self.num_seed)
            except Exception:
                pass
            print_(f"{name} results: { {k: v['mean'] for k, v in res.items()} }")
        return results


class OCVPEvaluator:
    """
    Deterministic video-prediction eval for the unconditional OCVP family and
    ActionCondOCVP (reference src/05_evaluate_OCVP.py): AR rollout with the
    sliding input buffer (PredictorWrapper semantics) or GT-action
    conditioning, predictions cropped to the forecast horizon.
    """

    def __init__(self, exp_path, savi_params, pred_variables, num_seed=6,
                 num_preds=15, batch_size=None, results_name="eval_ocvp",
                 metrics=DEFAULT_METRICS):
        self.exp_path = exp_path
        self.exp_params = Config.load(exp_path)
        self.savi_params = savi_params
        self.pred_variables = pred_variables
        self.num_seed = num_seed
        self.num_preds = num_preds
        self.batch_size = batch_size or self.exp_params["training"]["batch_size"]
        self.results_name = results_name
        self.metrics = metrics
        self.exp_params["dataset"]["num_frames"] = num_seed + num_preds

        self.savi = setup_model(self.exp_params["model"])
        self.predictor_name = self.exp_params["predictor"]["predictor_name"]
        self.predictor = setup_predictor(
            self.exp_params["predictor"],
            savi_params=self.exp_params["model"]["model_params"])
        self.is_action_cond = self.predictor_name == "ActionCondOCVP"
        buffer_size = self.exp_params["prediction_params"].get(
            "input_buffer_size", 30)

        savi, predictor = self.savi, self.predictor
        ns, npred = self.num_seed, self.num_preds

        @jax.jit
        def forward(savi_p, pred_v, videos, actions, k_slots):
            from playslot_tpu.models.ocvp import predictor_wrapper_rollout
            slots = savi.apply({"params": savi_p}, videos, decode=False,
                               rngs={"slots": k_slots})["slot_history"]
            if self.is_action_cond:
                pred_slots, _ = predictor.apply(pred_v, slots, actions,
                                                num_seed=ns, num_preds=npred)
                pred_slots = pred_slots[:, ns - 1:ns + npred - 1]
            else:
                pred_slots = predictor_wrapper_rollout(
                    lambda s, _t: predictor.apply(pred_v, s), slots,
                    num_context=ns, num_preds=npred,
                    input_buffer_size=buffer_size, teacher_force=False,
                    get_pred_only=True)
            pred_imgs, _, _ = savi.apply({"params": savi_p}, pred_slots,
                                         method=lambda m, s: m.decode_fast(s))
            return jnp.clip(pred_imgs, 0, 1)

        self._forward = forward
        self.rng = jax.random.PRNGKey(13)

    def evaluate(self, max_batches=None, expert_policy=False):
        # swap in the expert-demo dataset WITHOUT mutating the shared config
        # (a later evaluate() on this instance must see the original dataset)
        data_params = self.exp_params
        if expert_policy:
            name = data_params["dataset"]["dataset_name"]
            if not name.endswith("_ExpertDemos"):
                data_params = {**dict(self.exp_params),
                               "dataset": {**self.exp_params["dataset"],
                                           "dataset_name":
                                               name + "_ExpertDemos"}}
        ds = load_data(data_params, split="test")
        loader = build_data_loader(ds, batch_size=self.batch_size, shuffle=False)
        tracker = MetricTracker(self.metrics)
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            videos, _, _, others = unwrap_batch_data(self.exp_params, batch)
            videos = jnp.asarray(videos)
            actions = others.get("actions")
            actions = jnp.asarray(actions, jnp.float32) \
                if actions is not None and actions.size else None
            self.rng, k = jax.random.split(self.rng)
            preds = np.asarray(self._forward(
                self.savi_params["params"], self.pred_variables, videos,
                actions, k))
            targets = np.clip(np.asarray(
                videos[:, self.num_seed:self.num_seed + self.num_preds]), 0, 1)
            tracker.accumulate(preds, targets)

        results = tracker.aggregate()
        out_dir = os.path.join(self.exp_path, "results", self.results_name)
        os.makedirs(out_dir, exist_ok=True)
        import json
        with open(os.path.join(out_dir, "results.json"), "w") as f:
            json.dump({"results": results}, f, indent=4)
        try:
            from playslot_tpu.utils.visualizations import plot_metric_framewise
            for k2, v in results.items():
                if v.get("framewise"):
                    plot_metric_framewise(
                        v["framewise"], k2,
                        os.path.join(out_dir, f"{k2}_framewise.png"),
                        start_idx=self.num_seed)
        except Exception:
            pass
        print_(f"OCVP eval results: { {k2: v['mean'] for k2, v in results.items()} }")
        return results
