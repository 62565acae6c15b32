"""
Evaluation metrics in JAX: PSNR / SSIM / LPIPS / mIoU.

Capability parity with reference src/lib/metrics.py (PSNR/SSIM/LPIPS via
piqa, MetricTracker with framewise aggregation + best-of-N trial selection)
plus the segmentation mIoU required by BASELINE.md (the reference only
visualizes `masks.argmax(dim=slots)`; we score it).

All metric kernels are pure jittable functions over (B, F, H, W, C)
channels-last videos in [0, 1]. LPIPS follows the standard AlexNet-LPIPS
architecture; pretrained weights must be supplied as an .npz (no network
egress in this environment) via PLAYSLOT_LPIPS_WEIGHTS — otherwise the
metric reports as unavailable.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment


# ----------------------------------------------------------------- PSNR

def psnr(preds, targets, max_val=1.0, eps=1e-8):
    """Per-frame PSNR. preds/targets: (..., H, W, C) -> (...) scalars."""
    mse = jnp.mean((preds - targets) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val ** 2 / (mse + eps))


# ----------------------------------------------------------------- SSIM

def _gaussian_kernel(window_size=11, sigma=1.5):
    x = np.arange(window_size) - (window_size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return jnp.asarray(g / g.sum(), dtype=jnp.float32)


def _filter2d_separable(img, kernel):
    """Depthwise separable gaussian filter. img: (N, H, W, C), VALID padding."""
    k = kernel.shape[0]
    C = img.shape[-1]
    kh = jnp.tile(kernel.reshape(k, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(kernel.reshape(1, k, 1, 1), (1, 1, 1, C))
    dn = ("NHWC", "HWIO", "NHWC")
    out = jax.lax.conv_general_dilated(img, kh, (1, 1), "VALID",
                                       dimension_numbers=dn, feature_group_count=C)
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), "VALID",
                                       dimension_numbers=dn, feature_group_count=C)
    return out


def ssim(preds, targets, max_val=1.0, window_size=11, sigma=1.5, k1=0.01, k2=0.03):
    """
    Structural similarity with gaussian window (standard Wang et al. config,
    matching piqa defaults). preds/targets: (N, H, W, C) -> (N,) scalars.
    """
    kernel = _gaussian_kernel(window_size, sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_x = _filter2d_separable(preds, kernel)
    mu_y = _filter2d_separable(targets, kernel)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d_separable(preds * preds, kernel) - mu_xx
    sigma_yy = _filter2d_separable(targets * targets, kernel) - mu_yy
    sigma_xy = _filter2d_separable(preds * targets, kernel) - mu_xy

    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_xx + sigma_yy + c2)
    return jnp.mean(num / den, axis=(-3, -2, -1))


# ----------------------------------------------------------------- mIoU

def segmentation_from_masks(masks):
    """Per-pixel slot assignment: (..., S, H, W, 1) alpha masks -> (..., H, W)."""
    return jnp.argmax(masks[..., 0], axis=-3)


def miou_framewise(pred_seg, gt_seg, num_pred, num_gt, hungarian=True):
    """
    Mean IoU between predicted slot segmentation and ground-truth instance
    segmentation for ONE frame pair (host-side numpy; Hungarian matching
    between slot ids and GT ids, the standard object-centric protocol).
    """
    pred_seg = np.asarray(pred_seg)
    gt_seg = np.asarray(gt_seg)
    inter = np.zeros((num_gt, num_pred))
    union = np.zeros((num_gt, num_pred))
    for g in range(num_gt):
        gm = gt_seg == g
        if not gm.any():
            continue
        for p in range(num_pred):
            pm = pred_seg == p
            inter[g, p] = np.logical_and(gm, pm).sum()
            union[g, p] = np.logical_or(gm, pm).sum()
    iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    valid = np.array([np.any(gt_seg == g) for g in range(num_gt)])
    if hungarian:
        # one-to-one matching returns min(num_gt, num_pred) pairs; GT objects
        # left unmatched (more objects than slots) must still count as 0 in
        # the mean, not be dropped — otherwise a model capturing 4 of 8
        # objects perfectly would score 1.0
        rows, cols = linear_sum_assignment(-iou)
        matched = np.zeros(num_gt)
        matched[rows] = iou[rows, cols]
        return float(matched[valid].mean()) if valid.any() else 0.0
    best = iou.max(axis=1)
    return float(best[valid].mean()) if valid.any() else 0.0


# ----------------------------------------------------------------- LPIPS

class LPIPS:
    """
    AlexNet-LPIPS (Zhang et al. 2018) in JAX. Weights: npz with alexnet conv
    kernels `feat{0..4}/kernel|bias` (HWIO) and linear heads `lin{0..4}`
    (1x1 conv kernels), plus `shift`/`scale` normalization constants.
    """

    STRIDES = (4, 1, 1, 1, 1)
    PADS = (2, 2, 1, 1, 1)

    def __init__(self, weights_path=None):
        weights_path = weights_path or os.environ.get("PLAYSLOT_LPIPS_WEIGHTS")
        self.available = bool(weights_path) and os.path.exists(weights_path or "")
        if self.available:
            self.w = {k: jnp.asarray(v) for k, v in np.load(weights_path).items()}

    def __call__(self, preds, targets):
        """preds/targets: (N, H, W, 3) in [0, 1] -> (N,) distances."""
        if not self.available:
            raise RuntimeError(
                "LPIPS weights not available; set PLAYSLOT_LPIPS_WEIGHTS to an "
                "exported .npz (see tools/export_lpips_weights.py)")
        x = self._feats(preds * 2 - 1)
        y = self._feats(targets * 2 - 1)
        dist = 0.0
        for i, (fx, fy) in enumerate(zip(x, y)):
            nx = fx / jnp.sqrt(jnp.sum(fx ** 2, -1, keepdims=True) + 1e-10)
            ny = fy / jnp.sqrt(jnp.sum(fy ** 2, -1, keepdims=True) + 1e-10)
            d = (nx - ny) ** 2
            lin = self.w[f"lin{i}/kernel"]  # (1, 1, C, 1)
            d = jax.lax.conv_general_dilated(
                d, lin, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            dist = dist + jnp.mean(d, axis=(1, 2, 3))
        return dist

    def _feats(self, x):
        x = (x - self.w["shift"]) / self.w["scale"]
        feats = []
        dn = ("NHWC", "HWIO", "NHWC")
        for i in range(5):
            k = self.w[f"feat{i}/kernel"]
            b = self.w[f"feat{i}/bias"]
            p = self.PADS[i]
            s = self.STRIDES[i]
            x = jax.lax.conv_general_dilated(
                x, k, (s, s), [(p, p), (p, p)], dimension_numbers=dn) + b
            x = jax.nn.relu(x)
            feats.append(x)
            if i in (0, 1):  # maxpool after conv1 and conv2 (and before conv3)
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        return feats


# ----------------------------------------------------------- tracking

class Metric:
    LOWER_BETTER = False

    def __init__(self, fn, lower_better=False, name=""):
        self.fn = fn
        self.LOWER_BETTER = lower_better
        self.name = name
        self.values = []

    def reset(self):
        self.values = []

    def accumulate(self, preds, targets):
        """preds/targets: (B, F, H, W, C); stores (B, F) per-frame scores."""
        B, F = preds.shape[0], preds.shape[1]
        flat_p = preds.reshape(B * F, *preds.shape[2:])
        flat_t = targets.reshape(B * F, *targets.shape[2:])
        vals = np.asarray(self.fn(flat_p, flat_t)).reshape(B, F)
        self.values.append(vals)
        return vals.mean()

    def get_best_trial(self, num_trials):
        """Best-of-N selection for stochastic eval (metrics.py:171-188)."""
        scores = self.values[-1]
        B = scores.shape[0] // num_trials
        scores = scores.reshape(B, num_trials, *scores.shape[1:])
        mean_per_trial = scores.mean(axis=-1)
        best = np.argmin(mean_per_trial, 1) if self.LOWER_BETTER \
            else np.argmax(mean_per_trial, 1)
        self.values[-1] = scores[np.arange(B), best]

    def aggregate(self):
        all_vals = np.concatenate(self.values, axis=0)
        return float(all_vals.mean()), all_vals.mean(axis=0)


def _psnr_fn(p, t):
    return psnr(p, t)


METRICS_DICT = {
    "psnr": lambda: Metric(jax.jit(psnr), lower_better=False, name="psnr"),
    "ssim": lambda: Metric(jax.jit(ssim), lower_better=False, name="ssim"),
    "lpips": lambda: Metric(LPIPS(), lower_better=True, name="lpips"),
}


class MetricTracker:
    """Multi-metric accumulator with JSON export (metrics.py:17-157)."""

    def __init__(self, metrics=("psnr", "ssim")):
        self.metrics = {}
        for m in metrics:
            if m == "lpips":
                lp = LPIPS()
                if not lp.available:
                    import warnings
                    warnings.warn("LPIPS weights unavailable; skipping lpips metric")
                    continue
            self.metrics[m] = METRICS_DICT[m]()

    def reset(self):
        for m in self.metrics.values():
            m.reset()

    def accumulate(self, preds, targets):
        return {k: m.accumulate(preds, targets) for k, m in self.metrics.items()}

    def get_best_trial(self, num_trials):
        for m in self.metrics.values():
            m.get_best_trial(num_trials)

    def aggregate(self):
        out = {}
        for k, m in self.metrics.items():
            mean, framewise = m.aggregate()
            out[k] = {"mean": mean, "framewise": [float(v) for v in framewise]}
        return out

    def save_results(self, path):
        results = self.aggregate()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"results": results}, f, indent=4)
        return results
