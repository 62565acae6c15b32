"""
Loss registry + weighted multi-loss computation.

Capability parity with reference src/lib/loss.py: the same registry keys
(mse, pred_img_mse, pred_slot_mse, latent_action_mse, action_mse,
ActionDirKLD, VQLoss) and the same weighting/accumulation semantics, but as
pure jittable functions. Host-side running averages live in LossTracker.
"""

import jax.numpy as jnp
import numpy as np


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


def mse_loss(pred_imgs=None, target_imgs=None, **_):
    return _mse(pred_imgs, target_imgs)


def pred_img_mse(pred_imgs=None, target_imgs=None, **_):
    return _mse(pred_imgs, target_imgs)


def pred_slot_mse(preds=None, targets=None, **_):
    return _mse(preds, targets)


def latent_action_mse(pred_action_embs=None, target_action_embs=None, **_):
    return _mse(pred_action_embs, target_action_embs)


def action_mse(pred_actions=None, target_actions=None, **_):
    return _mse(pred_actions, target_actions)


def action_dir_kld(action_directions_dist=None, cov=1.0, **_):
    """
    Gaussian KLD pushing the action-direction distribution towards N(0, cov I)
    (reference loss.py:265-310; note prior/posterior naming mirrored as-is).
    action_directions_dist: (B, T, 2, ...) stack of [mean, std].
    """
    mean = action_directions_dist[:, :, 0]
    std = action_directions_dist[:, :, 1]
    mu_post = jnp.zeros_like(mean)
    sigma_post = jnp.ones_like(std) * cov
    sigma_prior = std
    logvar_prior = jnp.log(std)
    kld_1 = jnp.log(sigma_prior / sigma_post)
    kld_2 = (jnp.exp(jnp.log(sigma_post)) + (mu_post - mean) ** 2) / \
        (2 * jnp.exp(logvar_prior))
    return jnp.mean(kld_1 + kld_2 - 0.5)


def vq_loss(quant_loss=None, commit_loss=None, beta=0.25, **_):
    """Returns a DICT of components (reference loss.py:319-340)."""
    return {
        "vq_quant_loss": jnp.mean(quant_loss),
        "vq_commit_loss": beta * jnp.mean(commit_loss),
    }


def slot_smoothness(slot_history=None, **_):
    """Mean squared temporal slot difference — TPU-framework EXTENSION (no
    reference counterpart). Dampens frame-to-frame slot jitter, the measured
    killer of the latent-action channel: on the failing study seed the GT
    action explained only 0.17% of slot-difference variance vs 0.7-2.2% on
    working seeds (docs/BEHAVIOR_STUDY.md round-3 forensics,
    tools/probe_slotdiff_channel.py). Keep the weight small: genuine object
    motion lives in the same differences. Measured head-to-head at w=0.1 on
    the failing study stream, regularizing LOST to SNR-gated selection —
    sub-gate SNR (0.0028-0.0043), broken agent probes, oracle 0.40,
    closed-loop 0.03/0.07 (experiments/GridShapesSmooth/SMOOTH_RESULTS.json,
    docs/BEHAVIOR_STUDY.md) — so this stays a default-off extension."""
    d = slot_history[:, 1:] - slot_history[:, :-1]
    return jnp.mean(d * d)


LOSS_DICT = {
    "mse": mse_loss,
    "slot_smoothness": slot_smoothness,
    "pred_img_mse": pred_img_mse,
    "pred_slot_mse": pred_slot_mse,
    "latent_action_mse": latent_action_mse,
    "action_mse": action_mse,
    "ActionDirKLD": action_dir_kld,
    "VQLoss": vq_loss,
}


def compute_losses(loss_cfg, **tensors):
    """
    Evaluate every configured loss; returns (total, dict-of-scalars).
    Dict-valued losses (VQLoss) contribute each component, every component
    scaled by the configured weight — matching reference LossTracker
    (loss.py:66-92).
    """
    values = {}
    total = 0.0
    for item in loss_cfg:
        kind = item["type"]
        weight = item.get("weight", 1.0)
        kwargs = {k: v for k, v in item.items() if k not in ("type", "weight")}
        out = LOSS_DICT[kind](**tensors, **kwargs)
        if isinstance(out, dict):
            for k, v in out.items():
                values[k] = v
                total = total + weight * v
        else:
            values[kind] = out
            total = total + weight * out
    values["_total"] = total
    return total, values


class LossTracker:
    """
    Running average of per-iteration loss dicts. Values may be live device
    scalars — they are only fetched in summary(), so the train loop never
    synchronizes with the device per step (important on high-latency
    relayed TPU backends).
    """

    def __init__(self):
        self.records = []

    def accumulate(self, loss_dict):
        self.records.append(dict(loss_dict))

    def summary(self):
        if not self.records:
            return {}
        import jax
        host = jax.device_get(self.records)
        sums, counts = {}, {}
        for rec in host:
            for k, v in rec.items():
                v = float(np.asarray(v))
                if not np.isfinite(v):
                    import warnings
                    warnings.warn(f"Loss '{k}' is not finite: {v}")
                sums[k] = sums.get(k, 0.0) + v
                counts[k] = counts.get(k, 0) + 1
        return {k: sums[k] / max(counts[k], 1) for k in sums}

    def reset(self):
        self.records = []
