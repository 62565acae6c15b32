"""
LPIPS numerics validation (VERDICT r1 item 3).

Neither piqa nor torchvision ships in this image, and pretrained AlexNet
weights are egress-blocked — but the LPIPS *math* is fully checkable today:
build a random-weight AlexNet-LPIPS golden in raw torch (replicating the
richzhang/PerceptualSimilarity forward that piqa wraps — reference
src/lib/metrics.py:289-321), export it in the exact .npz layout written by
tools/export_lpips_weights.py, and assert the JAX LPIPS
(playslot_tpu.utils.metrics.LPIPS) matches to 1e-5.

Note the richzhang normalization constants (shift=2*mean-1, scale=2*std on
[-1,1] inputs) are algebraically identical to piqa's ImageNet normalization
of [0,1] inputs, so this golden covers both conventions.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

# torchvision AlexNet feature-extractor geometry (LPIPS taps relu1..relu5)
ALEX_SHAPES = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
               (256, 384, 3, 3), (256, 256, 3, 3)]
STRIDES = (4, 1, 1, 1, 1)
PADS = (2, 2, 1, 1, 1)
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _random_lpips_weights(seed=0):
    """Random weights in the exporter's npz layout (HWIO kernels)."""
    rng = np.random.RandomState(seed)
    out = {}
    for i, (co, ci, kh, kw) in enumerate(ALEX_SHAPES):
        w = rng.randn(co, ci, kh, kw).astype(np.float32) * 0.1
        out[f"feat{i}/kernel"] = w.transpose(2, 3, 1, 0)
        out[f"feat{i}/bias"] = rng.randn(co).astype(np.float32) * 0.1
        # richzhang lin heads are non-negative 1x1 convs
        out[f"lin{i}/kernel"] = np.abs(
            rng.randn(1, 1, co, 1).astype(np.float32)) * 0.05
    out["shift"] = SHIFT
    out["scale"] = SCALE
    return out


def _torch_lpips_golden(w, preds, targets):
    """richzhang AlexNet-LPIPS forward in raw torch. preds/targets: NHWC
    [0,1] numpy -> (N,) distances."""

    def feats(x_nhwc):
        x = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)).double() * 2 - 1
        shift = torch.from_numpy(w["shift"]).double().view(1, 3, 1, 1)
        scale = torch.from_numpy(w["scale"]).double().view(1, 3, 1, 1)
        x = (x - shift) / scale
        out = []
        for i in range(5):
            k = torch.from_numpy(
                w[f"feat{i}/kernel"].transpose(3, 2, 0, 1)).double()
            b = torch.from_numpy(w[f"feat{i}/bias"]).double()
            x = F.relu(F.conv2d(x, k, b, stride=STRIDES[i], padding=PADS[i]))
            out.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, kernel_size=3, stride=2)
        return out

    fx, fy = feats(preds), feats(targets)
    dist = torch.zeros(preds.shape[0], dtype=torch.float64)
    for i, (a, b) in enumerate(zip(fx, fy)):
        na = a / torch.sqrt((a ** 2).sum(1, keepdim=True) + 1e-10)
        nb = b / torch.sqrt((b ** 2).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        lin = torch.from_numpy(
            w[f"lin{i}/kernel"].transpose(3, 2, 0, 1)).double()
        d = F.conv2d(d, lin)
        dist = dist + d.mean(dim=(1, 2, 3))
    return dist.numpy()


def test_lpips_matches_torch_golden(tmp_path):
    from playslot_tpu.utils.metrics import LPIPS

    w = _random_lpips_weights()
    path = str(tmp_path / "lpips_rand.npz")
    np.savez(path, **w)

    rng = np.random.RandomState(1)
    preds = rng.rand(3, 64, 64, 3).astype(np.float32)
    targets = rng.rand(3, 64, 64, 3).astype(np.float32)

    golden = _torch_lpips_golden(w, preds, targets)
    lp = LPIPS(weights_path=path)
    assert lp.available
    got = np.asarray(lp(preds, targets))
    assert got.shape == (3,)
    assert np.allclose(got, golden, rtol=1e-5, atol=1e-5), \
        f"LPIPS mismatch: jax={got} torch={golden}"
    # identical inputs -> exactly zero distance
    assert np.allclose(np.asarray(lp(preds, preds)), 0.0, atol=1e-7)


def test_lpips_metric_tracker_integration(tmp_path, monkeypatch):
    """MetricTracker picks up lpips when PLAYSLOT_LPIPS_WEIGHTS is set and
    aggregates framewise like psnr/ssim (reference metrics.py:110-157)."""
    from playslot_tpu.utils.metrics import MetricTracker

    path = str(tmp_path / "lpips_rand.npz")
    np.savez(path, **_random_lpips_weights())
    monkeypatch.setenv("PLAYSLOT_LPIPS_WEIGHTS", path)

    tracker = MetricTracker(metrics=("psnr", "lpips"))
    assert set(tracker.metrics) == {"psnr", "lpips"}
    rng = np.random.RandomState(2)
    preds = rng.rand(2, 4, 32, 32, 3).astype(np.float32)
    targets = rng.rand(2, 4, 32, 32, 3).astype(np.float32)
    tracker.accumulate(preds, targets)
    res = tracker.aggregate()
    assert np.isfinite(res["lpips"]["mean"]) and res["lpips"]["mean"] > 0
    assert len(res["lpips"]["framewise"]) == 4
