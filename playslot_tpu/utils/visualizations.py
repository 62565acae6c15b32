"""
Visualization toolkit: frame grids, object decompositions, segmentations,
GIFs, metric plots and codebook diagnostics.

Capability parity with reference src/lib/visualizations.py (the subset every
entry script uses: visualize_sequence / visualize_recons / visualize_decomp,
masks_to_rgb / overlay_segmentations, make_gif, metric plots,
visualize_bins_count / distance-between-centroids).
All inputs are channels-last numpy/jax arrays in [0, 1].
"""

import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


COLORS = np.asarray([
    [1.0, 1.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.5, 0.0], [0.5, 0.5, 0.0],
    [1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.5, 0.0, 0.5], [1.0, 0.65, 0.0],
    [0.0, 1.0, 1.0], [0.65, 0.16, 0.16], [1.0, 0.75, 0.8], [1.0, 0.55, 0.0],
    [0.58, 0.0, 0.83], [0.0, 1.0, 0.5], [0.0, 1.0, 1.0], [0.25, 0.41, 0.88],
])


def _to_numpy(x):
    return np.asarray(x)


def visualize_sequence(frames, savepath=None, n_cols=None, titles=None,
                       suptitle=None):
    """Grid of frames (T, H, W, C)."""
    frames = np.clip(_to_numpy(frames), 0, 1)
    T = frames.shape[0]
    n_cols = n_cols or min(T, 10)
    n_rows = -(-T // n_cols)
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(2 * n_cols, 2 * n_rows),
                             squeeze=False)
    for i in range(n_rows * n_cols):
        ax = axes[i // n_cols][i % n_cols]
        ax.axis("off")
        if i < T:
            ax.imshow(frames[i])
            if titles is not None and i < len(titles):
                ax.set_title(titles[i], fontsize=8)
    if suptitle:
        fig.suptitle(suptitle)
    fig.tight_layout()
    if savepath:
        os.makedirs(os.path.dirname(savepath), exist_ok=True)
        fig.savefig(savepath, dpi=100)
        plt.close(fig)
        return None
    return fig


def visualize_recons(imgs, recons, savepath=None, n_cols=10):
    """Two-row comparison: ground truth on top, reconstructions below."""
    imgs = np.clip(_to_numpy(imgs), 0, 1)
    recons = np.clip(_to_numpy(recons), 0, 1)
    T = min(imgs.shape[0], n_cols)
    fig, axes = plt.subplots(2, T, figsize=(2 * T, 4.2), squeeze=False)
    for t in range(T):
        axes[0][t].imshow(imgs[t]); axes[0][t].axis("off")
        axes[1][t].imshow(recons[t]); axes[1][t].axis("off")
    axes[0][0].set_ylabel("GT")
    axes[1][0].set_ylabel("Recons")
    fig.tight_layout()
    if savepath:
        os.makedirs(os.path.dirname(savepath), exist_ok=True)
        fig.savefig(savepath, dpi=100)
        plt.close(fig)
        return None
    return fig


def visualize_decomp(objs, masks=None, savepath=None, suptitle=None):
    """
    Per-slot decomposition strip: rows = time, cols = slots.
    objs: (T, S, H, W, C); masks: (T, S, H, W, 1) optional multiplier.
    """
    objs = np.clip(_to_numpy(objs), 0, 1)
    if masks is not None:
        objs = objs * _to_numpy(masks)
    T, S = objs.shape[:2]
    fig, axes = plt.subplots(T, S, figsize=(1.6 * S, 1.6 * T), squeeze=False)
    for t in range(T):
        for s in range(S):
            axes[t][s].imshow(objs[t, s])
            axes[t][s].axis("off")
    if suptitle:
        fig.suptitle(suptitle)
    fig.tight_layout()
    if savepath:
        os.makedirs(os.path.dirname(savepath), exist_ok=True)
        fig.savefig(savepath, dpi=100)
        plt.close(fig)
        return None
    return fig


def masks_to_rgb(seg):
    """(..., H, W) int segmentation -> (..., H, W, 3) color image."""
    seg = _to_numpy(seg).astype(int) % len(COLORS)
    return COLORS[seg]


def overlay_segmentations(imgs, seg, alpha=0.6):
    """Blend color-coded segmentation over frames."""
    rgb = masks_to_rgb(seg)
    imgs = np.clip(_to_numpy(imgs), 0, 1)
    return np.clip((1 - alpha) * imgs + alpha * rgb, 0, 1)


def make_gif(frames, savepath, fps=8):
    """(T, H, W, C) in [0,1] -> animated gif."""
    import imageio
    frames = (np.clip(_to_numpy(frames), 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(savepath) or ".", exist_ok=True)
    imageio.mimsave(savepath, list(frames), duration=1000 / fps, loop=0)


def plot_metric_framewise(framewise, metric_name, savepath, start_idx=0):
    """Per-frame metric curve (reference metrics.py:110-157 plots)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    xs = np.arange(start_idx, start_idx + len(framewise))
    ax.plot(xs, framewise, marker="o")
    ax.set_xlabel("frame")
    ax.set_ylabel(metric_name)
    ax.grid(alpha=0.3)
    os.makedirs(os.path.dirname(savepath), exist_ok=True)
    fig.savefig(savepath, dpi=100)
    plt.close(fig)


def plot_loss_curves(losses_json, savepath):
    """Train/valid total-loss curves from the trainer's losses.json dict."""
    epochs = sorted(losses_json.keys(), key=int)
    tr = [losses_json[e]["train"].get("_total", np.nan) for e in epochs]
    va = [losses_json[e]["valid"].get("_total", np.nan) for e in epochs]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot([int(e) for e in epochs], tr, label="train")
    ax.plot([int(e) for e in epochs], va, label="valid")
    ax.set_xlabel("epoch"); ax.set_ylabel("total loss"); ax.legend()
    ax.grid(alpha=0.3)
    os.makedirs(os.path.dirname(savepath), exist_ok=True)
    fig.savefig(savepath, dpi=100)
    plt.close(fig)


def visualize_bins_count(bins, savepath):
    """Codebook usage histogram (reference visualizations.py:705)."""
    bins = _to_numpy(bins)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.bar(np.arange(len(bins)), bins)
    ax.set_xlabel("codeword"); ax.set_ylabel("usage")
    os.makedirs(os.path.dirname(savepath), exist_ok=True)
    fig.savefig(savepath, dpi=100)
    plt.close(fig)


def visualize_distance_between_centroids(codebook, savepath):
    """Pairwise codeword distance matrix (reference visualizations.py:721)."""
    cb = _to_numpy(codebook)
    d = np.linalg.norm(cb[:, None] - cb[None, :], axis=-1)
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(d, cmap="viridis")
    fig.colorbar(im)
    ax.set_title("codeword L2 distances")
    os.makedirs(os.path.dirname(savepath), exist_ok=True)
    fig.savefig(savepath, dpi=100)
    plt.close(fig)
