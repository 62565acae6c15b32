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


def visualize_aligned_slots(recons_objs, savepath=None, fontsize=12):
    """
    Grid of reconstructed per-slot objects after alignment: rows = objects,
    cols = time steps (reference visualizations.py:133-165).
    recons_objs: (T, S, H, W, C) in [0, 1].
    """
    objs = np.clip(_to_numpy(recons_objs), 0, 1)
    T, S = objs.shape[:2]
    fig, axes = plt.subplots(S, T, figsize=(1.8 * T, 1.8 * S), squeeze=False)
    for t in range(T):
        for s in range(S):
            ax = axes[s][t]
            ax.imshow(objs[t, s], vmin=0, vmax=1)
            ax.set_xticks([]); ax.set_yticks([])
            if t == 0:
                ax.set_ylabel(f"Object {s + 1}", fontsize=fontsize)
            if s == 0:
                ax.set_title(f"Time Step {t + 1}", fontsize=fontsize)
    fig.tight_layout()
    if savepath:
        os.makedirs(os.path.dirname(savepath) or ".", exist_ok=True)
        fig.savefig(savepath, dpi=100)
        plt.close(fig)
        return None
    return fig


_BORDER_COLORS = {"green": (0.0, 0.8, 0.0), "red": (0.9, 0.0, 0.0),
                  "blue": (0.0, 0.0, 0.9), "white": (1.0, 1.0, 1.0)}


def add_border(frame, color_name="green", pad=2):
    """Frame (H, W, C) in [0,1] -> (H+2p, W+2p, C) with a colored border."""
    frame = np.clip(_to_numpy(frame), 0, 1)
    H, W, C = frame.shape
    out = np.zeros((H + 2 * pad, W + 2 * pad, C), frame.dtype)
    out[...] = np.asarray(_BORDER_COLORS[color_name], frame.dtype)[:C]
    out[pad:pad + H, pad:pad + W] = frame
    return out


def all_tensors_to_gif(seed_frames, target_frames, all_preds_frames, fpath,
                       duration=200):
    """
    Side-by-side GIF of seed, target and K sampled predictions (reference
    visualizations.py:648-700): during the seed phase the green-bordered seed
    frame is tiled across all 1+K panels; during the prediction phase panel 0
    is the green-bordered target and panels 1..K the red-bordered samples.

    seed_frames (Ns, H, W, C), target_frames (Np, H, W, C),
    all_preds_frames (K, Np, H, W, C), all in [0, 1].
    """
    import imageio
    seed_frames = _to_numpy(seed_frames)
    target_frames = _to_numpy(target_frames)
    all_preds_frames = _to_numpy(all_preds_frames)
    num_gifs = 1 + all_preds_frames.shape[0]
    frames = []
    for i in range(seed_frames.shape[0]):
        f = np.pad(add_border(seed_frames[i], "green"),
                   ((1, 1), (1, 1), (0, 0)))
        frames.append(np.concatenate([f] * num_gifs, axis=1))
    for i in range(target_frames.shape[0]):
        panels = [np.pad(add_border(target_frames[i], "green"),
                         ((1, 1), (1, 1), (0, 0)))]
        for k in range(num_gifs - 1):
            panels.append(np.pad(add_border(all_preds_frames[k, i], "red"),
                                 ((1, 1), (1, 1), (0, 0))))
        frames.append(np.concatenate(panels, axis=1))
    frames = (np.clip(np.stack(frames), 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(fpath) or ".", exist_ok=True)
    imageio.mimsave(fpath, list(frames), duration=duration, loop=0)


# ------------------------------------------------- latent-space projections

def project_2d(embs):
    """PCA projection of (N, D) embeddings onto their top-2 components."""
    embs = _to_numpy(embs).astype(np.float64)
    centered = embs - embs.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return centered @ vt[:2].T


def display_projections(points, labels, fig=None, ax=None, legend=None,
                        add_legend=True, marker="o", markersize=15, alpha=1.0):
    """2-d scatter of projected latents colored per label (reference
    visualizations.py:596-624)."""
    points = _to_numpy(points)
    labels = _to_numpy(labels).astype(int)
    uniq = np.unique(labels)
    colors = COLORS[1:]
    if len(uniq) > len(colors):
        rng = np.random.RandomState(0)
        colors = np.concatenate(
            [colors, rng.rand(len(uniq) - len(colors), 3)], axis=0)
    if legend is None:
        legend = [f"Class {l}" for l in uniq]
    if ax is None:
        fig, ax = plt.subplots(1, 1, figsize=(12, 6))
    for i, l in enumerate(uniq):
        idx = labels == l
        ax.scatter(points[idx, 0], points[idx, 1],
                   label=legend[int(i)] if add_legend else None,
                   color=colors[l % len(colors)], marker=marker,
                   s=markersize, alpha=alpha)
    if add_legend:
        ax.legend(loc="best")
    return fig, ax


def process_for_latent_space_vis(codewords, latents, action_idxs):
    """Drop non-finite rows and stack codewords + latents for a joint
    projection (reference visualizations.py:739-777 + utils.remove_nans)."""
    codewords = _to_numpy(codewords)
    latents = _to_numpy(latents)
    action_idxs = _to_numpy(action_idxs)
    codewords = codewords[np.isfinite(codewords).all(axis=-1)]
    keep = np.isfinite(latents).all(axis=-1)
    latents, action_idxs = latents[keep], action_idxs[keep]
    all_embs = np.concatenate([codewords, latents], axis=0)
    return all_embs, codewords, latents, action_idxs


def latent_space_vis(points, labels, protos=None, savepath=None):
    """Latent-action projection figure: latents colored by action id, with
    optional 'x' markers for the VQ prototypes (visualizations.py:739-766)."""
    labels = _to_numpy(labels).astype(int)
    fig, ax = display_projections(
        points, labels, legend=[f"Class {l + 1}" for l in np.unique(labels)],
        markersize=20, alpha=0.5)
    if protos is not None:
        protos = _to_numpy(protos)
        fig, ax = display_projections(
            protos, np.arange(len(protos)), fig=fig, ax=ax,
            legend=[f"Proto {i + 1}" for i in range(len(protos))],
            marker="x", markersize=50, alpha=1.0)
    if savepath:
        os.makedirs(os.path.dirname(savepath) or ".", exist_ok=True)
        fig.savefig(savepath, dpi=100)
        plt.close(fig)
        return None
    return fig


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
