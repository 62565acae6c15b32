"""
Visualization toolkit: frame grids, object decompositions, segmentations,
GIFs, metric plots and codebook diagnostics.

Capability parity with reference src/lib/visualizations.py: sequence /
recons / decomposition / aligned-slot / qualitative-eval / stochastic grids,
individual-frame exporters, segmentation coloring + overlays, GIF writers,
metric plots, codebook diagnostics and latent-space projections.
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


def make_gif(frames, savepath, fps=8, n_seed=None, use_border=False):
    """(T, H, W, C) in [0,1] -> animated gif. With use_border, the first
    n_seed frames get a green border and the rest a red one (the reference's
    seed/prediction phase marking, visualizations.py:418-431)."""
    import imageio
    frames = np.clip(_to_numpy(frames), 0, 1)
    if use_border:
        n_seed = len(frames) if n_seed is None else n_seed
        frames = np.stack([
            add_border(f, "green" if i < n_seed else "red")
            for i, f in enumerate(frames)])
    frames = (frames * 255).astype(np.uint8)
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


def visualize_ind_figs(imgs, savepath, tag, size=3):
    """Save every frame of a sequence as its own borderless PNG
    `<tag>_<NN>.png` (reference visualizations.py:169-190)."""
    imgs = np.clip(_to_numpy(imgs), 0, 1)
    os.makedirs(savepath, exist_ok=True)
    for i, frame in enumerate(imgs):
        fig, ax = plt.subplots(figsize=(size, size))
        ax.imshow(frame)
        ax.set_xticks([]); ax.set_yticks([])
        fig.savefig(os.path.join(savepath, f"{tag}_{i:02}.png"),
                    bbox_inches="tight", pad_inches=0.0)
        plt.close(fig)


def visualize_ind_figs_objs(objs, masks, savepath, size=3):
    """Save per-slot object, mask and masked-object PNGs for every frame
    (`obj_/mask_/MaskedObj_<slot>_<frame>.png`, reference
    visualizations.py:192-238). objs (T, S, H, W, C), masks (T, S, H, W, 1)."""
    objs = np.clip(_to_numpy(objs), 0, 1)
    masks = np.clip(_to_numpy(masks), 0, 1)
    os.makedirs(savepath, exist_ok=True)
    T, S = objs.shape[:2]
    for t in range(T):
        for s in range(S):
            for name, img, kw in (
                    (f"obj_{s:02}_{t:02}.png", objs[t, s], {}),
                    (f"mask_{s:02}_{t:02}.png", masks[t, s, ..., 0],
                     {"cmap": "gray"}),
                    (f"MaskedObj_{s:02}_{t:02}.png",
                     masks[t, s] * objs[t, s], {})):
                fig, ax = plt.subplots(figsize=(size, size))
                ax.imshow(img, **kw)
                ax.set_xticks([]); ax.set_yticks([])
                fig.savefig(os.path.join(savepath, name),
                            bbox_inches="tight", pad_inches=0.0)
                plt.close(fig)


def visualize_ind_figs_stoch(seed, targets, all_preds, savepath, size=3,
                             is_post=True):
    """Individual PNGs for a stochastic eval: seed/target frames plus each
    sampled rollout, tagged `post`/`prior_i` (reference
    visualizations.py:241-255)."""
    visualize_ind_figs(seed, savepath, tag="seed", size=size)
    visualize_ind_figs(targets, savepath, tag="target", size=size)
    for i, pred in enumerate(_to_numpy(all_preds)):
        if is_post:
            tag = "post" if i == 0 else f"prior_{i}"
        else:
            tag = f"prior_{i + 1}"
        visualize_ind_figs(pred, savepath, tag=tag, size=size)


def _bordered_row(frames, color):
    return [add_border(f, color) for f in np.clip(_to_numpy(frames), 0, 1)]


def visualize_qualitative_eval(context, targets, preds, savepath=None,
                               size=4, fontsize=16, n_cols=10):
    """
    One-example qualitative eval grid: a green-bordered seed row, then
    green-bordered target rows, then red-bordered prediction rows (reference
    visualizations.py:333-384). All inputs (T, H, W, C) in [0, 1].
    """
    context = _bordered_row(context, "green")
    targets = _bordered_row(targets, "green")
    preds = _bordered_row(preds, "red")
    n_cols = min(n_cols, max(len(targets), len(context)))
    rows_t = -(-len(targets) // n_cols)
    rows_p = -(-len(preds) // n_cols)
    n_rows = 1 + rows_t + rows_p
    fig, ax = plt.subplots(n_rows, n_cols,
                           figsize=(n_cols * size, (n_rows + 1) * size),
                           squeeze=False)
    ax[0][n_cols // 2].set_title("Seed Frames", fontsize=fontsize)
    ax[1][n_cols // 2].set_title("Target Frames", fontsize=fontsize)
    ax[1 + rows_t][n_cols // 2].set_title("Predicted Frames",
                                          fontsize=fontsize)
    for i, f in enumerate(context[:n_cols]):
        ax[0][i].imshow(f)
    for i, f in enumerate(targets):
        ax[1 + i // n_cols][i % n_cols].imshow(f)
    for i, f in enumerate(preds):
        ax[1 + rows_t + i // n_cols][i % n_cols].imshow(f)
    for row in ax:
        for a in row:
            a.axis("off")
    fig.tight_layout()
    if savepath:
        os.makedirs(os.path.dirname(savepath) or ".", exist_ok=True)
        fig.savefig(savepath, dpi=100)
        plt.close(fig)
        return None
    return fig


def visualize_stoch_frame_figs(context, targets, all_preds, titles=None,
                               savepath=None, size=4, fontsize=30, n_cols=10):
    """
    Multi-sample qualitative eval: seed row, target rows, then one block of
    rows per sampled prediction sequence (e.g. best-PSNR / best-SSIM /
    posterior — reference visualizations.py:535-593). all_preds is
    (K, T, H, W, C); titles optionally labels the K blocks.
    """
    all_preds = _to_numpy(all_preds)
    if titles is not None and len(titles) != all_preds.shape[0]:
        raise ValueError(
            f"{all_preds.shape[0]} pred sequences != {len(titles)} titles")
    context = _bordered_row(context, "green")
    targets = _bordered_row(targets, "green")
    n_preds = len(targets)
    rows_per = -(-n_preds // n_cols)
    n_rows = 1 + (all_preds.shape[0] + 1) * rows_per
    fig, ax = plt.subplots(n_rows, n_cols,
                           figsize=(n_cols * size, (n_rows + 1) * size),
                           squeeze=False)
    ax[0][n_cols // 2].set_title("Seed Frames", fontsize=fontsize)
    ax[1][n_cols // 2].set_title("Target Frames", fontsize=fontsize)
    for i, f in enumerate(context[:n_cols]):
        ax[0][i].imshow(f)
    for i, f in enumerate(targets):
        ax[1 + i // n_cols][i % n_cols].imshow(f)
    for k in range(all_preds.shape[0]):
        offset = 1 + (k + 1) * rows_per
        if titles is not None:
            ax[offset][n_cols // 2].set_title(titles[k], fontsize=fontsize)
        for i, f in enumerate(_bordered_row(all_preds[k][:n_preds], "red")):
            ax[offset + i // n_cols][i % n_cols].imshow(f)
    for row in ax:
        for a in row:
            a.axis("off")
    fig.tight_layout()
    if savepath:
        os.makedirs(os.path.dirname(savepath) or ".", exist_ok=True)
        fig.savefig(savepath, dpi=100)
        plt.close(fig)
        return None
    return fig


def idx_to_one_hot(x):
    """Instance-index map (..., H, W) int -> one-hot masks (..., K, H, W)
    with K = max index + 1 (reference visualizations.py:453-464; kept
    classes-first to match its downstream overlay usage)."""
    x = _to_numpy(x).astype(np.int64)
    K = int(x.max()) + 1
    one_hot = np.eye(K, dtype=np.int64)[x]          # (..., H, W, K)
    return np.moveaxis(one_hot, -1, -3)             # (..., K, H, W)


def overlay_segmentation(img, segmentation, alpha=0.7, colors=None):
    """Blend boolean per-class masks over ONE image (reference
    visualizations.py:512-532). img (H, W, C) in [0, 1]; segmentation
    (K, H, W) boolean. The class covering the most pixels is treated as
    background and drawn in off-white ('seashell')."""
    img = np.clip(_to_numpy(img), 0, 1)
    seg = _to_numpy(segmentation).astype(bool)
    background = int(seg.sum(axis=(-1, -2)).argmax())
    if colors is None:
        colors = [COLORS[(i + 1) % len(COLORS)] for i in range(len(seg))]
    colors = list(colors)
    colors[background] = np.asarray([1.0, 0.961, 0.933])  # seashell
    out = img.copy()
    for k, mask in enumerate(seg):
        out[mask] = (1 - alpha) * out[mask] + alpha * np.asarray(colors[k])
    return np.clip(out, 0, 1)


def get_random_colors(num_colors, seed=None):
    """Random hex color strings (reference visualizations.py:628-634)."""
    rng = np.random.RandomState(seed)
    return ["#%06X" % rng.randint(0, 0x1000000) for _ in range(num_colors)]


def tensors_to_gif(sequence, filename, duration=100):
    """(T, H, W, C) in [0,1] -> GIF with per-frame duration in ms (reference
    visualizations.py:637-645)."""
    make_gif(sequence, filename, fps=1000 / duration)


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
