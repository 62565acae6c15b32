"""Smoke tests for the visualization helpers added for reference parity
(visualize_aligned_slots, all_tensors_to_gif, latent-space projections —
reference src/lib/visualizations.py:133, :648, :739-777)."""

import numpy as np

from playslot_tpu.utils import visualizations as viz


def test_visualize_aligned_slots(tmp_path):
    objs = np.random.RandomState(0).rand(4, 3, 16, 16, 3)
    out = str(tmp_path / "aligned.png")
    assert viz.visualize_aligned_slots(objs, savepath=out) is None
    assert (tmp_path / "aligned.png").exists()
    fig = viz.visualize_aligned_slots(objs)  # no savepath -> figure returned
    assert fig is not None


def test_add_border_and_all_tensors_to_gif(tmp_path):
    frame = np.zeros((8, 8, 3), np.float32)
    bordered = viz.add_border(frame, "green", pad=2)
    assert bordered.shape == (12, 12, 3)
    assert np.allclose(bordered[0, 0], [0.0, 0.8, 0.0])
    assert np.allclose(bordered[2:-2, 2:-2], 0.0)

    rng = np.random.RandomState(1)
    seed = rng.rand(2, 8, 8, 3)
    target = rng.rand(3, 8, 8, 3)
    preds = rng.rand(4, 3, 8, 8, 3)  # K=4 samples
    out = str(tmp_path / "rollouts.gif")
    viz.all_tensors_to_gif(seed, target, preds, out)
    import imageio
    frames = imageio.mimread(out)
    assert len(frames) == 2 + 3  # seed phase + prediction phase
    # each frame is 1+K panels wide, each panel padded to 8+2*2+2 = 14
    assert frames[0].shape[1] == 5 * 14


def test_individual_frame_exporters(tmp_path):
    rng = np.random.RandomState(3)
    seed = rng.rand(2, 8, 8, 3)
    targets = rng.rand(3, 8, 8, 3)
    preds = rng.rand(2, 3, 8, 8, 3)  # K=2 samples
    d = str(tmp_path / "figs")
    viz.visualize_ind_figs_stoch(seed, targets, preds, d, size=1)
    names = {p.name for p in (tmp_path / "figs").iterdir()}
    assert {"seed_00.png", "seed_01.png", "target_02.png",
            "post_00.png", "prior_1_02.png"} <= names

    objs = rng.rand(2, 2, 8, 8, 3)
    masks = rng.rand(2, 2, 8, 8, 1)
    viz.visualize_ind_figs_objs(objs, masks, d, size=1)
    names = {p.name for p in (tmp_path / "figs").iterdir()}
    assert {"obj_01_01.png", "mask_00_01.png", "MaskedObj_01_00.png"} <= names


def test_qualitative_and_stoch_grids(tmp_path):
    rng = np.random.RandomState(4)
    ctx, tgt = rng.rand(3, 8, 8, 3), rng.rand(5, 8, 8, 3)
    preds = rng.rand(5, 8, 8, 3)
    out = str(tmp_path / "qual.png")
    assert viz.visualize_qualitative_eval(ctx, tgt, preds, savepath=out,
                                          size=1) is None
    assert (tmp_path / "qual.png").exists()

    all_preds = rng.rand(2, 5, 8, 8, 3)
    out2 = str(tmp_path / "stoch.png")
    assert viz.visualize_stoch_frame_figs(
        ctx, tgt, all_preds, titles=["best PSNR", "posterior"],
        savepath=out2, size=1, fontsize=8) is None
    assert (tmp_path / "stoch.png").exists()
    import pytest
    with pytest.raises(ValueError):
        viz.visualize_stoch_frame_figs(ctx, tgt, all_preds, titles=["one"])


def test_segmentation_and_misc_helpers(tmp_path):
    seg_idx = np.asarray([[0, 1], [2, 0]])
    one_hot = viz.idx_to_one_hot(seg_idx)
    assert one_hot.shape == (3, 2, 2)  # classes-first like the reference
    assert one_hot[1, 0, 1] == 1 and one_hot[0, 0, 0] == 1

    img = np.zeros((2, 2, 3))
    # class 0 covers most pixels -> treated as background (seashell)
    out = viz.overlay_segmentation(img, one_hot.astype(bool), alpha=1.0)
    assert np.allclose(out[0, 0], [1.0, 0.961, 0.933], atol=1e-3)
    assert not np.allclose(out[0, 1], out[0, 0])

    cols = viz.get_random_colors(5, seed=0)
    assert len(cols) == 5 and all(c.startswith("#") and len(c) == 7
                                  for c in cols)

    gif = str(tmp_path / "seq.gif")
    viz.tensors_to_gif(np.random.RandomState(5).rand(3, 8, 8, 3), gif)
    import imageio
    assert len(imageio.mimread(gif)) == 3


def test_latent_space_projection(tmp_path):
    rng = np.random.RandomState(2)
    codewords = rng.randn(4, 16)
    latents = rng.randn(20, 16)
    latents[3, 0] = np.nan  # must be dropped
    idxs = rng.randint(0, 4, 20)

    all_embs, cw, lat, kept_idxs = viz.process_for_latent_space_vis(
        codewords, latents, idxs)
    assert lat.shape[0] == 19 and kept_idxs.shape[0] == 19
    assert all_embs.shape == (4 + 19, 16)

    pts = viz.project_2d(all_embs)
    assert pts.shape == (23, 2)
    out = str(tmp_path / "latents.png")
    assert viz.latent_space_vis(pts[4:], kept_idxs, protos=pts[:4],
                                savepath=out) is None
    assert (tmp_path / "latents.png").exists()
