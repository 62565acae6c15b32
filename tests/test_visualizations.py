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
