"""
On-device goal-reaching scene generator (data/gridshapes_jax.py:
generate_scene_batch) — the hermetic stand-in for the reference's
BlockPush expert-demo recordings (src/data/BlockPush.py:184-228).

Key property under test: EXPERT demos are stationary in time (target
respawns once reached), so the action distribution cannot leak
time-in-sequence — the shortcut that collapsed closed-loop control
(see generate_scene_batch docstring).
"""

import numpy as np
import jax

from playslot_tpu.data.gridshapes_jax import generate_scene_batch


def _batch(policy, T=24, B=32):
    return jax.tree_util.tree_map(
        np.asarray,
        generate_scene_batch(jax.random.PRNGKey(3), batch=B, num_frames=T,
                             img_size=64, policy=policy))


def test_expert_demos_are_stationary():
    out = _batch("expert")
    a = out["actions"]
    mag = np.abs(a).max(axis=-1)                      # (B, T)
    # no time quartile may be dominated by parked zero-actions
    T = a.shape[1]
    for q in range(4):
        frac_zero = (mag[:, q * T // 4:(q + 1) * T // 4] < 0.01).mean()
        assert frac_zero < 0.05, (q, frac_zero)
    # expert moves are axis-aligned grid steps in [-1, 1]
    assert np.all((np.abs(a) <= 1.0 + 1e-6))
    nonzero_axes = (np.abs(a) > 1e-6).sum(axis=-1)
    assert np.all(nonzero_axes <= 1)


def test_expert_actions_point_at_target():
    out = _batch("expert")
    masks = out["masks"]                              # agent=1, target=2
    a = out["actions"]
    B, T = a.shape[:2]
    ok, tot = 0, 0
    for b in range(B):
        for t in range(T):
            ay, ax = np.argwhere(masks[b, t] == 1).mean(axis=0)
            ty, tx = np.argwhere(masks[b, t] == 2).mean(axis=0)
            d = np.array([ty - ay, tx - ax])
            act = a[b, t]
            if np.abs(act).max() < 1e-6 or np.abs(d).max() < 3:
                continue
            axis = int(np.argmax(np.abs(act)))
            ok += int(np.sign(act[axis]) == np.sign(d[axis]))
            tot += 1
    assert tot > 100
    assert ok / tot > 0.95, ok / tot


def test_masks_and_frames_consistent():
    for policy in ("expert", "random"):
        out = _batch(policy, T=6, B=4)
        assert out["videos"].shape == (4, 6, 64, 64, 3)
        assert out["masks"].shape == (4, 6, 64, 64)
        assert set(np.unique(out["masks"])) <= {0, 1, 2}
        # every frame contains both objects (respawn never deletes them)
        for b in range(4):
            for t in range(6):
                assert (out["masks"][b, t] == 1).any()
                assert (out["masks"][b, t] == 2).any()
        # agent pixels are red-ish, target green-ish
        agent_px = out["videos"][out["masks"] == 1]
        target_px = out["videos"][out["masks"] == 2]
        assert agent_px[:, 0].mean() > agent_px[:, 1].mean()
        assert target_px[:, 1].mean() > target_px[:, 0].mean()
