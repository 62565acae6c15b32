"""
Torch-vs-JAX N-step training-trajectory parity (VERDICT r3 item 1).

Drives tools/trajectory_parity.py at reduced step counts against the actual
reference implementation (imported from /root/reference — LRWarmUp,
WarmupVSScehdule, torch Adam + CosineAnnealingLR, the reference SAVi /
SlotSingleActionPredictor and LossTracker), comparing against OUR production
jitted trainer steps from the same converted init on identical batches.

Three gates per stage (see the tool's docstring for the instruments):
  * lr-sequence exactness within the cosine T_max window,
  * step-local resync: one step of our trainer from the torch state (params
    + Adam moments + step count) reproduces torch's next params,
  * coupled free-running loss curves stay tight over the early trajectory
    (later steps drift chaotically from f32 reassociation noise; the resync
    gate is the tight instrument, the curve is the drift measurement).

Tolerance argument (f32): a single fwd+bwd differs between frameworks by
~1e-6 relative (different reduction orders at matmul precision "highest");
Adam divides by sqrt(nu)+eps, amplifying near-zero-moment leaves, and the
global-norm clip couples every leaf's noise — measured single-step error
against the global update magnitude is ~1e-5..1e-4; gates are set 10x above
the measured worst case. The full 200/150-step report with per-step deltas
is committed at docs/TRAJECTORY_PARITY.json (tools/trajectory_parity.py).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tp():
    if not os.path.isdir("/root/reference/src"):
        pytest.skip("reference repo not available")
    pytest.importorskip("torch")
    import trajectory_parity
    return trajectory_parity


def test_lr_schedule_matches_reference_exactly(tp):
    """Our optax schedule == the reference's measured per-step lr (LRWarmUp
    + deactivation hold + per-batch CosineAnnealingLR) within T_max; beyond
    T_max torch bounces back up (documented deviation, we clamp)."""
    r = tp.compare_lr_sequences(num_steps=140, lr=1e-3, warmup=10,
                                sched_steps=100)
    assert r["max_rel_diff_within_T_max"] < 1e-6, r
    assert r["max_rel_diff_warmup_region"] < 1e-6, r
    # the post-T_max bounce IS there (this gate fails if torch changes
    # behavior or we accidentally start replicating the bounce)
    assert r["max_rel_diff_incl_post_T_max_bounce"] > 1e-4, r


def test_savi_training_trajectory(tp, tmp_path):
    """40 SAVi train steps (Adam + global-norm clip + warmup->cosine) from
    the same converted init on identical GridShapes batches."""
    r = tp.run_savi_trajectory(tmp_path, num_steps=40, resync_every=10,
                               B=4, T=3, lr=1e-3, warmup=10, sched_steps=200)
    # step-local: our jitted step from the torch state reproduces torch's
    # next params to ~f32 noise of the update magnitude (measured worst over
    # the committed 200-step report: 1.9e-3 — noise/update ratio grows as
    # updates shrink with convergence; gate gives ~2.5x margin)
    assert r["resync_max_err_vs_global_update"] < 5e-3, r["resync_checks"]
    # coupled curves: tight early; the late curve drifts chaotically from
    # f32 noise (measured + reported, resync is the tight instrument)
    assert r["loss_rel_diff_max_first_quarter"] < 1e-3, r
    # sanity: the free-running trajectories did not fly apart
    assert r["loss_rel_diff_max"] < 0.5, r
    assert r["final_param_max_rel_err"] < 1.0, r


def test_behavior_training_trajectory(tp, tmp_path):
    """24 stage-3 (behavior cloning) train steps with the reference's exact
    stage-3 optimizer semantics: TWO Adams, warmup/cosine on the POLICY
    optimizer only (action decoder at constant base lr), NO gradient
    clipping (10_learn_behavior_from_demos.py:105-137,205-217); InvDyn
    targets from identical injected noise; frozen converted SAVi+predictor
    both sides."""
    r = tp.run_behavior_trajectory(tmp_path, num_steps=24, resync_every=8,
                                   B=2, T=4, lr=1e-3, warmup=8,
                                   sched_steps=200)
    assert r["resync_max_err_vs_global_update"] < 2e-3, r["resync_checks"]
    assert r["loss_rel_diff_max_first_quarter"] < 1e-3, r
    assert r["loss_rel_diff_max"] < 0.5, r


def test_oracle_training_trajectory(tp, tmp_path):
    """20 oracle-BC train steps: single Adam + clip + warmup/cosine, both
    regression sides clamped to [-1, 1] (10_train_oracle.py:128-141); the
    clamp is ACTIVE (targets drawn at 1.5x the clamp range)."""
    r = tp.run_oracle_trajectory(tmp_path, num_steps=20, resync_every=5,
                                 B=2, T=4, lr=1e-3, warmup=8, sched_steps=200)
    assert r["resync_max_err_vs_global_update"] < 2e-3, r["resync_checks"]
    assert r["loss_rel_diff_max_first_quarter"] < 1e-3, r
    assert r["loss_rel_diff_max"] < 0.5, r


def test_playslot_training_trajectory(tp, tmp_path):
    """30 PlaySlot (cOCVP+InvDyn) train steps with VQ-EMA ON, identical
    injected reparameterization noise, frozen converted SAVi both sides."""
    r = tp.run_playslot_trajectory(tmp_path, num_steps=30, resync_every=10,
                                   B=2, num_context=2, num_preds=3, lr=1e-3,
                                   warmup=10, sched_steps=200)
    assert r["resync_max_err_vs_global_update"] < 2e-3, r["resync_checks"]
    # the EMA codebook (updated inside the jitted step every step) tracks
    # the torch EMA trajectory
    assert r["resync_max_vq_rel_err"] < 1e-3, r["resync_checks"]
    assert r["loss_rel_diff_max_first_quarter"] < 1e-3, r
    assert r["loss_rel_diff_max"] < 0.5, r
    assert r["final_vq_max_rel_err"] < 0.2, r
