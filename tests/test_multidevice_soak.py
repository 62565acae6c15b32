"""
Multi-device training SOAK through the real Trainer (VERDICT r3 item 4).

test_tensor_parallel.py proves ONE dp/tp train step matches single-device;
this test runs the full `training_loop` — epochs, per-epoch checkpointing,
a mid-run crash (emergency save), and `--resume_training` — on a dp4×tp2
virtual CPU mesh, and asserts the final state (params AND the VQ-EMA
codebook accumulated across every step) matches an uninterrupted
single-device run.

Determinism setup: SAVi uses the `Learned` initializer (rng-free) and the
predictor uses latent_det (deterministic VQ bottleneck), so per-step math is
independent of the trainer's key stream — which a resume necessarily resets
(the reference has the same property: resume restores model/optimizer state,
not the RNG; src/lib/setup_model.py:246-297). Data is GridShapes, which is
deterministic per (seed, split, index), with shuffling off.

Reference semantics being soaked: baseTrainer.py:143-253 (epoch loop +
checkpoint_last_saved every epoch), setup_model.py:301-336 (emergency save),
setup_model.py:246-297 (resume restores optimizer + epoch).
"""

import copy

import numpy as np
import jax
import pytest

from playslot_tpu.config import DEFAULTS, Config
from tests.test_training import TINY_PRED, TINY_SAVI

pytestmark = pytest.mark.slow

EPOCHS = 4


def _det_exp(tmp_path, dp, tp):
    cfg = Config(exp_path=str(tmp_path), **copy.deepcopy(DEFAULTS))
    savi_cfg = copy.deepcopy(TINY_SAVI)
    savi_cfg["initializer"] = "Learned"  # rng-free slot init
    cfg["model"] = {"model_name": "SAVi", "model_params": savi_cfg}
    cfg["dataset"].update({
        "dataset_name": "GridShapes", "num_frames": 4, "num_balls": 2,
        "img_size": 16, "shape_size": 5, "length": 16,
        "shuffle_train": False, "shuffle_eval": False})
    cfg["training"].update({
        "num_epochs": EPOCHS, "batch_size": 8, "train_iters_per_epoch": 2,
        "valid_iters_per_epoch": 1, "save_frequency": 2, "warmup_steps": 2,
        "scheduler_steps": 20, "data_parallel_devices": dp,
        "model_parallel_devices": tp})
    pred_cfg = copy.deepcopy(TINY_PRED)
    pred_cfg["predictor_params"]["LatentAction"]["model_params"][
        "latent_det"] = True  # rng-free latent bottleneck
    cfg["predictor"] = pred_cfg
    cfg["predictor_loss"] = copy.deepcopy(DEFAULTS["predictor_loss"])
    cfg["prediction_params"] = {"num_context": 2, "num_preds": 2,
                                "teacher_force": False, "sample_length": 4,
                                "input_buffer_size": 4}
    cfg.save()
    return cfg


def _savi_params(tmp_path):
    """Deterministic fresh SAVi init (fixed training.seed drives the key)."""
    from playslot_tpu.train.trainer import SAViTrainer
    tr = SAViTrainer(str(tmp_path))
    tr.load_data()
    tr.setup_model()
    return jax.device_get(tr.state.params)


def _predictor_trainer(tmp_path, savi_params, **kw):
    from playslot_tpu.train.predictor_trainer import PredictorTrainer
    tr = PredictorTrainer(str(tmp_path), **kw)
    tr.load_data()
    tr.load_savi(savi_params=savi_params)
    tr.setup_predictor()
    return tr


class _KillAtEpoch(RuntimeError):
    pass


def _assert_trees_close(got, want, what, rtol=2e-4, atol=1e-5):
    flat_want = jax.tree_util.tree_leaves_with_path(want)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got))
    assert flat_want, f"empty {what} tree"
    for path, w in flat_want:
        g = np.asarray(flat_got[path])
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        assert np.allclose(g, np.asarray(w), rtol=rtol, atol=atol), \
            f"{what} {name}: max |diff| = {np.abs(g - np.asarray(w)).max()}"


def test_mesh_training_loop_kill_resume_matches_single_device(tmp_path):
    # ---------------- reference: uninterrupted single-device run
    ref_dir = tmp_path / "single"
    ref_dir.mkdir()
    _det_exp(ref_dir, 1, 1)
    savi_params = _savi_params(ref_dir)
    ref = _predictor_trainer(ref_dir, savi_params)
    ref.training_loop()
    ref_state = jax.device_get(ref.state)
    assert int(ref_state.step) == EPOCHS * 2  # 2 train iters per epoch

    # ---------------- mesh run, killed at the start of epoch 2
    mesh_dir = tmp_path / "mesh"
    mesh_dir.mkdir()
    _det_exp(mesh_dir, 4, 2)
    tr = _predictor_trainer(mesh_dir, savi_params)
    assert tr.mesh is not None and dict(tr.mesh.shape) == {"data": 4,
                                                           "model": 2}

    real_run_epoch = type(tr).run_epoch

    def killing_run_epoch(self, loader, train, max_iters):
        if getattr(self, "epoch", 0) == 2:
            raise _KillAtEpoch("simulated crash at epoch-2 start")
        return real_run_epoch(self, loader, train, max_iters)

    tr.run_epoch = killing_run_epoch.__get__(tr)
    with pytest.raises(_KillAtEpoch):
        tr.training_loop()

    # the crash produced an emergency checkpoint; epochs 0-1 left the regular
    # per-epoch artifacts behind (reference baseTrainer.py:172 semantics)
    models = mesh_dir / "models"
    assert (models / "emergency_checkpoint_epoch_2").is_dir()
    assert (models / "checkpoint_last_saved").is_dir()
    assert (models / "checkpoint_epoch_1").is_dir()  # save_frequency=2

    # ---------------- resume under the mesh, train to completion
    tr2 = _predictor_trainer(mesh_dir, savi_params,
                             checkpoint="checkpoint_last_saved",
                             resume_training=True)
    assert tr2.start_epoch == 2
    assert tr2.mesh is not None
    tr2.training_loop()
    got_state = jax.device_get(tr2.state)

    # ---------------- the resumed mesh run == the uninterrupted single run
    assert int(got_state.step) == int(ref_state.step)
    _assert_trees_close(got_state.params, ref_state.params, "param")
    _assert_trees_close(got_state.vq, ref_state.vq, "vq")
    # adam moments also came through save/restore + re-placement correctly
    ref_moments = [x for x in jax.tree_util.tree_leaves(ref_state.opt_state)
                   if hasattr(x, "shape") and getattr(x, "size", 0) > 1]
    got_moments = [x for x in jax.tree_util.tree_leaves(got_state.opt_state)
                   if hasattr(x, "shape") and getattr(x, "size", 0) > 1]
    assert len(ref_moments) == len(got_moments) and ref_moments
    for a, b in zip(got_moments, ref_moments):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                           atol=1e-5), "optimizer moments diverged"


def test_mesh_resume_restores_sharding(tmp_path):
    """After --resume_training under a tp mesh, the restored params are
    actually laid out over the 'model' axis again (not replicated)."""
    mesh_dir = tmp_path / "exp"
    mesh_dir.mkdir()
    _det_exp(mesh_dir, 4, 2)
    savi_params = _savi_params(mesh_dir)
    tr = _predictor_trainer(mesh_dir, savi_params)
    tr.epoch = 0
    tr.save("checkpoint_last_saved")

    tr2 = _predictor_trainer(mesh_dir, savi_params,
                             checkpoint="checkpoint_last_saved",
                             resume_training=True)
    specs = [str(leaf.sharding.spec) for leaf in
             jax.tree_util.tree_leaves(tr2.state.params)]
    assert any("model" in s for s in specs), \
        "restored params lost the tensor-parallel layout"
