"""
Multi-PROCESS runtime test (VERDICT r4 item 2).

All prior multi-device evidence is single-process
(`--xla_force_host_platform_device_count=8`); this test exercises the real
multi-process path — `parallel/distributed.py` initialize_distributed +
process_shard — by spawning 2 `jax.distributed` CPU worker processes
(4 virtual devices each, gloo collectives, local coordinator) that run the
REAL `SAViTrainer.training_loop` over one global dp8 mesh, with per-process
data sharding (each host materializes only its `process_shard` rows of every
global batch, data/loader.py). Asserts:

  * both processes converge to the SAME final params (replication invariant);
  * the 2-process final params match a single-process 8-device run of the
    identical config to f32 collective-reduction-order tolerance;
  * a checkpoint written by process 0 under the multi-process runtime
    resumes correctly (--resume_training continues to the same final state
    as an uninterrupted run).

TPU-pod-slice analogy: one process per host, N chips per process, one global
mesh — the topology this runtime targets (SURVEY.md §2.5 TPU-build plan,
"host data loading sharded per process").
"""

import copy
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from playslot_tpu.config import DEFAULTS, Config
from tests.test_training import TINY_PRED, TINY_SAVI

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "mp_train_worker.py")
EPOCHS = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _write_config(exp, num_epochs=EPOCHS):
    cfg = Config(exp_path=str(exp), **copy.deepcopy(DEFAULTS))
    savi_cfg = copy.deepcopy(TINY_SAVI)
    savi_cfg["initializer"] = "Learned"  # rng-free: resume resets the key
    cfg["model"] = {"model_name": "SAVi", "model_params": savi_cfg}
    cfg["dataset"].update({
        "dataset_name": "GridShapes", "num_frames": 3, "num_balls": 2,
        "img_size": 16, "shape_size": 5, "length": 16,
        "shuffle_train": False, "shuffle_eval": False})
    cfg["training"].update({
        "num_epochs": num_epochs, "batch_size": 8,
        "train_iters_per_epoch": 2, "valid_iters_per_epoch": 1,
        "save_frequency": 1, "warmup_steps": 2, "scheduler_steps": 20,
        "data_parallel_devices": 8})
    cfg.save()


def _write_predictor_config(exp, num_epochs=EPOCHS):
    """Stage-2 (cOCVP+InvDyn, VQ-EMA on) config — deterministic like the
    soak test: Learned slot init + latent_det bottleneck, shuffling off."""
    _write_config(exp, num_epochs=num_epochs)
    cfg = Config.load(str(exp))
    cfg["dataset"]["num_frames"] = 4
    pred_cfg = copy.deepcopy(TINY_PRED)
    pred_cfg["predictor_params"]["LatentAction"]["model_params"][
        "latent_det"] = True
    cfg["predictor"] = pred_cfg
    cfg["predictor_loss"] = copy.deepcopy(DEFAULTS["predictor_loss"])
    cfg["prediction_params"] = {"num_context": 2, "num_preds": 2,
                                "teacher_force": False, "sample_length": 4,
                                "input_buffer_size": 4}
    cfg.save()


def _clean_env():
    """CPU-backend env for the workers: drop the TPU-relay sitecustomize
    (PYTHONPATH) and any JAX/XLA overrides the test session inherited."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return env


def _run(exp, num_processes, extra=()):
    port = _free_port()
    local = 8 // num_processes
    procs = []
    for pid in range(num_processes):
        logf = open(os.path.join(exp, f"worker{pid}.log"), "w")
        procs.append((subprocess.Popen(
            [sys.executable, WORKER, "--exp", str(exp),
             "--process_id", str(pid), "--num_processes", str(num_processes),
             "--coordinator", f"127.0.0.1:{port}",
             "--local_devices", str(local),
             "--out", os.path.join(exp, "final_params"), *extra],
            env=_clean_env(), stdout=logf, stderr=subprocess.STDOUT), logf))
    fail = []
    for pid, (p, logf) in enumerate(procs):
        rc = p.wait(timeout=900)
        logf.close()
        if rc != 0:
            with open(os.path.join(exp, f"worker{pid}.log")) as f:
                fail.append(f"worker {pid} rc={rc}:\n{f.read()[-3000:]}")
    assert not fail, "\n".join(fail)


def _params(exp, pid=0):
    return dict(np.load(os.path.join(exp, f"final_params.p{pid}.npz")))


def _assert_close(got, want, what, rtol=1e-5, atol=1e-7):
    assert set(got) == set(want)
    worst = 0.0
    for k in want:
        d = float(np.abs(got[k] - want[k]).max())
        worst = max(worst, d)
        assert np.allclose(got[k], want[k], rtol=rtol, atol=atol), \
            f"{what}: {k} max|diff|={d}"
    print(f"{what}: {len(want)} leaves, max|diff|={worst:.3g}")


def test_two_process_runtime_matches_single_process(tmp_path):
    single = tmp_path / "single"
    multi = tmp_path / "multi"
    for d in (single, multi):
        os.makedirs(d)
        _write_config(d)

    _run(single, num_processes=1)
    _run(multi, num_processes=2)

    # both processes hold identical replicated finals
    _assert_close(_params(multi, 1), _params(multi, 0),
                  "process replication", rtol=0, atol=0)
    # 2-process == 1-process (up to collective reduction order)
    _assert_close(_params(multi, 0), _params(single, 0), "multi vs single")
    # checkpoint written under the multi-process runtime exists (process 0
    # only — trainer.save gates the write)
    assert os.path.isdir(os.path.join(multi, "models",
                                      "checkpoint_epoch_final"))


def test_two_process_predictor_trainer_with_vq_ema(tmp_path):
    """The stage-2 trainer under the multi-process runtime: the VQ-EMA
    codebook is mutable state threaded through the jitted step, so its
    batch statistics must aggregate identically whether the batch lives on
    one process or two. Compares params AND the vq collection."""
    single = tmp_path / "single"
    multi = tmp_path / "multi"
    for d in (single, multi):
        os.makedirs(d)
        _write_predictor_config(d)

    _run(single, num_processes=1, extra=("--trainer", "predictor"))
    _run(multi, num_processes=2, extra=("--trainer", "predictor"))

    got, want = _params(multi, 0), _params(single, 0)
    assert any(k.startswith("vq/") and np.asarray(got[k]).size
               for k in got), "vq collection missing from the dump"
    _assert_close(_params(multi, 1), got, "process replication",
                  rtol=0, atol=0)
    # atol 5e-6: the EMA codebook is a ratio of two all-reduced running
    # sums, so collective/conv reduction-order noise passes through the
    # division slightly amplified — measured 1.4e-7..1.4e-6 max|diff|
    # across runs; the margin keeps a diff landing on a near-zero element
    # from flaking the gate
    _assert_close(got, want, "predictor multi vs single", atol=5e-6)


def test_multiprocess_checkpoint_resume(tmp_path):
    full = tmp_path / "full"
    resumed = tmp_path / "resumed"
    for d in (full, resumed):
        os.makedirs(d)

    # uninterrupted 2-epoch multi-process run
    _write_config(full, num_epochs=EPOCHS)
    _run(full, num_processes=2)

    # epoch 0 only, then resume into epoch 1 from process-0's checkpoint
    _write_config(resumed, num_epochs=1)
    _run(resumed, num_processes=2)
    _write_config(resumed, num_epochs=EPOCHS)
    _run(resumed, num_processes=2,
         extra=("--checkpoint", "checkpoint_epoch_final", "--resume"))

    _assert_close(_params(resumed, 0), _params(full, 0),
                  "kill/resume vs uninterrupted")
