"""Coverage for smaller components: initializers, resume roundtrip,
distributed helpers, device dataset in a trainer, metrics sanity."""

import copy
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from playslot_tpu.models.initializers import get_initializer


def test_learned_and_coord_initializers(rng):
    init = get_initializer("Learned", slot_dim=8, num_slots=3)
    params = init.init(rng, batch_size=2)
    slots = init.apply(params, batch_size=2)
    assert slots.shape == (2, 3, 8)
    # same slots for every batch row (no sampling)
    np.testing.assert_allclose(np.asarray(slots[0]), np.asarray(slots[1]))

    cinit = get_initializer("CoM", slot_dim=8, num_slots=4)
    coords = jnp.zeros((2, 2, 2)) + 0.5  # 2 objects -> pad 2 slots
    cparams = cinit.init(rng, batch_size=2, com_coords=coords)
    cslots = cinit.apply(cparams, batch_size=2, com_coords=coords)
    assert cslots.shape == (2, 4, 8)

    binit = get_initializer("BBox", slot_dim=8, num_slots=2)
    bbox = jnp.zeros((2, 2, 4)) + 0.3
    bparams = binit.init(rng, batch_size=2, bbox_coords=bbox)
    assert binit.apply(bparams, batch_size=2, bbox_coords=bbox).shape == (2, 2, 8)


def test_trainer_save_restore_roundtrip(tmp_path):
    from playslot_tpu.train.trainer import SAViTrainer
    from tests.test_training import _tiny_exp

    _tiny_exp(tmp_path)
    tr = SAViTrainer(str(tmp_path))
    tr.load_data()
    tr.setup_model()
    tr.training_loop()
    step_after = int(tr.state.step)
    leaf_before = np.asarray(
        jax.tree_util.tree_leaves(tr.state.params)[0]).copy()

    tr2 = SAViTrainer(str(tmp_path), checkpoint="checkpoint_epoch_final",
                      resume_training=True)
    tr2.load_data()
    tr2.setup_model()
    assert int(tr2.state.step) == step_after
    assert tr2.start_epoch == 1
    leaf_restored = np.asarray(jax.tree_util.tree_leaves(tr2.state.params)[0])
    np.testing.assert_allclose(leaf_before, leaf_restored)

    # weights-only load: params restored, optimizer/epoch fresh
    tr3 = SAViTrainer(str(tmp_path), checkpoint="checkpoint_epoch_final")
    tr3.load_data()
    tr3.setup_model()
    assert int(tr3.state.step) == 0 and tr3.start_epoch == 0
    np.testing.assert_allclose(
        leaf_before, np.asarray(jax.tree_util.tree_leaves(tr3.state.params)[0]))


def test_device_dataset_in_trainer(tmp_path):
    """GridShapesOnDevice plugs into the SAVi trainer end to end."""
    from playslot_tpu.train.trainer import SAViTrainer
    from tests.test_training import _tiny_exp

    cfg = _tiny_exp(tmp_path)
    cfg["dataset"].update({"dataset_name": "GridShapesOnDevice",
                           "num_frames": 3, "num_balls": 2, "img_size": 16,
                           "shape_size": 5, "length": 8})
    cfg.save()
    tr = SAViTrainer(str(tmp_path))
    tr.load_data()
    tr.setup_model()
    tr.training_loop()
    assert os.path.isdir(tmp_path / "models" / "checkpoint_epoch_final")


def test_process_shard_partition():
    from playslot_tpu.parallel.distributed import process_shard
    covered = []
    for pi in range(3):
        s, e = process_shard(10, process_index=pi, process_count=3)
        covered.extend(range(s, e))
    assert sorted(covered) == list(range(10))


def test_psnr_ssim_sanity(rng):
    from playslot_tpu.utils.metrics import psnr, ssim
    img = jax.random.uniform(rng, (2, 32, 32, 3))
    assert float(jnp.mean(psnr(img, img))) > 70
    assert float(jnp.mean(ssim(img, img))) > 0.99
    noisy = jnp.clip(img + 0.2 * jax.random.normal(rng, img.shape), 0, 1)
    assert float(jnp.mean(psnr(img, noisy))) < 25
    assert float(jnp.mean(ssim(img, noisy))) < 0.99


def test_miou_perfect_and_disjoint():
    from playslot_tpu.utils.metrics import miou_framewise
    seg = np.zeros((8, 8), int)
    seg[:4] = 1
    assert miou_framewise(seg, seg, num_pred=2, num_gt=2) == 1.0
    other = 1 - seg
    # hungarian matching should still align the permuted labels
    assert miou_framewise(other, seg, num_pred=2, num_gt=2) == 1.0


def test_miou_counts_unmatched_gt_objects():
    """More GT objects than slots: unmatched GT must count as IoU 0, not be
    dropped from the mean (a 2-slot model capturing 2 of 4 objects scores
    0.5, not 1.0)."""
    from playslot_tpu.utils.metrics import miou_framewise
    gt = np.arange(4).repeat(4).reshape(4, 4).T  # 4 vertical stripes 0..3
    pred = np.where(gt < 2, gt, 0)  # slots 0/1 match stripes 0/1 only...
    pred_seg = np.where(gt < 2, gt, 2)  # ...stripes 2/3 lumped into slot 2
    del pred
    score = miou_framewise(pred_seg, gt, num_pred=3, num_gt=4)
    # stripes 0,1 match perfectly; stripe 2 or 3 gets IoU 0.5 vs slot 2;
    # the 4th stripe is unmatched and MUST contribute 0
    assert abs(score - (1.0 + 1.0 + 0.5 + 0.0) / 4) < 1e-6


def test_ssim_matches_tensorflow():
    """Golden cross-check against tf.image.ssim (same window/constants)."""
    tf = pytest.importorskip("tensorflow")
    from playslot_tpu.utils.metrics import ssim
    rng_np = np.random.RandomState(0)
    a = rng_np.rand(2, 64, 64, 3).astype(np.float32)
    b = np.clip(a + 0.2 * rng_np.randn(2, 64, 64, 3).astype(np.float32), 0, 1)
    mine = np.asarray(ssim(a, b))
    ref = tf.image.ssim(tf.constant(a), tf.constant(b), max_val=1.0,
                        filter_size=11, filter_sigma=1.5).numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_native_frame_loader(tmp_path):
    """Native libpng batch loader matches PIL decode (no-resize is exact)."""
    from playslot_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip("native toolchain/libpng unavailable")
    from PIL import Image
    rng_np = np.random.RandomState(0)
    paths = []
    imgs = []
    for i in range(6):
        arr = (rng_np.rand(32, 32, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        imgs.append(arr.astype(np.float32) / 255.0)
    out = native_loader.load_frames(paths, 32, 32)
    np.testing.assert_allclose(out, np.stack(imgs), atol=1e-6)
    # resize path: sane range + shape
    out2 = native_loader.load_frames(paths, 16, 16)
    assert out2.shape == (6, 16, 16, 3)
    assert 0 <= out2.min() and out2.max() <= 1


def test_episode_dataset_with_native_loader(tmp_path, monkeypatch):
    """EpisodeFrameDataset production path: the native C++ batch decoder is
    the default when available, and its output is byte-identical to the PIL
    fallback at the no-resize shipped config (64x64 frames -> 64x64)."""
    from PIL import Image
    from playslot_tpu.data import native_loader
    from playslot_tpu.data.episodes import BlockPush
    rng_np = np.random.RandomState(1)
    for ep in range(2):
        d = tmp_path / "train" / str(ep)
        os.makedirs(d)
        for t in range(5):
            arr = (rng_np.rand(64, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(d / f"{t:02d}.png"))
        np.save(str(d / "actions.npy"), rng_np.rand(5, 4).astype(np.float32))
    ds = BlockPush(split="train", datapath=str(tmp_path), ep_len=5,
                   num_frames=3, random_start=True, img_size=(64, 64))
    assert len(ds) == 2 * 3  # 2 episodes x (5 - 3 + 1) starts

    monkeypatch.setenv("PLAYSLOT_NATIVE_LOADER", "0")
    video_pil, _, meta = ds[4]
    assert video_pil.shape == (3, 64, 64, 3)
    assert meta["actions"].shape == (3, 4)

    if not native_loader.available():
        pytest.skip("native toolchain/libpng unavailable")
    monkeypatch.setenv("PLAYSLOT_NATIVE_LOADER", "1")
    assert ds._use_native()
    video_native, _, _ = ds[4]
    # identical decode; 1-ulp tolerance for C-float vs numpy /255 rounding
    np.testing.assert_allclose(video_native, video_pil, atol=1e-6)


def test_native_loader_skipped_when_resample_needed(tmp_path, monkeypatch):
    """Frames stored at a different resolution than img_size must take the
    PIL path (bicubic, reference-exact) — the native loader's bilinear
    resize is only byte-identical when no resample happens."""
    from PIL import Image
    from playslot_tpu.data.episodes import BlockPush
    rng_np = np.random.RandomState(2)
    d = tmp_path / "train" / "0"
    os.makedirs(d)
    for t in range(3):
        arr = (rng_np.rand(128, 128, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(str(d / f"{t:02d}.png"))
    ds = BlockPush(split="train", datapath=str(tmp_path), ep_len=3,
                   num_frames=3, random_start=True, img_size=(64, 64))
    monkeypatch.setenv("PLAYSLOT_NATIVE_LOADER", "1")
    assert not ds._use_native()  # 128px source vs 64px target -> PIL
    monkeypatch.setenv("PLAYSLOT_NATIVE_LOADER", "0")
    video_pil, _, _ = ds[0]
    monkeypatch.setenv("PLAYSLOT_NATIVE_LOADER", "1")
    video_auto, _, _ = ds[0]
    assert video_auto.shape == (3, 64, 64, 3)
    np.testing.assert_array_equal(video_auto, video_pil)

    # matched-size tree still elects the native path when buildable
    from playslot_tpu.data import native_loader
    if native_loader.available():
        d2 = tmp_path / "same" / "train" / "0"
        os.makedirs(d2)
        for t in range(3):
            arr = (rng_np.rand(64, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(d2 / f"{t:02d}.png"))
        ds2 = BlockPush(split="train", datapath=str(tmp_path / "same"),
                        ep_len=3, num_frames=3, img_size=(64, 64))
        assert ds2._use_native()


def test_data_parallel_savi_training(tmp_path):
    """SAVi trainer with training.data_parallel_devices=4 on virtual devices:
    batch sharded over the mesh, params replicated, loss finite."""
    from playslot_tpu.train.trainer import SAViTrainer
    from tests.test_training import _tiny_exp

    cfg = _tiny_exp(tmp_path)
    cfg["training"]["data_parallel_devices"] = 4
    cfg["training"]["batch_size"] = 4
    cfg.save()
    tr = SAViTrainer(str(tmp_path))
    tr.load_data()
    tr.setup_model()
    assert tr.mesh is not None and tr.mesh.shape["data"] == 4
    tr.training_loop()
    import json
    losses = json.load(open(tmp_path / "losses.json"))
    assert np.isfinite(losses["0"]["train"]["_total"])


def test_data_parallel_playslot_eval(tmp_path):
    """Sharded PlaySlot eval over a 4-device virtual mesh."""
    import copy
    import jax as _jax
    import jax.numpy as jnp
    from playslot_tpu.config import Config, DEFAULTS
    from playslot_tpu.models.factory import setup_model, setup_predictor
    from playslot_tpu.train.evaluator import PlaySlotEvaluator
    from tests.test_training import TINY_PRED, TINY_SAVI

    cfg = Config(exp_path=str(tmp_path), **copy.deepcopy(DEFAULTS))
    cfg["model"] = {"model_name": "SAVi", "model_params": copy.deepcopy(TINY_SAVI)}
    cfg["predictor"] = copy.deepcopy(TINY_PRED)
    cfg["dataset"].update({"dataset_name": "GridShapes", "num_frames": 4,
                           "num_balls": 2, "img_size": 16, "shape_size": 5,
                           "length": 8})
    cfg["training"]["batch_size"] = 4
    cfg.save()

    key = _jax.random.PRNGKey(0)
    savi = setup_model(cfg["model"])
    sv = savi.init({"params": key, "slots": key},
                   jnp.zeros((1, 2, 16, 16, 3)))
    pred = setup_predictor(cfg["predictor"], savi_params=cfg["model"]["model_params"])
    pv = pred.init({"params": key, "action": key},
                   jnp.zeros((1, 4, 3, 16)), num_seed=2, num_preds=2)

    ev = PlaySlotEvaluator(str(tmp_path), sv, pv, num_seed=2, num_preds=2,
                           post_only=True, batch_size=4, metrics=("psnr",),
                           data_parallel_devices=4)
    res = ev.evaluate(max_batches=1)
    assert np.isfinite(res["Post"]["psnr"]["mean"])


def test_expert_demos_split_and_sketchy_indexing(tmp_path):
    """BlockPushExpertDemos 90/10 split + Sketchy windowed indexing."""
    from PIL import Image
    from playslot_tpu.data.episodes import BlockPushExpertDemos
    from playslot_tpu.data.sketchy import Sketchy

    rng_np = np.random.RandomState(0)
    # expert demos: single flat folder of 10 episodes
    demo_root = tmp_path / "demos"
    for ep in range(10):
        d = demo_root / str(ep)
        os.makedirs(d)
        for t in range(4):
            Image.fromarray((rng_np.rand(8, 8, 3) * 255).astype(np.uint8)) \
                .save(str(d / f"{t}.png"))
        np.save(str(d / "actions.npy"), rng_np.rand(4, 2).astype(np.float32))
    train = BlockPushExpertDemos(split="train", datapath=str(demo_root),
                                 ep_len=4, num_frames=3, img_size=(8, 8),
                                 num_expert_demos=-1)
    test = BlockPushExpertDemos(split="test", datapath=str(demo_root),
                                ep_len=4, num_frames=3, img_size=(8, 8),
                                num_expert_demos=-1)
    assert len(train.episodes) == 9 and len(test.episodes) == 1
    capped = BlockPushExpertDemos(split="train", datapath=str(demo_root),
                                  ep_len=4, num_frames=3, img_size=(8, 8),
                                  num_expert_demos=5)
    assert len(capped.episodes) == 5

    # sketchy: fl/fr camera dirs with crop_i frames
    sk_root = tmp_path / "sketchy" / "train" / "ep0"
    for cam in ("fl_0_full", "fr_0_full"):
        d = sk_root / cam
        os.makedirs(d)
        for i in range(6):
            Image.fromarray((rng_np.rand(8, 8, 3) * 255).astype(np.uint8)) \
                .save(str(d / f"crop_{i}.png"))
    np.save(str(sk_root / "actions.npy"), rng_np.rand(6, 7).astype(np.float32))
    ds = Sketchy(split="train", datapath=str(tmp_path / "sketchy"),
                 num_frames=3, seq_step=1, img_size=(8, 8), max_overlap=0,
                 mode="all")
    # per camera: floor((6-3)/3)+1 = 2 windows -> 4 samples total
    assert len(ds) == 4
    video, _, meta = ds[0]
    assert video.shape == (3, 8, 8, 3)
    assert meta["actions"].shape == (3, 7)


def test_stochastic_eval_decode_chunks_fold(tmp_path):
    """decode_chunks on the full stochastic eval (default batch 1): the
    sample axis is folded into the chunked dim, and a chunk count that
    cannot split B*nsamp snaps to its gcd instead of crashing — results
    are bit-identical to the unchunked eval either way."""
    import copy
    import jax as _jax
    import jax.numpy as jnp
    from playslot_tpu.config import Config, DEFAULTS
    from playslot_tpu.models.factory import setup_model, setup_predictor
    from playslot_tpu.train.evaluator import PlaySlotEvaluator
    from tests.test_training import TINY_PRED, TINY_SAVI

    cfg = Config(exp_path=str(tmp_path), **copy.deepcopy(DEFAULTS))
    cfg["model"] = {"model_name": "SAVi",
                    "model_params": copy.deepcopy(TINY_SAVI)}
    cfg["predictor"] = copy.deepcopy(TINY_PRED)
    cfg["dataset"].update({"dataset_name": "GridShapes", "num_frames": 4,
                           "num_balls": 2, "img_size": 16, "shape_size": 5,
                           "length": 4})
    cfg.save()

    key = _jax.random.PRNGKey(0)
    savi = setup_model(cfg["model"])
    sv = savi.init({"params": key, "slots": key},
                   jnp.zeros((1, 2, 16, 16, 3)))
    pred = setup_predictor(cfg["predictor"],
                           savi_params=cfg["model"]["model_params"])
    pv = pred.init({"params": key, "action": key},
                   jnp.zeros((1, 4, 3, 16)), num_seed=2, num_preds=2)

    # num_samples=3 -> B*nsamp = 3: chunks=2 snaps to gcd(2,3)=1;
    # num_samples=4 -> B*nsamp = 4: chunks=2 genuinely splits
    for nsamp in (3, 4):
        results = {}
        for chunks in (1, 2):
            ev = PlaySlotEvaluator(str(tmp_path), sv, pv, num_seed=2,
                                   num_preds=2, num_samples=nsamp,
                                   post_only=False, metrics=("psnr",),
                                   decode_chunks=chunks)
            assert ev.batch_size == 1  # the stochastic-eval default
            results[chunks] = ev.evaluate(max_batches=1)
        for mode in results[1]:
            a = results[1][mode]["psnr"]["mean"]
            b = results[2][mode]["psnr"]["mean"]
            assert np.isfinite(a) and a == b, (nsamp, mode, a, b)


def test_behavior_optimizer_semantics():
    """Fast pin of build_behavior_optimizer (reference stage-3 rule,
    src/10_learn_behavior_from_demos.py:80-137,205-217): equals two
    INDEPENDENT Adams — policy on the warmup+cosine schedule, decoder at
    CONSTANT base lr — with NO gradient clipping. The slow torch-resync
    check lives in tests/test_training_trajectory_parity.py; this guards
    the optax construction itself."""
    import optax
    from playslot_tpu.train.schedulers import (build_behavior_optimizer,
                                               build_lr_schedule)

    tcfg = {"lr": 1e-3, "scheduler": "cosine_annealing", "lr_warmup": True,
            "warmup_steps": 4, "scheduler_steps": 20,
            # present in configs but MUST be ignored by the stage-3 rule
            "gradient_clipping": True, "clipping_max_value": 1e-8}
    tx, _ = build_behavior_optimizer(tcfg)

    key = jax.random.PRNGKey(0)
    kp, kd, kg = jax.random.split(key, 3)
    params = {"policy": {"w": jax.random.normal(kp, (3, 3))},
              "decoder": {"w": jax.random.normal(kd, (3,))}}

    schedule = build_lr_schedule(tcfg)
    ref_pol = optax.adam(schedule)
    ref_dec = optax.adam(tcfg["lr"])  # constant base lr, never scheduled

    state = tx.init(params)
    sp = ref_pol.init(params["policy"])
    sd = ref_dec.init(params["decoder"])
    ours, ref = params, copy.deepcopy(params)
    for step in range(8):
        # grads far above clipping_max_value: clipping would shrink them
        g = {"policy": {"w": 5.0 * jax.random.normal(kg, (3, 3)) + step},
             "decoder": {"w": 5.0 * jax.random.normal(kg, (3,)) - step}}
        up, state = tx.update(g, state, ours)
        ours = optax.apply_updates(ours, up)
        upp, sp = ref_pol.update(g["policy"], sp, ref["policy"])
        upd, sd = ref_dec.update(g["decoder"], sd, ref["decoder"])
        ref = {"policy": optax.apply_updates(ref["policy"], upp),
               "decoder": optax.apply_updates(ref["decoder"], upd)}
    for branch in ("policy", "decoder"):
        np.testing.assert_allclose(np.asarray(ours[branch]["w"]),
                                   np.asarray(ref[branch]["w"]),
                                   rtol=1e-6, atol=1e-7, err_msg=branch)
    # the branch distinction must be provable: over the 8 steps taken the
    # policy's scheduled lr must actually differ from the decoder's constant
    # base lr, otherwise the per-branch allclose gates above degenerate into
    # a single-lr check and a same-lr regression would pass unnoticed
    sched_lrs = np.asarray([float(schedule(t)) for t in range(8)])
    assert np.any(np.abs(sched_lrs - tcfg["lr"]) > 1e-6 * tcfg["lr"]), \
        "warmup/cosine schedule coincides with base lr over the test window"
    assert not np.allclose(np.asarray(ours["policy"]["w"]),
                           np.asarray(params["policy"]["w"]))


def test_scheduler_post_tmax_bounce_matches_torch():
    """`training.scheduler_post_tmax: "bounce"` replicates the reference's
    torch CosineAnnealingLR PAST T_max (the periodic bounce the default
    "clamp" deliberately deviates from — docs/MIGRATION.md DEVIATIONS).
    Drives the reference's own LRWarmUp + WarmupVSScehdule + per-batch
    CosineAnnealingLR exactly like src/base/base_callbacks.py:112-134."""
    from tests.reference_util import import_reference
    from playslot_tpu.train.schedulers import build_lr_schedule

    torch = import_reference()
    from lib.schedulers import LRWarmUp, WarmupVSScehdule

    lr, warmup, sched_steps, horizon = 1e-3, 10, 100, 350  # 2+ bounces
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr)
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=sched_steps, eta_min=0)
    orch = WarmupVSScehdule(
        optimizer=opt, scheduler=scheduler,
        lr_warmup=LRWarmUp(init_lr=lr, warmup_steps=warmup, max_epochs=1))
    exp_params = {"training": {"scheduler": "cosine_annealing"}}
    ref_lrs = []
    for t in range(horizon):
        orch(iter=t, epoch=0, exp_params=exp_params, end_epoch=False)
        ref_lrs.append(float(opt.param_groups[0]["lr"]))
        p.grad = torch.ones(1)
        opt.step()

    sched = build_lr_schedule({
        "lr": lr, "scheduler": "cosine_annealing", "lr_warmup": True,
        "warmup_steps": warmup, "scheduler_steps": sched_steps,
        "scheduler_post_tmax": "bounce"})
    ours = np.asarray([float(sched(t)) for t in range(horizon)])
    ref = np.asarray(ref_lrs)
    # past T_max the reference genuinely bounces (not ~0) ...
    post = ref[warmup + 1 + sched_steps:]
    assert post.max() > 0.5 * lr
    # ... and we match it everywhere to fp noise
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-9)
