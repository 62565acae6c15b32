"""
Tensor-parallel correctness (VERDICT r1 item 2).

A tp-sharded PlaySlot train step must match the single-device step
numerically — same init, same batch, same rngs — proving the rule-based
TP layout in parallel/mesh.py (MLP up/down, attn qkv/out_proj splits)
doesn't silently mis-shard. Also runs the bench workload's eval path
(SAVi encode -> posterior rollout -> decode, engine/rollout.py) dp-sharded
over all 8 virtual devices as correctness-level evidence for the
multi-chip aggregate throughput claim.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp

from playslot_tpu.config import DEFAULTS
from tests.test_training import TINY_PRED, _tiny_exp


def _one_predictor_step(tmp_path, dp, tp):
    """Build SAVi+PlaySlot trainers from the same seed and run ONE train
    step on a fixed batch under a (dp, tp) mesh (None when dp*tp==1)."""
    from playslot_tpu.train.trainer import SAViTrainer
    from playslot_tpu.train.predictor_trainer import PredictorTrainer

    cfg = _tiny_exp(tmp_path, num_frames=4)
    cfg["predictor"] = copy.deepcopy(TINY_PRED)
    cfg["predictor_loss"] = copy.deepcopy(DEFAULTS["predictor_loss"])
    cfg["prediction_params"] = {"num_context": 2, "num_preds": 2,
                                "teacher_force": False, "sample_length": 4,
                                "input_buffer_size": 4}
    cfg.save()

    savi_tr = SAViTrainer(str(tmp_path))
    savi_tr.load_data()
    savi_tr.setup_model()

    cfg["training"]["data_parallel_devices"] = dp
    cfg["training"]["model_parallel_devices"] = tp
    cfg.save()

    tr = PredictorTrainer(str(tmp_path))
    tr.load_data()
    tr.load_savi(savi_params=savi_tr.state.params)
    tr.setup_predictor()

    videos = tr._shard_batch(jnp.asarray(
        np.random.RandomState(0).rand(8, 4, 16, 16, 3), jnp.float32))
    k0, k1 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    state, ldict = tr._train_step(tr.state, videos, None, k0, k1)
    return (jax.device_get(state.params), jax.device_get(state.vq),
            {k: float(v) for k, v in ldict.items()}, tr)


def test_tp_train_step_matches_single_device(tmp_path):
    """One train step on (2,2) and (4,2) meshes == single-device step —
    post-update params AND the mutable 'vq' collection (EMA codebook, counts,
    usage bins): a dp-replica-divergent codebook would otherwise pass
    silently (VERDICT r2 item 5b)."""
    ref_params, ref_vq, ref_losses, _ = _one_predictor_step(
        tmp_path / "ref", 1, 1)

    def _name(path):
        return "/".join(str(getattr(p, "key", p)) for p in path)

    for dp, tp in [(2, 2), (4, 2)]:
        params, vq, losses, tr = _one_predictor_step(
            tmp_path / f"dp{dp}tp{tp}", dp, tp)
        assert tr.mesh is not None
        assert dict(tr.mesh.shape) == {"data": dp, "model": tp}
        for k, ref in ref_losses.items():
            assert np.isclose(losses[k], ref, rtol=1e-4, atol=1e-6), \
                f"loss {k} mismatch at dp{dp}tp{tp}: {losses[k]} vs {ref}"
        for tree, ref_tree, what in ((params, ref_params, "param"),
                                     (vq, ref_vq, "vq")):
            flat_ref = jax.tree_util.tree_leaves_with_path(ref_tree)
            assert flat_ref, f"empty {what} tree"
            flat = dict(jax.tree_util.tree_leaves_with_path(tree))
            for path, ref_leaf in flat_ref:
                got = flat[path]
                assert np.allclose(got, ref_leaf, rtol=1e-4, atol=1e-5), \
                    f"{what} {_name(path)} diverged at dp{dp}tp{tp}: " \
                    f"max |diff| = {np.abs(got - ref_leaf).max()}"


def test_tp_rules_actually_shard_params(tmp_path):
    """Non-vacuity: with tp=2 the transformer MLP/attn kernels really are
    laid out over the 'model' axis (not silently replicated)."""
    _, _, _, tr = _one_predictor_step(tmp_path, 2, 2)
    specs = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tr.state.params):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        specs[name] = leaf.sharding.spec
    model_sharded = [n for n, s in specs.items() if "model" in str(s)]
    assert any(n.endswith("mlp/Dense_0/kernel") for n in model_sharded), \
        f"no MLP up-projection sharded over model: {model_sharded}"
    assert any("attn" in n for n in model_sharded), \
        f"no attention kernel sharded over model: {model_sharded}"
    # optimizer moments must mirror the param layout (memory correctness)
    opt_model_sharded = [
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tr.state.opt_state)
        if hasattr(leaf, "sharding") and "model" in str(leaf.sharding.spec)]
    assert opt_model_sharded, "adam moments not sharded like the params"


def test_dp_sharded_bench_eval_path(tmp_path):
    """The bench workload's eval path (posterior rollout -> decode_fast,
    same code as bench.py/engine.rollout) jitted dp-sharded over all 8
    virtual devices, at reduced scale; output must match the unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from playslot_tpu.engine.rollout import posterior_rollout
    from playslot_tpu.models.factory import setup_model, setup_predictor
    from playslot_tpu.parallel.mesh import make_mesh
    from tests.test_training import TINY_SAVI

    num_seed, num_preds = 3, 4
    T = num_seed + num_preds
    savi = setup_model({"model_name": "SAVi",
                        "model_params": copy.deepcopy(TINY_SAVI)})
    pred_cfg = copy.deepcopy(TINY_PRED)
    pred_cfg["predictor_params"]["DynamicsModel"]["model_params"][
        "context_length"] = num_seed
    predictor = setup_predictor(pred_cfg)

    key = jax.random.PRNGKey(0)
    videos = jnp.asarray(np.random.RandomState(0).rand(8, T, 16, 16, 3),
                         jnp.float32)
    savi_vars = jax.jit(
        lambda v: savi.init({"params": key, "slots": key}, v))(videos[:1, :2])
    slots0 = jnp.zeros((1, T, 3, 16), jnp.float32)
    pred_vars = jax.jit(lambda s: predictor.init(
        {"params": key, "action": key}, s, num_seed=num_seed,
        num_preds=num_preds))(slots0)

    def forward(savi_params, pred_variables, vids, k):
        slots = savi.apply({"params": savi_params}, vids, decode=False,
                           rngs={"slots": k})["slot_history"]
        preds = posterior_rollout(predictor, pred_variables, slots,
                                  num_seed, num_preds, rng=k)
        pred_imgs, _, _ = savi.apply({"params": savi_params}, preds,
                                     method=lambda m, s: m.decode_fast(s))
        return pred_imgs

    ref = jax.jit(forward)(savi_vars["params"], pred_vars, videos, key)

    mesh = make_mesh(8, model_parallel=1)
    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    with mesh:
        sharded = jax.jit(forward)(
            jax.device_put(savi_vars["params"], rep),
            jax.device_put(pred_vars, rep),
            jax.device_put(videos, data_sh),
            key)
    assert sharded.shape == ref.shape
    assert np.allclose(np.asarray(sharded), np.asarray(ref),
                       rtol=1e-5, atol=1e-5)
