"""
Golden-output parity: reference PyTorch SAVi vs playslot_tpu SAVi with
converted parameters. Covers encoder, slot attention, transition, decoder,
compositing and the full recurrent video forward (deterministic slot init).
"""

import numpy as np
import pytest

import jax

from playslot_tpu.models.savi import SAVi
from playslot_tpu.utils.convert import convert_savi
from tests.reference_util import import_reference, to_torch_video, to_numpy_video


NUM_SLOTS, SLOT_DIM, RES = 4, 32, 16

MODEL_KW = dict(
    num_slots=NUM_SLOTS, slot_dim=SLOT_DIM, num_iterations=1, num_iterations_first=2,
    in_channels=3, mlp_hidden=64, mlp_encoder_dim=32,
    initializer="LearnedRandom",
    encoder={"encoder_name": "ConvEncoder",
             "encoder_params": {"num_channels": [16, 16], "kernel_size": 5,
                                "resolution": [RES, RES]}},
    decoder={"decoder_name": "ConvDecoder",
             "decoder_params": {"num_channels": [16, 16], "kernel_size": 5,
                                "resolution": [RES, RES], "upsample": 1}},
    transition_module_params={"model_name": "TransformerBlock", "num_heads": 2,
                              "head_dim": 16, "mlp_size": 64},
)


@pytest.fixture(scope="module")
def pair():
    torch = import_reference()
    from models.SAVi import SAVi as TorchSAVi

    import copy
    tm = TorchSAVi(**copy.deepcopy(MODEL_KW))
    tm.eval()

    jm = SAVi(**MODEL_KW)
    params = {"params": convert_savi(tm.state_dict())}

    # sanity: converted tree has the same structure as a fresh init
    x = np.zeros((1, 2, RES, RES, 3), np.float32)
    ref_params = jm.init({"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}, x)
    ref_paths = set(jax.tree_util.tree_map(lambda _: 0, ref_params["params"]).keys())
    got_paths = set(params["params"].keys())
    assert ref_paths == got_paths, f"missing={ref_paths - got_paths} extra={got_paths - ref_paths}"
    ref_leaves = jax.tree_util.tree_structure(ref_params["params"])
    got_leaves = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.asarray, params["params"]))
    assert ref_leaves == got_leaves

    return torch, tm, jm, params


def test_full_video_forward_parity(pair):
    torch, tm, jm, params = pair
    rng = np.random.RandomState(0)
    B, T = 2, 3
    x = rng.rand(B, T, RES, RES, 3).astype(np.float32)
    noise = rng.randn(B, NUM_SLOTS, SLOT_DIM).astype(np.float32)

    # deterministic slot init on the torch side: mu + sigma * noise
    mu = tm.slot_attention  # noqa: F841  (keep linter quiet)
    t_noise = torch.from_numpy(noise)

    def fixed_init(batch_size, **kwargs):
        m = tm.initializer.slots_mu.expand(batch_size, NUM_SLOTS, -1)
        s = tm.initializer.slots_sigma.expand(batch_size, NUM_SLOTS, -1)
        return m + s * t_noise

    tm.initializer.forward = fixed_init

    with torch.no_grad():
        out_t = tm(to_torch_video(x, torch), num_imgs=T)

    out_j = jm.apply(params, x, num_imgs=T,
                     initializer_kwargs={"noise": noise})

    np.testing.assert_allclose(
        np.asarray(out_j["slot_history"]),
        out_t["slot_history"].numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out_j["recons_imgs"]),
        to_numpy_video(out_t["recons_imgs"]), atol=2e-4, rtol=1e-3)
    # masks: (B, T, S, 1, H, W) torch -> (B, T, S, H, W, 1) ours
    masks_t = out_t["masks"].numpy().transpose(0, 1, 2, 4, 5, 3)
    np.testing.assert_allclose(np.asarray(out_j["masks"]), masks_t, atol=2e-4, rtol=1e-3)


def test_encoder_bn_downsample_parity():
    """Encoder variants: BatchNorm (eval stats) + max-pool downsampling."""
    torch = import_reference()
    from models.EncodersDecoders.encoders import SimpleConvEncoder as TorchEnc
    from playslot_tpu.models.encoders import SimpleConvEncoder
    from playslot_tpu.utils.convert import conv as conv_cv, _np

    tm = TorchEnc(in_channels=3, hidden_dims=(8, 8, 8), kernel_size=3,
                  batch_norm=True, downsample_encoder=True, downsample=2)
    tm.eval()
    # feed data through torch in train mode once so running stats move
    with torch.no_grad():
        tm.train()
        tm(torch.randn(4, 3, 16, 16))
        tm.eval()

    sd = tm.state_dict()
    params, stats = {}, {}
    for j in range(3):
        params[f"block_{j}"] = {
            "conv": conv_cv(sd, f"encoder.{j}.block.0"),
            "bn": {"scale": _np(sd[f"encoder.{j}.block.1.weight"]),
                   "bias": _np(sd[f"encoder.{j}.block.1.bias"])}}
        stats[f"block_{j}"] = {"bn": {
            "mean": _np(sd[f"encoder.{j}.block.1.running_mean"]),
            "var": _np(sd[f"encoder.{j}.block.1.running_var"])}}

    jm = SimpleConvEncoder(hidden_dims=(8, 8, 8), kernel_size=3,
                           batch_norm=True, downsample_encoder=True, downsample=2)
    x = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    out = jm.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)
