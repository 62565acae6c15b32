"""Parity for OCVP-family predictors, ActionCondOCVP and behavior heads."""

import numpy as np
import pytest

from playslot_tpu.models.behavior import MarkovBehaviorCloner, MLPActionDecoder
from playslot_tpu.models.ocvp import OCVP_MODELS, predictor_wrapper_rollout
from playslot_tpu.models.predictors import ActionCondOCVP
from playslot_tpu.utils.convert import (
    convert_action_cond_ocvp, convert_behavior_cloner, convert_action_decoder,
    convert_ocvp,
)
from tests.reference_util import import_reference

S, D = 3, 16
KW = dict(num_slots=S, slot_dim=D, token_dim=16, hidden_dim=32, num_layers=2,
          n_heads=2, residual=True, input_buffer_size=6, pos_enc_dropout=0.0)


@pytest.mark.parametrize("kind", ["VanillaTransformer", "OCVPSeq"])
def test_ocvp_parity(kind):
    torch = import_reference()
    from models.Predictors import transformers as T
    cls_map = {"VanillaTransformer": T.VanillaTransformerPredictor,
               "OCVPSeq": T.OCVPSeq}
    tm = cls_map[kind](**KW)
    tm.eval()
    jm = OCVP_MODELS[kind](**KW)
    variables = convert_ocvp(tm.state_dict(), kind)

    x = np.random.RandomState(0).randn(2, 4, S, D).astype(np.float32) * 0.5
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x)).numpy()
    out_j = jm.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5, rtol=1e-4)


def test_ocvp_par_layer_parity():
    """
    The reference OCVPPar top-level module is broken dead code (its __init__
    passes `d_model` to OCVPParLayer, transformers.py:407 — unregistered in
    the factory, SURVEY.md §0.1), so golden-test the LAYER it intended to
    stack and rely on the other OCVP tests for the shared scaffold.
    """
    torch = import_reference()
    from models.Predictors.transformers import OCVPParLayer as TLayer
    from playslot_tpu.models.ocvp import OCVPParLayer

    tm = TLayer(token_dim=16, hidden_dim=32, n_heads=2)
    tm.eval()
    jm = OCVPParLayer(token_dim=16, hidden_dim=32, n_heads=2)
    sd = tm.state_dict()
    from playslot_tpu.utils.convert import layernorm, linear
    variables = {"params": {
        "ln_att": layernorm(sd, "ln_att"),
        "ln_mlp": layernorm(sd, "ln_mlp"),
        "mlp": {"Dense_0": linear(sd, "mlp.mlp.0"),
                "Dense_1": linear(sd, "mlp.mlp.2")},
        "object_encoder_block": {
            "q": linear(sd, "object_encoder_block.q", bias=False),
            "k": linear(sd, "object_encoder_block.k", bias=False),
            "v": linear(sd, "object_encoder_block.v", bias=False)},
        "time_encoder_block": {
            "q": linear(sd, "time_encoder_block.q", bias=False),
            "k": linear(sd, "time_encoder_block.k", bias=False),
            "v": linear(sd, "time_encoder_block.v", bias=False)},
    }}
    x = np.random.RandomState(5).randn(2, 4, S, 16).astype(np.float32) * 0.5
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x)).numpy()
    out_j = jm.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5, rtol=1e-4)


def test_predictor_wrapper_rollout_parity():
    torch = import_reference()
    from models.Predictors.transformers import VanillaTransformerPredictor
    from models.Predictors.predictor_wrappers import PredictorWrapper

    tm = VanillaTransformerPredictor(**KW)
    tm.eval()
    jm = OCVP_MODELS["VanillaTransformer"](**KW)
    variables = convert_ocvp(tm.state_dict(), "VanillaTransformer")

    exp_params = {
        "prediction_params": {"num_context": 3, "num_preds": 2,
                              "teacher_force": False, "sample_length": 5,
                              "input_buffer_size": 4},
        "predictor": {"predictor_name": "VanillaTransformer",
                      "predictor_params": dict(KW)},
    }
    wrapper = PredictorWrapper(exp_params, tm)
    wrapper.eval()
    x = np.random.RandomState(1).randn(2, 5, S, D).astype(np.float32) * 0.5
    with torch.no_grad():
        pred_t, _ = wrapper(torch.from_numpy(x))

    pred_j = predictor_wrapper_rollout(
        lambda s, _t: jm.apply(variables, s), x, num_context=3, num_preds=2,
        input_buffer_size=4, teacher_force=False, get_pred_only=False)
    np.testing.assert_allclose(np.asarray(pred_j), pred_t.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_action_cond_ocvp_parity():
    torch = import_reference()
    from models.Predictors.ActionConditional_OCVP import ActionCondtionalOCVP

    dyn = {"model_name": "SlotGPTDymamicsModel",
           "model_params": {"embed_dim": 16, "head_dim": 8, "num_heads": 2,
                            "mlp_size": 32, "num_layers": 2, "context_length": 4,
                            "pos_enc_dropout": 0.0}}
    kw = dict(slot_dim=D, raw_action_dim=4, action_embed_dim=8,
              condition_mode="sum", autoregressive_dynamics=True)
    import copy
    tm = ActionCondtionalOCVP(**kw, DynamicsModel=copy.deepcopy(dyn))
    tm.eval()
    jm = ActionCondOCVP(**kw, DynamicsModel=dyn)
    variables = convert_action_cond_ocvp(tm.state_dict())

    rng = np.random.RandomState(2)
    slots = rng.randn(2, 4, S, D).astype(np.float32) * 0.5
    actions = rng.randn(2, 4, 4).astype(np.float32)
    with torch.no_grad():
        pred_t, _ = tm(torch.from_numpy(slots), torch.from_numpy(actions),
                       num_seed=2, num_preds=3)
    pred_j, _ = jm.apply(variables, slots, actions, num_seed=2, num_preds=3)
    np.testing.assert_allclose(np.asarray(pred_j), pred_t.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_behavior_heads_parity():
    torch = import_reference()
    from models.Downstream.behavior_predictor import MarkovBehaviorCloner as TBC
    from models.Downstream.action_decoding import MLPActionDecoder as TAD

    tbc = TBC(slot_dim=D, emb_dim=16, num_layers=2, num_heads=2, head_dim=8,
              mlp_dim=32, action_dim=8)
    tbc.eval()
    jbc = MarkovBehaviorCloner(slot_dim=D, action_dim=8, emb_dim=16,
                               num_layers=2, num_heads=2, head_dim=8, mlp_dim=32)
    vb = convert_behavior_cloner(tbc.state_dict())
    slots = np.random.RandomState(3).randn(2, 4, S, D).astype(np.float32) * 0.5
    with torch.no_grad():
        out_t = tbc(torch.from_numpy(slots)).numpy()
    out_j = jbc.apply(vb, slots)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5, rtol=1e-4)

    tad = TAD(in_dim=8, out_dim=4, hidden_dim=[16, 16])
    tad.eval()
    jad = MLPActionDecoder(out_dim=4, hidden_dim=(16, 16))
    va = convert_action_decoder(tad.state_dict())
    z = np.random.RandomState(4).randn(2, 4, 8).astype(np.float32)
    with torch.no_grad():
        a_t = tad(torch.from_numpy(z)).numpy()
    a_j = jad.apply(va, z)
    np.testing.assert_allclose(np.asarray(a_j), a_t, atol=2e-5, rtol=1e-4)


def test_cross_attention_decoder_block_parity():
    """TransformerDecoder with use_cross_attn=True (unused by shipped
    configs but part of the reference surface, attention.py:479-565)."""
    torch = import_reference()
    from models.BlocksUtils.attention import TransformerDecoder as TDec
    from playslot_tpu.models.blocks import TransformerDecoderBlock
    from playslot_tpu.utils.convert import decoder_block

    tm = TDec(embed_dim=16, head_dim=8, num_heads=2, mlp_size=32, kv_dim=12,
              use_cross_attn=True, project_out=True)
    tm.eval()
    jm = TransformerDecoderBlock(embed_dim=16, head_dim=8, num_heads=2,
                                 mlp_size=32, kv_dim=12, use_cross_attn=True,
                                 project_out=True)
    sd = {f"blk.{k}": v for k, v in tm.state_dict().items()}
    variables = {"params": decoder_block(sd, "blk")}

    rng_np = np.random.RandomState(7)
    q = rng_np.randn(2, 5, 16).astype(np.float32) * 0.5
    feats = rng_np.randn(2, 9, 12).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(q), feats=torch.from_numpy(feats)).numpy()
    out = jm.apply(variables, q, feats=feats)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)
