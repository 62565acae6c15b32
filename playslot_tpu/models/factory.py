"""
Model factories — the only supported way to instantiate models from config
dictionaries (mirrors reference src/lib/setup_model.py:29-181).
"""

from playslot_tpu.models.savi import SAVi
from playslot_tpu.models.predictors import (
    ActionCondOCVP, SlotLatentPredictor, SlotSingleActionPredictor,
)
from playslot_tpu.models.ocvp import OCVP_MODELS
from playslot_tpu.models.behavior import ACTION_DECODERS, BEHAVIOR_MODELS


def setup_model(model_params, dtype=None):
    """Instantiate the SAVi decomposition model (setup_model.py:29-55)."""
    name = model_params.get("model_name", "SAVi") or "SAVi"
    if name not in ("SAVi",):
        raise ValueError(f"Unknown model {name}; only 'SAVi' is supported")
    p = dict(model_params["model_params"]) if "model_params" in model_params \
        else dict(model_params)
    p.pop("model_name", None)
    return SAVi(
        num_slots=p["num_slots"],
        slot_dim=p["slot_dim"],
        num_iterations=p.get("num_iterations", 3),
        num_iterations_first=p.get("num_iterations_first"),
        in_channels=p.get("in_channels", 3),
        mlp_hidden=p.get("mlp_hidden", 128),
        mlp_encoder_dim=p.get("mlp_encoder_dim", 128),
        initializer=p.get("initializer", "LearnedRandom"),
        encoder=p.get("encoder"),
        decoder=p.get("decoder"),
        transition_module_params=p.get("transition_module_params"),
        dtype=dtype,
    )


PREDICTORS = ("SlotLatentPredictor", "SlotSingleAction", "ActionCondOCVP",
              "VanillaTransformer", "OCVPSeq", "OCVPPar")


def setup_predictor(predictor_cfg, savi_params=None, dtype=None):
    """
    Instantiate a predictor from its config block (setup_model.py:60-116).
    `savi_params` supplies num_slots/slot_dim for the OCVP family.
    """
    name = predictor_cfg["predictor_name"]
    p = dict(predictor_cfg["predictor_params"])

    if name == "SlotLatentPredictor":
        return SlotLatentPredictor(
            slot_dim=p["slot_dim"], num_actions=p["num_actions"],
            action_dim=p["action_dim"], condition_mode=p.get("condition_mode", "sum"),
            use_variability=p.get("use_variability", False),
            autoregressive_dynamics=p.get("autoregressive_dynamics", True),
            LatentAction=p["LatentAction"], DynamicsModel=p["DynamicsModel"],
            dtype=dtype)
    if name == "SlotSingleAction":
        return SlotSingleActionPredictor(
            slot_dim=p["slot_dim"], num_actions=p["num_actions"],
            action_dim=p["action_dim"], condition_mode=p.get("condition_mode", "sum"),
            use_variability=p.get("use_variability", False),
            autoregressive_dynamics=p.get("autoregressive_dynamics", True),
            LatentAction=p["LatentAction"], DynamicsModel=p["DynamicsModel"],
            dtype=dtype)
    if name == "ActionCondOCVP":
        return ActionCondOCVP(
            slot_dim=p["slot_dim"], raw_action_dim=p["raw_action_dim"],
            action_embed_dim=p["action_embed_dim"],
            condition_mode=p.get("condition_mode", "sum"),
            autoregressive_dynamics=p.get("autoregressive_dynamics", True),
            DynamicsModel=p["DynamicsModel"], dtype=dtype)
    if name in OCVP_MODELS:
        assert savi_params is not None, f"{name} needs SAVi params for slot shape"
        return OCVP_MODELS[name](
            num_slots=savi_params["num_slots"], slot_dim=savi_params["slot_dim"],
            token_dim=p.get("token_dim", 128), hidden_dim=p.get("hidden_dim", 256),
            num_layers=p.get("num_layers", 2), n_heads=p.get("n_heads", 4),
            residual=p.get("residual", False),
            input_buffer_size=p.get("input_buffer_size", 30),
            pos_enc_dropout=p.get("pos_enc_dropout", 0.1), dtype=dtype)
    raise ValueError(f"Unknown predictor {name}. Supported: {PREDICTORS}")


def setup_behavior_model(behavior_cfg, slot_dim, action_dim, dtype=None):
    """Instantiate a behavior-cloning policy (setup_model.py:121-181)."""
    name = behavior_cfg["model_name"]
    if name not in BEHAVIOR_MODELS:
        raise ValueError(f"Unknown behavior model {name}")
    p = dict(behavior_cfg.get("model_params") or {})
    return BEHAVIOR_MODELS[name](
        slot_dim=slot_dim, action_dim=action_dim, emb_dim=p.get("emb_dim", 128),
        num_layers=p.get("num_layers", 4), num_heads=p.get("num_heads", 4),
        head_dim=p.get("head_dim", 32), mlp_dim=p.get("mlp_dim", 512), dtype=dtype)


def setup_action_decoder(decoder_cfg, dtype=None):
    """Instantiate an action decoder (setup_model.py:121-181)."""
    name = decoder_cfg["model_name"]
    if name not in ACTION_DECODERS:
        raise ValueError(f"Unknown action decoder {name}")
    p = dict(decoder_cfg.get("model_params") or {})
    return ACTION_DECODERS[name](
        out_dim=p["out_dim"], hidden_dim=tuple(p.get("hidden_dim", (128, 128))),
        dtype=dtype)
