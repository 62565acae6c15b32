"""Shared CLI utilities: checkpoint resolution (orbax dir or legacy .pth)."""

import os

from playslot_tpu.utils.checkpoint import load_checkpoint


def resolve_savi_params(exp_path, ckpt_name):
    """
    Load SAVi params from `<exp>/models/<ckpt>`: orbax directory produced by
    our trainers, or a legacy reference .pth (converted on the fly).
    Returns {"params": ...}.
    """
    path = ckpt_name if os.path.isabs(ckpt_name) \
        else os.path.join(exp_path, "models", ckpt_name)
    if path.endswith(".pth"):
        from playslot_tpu.utils.convert import convert_savi, load_torch_checkpoint
        ck = load_torch_checkpoint(path)
        sd = ck.get("model_state_dict", ck)
        return {"params": convert_savi(sd)}
    ck = load_checkpoint(path)
    return {"params": ck["state"]["params"]}


def resolve_predictor_variables(exp_path, ckpt_name, predictor_name=None):
    """
    Load predictor variables ({"params", "vq"}) from orbax or legacy .pth.
    """
    path = ckpt_name if os.path.isabs(ckpt_name) \
        else os.path.join(exp_path, "models", ckpt_name)
    if path.endswith(".pth"):
        from playslot_tpu.utils.convert import (
            convert_action_cond_ocvp, convert_latent_predictor, convert_ocvp,
            load_torch_checkpoint)
        ck = load_torch_checkpoint(path)
        sd = ck.get("model_state_dict", ck)
        if predictor_name in ("SlotLatentPredictor", "SlotSingleAction", None):
            return convert_latent_predictor(sd)
        if predictor_name == "ActionCondOCVP":
            return convert_action_cond_ocvp(sd)
        return convert_ocvp(sd, predictor_name)
    ck = load_checkpoint(path)
    out = {"params": ck["state"]["params"]}
    if "vq" in ck["state"] and ck["state"]["vq"]:
        out["vq"] = ck["state"]["vq"]
    return out
