"""
One-way converter: reference PyTorch checkpoints (.pth state_dicts) ->
playslot_tpu parameter pytrees.

Covers the full reference model zoo so pretrained experiment trees can be
evaluated on TPU (reference src/lib/setup_model.py:246-297 is the load path
being replaced). Conventions converted:
  * torch Linear weight (out, in)        -> flax Dense kernel (in, out)
  * torch Conv2d weight (out, in, kh, kw)-> flax Conv kernel (kh, kw, in, out)
  * torch LayerNorm weight/bias          -> flax scale/bias
  * torch GRUCell weight_ih/hh (3D, in)  -> TorchGRUCell wi/wh (in, 3D)
  * `module.` DataParallel prefixes are stripped.
"""

import re

import numpy as np


def _np(t):
    """torch tensor -> numpy array (no torch import needed at module level)."""
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def strip_module_prefix(state_dict):
    return {re.sub(r"^module\.", "", k): v for k, v in state_dict.items()}


def linear(sd, prefix, bias=True):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv1x1_as_dense(sd, prefix):
    """torch Conv2d(in, out, 1) used as a pixelwise projection -> Dense."""
    w = _np(sd[f"{prefix}.weight"])  # (out, in, 1, 1)
    out = {"kernel": w[:, :, 0, 0].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def layernorm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def gru_cell(sd, prefix):
    return {
        "wi": _np(sd[f"{prefix}.weight_ih"]).T,
        "wh": _np(sd[f"{prefix}.weight_hh"]).T,
        "bi": _np(sd[f"{prefix}.bias_ih"]),
        "bh": _np(sd[f"{prefix}.bias_hh"]),
    }


def _sorted_child_indices(sd, prefix):
    """Integer child indices of a torch nn.Sequential appearing in sd."""
    idxs = set()
    pat = re.compile(rf"^{re.escape(prefix)}\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            idxs.add(int(m.group(1)))
    return sorted(idxs)


# --------------------------------------------------------------------------
# shared sub-blocks
# --------------------------------------------------------------------------

def encoder_block(sd, prefix, has_attn_proj=False):
    """Reference TransformerEncoderBlock -> our TransformerEncoderBlock tree."""
    attn = {
        "q": linear(sd, f"{prefix}.attn.q", bias=False),
        "k": linear(sd, f"{prefix}.attn.k", bias=False),
        "v": linear(sd, f"{prefix}.attn.v", bias=False),
    }
    if f"{prefix}.attn.out_proj.0.weight" in sd:
        attn["out_proj"] = linear(sd, f"{prefix}.attn.out_proj.0")
    return {
        "ln_att": layernorm(sd, f"{prefix}.ln_att"),
        "attn": attn,
        "ln_mlp": layernorm(sd, f"{prefix}.ln_mlp"),
        "mlp": {
            "Dense_0": linear(sd, f"{prefix}.mlp.mlp.0"),
            "Dense_1": linear(sd, f"{prefix}.mlp.mlp.2"),
        },
    }


def decoder_block(sd, prefix):
    """Reference TransformerDecoder (self-attn only variant) -> our tree."""
    out = {
        "ln_att": layernorm(sd, f"{prefix}.ln_att"),
        "attn": {
            "q": linear(sd, f"{prefix}.attn.q", bias=False),
            "k": linear(sd, f"{prefix}.attn.k", bias=False),
            "v": linear(sd, f"{prefix}.attn.v", bias=False),
        },
        "ln_mlp": layernorm(sd, f"{prefix}.ln_mlp"),
        "mlp": {
            "Dense_0": linear(sd, f"{prefix}.mlp.mlp.0"),
            "Dense_1": linear(sd, f"{prefix}.mlp.mlp.2"),
        },
    }
    if f"{prefix}.attn.out_proj.0.weight" in sd:
        out["attn"]["out_proj"] = linear(sd, f"{prefix}.attn.out_proj.0")
    if f"{prefix}.cross_attn.q.weight" in sd:
        out["ln_cross_att_q"] = layernorm(sd, f"{prefix}.ln_cross_att_q")
        out["ln_cross_att_kv"] = layernorm(sd, f"{prefix}.ln_cross_att_kv")
        cross = {
            "q": linear(sd, f"{prefix}.cross_attn.q", bias=False),
            "k": linear(sd, f"{prefix}.cross_attn.k", bias=False),
            "v": linear(sd, f"{prefix}.cross_attn.v", bias=False),
        }
        if f"{prefix}.cross_attn.out_proj.0.weight" in sd:
            cross["out_proj"] = linear(sd, f"{prefix}.cross_attn.out_proj.0")
        out["cross_attn"] = cross
    return out


# --------------------------------------------------------------------------
# SAVi
# --------------------------------------------------------------------------

def convert_savi(state_dict):
    """Reference SAVi state_dict -> playslot_tpu.models.SAVi params tree."""
    sd = strip_module_prefix(state_dict)
    params = {}

    # initializer
    if "initializer.slots_mu" in sd:
        params["initializer"] = {
            "slots_mu": _np(sd["initializer.slots_mu"]),
            "slots_sigma": _np(sd["initializer.slots_sigma"]),
        }
    elif "initializer.slots" in sd:
        params["initializer"] = {"slots": _np(sd["initializer.slots"])}
    elif "initializer.coord_encoder.0.weight" in sd:
        params["initializer"] = {
            "Dense_0": linear(sd, "initializer.coord_encoder.0"),
            "Dense_1": linear(sd, "initializer.coord_encoder.2"),
        }

    # conv encoder (torch Sequential of ConvBlocks)
    enc = {}
    for j, i in enumerate(_sorted_child_indices(sd, "encoder.encoder")):
        blk = {"conv": conv(sd, f"encoder.encoder.{i}.block.0")}
        if f"encoder.encoder.{i}.block.1.running_mean" in sd:  # BatchNorm present
            bn_p = f"encoder.encoder.{i}.block.1"
            blk["bn"] = {"scale": _np(sd[f"{bn_p}.weight"]), "bias": _np(sd[f"{bn_p}.bias"])}
        enc[f"block_{j}"] = blk
    params["encoder"] = enc

    params["encoder_pos_embedding"] = {
        "projection": conv1x1_as_dense(sd, "encoder_pos_embedding.projection")
    }
    params["encoder_norm"] = layernorm(sd, "encoder_mlp.0")
    params["encoder_mlp_0"] = linear(sd, "encoder_mlp.1")
    params["encoder_mlp_1"] = linear(sd, "encoder_mlp.3")

    # slot attention
    params["slot_attn"] = {
        "norm_input": layernorm(sd, "slot_attention.norm_input"),
        "norm_slot": layernorm(sd, "slot_attention.norm_slot"),
        "norm_mlp": layernorm(sd, "slot_attention.norm_mlp"),
        "to_q": linear(sd, "slot_attention.to_q", bias=False),
        "to_k": linear(sd, "slot_attention.to_k", bias=False),
        "to_v": linear(sd, "slot_attention.to_v", bias=False),
        "gru": gru_cell(sd, "slot_attention.gru"),
        "mlp_0": linear(sd, "slot_attention.mlp.0"),
        "mlp_1": linear(sd, "slot_attention.mlp.2"),
    }

    # transition module (Identity has no params)
    if "transition_module.ln_att.weight" in sd:
        params["transition"] = encoder_block(sd, "transition_module")

    # decoder: conv blocks appear interleaved with (param-free) Upsample modules
    params["decoder_pos_embedding"] = {
        "projection": conv1x1_as_dense(sd, "decoder_pos_embedding.projection")
    }
    dec = {}
    dec_idxs = _sorted_child_indices(sd, "decoder.decoder")
    conv_blocks = [i for i in dec_idxs if f"decoder.decoder.{i}.block.0.weight" in sd]
    final = [i for i in dec_idxs
             if f"decoder.decoder.{i}.weight" in sd and i not in conv_blocks]
    for j, i in enumerate(conv_blocks):
        blk = {"conv": conv(sd, f"decoder.decoder.{i}.block.0")}
        if f"decoder.decoder.{i}.block.1.running_mean" in sd:
            bn_p = f"decoder.decoder.{i}.block.1"
            blk["bn"] = {"scale": _np(sd[f"{bn_p}.weight"]), "bias": _np(sd[f"{bn_p}.bias"])}
        dec[f"block_{j}"] = blk
    assert len(final) == 1, f"expected exactly one final conv, got {final}"
    dec["final_conv"] = conv(sd, f"decoder.decoder.{final[0]}")
    params["decoder"] = dec
    return params


def load_torch_checkpoint(path):
    """Load a reference .pth checkpoint (CPU map) and return its state_dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt
