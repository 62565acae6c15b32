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
    """torch tensor -> numpy array (no torch import needed at module level).

    Always COPIES: `.numpy()` on a contiguous CPU tensor returns a VIEW of
    the live torch storage, so a "converted snapshot" would silently mutate
    when the torch model trains on (bit us in the trajectory-parity harness,
    tools/trajectory_parity.py — transposed leaves were real copies while
    contiguous ones were views, producing inconsistent garbage snapshots).
    """
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy().copy()
    return np.array(t)


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

def convert_savi(state_dict, return_batch_stats=False):
    """
    Reference SAVi state_dict -> playslot_tpu.models.SAVi params tree.
    With return_batch_stats=True also returns the flax `batch_stats`
    collection (BatchNorm running mean/var) for BN-configured encoders.
    """
    sd = strip_module_prefix(state_dict)
    params = {}
    batch_stats = {}

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
    enc_stats = {}
    for j, i in enumerate(_sorted_child_indices(sd, "encoder.encoder")):
        blk = {"conv": conv(sd, f"encoder.encoder.{i}.block.0")}
        if f"encoder.encoder.{i}.block.1.running_mean" in sd:  # BatchNorm present
            bn_p = f"encoder.encoder.{i}.block.1"
            blk["bn"] = {"scale": _np(sd[f"{bn_p}.weight"]), "bias": _np(sd[f"{bn_p}.bias"])}
            enc_stats[f"block_{j}"] = {"bn": {
                "mean": _np(sd[f"{bn_p}.running_mean"]),
                "var": _np(sd[f"{bn_p}.running_var"])}}
        enc[f"block_{j}"] = blk
    params["encoder"] = enc
    if enc_stats:
        batch_stats["encoder"] = enc_stats

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
    dec_stats = {}
    for j, i in enumerate(conv_blocks):
        blk = {"conv": conv(sd, f"decoder.decoder.{i}.block.0")}
        if f"decoder.decoder.{i}.block.1.running_mean" in sd:
            bn_p = f"decoder.decoder.{i}.block.1"
            blk["bn"] = {"scale": _np(sd[f"{bn_p}.weight"]), "bias": _np(sd[f"{bn_p}.bias"])}
            dec_stats[f"block_{j}"] = {"bn": {
                "mean": _np(sd[f"{bn_p}.running_mean"]),
                "var": _np(sd[f"{bn_p}.running_var"])}}
        dec[f"block_{j}"] = blk
    assert len(final) == 1, f"expected exactly one final conv, got {final}"
    dec["final_conv"] = conv(sd, f"decoder.decoder.{final[0]}")
    params["decoder"] = dec
    if dec_stats:
        batch_stats["decoder"] = dec_stats
    if return_batch_stats:
        return params, batch_stats
    return params


def load_torch_checkpoint(path):
    """Load a reference .pth checkpoint (CPU map) and return its state_dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt


# --------------------------------------------------------------------------
# InvDyn / dynamics / predictors
# --------------------------------------------------------------------------

def _convert_quantizer(sd, prefix):
    """
    Reference VectorQuantizer / EmaVectorQuantizer -> (params, vq_state).
    EMA variant keys: {prefix}.vq.embeddings.0.weight, {prefix}.ema_count,
    {prefix}.ema_weight; plain variant: {prefix}.embeddings.0.weight.
    """
    params, vq = {}, {}
    n = None
    if f"{prefix}.vq.embeddings.0.weight" in sd:  # EMA
        vq["codebook"] = _np(sd[f"{prefix}.vq.embeddings.0.weight"])
        vq["ema_count"] = _np(sd[f"{prefix}.ema_count"])
        vq["ema_weight"] = _np(sd[f"{prefix}.ema_weight"])
        n = vq["codebook"].shape[0]
    elif f"{prefix}.embeddings.0.weight" in sd:
        params["codebook"] = _np(sd[f"{prefix}.embeddings.0.weight"])
        n = params["codebook"].shape[0]
    else:
        raise KeyError(f"no quantizer found at {prefix}")
    vq["usage_bins"] = np.ones(n, np.float32) / n
    vq["usage_iters"] = np.zeros((), np.int32)
    return params, vq


def convert_latent_action(sd, prefix="latent_action"):
    """InvDynS/InvDynM -> (params, vq_state) subtrees."""
    params = {
        "mean_fc": linear(sd, f"{prefix}.mean_fc"),
        "variance_fc": linear(sd, f"{prefix}.variance_fc"),
    }
    qp, qv = _convert_quantizer(sd, f"{prefix}.quantizer")
    params["quantizer"] = qp
    vq = {"quantizer": qv}

    if f"{prefix}.act_token" in sd:  # InvDynS
        params["act_token"] = _np(sd[f"{prefix}.act_token"])
        params["slot_norm"] = layernorm(sd, f"{prefix}.slot_encoder.0")
        params["slot_proj"] = linear(sd, f"{prefix}.slot_encoder.1")
        i = 0
        while f"{prefix}.transformer.{i}.ln_att.weight" in sd:
            params[f"block_{i}"] = encoder_block(sd, f"{prefix}.transformer.{i}")
            i += 1
    else:  # InvDynM: Sequential(Linear, ReLU, LayerNorm, Linear)
        params["slot_fc0"] = linear(sd, f"{prefix}.slot_encoder.0")
        params["slot_norm"] = layernorm(sd, f"{prefix}.slot_encoder.2")
        params["slot_fc1"] = linear(sd, f"{prefix}.slot_encoder.3")
    return params, vq


def convert_dynamics_model(sd, prefix="dynamics_model"):
    """MarkovTransformer / SlotGPT dynamics -> params subtree."""
    params = {"tok_emb": linear(sd, f"{prefix}.tok_emb")}
    if f"{prefix}.action_emb.weight" in sd:
        params["action_emb"] = linear(sd, f"{prefix}.action_emb")
    if f"{prefix}.variability_emb.weight" in sd:
        params["variability_emb"] = linear(sd, f"{prefix}.variability_emb")
    params["head_norm"] = layernorm(sd, f"{prefix}.regression_head.0")
    params["head_out"] = linear(sd, f"{prefix}.regression_head.1")
    i = 0
    while f"{prefix}.dynamics_model.{i}.ln_att.weight" in sd:
        params[f"block_{i}"] = decoder_block(sd, f"{prefix}.dynamics_model.{i}")
        i += 1
    return params


def convert_latent_predictor(state_dict):
    """
    SlotLatentPredictor / SlotSingleActionPredictor state_dict ->
    {"params": ..., "vq": ...} variables for the playslot_tpu predictor.
    """
    sd = strip_module_prefix(state_dict)
    la_params, la_vq = convert_latent_action(sd, "latent_action")
    params = {
        "latent_action": la_params,
        "dynamics_model": convert_dynamics_model(sd, "dynamics_model"),
    }
    return {"params": params, "vq": {"latent_action": la_vq}}


def convert_action_cond_ocvp(state_dict):
    """ActionCondtionalOCVP state_dict -> {"params": ...}."""
    sd = strip_module_prefix(state_dict)
    return {"params": {
        "action_encoder": linear(sd, "action_encoder.0"),
        "dynamics_model": convert_dynamics_model(sd, "dynamics_model"),
    }}


def convert_ocvp(state_dict, kind):
    """VanillaTransformer / OCVPSeq / OCVPPar state_dict -> {"params": ...}."""
    sd = strip_module_prefix(state_dict)
    params = {
        "mlp_in": linear(sd, "mlp_in"),
        "mlp_out": linear(sd, "mlp_out"),
    }
    i = 0
    if kind == "VanillaTransformer":
        while f"transformer_encoders.{i}.ln_att.weight" in sd:
            params[f"block_{i}"] = encoder_block(sd, f"transformer_encoders.{i}")
            i += 1
    elif kind == "OCVPSeq":
        while f"transformer_encoders.{i}.object_encoder_block.ln_att.weight" in sd:
            params[f"layer_{i}"] = {
                "object_encoder_block": encoder_block(
                    sd, f"transformer_encoders.{i}.object_encoder_block"),
                "time_encoder_block": encoder_block(
                    sd, f"transformer_encoders.{i}.time_encoder_block"),
            }
            i += 1
    elif kind == "OCVPPar":
        while f"transformer_encoders.{i}.ln_att.weight" in sd:
            p = f"transformer_encoders.{i}"
            params[f"layer_{i}"] = {
                "ln_att": layernorm(sd, f"{p}.ln_att"),
                "ln_mlp": layernorm(sd, f"{p}.ln_mlp"),
                "mlp": {"Dense_0": linear(sd, f"{p}.mlp.mlp.0"),
                        "Dense_1": linear(sd, f"{p}.mlp.mlp.2")},
                "object_encoder_block": {
                    "q": linear(sd, f"{p}.object_encoder_block.q", bias=False),
                    "k": linear(sd, f"{p}.object_encoder_block.k", bias=False),
                    "v": linear(sd, f"{p}.object_encoder_block.v", bias=False),
                },
                "time_encoder_block": {
                    "q": linear(sd, f"{p}.time_encoder_block.q", bias=False),
                    "k": linear(sd, f"{p}.time_encoder_block.k", bias=False),
                    "v": linear(sd, f"{p}.time_encoder_block.v", bias=False),
                },
            }
            i += 1
    else:
        raise ValueError(f"unknown OCVP kind {kind}")
    return {"params": params}


def convert_behavior_cloner(state_dict):
    """MarkovBehaviorCloner state_dict -> {"params": ...}."""
    sd = strip_module_prefix(state_dict)
    params = {
        "slot_norm": layernorm(sd, "slot_encoder.0"),
        "slot_proj": linear(sd, "slot_encoder.1"),
        "act_token": _np(sd["act_token"]),
        "latent_action_predictor": linear(sd, "latent_action_predictor"),
    }
    i = 0
    while f"transformer.{i}.ln_att.weight" in sd:
        params[f"block_{i}"] = encoder_block(sd, f"transformer.{i}")
        i += 1
    return {"params": params}


def convert_action_decoder(state_dict):
    """MLPActionDecoder state_dict -> {"params": ...}."""
    sd = strip_module_prefix(state_dict)
    params = {}
    idxs = _sorted_child_indices(sd, "mlp")
    hidden = idxs[:-1]
    for j, i in enumerate(hidden):
        params[f"fc_{j}"] = linear(sd, f"mlp.{i}.0")
    params["fc_out"] = linear(sd, f"mlp.{idxs[-1]}")
    return {"params": params}
