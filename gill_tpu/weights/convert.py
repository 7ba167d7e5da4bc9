"""torch state_dict -> gill_tpu parameter-pytree converters.

One-time weight import for the frozen backbones (OPT, CLIP, SD) and for
reference GILL checkpoints (`pretrained_ckpt.pth.tar`,
`decision_model.pth.tar`). Layout rules:

  * torch Linear stores (out, in); we store (in, out)        -> transpose
  * torch Conv2d stores OIHW; we store HWIO                  -> transpose(2,3,1,0)
  * per-layer weights are stacked along a leading L axis for lax.scan

Conversion accepts either torch tensors or numpy arrays so tests can run
without torch if needed.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor
    return x.detach().to("cpu").float().numpy()


def _lin(sd, prefix) -> Dict[str, np.ndarray]:
    p = {"w": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def _ln(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _conv(sd, prefix) -> Dict[str, np.ndarray]:
    p = {"w": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def _stack(dicts):
    """List of identical-structure dicts -> one dict with stacked leaves."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *dicts)


# ---------------------------------------------------------------------------
# OPT
# ---------------------------------------------------------------------------

def opt_from_torch(sd, cfg) -> dict:
    """HF OPTForCausalLM state_dict -> gill_tpu.models.opt params."""
    sd = {k.replace("model.decoder.", "dec."): v for k, v in sd.items()}
    layers = []
    for i in range(cfg.num_layers):
        p = f"dec.layers.{i}"
        layers.append({
            "attn": {
                "q": _lin(sd, f"{p}.self_attn.q_proj"),
                "k": _lin(sd, f"{p}.self_attn.k_proj"),
                "v": _lin(sd, f"{p}.self_attn.v_proj"),
                "o": _lin(sd, f"{p}.self_attn.out_proj"),
            },
            "attn_ln": _ln(sd, f"{p}.self_attn_layer_norm"),
            "fc1": _lin(sd, f"{p}.fc1"),
            "fc2": _lin(sd, f"{p}.fc2"),
            "mlp_ln": _ln(sd, f"{p}.final_layer_norm"),
        })
    params = {
        "embed_tokens": {"weight": _np(sd["dec.embed_tokens.weight"])},
        "embed_positions": {"weight": _np(sd["dec.embed_positions.weight"])},
        "layers": _stack(layers),
    }
    if "dec.final_layer_norm.weight" in sd and cfg.do_layer_norm_before:
        params["final_ln"] = _ln(sd, "dec.final_layer_norm")
    if "dec.project_in.weight" in sd:
        params["project_in"] = _lin(sd, "dec.project_in")
        params["project_out"] = _lin(sd, "dec.project_out")
    return params


# ---------------------------------------------------------------------------
# CLIP vision / text towers
# ---------------------------------------------------------------------------

def clip_vision_from_torch(sd, cfg) -> dict:
    """HF CLIPVisionModel state_dict -> gill_tpu.models.clip vision params."""
    sd = {k.replace("vision_model.", ""): v for k, v in sd.items()}
    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        layers.append({
            "ln1": _ln(sd, f"{p}.layer_norm1"),
            "attn": {
                "q": _lin(sd, f"{p}.self_attn.q_proj"),
                "k": _lin(sd, f"{p}.self_attn.k_proj"),
                "v": _lin(sd, f"{p}.self_attn.v_proj"),
                "o": _lin(sd, f"{p}.self_attn.out_proj"),
            },
            "ln2": _ln(sd, f"{p}.layer_norm2"),
            "fc1": _lin(sd, f"{p}.mlp.fc1"),
            "fc2": _lin(sd, f"{p}.mlp.fc2"),
        })
    return {
        "class_embedding": _np(sd["embeddings.class_embedding"]),
        "patch_embedding": {
            "w": _np(sd["embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
        },
        "position_embedding": {"weight": _np(sd["embeddings.position_embedding.weight"])},
        "pre_ln": _ln(sd, "pre_layrnorm"),  # (sic) HF attribute name
        "layers": _stack(layers),
        "post_ln": _ln(sd, "post_layernorm"),
    }


def clip_text_from_torch(sd, cfg) -> dict:
    """HF CLIPTextModel state_dict -> gill_tpu.models.clip text params."""
    sd = {k.replace("text_model.", ""): v for k, v in sd.items()}
    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        layers.append({
            "ln1": _ln(sd, f"{p}.layer_norm1"),
            "attn": {
                "q": _lin(sd, f"{p}.self_attn.q_proj"),
                "k": _lin(sd, f"{p}.self_attn.k_proj"),
                "v": _lin(sd, f"{p}.self_attn.v_proj"),
                "o": _lin(sd, f"{p}.self_attn.out_proj"),
            },
            "ln2": _ln(sd, f"{p}.layer_norm2"),
            "fc1": _lin(sd, f"{p}.mlp.fc1"),
            "fc2": _lin(sd, f"{p}.mlp.fc2"),
        })
    return {
        "token_embedding": {"weight": _np(sd["embeddings.token_embedding.weight"])},
        "position_embedding": {"weight": _np(sd["embeddings.position_embedding.weight"])},
        "layers": _stack(layers),
        "final_ln": _ln(sd, "final_layer_norm"),
    }


# ---------------------------------------------------------------------------
# torch.nn.Transformer (the gill_mapper core)
# ---------------------------------------------------------------------------

def _torch_mha(sd, prefix, d_model: int) -> dict:
    """torch.nn.MultiheadAttention packed in_proj -> split q/k/v + out."""
    w = _np(sd[prefix + ".in_proj_weight"])  # (3D, D)
    b = _np(sd[prefix + ".in_proj_bias"])    # (3D,)
    qw, kw, vw = w[:d_model], w[d_model:2 * d_model], w[2 * d_model:]
    qb, kb, vb = b[:d_model], b[d_model:2 * d_model], b[2 * d_model:]
    return {
        "q": {"w": qw.T, "b": qb},
        "k": {"w": kw.T, "b": kb},
        "v": {"w": vw.T, "b": vb},
        "o": _lin(sd, prefix + ".out_proj"),
    }


def torch_transformer_from_torch(sd, prefix: str, d_model: int,
                                 num_encoder_layers: int,
                                 num_decoder_layers: int) -> dict:
    """torch.nn.Transformer state_dict subtree -> mapper params.

    Layer structure mirrors TransformerEncoderLayer/DecoderLayer with
    norm_first=True (reference gill/layers.py:20-22).
    """
    enc_layers, dec_layers = [], []
    for i in range(num_encoder_layers):
        p = f"{prefix}encoder.layers.{i}"
        enc_layers.append({
            "self_attn": _torch_mha(sd, f"{p}.self_attn", d_model),
            "ln1": _ln(sd, f"{p}.norm1"),
            "fc1": _lin(sd, f"{p}.linear1"),
            "fc2": _lin(sd, f"{p}.linear2"),
            "ln2": _ln(sd, f"{p}.norm2"),
        })
    for i in range(num_decoder_layers):
        p = f"{prefix}decoder.layers.{i}"
        dec_layers.append({
            "self_attn": _torch_mha(sd, f"{p}.self_attn", d_model),
            "cross_attn": _torch_mha(sd, f"{p}.multihead_attn", d_model),
            "ln1": _ln(sd, f"{p}.norm1"),
            "ln2": _ln(sd, f"{p}.norm2"),
            "ln3": _ln(sd, f"{p}.norm3"),
            "fc1": _lin(sd, f"{p}.linear1"),
            "fc2": _lin(sd, f"{p}.linear2"),
        })
    return {
        "encoder": {"layers": _stack(enc_layers), "norm": _ln(sd, f"{prefix}encoder.norm")},
        "decoder": {"layers": _stack(dec_layers), "norm": _ln(sd, f"{prefix}decoder.norm")},
    }


def text_fc_layer_from_torch(sd, prefix: str, mode: str, d_model: int = 512,
                             num_encoder_layers: int = 4,
                             num_decoder_layers: int = 4) -> dict:
    """Reference TextFcLayer weights (gill/layers.py) -> mapper params."""
    if mode == "linear":
        return {"model": _lin(sd, prefix + "model")}
    assert mode == "gill_mapper", mode
    return {
        "fc": _lin(sd, prefix + "fc"),
        "tfm": torch_transformer_from_torch(
            sd, prefix + "tfm.", d_model, num_encoder_layers, num_decoder_layers),
        "model": _lin(sd, prefix + "model"),
        "query_embs": _np(sd[prefix + "query_embs"]),
    }
