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
    out = {
        "class_embedding": _np(sd["embeddings.class_embedding"]),
        "patch_embedding": {
            "w": _np(sd["embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
        },
        "position_embedding": {"weight": _np(sd["embeddings.position_embedding.weight"])},
        "pre_ln": _ln(sd, "pre_layrnorm"),  # (sic) HF attribute name
        "layers": _stack(layers),
        "post_ln": _ln(sd, "post_layernorm"),
    }
    # Present when converting a full CLIPModel (used by the CLIP-sim evals).
    if "visual_projection.weight" in sd:
        out["visual_projection"] = _lin(sd, "visual_projection")
    return out


def safety_checker_from_torch(sd, cfg) -> dict:
    """diffusers `StableDiffusionSafetyChecker` state_dict -> safety params.

    Keys: vision_model.vision_model.* (CLIP ViT tower), visual_projection
    (bias-free), and the concept/special-care embedding buffers
    (reference custom_sd.py:653-661 runs this model post-decode)."""
    vis_sd = {k[len("vision_model."):]: v for k, v in sd.items()
              if k.startswith("vision_model.")}
    vis_sd["visual_projection.weight"] = sd["visual_projection.weight"]
    vision = clip_vision_from_torch(vis_sd, cfg.vision)
    params = {
        "vision": vision,
        "concept_embeds": _np(sd["concept_embeds"]),
        "special_care_embeds": _np(sd["special_care_embeds"]),
        "concept_embeds_weights": _np(sd["concept_embeds_weights"]),
        "special_care_embeds_weights": _np(sd["special_care_embeds_weights"]),
    }
    assert params["concept_embeds"].shape == (cfg.num_concepts,
                                              cfg.projection_dim)
    assert params["special_care_embeds"].shape == (cfg.num_special,
                                                   cfg.projection_dim)
    return params


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


# ---------------------------------------------------------------------------
# Stable Diffusion (diffusers UNet2DConditionModel / AutoencoderKL)
# ---------------------------------------------------------------------------

class _Tracked:
    """Wraps a state dict and records consumed keys so converters can assert
    full coverage (catches architecture drift against real checkpoints)."""

    def __init__(self, sd):
        self.sd = sd
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return self.sd[k]

    def __contains__(self, k):
        return k in self.sd

    def unused(self, prefix=""):
        return [k for k in self.sd
                if k.startswith(prefix) and k not in self.used]


def _gn(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _sd_resnet(sd, p, has_temb=True):
    out = {
        "norm1": _gn(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _gn(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if has_temb and f"{p}.time_emb_proj.weight" in sd:
        out["time_emb"] = _lin(sd, f"{p}.time_emb_proj")
    if f"{p}.conv_shortcut.weight" in sd:
        out["shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _sd_attn_proj(sd, p):
    return {
        "q": _lin(sd, f"{p}.to_q"),
        "k": _lin(sd, f"{p}.to_k"),
        "v": _lin(sd, f"{p}.to_v"),
        "o": _lin(sd, f"{p}.to_out.0"),
    }


def _sd_spatial_tfm(sd, p):
    tb = f"{p}.transformer_blocks.0"
    return {
        "norm": _gn(sd, f"{p}.norm"),
        "proj_in": _conv(sd, f"{p}.proj_in"),
        "block": {
            "ln1": _ln(sd, f"{tb}.norm1"),
            "attn1": _sd_attn_proj(sd, f"{tb}.attn1"),
            "ln2": _ln(sd, f"{tb}.norm2"),
            "attn2": _sd_attn_proj(sd, f"{tb}.attn2"),
            "ln3": _ln(sd, f"{tb}.norm3"),
            "geglu": _lin(sd, f"{tb}.ff.net.0.proj"),
            "ff_out": _lin(sd, f"{tb}.ff.net.2"),
        },
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def sd_unet_from_torch(sd_raw, cfg) -> dict:
    """diffusers UNet2DConditionModel state_dict -> gill_tpu sd.unet params."""
    sd = _Tracked(sd_raw)
    params = {
        "conv_in": _conv(sd, "conv_in"),
        "time_fc1": _lin(sd, "time_embedding.linear_1"),
        "time_fc2": _lin(sd, "time_embedding.linear_2"),
        "down": [], "up": [],
        "norm_out": _gn(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    for i, btype in enumerate(cfg.down_block_types):
        p = f"down_blocks.{i}"
        block = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(_sd_resnet(sd, f"{p}.resnets.{j}"))
            if btype == "CrossAttnDownBlock2D":
                block["attns"].append(_sd_spatial_tfm(sd, f"{p}.attentions.{j}"))
        if f"{p}.downsamplers.0.conv.weight" in sd:
            block["downsample"] = _conv(sd, f"{p}.downsamplers.0.conv")
        params["down"].append(block)
    params["mid"] = {
        "res1": _sd_resnet(sd, "mid_block.resnets.0"),
        "attn": _sd_spatial_tfm(sd, "mid_block.attentions.0"),
        "res2": _sd_resnet(sd, "mid_block.resnets.1"),
    }
    for i, btype in enumerate(cfg.up_block_types):
        p = f"up_blocks.{i}"
        block = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(_sd_resnet(sd, f"{p}.resnets.{j}"))
            if btype == "CrossAttnUpBlock2D":
                block["attns"].append(_sd_spatial_tfm(sd, f"{p}.attentions.{j}"))
        if f"{p}.upsamplers.0.conv.weight" in sd:
            block["upsample"] = _conv(sd, f"{p}.upsamplers.0.conv")
        params["up"].append(block)
    leftover = sd.unused()
    assert not leftover, f"unconverted UNet keys: {leftover[:8]}"
    return params


def _sd_vae_attn(sd, p):
    """VAE bottleneck attention; supports both new (to_q/group_norm) and old
    (query/norm/proj_attn) diffusers key spellings, and 1x1-conv weights."""
    def pick(*names):
        for n in names:
            if f"{p}.{n}.weight" in sd:
                return n
        raise KeyError(f"none of {names} under {p}")

    def lin_sq(name):
        w = _np(sd[f"{p}.{name}.weight"])
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return {"w": w.T, "b": _np(sd[f"{p}.{name}.bias"])}

    return {
        "norm": _gn(sd, f"{p}.{pick('group_norm', 'norm')}"),
        "q": lin_sq(pick("to_q", "query")),
        "k": lin_sq(pick("to_k", "key")),
        "v": lin_sq(pick("to_v", "value")),
        "o": lin_sq("to_out.0" if f"{p}.to_out.0.weight" in sd else "proj_attn"),
    }


def sd_vae_decoder_from_torch(sd_raw, cfg) -> dict:
    sd = _Tracked(sd_raw)
    rev = list(reversed(cfg.block_out_channels))
    params = {
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid": {
            "res1": _sd_resnet(sd, "decoder.mid_block.resnets.0", False),
            "attn": _sd_vae_attn(sd, "decoder.mid_block.attentions.0"),
            "res2": _sd_resnet(sd, "decoder.mid_block.resnets.1", False),
        },
        "up": [],
        "norm_out": _gn(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    for i in range(len(rev)):
        p = f"decoder.up_blocks.{i}"
        block = {"resnets": [
            _sd_resnet(sd, f"{p}.resnets.{j}", False)
            for j in range(cfg.layers_per_block + 1)]}
        if f"{p}.upsamplers.0.conv.weight" in sd:
            block["upsample"] = _conv(sd, f"{p}.upsamplers.0.conv")
        params["up"].append(block)
    leftover = sd.unused("decoder.") + sd.unused("post_quant")
    assert not leftover, f"unconverted VAE decoder keys: {leftover[:8]}"
    return params


def sd_vae_encoder_from_torch(sd_raw, cfg) -> dict:
    sd = _Tracked(sd_raw)
    params = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "down": [],
        "mid": {
            "res1": _sd_resnet(sd, "encoder.mid_block.resnets.0", False),
            "attn": _sd_vae_attn(sd, "encoder.mid_block.attentions.0"),
            "res2": _sd_resnet(sd, "encoder.mid_block.resnets.1", False),
        },
        "norm_out": _gn(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "quant_conv": _conv(sd, "quant_conv"),
    }
    for i in range(len(cfg.block_out_channels)):
        p = f"encoder.down_blocks.{i}"
        block = {"resnets": [
            _sd_resnet(sd, f"{p}.resnets.{j}", False)
            for j in range(cfg.layers_per_block)]}
        if f"{p}.downsamplers.0.conv.weight" in sd:
            block["downsample"] = _conv(sd, f"{p}.downsamplers.0.conv")
        params["down"].append(block)
    return params


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
