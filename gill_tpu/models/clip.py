"""CLIP towers (vision ViT + text encoder) as functional JAX models.

Vision: parity target HF `CLIPVisionModel` — the reference consumes only
`pooler_output` (post-layernormed [CLS]; gill/models.py:134-136). Used for
the visual side of captioning/retrieval and for CLIP-similarity evals.

Text: parity target HF `CLIPTextModel` — Stable Diffusion v1.5's prompt
encoder (reference gill/custom_sd.py:594-604 consumes last_hidden_state).
Causal attention, quick_gelu, final layer norm; pooling at the EOT token
for the eval scorer.

TPU-first: stacked layers + lax.scan; patch embedding as one NHWC conv that
XLA lowers to an MXU matmul; Pallas flash attention for the 257-token
vision sequence (no causal mask) via ops/attention.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gill_tpu.config import CLIPVisionConfig
from gill_tpu.nn import core as nn
from gill_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# ---------------------------------------------------------------------------
# shared encoder layer (pre-LN transformer block)
# ---------------------------------------------------------------------------

def _init_layer(key, d, heads, inter, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln1": nn.layer_norm_init(d, dtype),
        "attn": nn.mha_init(k1, d, heads, dtype=dtype),
        "ln2": nn.layer_norm_init(d, dtype),
        "fc1": nn.linear_init(k2, d, inter, dtype=dtype),
        "fc2": nn.linear_init(k3, inter, d, dtype=dtype),
    }


def _encoder_layer(lp, h, *, num_heads: int, causal: bool, eps: float):
    b, t, d = h.shape
    hd = d // num_heads
    resid = h
    x = nn.layer_norm(lp["ln1"], h, eps)
    q = nn.linear(lp["attn"]["q"], x).reshape(b, t, num_heads, hd)
    k = nn.linear(lp["attn"]["k"], x).reshape(b, t, num_heads, hd)
    v = nn.linear(lp["attn"]["v"], x).reshape(b, t, num_heads, hd)
    a = dot_product_attention(q, k, v, causal=causal)
    h = resid + nn.linear(lp["attn"]["o"], a.reshape(b, t, d))
    resid = h
    x = nn.layer_norm(lp["ln2"], h, eps)
    x = nn.linear(lp["fc2"], quick_gelu(nn.linear(lp["fc1"], x)))
    return resid + x


def _encoder(params_layers, h, *, num_heads: int, causal: bool, eps: float):
    def body(h, lp):
        return _encoder_layer(lp, h, num_heads=num_heads, causal=causal, eps=eps), None

    h, _ = jax.lax.scan(body, h, params_layers)
    return h


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------

def init_vision(key, cfg: CLIPVisionConfig, dtype=jnp.float32):
    n = cfg.num_layers
    keys = jax.random.split(key, n + 3)
    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[_init_layer(keys[i], cfg.hidden_size, cfg.num_heads,
                      cfg.intermediate_size, dtype) for i in range(n)])
    return {
        "class_embedding": jax.random.normal(keys[n], (cfg.hidden_size,), dtype) * 0.02,
        "patch_embedding": {
            "w": jax.random.normal(
                keys[n + 1], (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size),
                dtype) * 0.02,
        },
        "position_embedding": nn.embedding_init(keys[n + 2], cfg.seq_len,
                                                cfg.hidden_size, dtype),
        "pre_ln": nn.layer_norm_init(cfg.hidden_size, dtype),
        "layers": layers,
        "post_ln": nn.layer_norm_init(cfg.hidden_size, dtype),
    }


def vision_forward(params, cfg: CLIPVisionConfig, pixel_values):
    """pixel_values: (B, H, W, 3) NHWC, CLIP-normalized.

    Returns dict with "last_hidden" (B, 1+P, D) and "pooler_output" (B, D)
    (post_layernorm over [CLS]; the only vision feature the reference uses).
    """
    b = pixel_values.shape[0]
    patches = nn.conv2d(params["patch_embedding"], pixel_values,
                        stride=cfg.patch_size, padding="VALID")  # (B, h, w, D)
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(patches.dtype)[None, None],
        (b, 1, cfg.hidden_size))
    h = jnp.concatenate([cls, patches], axis=1)
    h = h + params["position_embedding"]["weight"].astype(h.dtype)[None]
    h = nn.layer_norm(params["pre_ln"], h, cfg.layer_norm_eps)
    h = _encoder(params["layers"], h, num_heads=cfg.num_heads, causal=False,
                 eps=cfg.layer_norm_eps)
    pooled = nn.layer_norm(params["post_ln"], h[:, 0], cfg.layer_norm_eps)
    return {"last_hidden": h, "pooler_output": pooled}


def get_image_features(params, cfg: CLIPVisionConfig, pixel_values):
    """pooler_output -> CLIP joint space via visual_projection (HF
    CLIPModel.get_image_features; the similarity metric used by the
    reference evals, evals/compute_clip_similarity_vist.py:40-51)."""
    pooled = vision_forward(params, cfg, pixel_values)["pooler_output"]
    assert "visual_projection" in params, \
        "load full CLIP weights (with visual_projection) for image features"
    return nn.linear(params["visual_projection"], pooled)


# ---------------------------------------------------------------------------
# text tower
# ---------------------------------------------------------------------------

def init_text(key, cfg: CLIPTextConfig, dtype=jnp.float32):
    n = cfg.num_layers
    keys = jax.random.split(key, n + 2)
    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[_init_layer(keys[i], cfg.hidden_size, cfg.num_heads,
                      cfg.intermediate_size, dtype) for i in range(n)])
    return {
        "token_embedding": nn.embedding_init(keys[n], cfg.vocab_size,
                                             cfg.hidden_size, dtype),
        "position_embedding": nn.embedding_init(keys[n + 1], cfg.max_positions,
                                                cfg.hidden_size, dtype),
        "layers": layers,
        "final_ln": nn.layer_norm_init(cfg.hidden_size, dtype),
    }


def text_forward(params, cfg: CLIPTextConfig, input_ids):
    """input_ids: (B, T). Returns "last_hidden" (B, T, D) (the SD prompt
    embedding surface) and "pooler_output" (B, D) at the EOT position."""
    b, t = input_ids.shape
    h = params["token_embedding"]["weight"][input_ids]
    h = h + params["position_embedding"]["weight"][:t][None].astype(h.dtype)
    h = _encoder(params["layers"], h, num_heads=cfg.num_heads, causal=True,
                 eps=cfg.layer_norm_eps)
    h = nn.layer_norm(params["final_ln"], h, cfg.layer_norm_eps)
    # EOT pooling: position of the eos token (HF uses argmax over ==eos).
    eot = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = jnp.take_along_axis(h, eot[:, None, None], axis=1)[:, 0]
    return {"last_hidden": h, "pooler_output": pooled}
