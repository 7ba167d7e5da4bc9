"""TextFcLayer: maps LM hidden states at the [IMG] positions to visual
output spaces (parity target: reference gill/layers.py:5-53).

Two modes:
  * 'linear'      — one Linear; output truncated to num_output_tokens
                    (the retrieval head: 8 in-tokens -> 1 out-token x 256-d).
  * 'gill_mapper' — x+input_embs -> Linear(in,512) -> 4-enc/4-dec
                    transformer (pre-norm, nhead 4, ff 2048, relu, dropout 0,
                    final norms) with num_output_tokens learned queries ->
                    Linear(512,out)  (the generation head: 8 -> 77 x 768).

The transformer replicates torch.nn.Transformer(norm_first=True) numerics
exactly so converted reference checkpoints are bit-compatible:
encoder layer  h += attn(ln1(h)); h += ff(ln2(h)); final encoder.norm,
decoder layer  h += self_attn(ln1(h)); h += cross(ln2(h), mem);
               h += ff(ln3(h)); final decoder.norm.
No masks anywhere (the reference passes none).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gill_tpu.nn import core as nn


@dataclasses.dataclass
class MapperConfig:
    in_dim: int
    out_dim: int
    num_input_tokens: int = 1
    num_output_tokens: int = 1
    mode: str = "linear"          # 'linear' | 'gill_mapper'
    hidden_dim: int = 512
    num_heads: int = 4
    ffn_dim: int = 2048
    num_encoder_layers: int = 4
    num_decoder_layers: int = 4
    layer_norm_eps: float = 1e-5


def _init_enc_layer(key, d, ff, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "self_attn": nn.mha_init(k1, d, 1, dtype=dtype),  # heads split at apply
        "ln1": nn.layer_norm_init(d, dtype),
        "fc1": nn.linear_init(k2, d, ff, dtype=dtype),
        "fc2": nn.linear_init(k3, ff, d, dtype=dtype),
        "ln2": nn.layer_norm_init(d, dtype),
    }


def _init_dec_layer(key, d, ff, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "self_attn": nn.mha_init(k1, d, 1, dtype=dtype),
        "cross_attn": nn.mha_init(k2, d, 1, dtype=dtype),
        "ln1": nn.layer_norm_init(d, dtype),
        "ln2": nn.layer_norm_init(d, dtype),
        "ln3": nn.layer_norm_init(d, dtype),
        "fc1": nn.linear_init(k3, d, ff, dtype=dtype),
        "fc2": nn.linear_init(k4, ff, d, dtype=dtype),
    }


def init(key, cfg: MapperConfig, dtype=jnp.float32):
    if cfg.mode == "linear":
        return {"model": nn.linear_init(key, cfg.in_dim, cfg.out_dim, dtype=dtype)}
    assert cfg.mode == "gill_mapper", cfg.mode
    keys = jax.random.split(key, cfg.num_encoder_layers + cfg.num_decoder_layers + 3)
    d, ff = cfg.hidden_dim, cfg.ffn_dim
    enc = [
        _init_enc_layer(keys[i], d, ff, dtype) for i in range(cfg.num_encoder_layers)
    ]
    dec = [
        _init_dec_layer(keys[cfg.num_encoder_layers + i], d, ff, dtype)
        for i in range(cfg.num_decoder_layers)
    ]
    stack = lambda ls: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ls)
    return {
        "fc": nn.linear_init(keys[-3], cfg.in_dim, d, dtype=dtype),
        "tfm": {
            "encoder": {"layers": stack(enc), "norm": nn.layer_norm_init(d, dtype)},
            "decoder": {"layers": stack(dec), "norm": nn.layer_norm_init(d, dtype)},
        },
        "model": nn.linear_init(keys[-2], d, cfg.out_dim, dtype=dtype),
        "query_embs": jax.random.normal(
            keys[-1], (1, cfg.num_output_tokens, d), dtype),
    }


def _mha(p, x, ctx, num_heads):
    return nn.mha_apply(p, x, None if ctx is x else ctx, num_heads=num_heads,
                        causal=False)


def _transformer(p, src, tgt, *, num_heads: int, eps: float):
    def enc_body(h, lp):
        h = h + _mha(lp["self_attn"], nn.layer_norm(lp["ln1"], h, eps),
                     None, num_heads)
        h = h + nn.linear(lp["fc2"], jax.nn.relu(
            nn.linear(lp["fc1"], nn.layer_norm(lp["ln2"], h, eps))))
        return h, None

    mem, _ = jax.lax.scan(enc_body, src, p["encoder"]["layers"])
    mem = nn.layer_norm(p["encoder"]["norm"], mem, eps)

    def dec_body(h, lp):
        h = h + _mha(lp["self_attn"], nn.layer_norm(lp["ln1"], h, eps),
                     None, num_heads)
        x = nn.layer_norm(lp["ln2"], h, eps)
        h = h + nn.mha_apply(lp["cross_attn"], x, mem, num_heads=num_heads)
        h = h + nn.linear(lp["fc2"], jax.nn.relu(
            nn.linear(lp["fc1"], nn.layer_norm(lp["ln3"], h, eps))))
        return h, None

    out, _ = jax.lax.scan(dec_body, tgt, p["decoder"]["layers"])
    return nn.layer_norm(p["decoder"]["norm"], out, eps)


def apply(params, cfg: MapperConfig, x, input_embs: Optional[jax.Array] = None):
    """x: (N, T_in, in_dim); input_embs: (N, T_in, in_dim) or None.

    Returns (N, num_output_tokens, out_dim) for gill_mapper;
    (N, min(T_in, num_output_tokens), out_dim) for linear.
    """
    if cfg.mode == "gill_mapper":
        if input_embs is not None:
            x = x + input_embs
        x = nn.linear(params["fc"], x)
        queries = jnp.broadcast_to(
            params["query_embs"].astype(x.dtype),
            (x.shape[0],) + params["query_embs"].shape[1:])
        x = _transformer(params["tfm"], x, queries,
                         num_heads=cfg.num_heads, eps=cfg.layer_norm_eps)
        return nn.linear(params["model"], x)
    # linear mode: no input_embs addition (reference layers.py:31-32 only
    # adds for gill_mapper), truncate to num_output_tokens (layers.py:46-48).
    out = nn.linear(params["model"], x)
    if out.shape[1] != cfg.num_output_tokens:
        out = out[:, : cfg.num_output_tokens, :]
    return out
