"""Stable Diffusion VAE (AutoencoderKL) in functional JAX, NHWC.

Parity target: the latent decode the reference performs at
gill/custom_sd.py:385-392 (1/0.18215 scaling hardcoded) plus the encoder for
completeness. SD v1.5 VAE: block channels (128, 256, 512, 512), 2 layers per
encoder block / 3 per decoder block, one single-head attention at the
bottleneck, GroupNorm(32, eps 1e-6), silu.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from gill_tpu.nn import core as nn

SCALING_FACTOR = 0.18215


@dataclasses.dataclass
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                     norm_groups=4)


def _init_resnet(key, in_ch, out_ch, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": nn.group_norm_init(in_ch, dtype),
        "conv1": nn.conv2d_init(k1, in_ch, out_ch, 3, dtype=dtype),
        "norm2": nn.group_norm_init(out_ch, dtype),
        "conv2": nn.conv2d_init(k2, out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        p["shortcut"] = nn.conv2d_init(k3, in_ch, out_ch, 1, dtype=dtype)
    return p


def _init_attn(key, ch, dtype):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "norm": nn.group_norm_init(ch, dtype),
        "q": nn.linear_init(kq, ch, ch, dtype=dtype),
        "k": nn.linear_init(kk, ch, ch, dtype=dtype),
        "v": nn.linear_init(kv, ch, ch, dtype=dtype),
        "o": nn.linear_init(ko, ch, ch, dtype=dtype),
    }


def init_decoder(key, cfg: VAEConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 48)
    ki = iter(range(48))
    nk = lambda: keys[next(ki)]
    rev = list(reversed(cfg.block_out_channels))
    ch = rev[0]
    params = {
        "post_quant_conv": nn.conv2d_init(nk(), cfg.latent_channels,
                                          cfg.latent_channels, 1, dtype=dtype),
        "conv_in": nn.conv2d_init(nk(), cfg.latent_channels, ch, 3, dtype=dtype),
        "mid": {
            "res1": _init_resnet(nk(), ch, ch, dtype),
            "attn": _init_attn(nk(), ch, dtype),
            "res2": _init_resnet(nk(), ch, ch, dtype),
        },
        "up": [],
        "norm_out": nn.group_norm_init(rev[-1], dtype),
        "conv_out": nn.conv2d_init(nk(), rev[-1], cfg.in_channels, 3, dtype=dtype),
    }
    prev = ch
    for i, out_ch in enumerate(rev):
        block = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(_init_resnet(
                nk(), prev if j == 0 else out_ch, out_ch, dtype))
        if i < len(rev) - 1:
            block["upsample"] = nn.conv2d_init(nk(), out_ch, out_ch, 3,
                                               dtype=dtype)
        params["up"].append(block)
        prev = out_ch
    return params


def init_encoder(key, cfg: VAEConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 48)
    ki = iter(range(48))
    nk = lambda: keys[next(ki)]
    chans = cfg.block_out_channels
    params = {
        "conv_in": nn.conv2d_init(nk(), cfg.in_channels, chans[0], 3, dtype=dtype),
        "down": [],
        "mid": {
            "res1": _init_resnet(nk(), chans[-1], chans[-1], dtype),
            "attn": _init_attn(nk(), chans[-1], dtype),
            "res2": _init_resnet(nk(), chans[-1], chans[-1], dtype),
        },
        "norm_out": nn.group_norm_init(chans[-1], dtype),
        "conv_out": nn.conv2d_init(nk(), chans[-1], 2 * cfg.latent_channels, 3,
                                   dtype=dtype),
        "quant_conv": nn.conv2d_init(nk(), 2 * cfg.latent_channels,
                                     2 * cfg.latent_channels, 1, dtype=dtype),
    }
    prev = chans[0]
    for i, out_ch in enumerate(chans):
        block = {"resnets": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(_init_resnet(
                nk(), prev if j == 0 else out_ch, out_ch, dtype))
        if i < len(chans) - 1:
            block["downsample"] = nn.conv2d_init(nk(), out_ch, out_ch, 3,
                                                 dtype=dtype)
        params["down"].append(block)
        prev = out_ch
    return params


def _resnet(p, x, groups):
    h = nn.group_norm(p["norm1"], x, groups, eps=1e-6)
    h = nn.conv2d(p["conv1"], jax.nn.silu(h), padding=1)
    h = nn.group_norm(p["norm2"], h, groups, eps=1e-6)
    h = nn.conv2d(p["conv2"], jax.nn.silu(h), padding=1)
    if "shortcut" in p:
        x = nn.conv2d(p["shortcut"], x, padding=0)
    return x + h


def _attn(p, x, groups):
    """Single-head self-attention over all spatial positions. Runs the
    shared flash core on TPU (the XLA fallback would materialize a
    (B, 4096, 4096) fp32 score tensor at 512px latents)."""
    from gill_tpu.ops.attention import dot_product_attention

    b, h, w, c = x.shape
    y = nn.group_norm(p["norm"], x, groups, eps=1e-6).reshape(b, h * w, c)
    q = nn.linear(p["q"], y)[:, :, None, :]
    k = nn.linear(p["k"], y)[:, :, None, :]
    v = nn.linear(p["v"], y)[:, :, None, :]
    # fast=False: unlike the UNet (post-LayerNorm q/k), the VAE q/k come
    # from an unnormalized linear over group-normed activations, so the
    # fast path's |logit|<clamp bound is not established here. One exact
    # softmax per image (a single 512-channel head) is noise in the decode
    # cost. (ADVICE r2)
    a = dot_product_attention(q, k, v, causal=False, fast=False)[:, :, 0, :]
    return x + nn.linear(p["o"], a).reshape(b, h, w, c)


def decode(params, cfg: VAEConfig, latents, scale: bool = True):
    """latents (B, h, w, 4) -> images (B, 8h, 8w, 3) in [-1, 1]."""
    g = cfg.norm_groups
    x = latents / SCALING_FACTOR if scale else latents
    x = nn.conv2d(params["post_quant_conv"], x, padding=0)
    x = nn.conv2d(params["conv_in"], x, padding=1)
    x = _resnet(params["mid"]["res1"], x, g)
    x = _attn(params["mid"]["attn"], x, g)
    x = _resnet(params["mid"]["res2"], x, g)
    for block in params["up"]:
        for res in block["resnets"]:
            x = _resnet(res, x, g)
        if "upsample" in block:
            b, h, w, c = x.shape
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
            x = nn.conv2d(block["upsample"], x, padding=1)
    x = nn.group_norm(params["norm_out"], x, g, eps=1e-6)
    x = nn.conv2d(params["conv_out"], jax.nn.silu(x), padding=1)
    return x


def encode(params, cfg: VAEConfig, images, rng=None, sample: bool = False):
    """images (B, H, W, 3) in [-1,1] -> latent (B, H/8, W/8, 4), scaled."""
    g = cfg.norm_groups
    x = nn.conv2d(params["conv_in"], images, padding=1)
    for block in params["down"]:
        for res in block["resnets"]:
            x = _resnet(res, x, g)
        if "downsample" in block:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = nn.conv2d(block["downsample"], x, stride=2, padding="VALID")
    x = _resnet(params["mid"]["res1"], x, g)
    x = _attn(params["mid"]["attn"], x, g)
    x = _resnet(params["mid"]["res2"], x, g)
    x = nn.group_norm(params["norm_out"], x, g, eps=1e-6)
    x = nn.conv2d(params["conv_out"], jax.nn.silu(x), padding=1)
    x = nn.conv2d(params["quant_conv"], x, padding=0)
    mean, logvar = jnp.split(x, 2, axis=-1)
    if sample:
        assert rng is not None
        mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * \
            jax.random.normal(rng, mean.shape, mean.dtype)
    return mean * SCALING_FACTOR
