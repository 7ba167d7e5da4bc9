"""FULL-MODEL golden parity for the SD pipeline against torch:

  * a complete diffusers-architecture UNet2DConditionModel replica in torch
    (exact state_dict naming) -> weights/convert.sd_unet_from_torch -> our
    JAX UNet, compared end-to-end at full block depth;
  * a complete VAE decoder replica -> sd_vae_decoder_from_torch -> decode;
  * a multi-step PLMS + classifier-free-guidance trajectory vs a numpy port
    of diffusers PNDMScheduler.step_plms driven by the SAME torch UNet —
    the 50-step denoise the reference runs (custom_sd.py:596-651), scaled to
    cover every PLMS order (1, 1.5, 2, 3, 4).

Set GILL_SLOW_TESTS=1 to also run the UNet golden at the real SD-v1.5
architecture (860M params — minutes on CPU).
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.models.sd import unet as unet_mod
from gill_tpu.models.sd import vae as vae_mod
from gill_tpu.models.sd.pipeline import SDPipelineConfig, StableDiffusionPipeline
from gill_tpu.models.sd.scheduler import SchedulerConfig
from gill_tpu.weights.convert import (sd_unet_from_torch,
                                      sd_vae_decoder_from_torch)

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from test_sd_blocks_torch import TorchResnet, TorchSpatialTfm  # noqa: E402


# ---------------------------------------------------------------------------
# torch UNet2DConditionModel replica (diffusers structure + key names)
# ---------------------------------------------------------------------------

class _Downsampler(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class _Upsampler(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _DownBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, temb, ctx_dim, heads, groups, layers,
                 cross, downsample):
        super().__init__()
        self.resnets = tnn.ModuleList([
            TorchResnet(in_ch if j == 0 else out_ch, out_ch, temb, groups)
            for j in range(layers)])
        if cross:
            self.attentions = tnn.ModuleList([
                TorchSpatialTfm(out_ch, ctx_dim, heads, groups)
                for _ in range(layers)])
        if downsample:
            self.downsamplers = tnn.ModuleList([_Downsampler(out_ch)])


class _UpBlock(tnn.Module):
    def __init__(self, prev_ch, out_ch, skip_in_ch, temb, ctx_dim, heads,
                 groups, layers, cross, upsample):
        super().__init__()
        res = []
        for j in range(layers + 1):
            res_skip = skip_in_ch if j == layers else out_ch
            res_in = prev_ch if j == 0 else out_ch
            res.append(TorchResnet(res_in + res_skip, out_ch, temb, groups))
        self.resnets = tnn.ModuleList(res)
        if cross:
            self.attentions = tnn.ModuleList([
                TorchSpatialTfm(out_ch, ctx_dim, heads, groups)
                for _ in range(layers + 1)])
        if upsample:
            self.upsamplers = tnn.ModuleList([_Upsampler(out_ch)])


class _TimeEmbedding(tnn.Module):
    def __init__(self, ch, temb):
        super().__init__()
        self.linear_1 = tnn.Linear(ch, temb)
        self.linear_2 = tnn.Linear(temb, temb)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


def _np_timestep_embedding(timesteps, dim, flip_sin_to_cos=True,
                           freq_shift=0.0):
    """diffusers get_timestep_embedding in numpy."""
    half = dim // 2
    exponent = -math.log(10000.0) * np.arange(half, dtype=np.float32)
    exponent = exponent / (half - freq_shift)
    emb = np.exp(exponent)[None, :] * np.asarray(timesteps,
                                                 np.float32)[:, None]
    sin, cos = np.sin(emb), np.cos(emb)
    return np.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], -1)


class TorchUNet(tnn.Module):
    """Full UNet2DConditionModel replica built from the tested block
    replicas, with diffusers' exact parameter names."""

    def __init__(self, cfg: unet_mod.UNetConfig):
        super().__init__()
        self.cfg = cfg
        ch0 = cfg.block_out_channels[0]
        temb = cfg.time_embed_dim
        g = cfg.norm_groups
        self.conv_in = tnn.Conv2d(cfg.in_channels, ch0, 3, padding=1)
        self.time_embedding = _TimeEmbedding(ch0, temb)

        downs = []
        out_ch = ch0
        for i, btype in enumerate(cfg.down_block_types):
            in_ch, out_ch = out_ch, cfg.block_out_channels[i]
            downs.append(_DownBlock(
                in_ch, out_ch, temb, cfg.cross_attention_dim, cfg.num_heads,
                g, cfg.layers_per_block, btype == "CrossAttnDownBlock2D",
                downsample=i < len(cfg.down_block_types) - 1))
        self.down_blocks = tnn.ModuleList(downs)

        mid_ch = cfg.block_out_channels[-1]

        class _Mid(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = tnn.ModuleList([
                    TorchResnet(mid_ch, mid_ch, temb, g),
                    TorchResnet(mid_ch, mid_ch, temb, g)])
                self.attentions = tnn.ModuleList([
                    TorchSpatialTfm(mid_ch, cfg.cross_attention_dim,
                                    cfg.num_heads, g)])

        self.mid_block = _Mid()

        ups = []
        rev = list(reversed(cfg.block_out_channels))
        prev_ch = mid_ch
        for i, btype in enumerate(cfg.up_block_types):
            out_ch = rev[i]
            skip_in_ch = rev[min(i + 1, len(rev) - 1)]
            ups.append(_UpBlock(
                prev_ch, out_ch, skip_in_ch, temb, cfg.cross_attention_dim,
                cfg.num_heads, g, cfg.layers_per_block,
                btype == "CrossAttnUpBlock2D",
                upsample=i < len(cfg.up_block_types) - 1))
            prev_ch = out_ch
        self.up_blocks = tnn.ModuleList(ups)

        self.conv_norm_out = tnn.GroupNorm(g, ch0, eps=1e-5)
        self.conv_out = tnn.Conv2d(ch0, cfg.out_channels, 3, padding=1)

    def state_dict_diffusers(self):
        sd = {}
        for k, v in self.named_parameters():
            k = k.replace("_geglu", "transformer_blocks.0.ff.net.0.proj")
            k = k.replace("_ff_out", "transformer_blocks.0.ff.net.2")
            sd[k] = v.detach()
        return sd

    def forward(self, sample, timesteps, ctx):
        """sample NCHW; timesteps (B,); ctx (B, T, D)."""
        cfg = self.cfg
        temb = torch.tensor(_np_timestep_embedding(
            timesteps.numpy(), cfg.block_out_channels[0],
            cfg.flip_sin_to_cos, cfg.freq_shift))
        emb = self.time_embedding(temb)

        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            for j, res in enumerate(blk.resnets):
                x = res(x, emb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, ctx)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, emb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, emb)

        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, emb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, ctx)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)

        x = self.conv_norm_out(x)
        return self.conv_out(F.silu(x))


def _unet_golden(cfg, batch=2, size=16, seed=0, atol=2e-4):
    torch.manual_seed(seed)
    tm = TorchUNet(cfg).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, sd_unet_from_torch(tm.state_dict_diffusers(), cfg))

    rng = np.random.RandomState(seed)
    lat = rng.randn(batch, cfg.in_channels, size, size).astype(np.float32)
    ctx = rng.randn(batch, 7, cfg.cross_attention_dim).astype(np.float32)
    for t in (999.0, 481.0, 1.0):
        ts = np.full((batch,), t, np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(lat), torch.tensor(ts),
                     torch.tensor(ctx)).numpy()
        got = unet_mod.apply(params, cfg, jnp.asarray(lat.transpose(0, 2, 3, 1)),
                             jnp.asarray(ts), jnp.asarray(ctx))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                                   atol=atol, rtol=1e-3)


def test_unet_full_forward_golden_tiny():
    _unet_golden(unet_mod.tiny_unet_config(), size=8)


def test_unet_full_forward_golden_sd15_depth():
    """Full SD-v1.5 BLOCK STRUCTURE (4 down/up blocks, 2 layers/block,
    cross-attention placement, all skip routings) at reduced widths."""
    cfg = unet_mod.UNetConfig(block_out_channels=(32, 64, 96, 96),
                              layers_per_block=2, cross_attention_dim=16,
                              num_heads=4, norm_groups=8)
    _unet_golden(cfg, size=16)


@pytest.mark.skipif(os.environ.get("GILL_SLOW_TESTS") != "1",
                    reason="860M-param torch UNet; set GILL_SLOW_TESTS=1")
def test_unet_full_forward_golden_sd15_real_shape():
    """The exact SD-v1.5 architecture (as in the reference's checkpoint)."""
    _unet_golden(unet_mod.UNetConfig(), batch=1, size=32, atol=5e-4)


# ---------------------------------------------------------------------------
# torch VAE decoder replica
# ---------------------------------------------------------------------------

class _TorchVaeResnet(tnn.Module):
    def __init__(self, in_ch, out_ch, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = tnn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class _TorchVaeAttn(tnn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x)
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        a = F.scaled_dot_product_attention(q[:, None], k[:, None],
                                           v[:, None])[:, 0]
        y = self.to_out[0](a).reshape(b, h, w, c).permute(0, 3, 1, 2)
        return x + y


class TorchVAEDecoder(tnn.Module):
    """diffusers AutoencoderKL decode path with exact key names."""

    def __init__(self, cfg: vae_mod.VAEConfig):
        super().__init__()
        g = cfg.norm_groups
        rev = list(reversed(cfg.block_out_channels))
        ch = rev[0]
        self.post_quant_conv = tnn.Conv2d(cfg.latent_channels,
                                          cfg.latent_channels, 1)

        class _Mid(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = tnn.ModuleList([
                    _TorchVaeResnet(ch, ch, g), _TorchVaeResnet(ch, ch, g)])
                self.attentions = tnn.ModuleList([_TorchVaeAttn(ch, g)])

        class _Up(tnn.Module):
            def __init__(self, prev, out, upsample):
                super().__init__()
                self.resnets = tnn.ModuleList([
                    _TorchVaeResnet(prev if j == 0 else out, out, g)
                    for j in range(cfg.layers_per_block + 1)])
                if upsample:
                    self.upsamplers = tnn.ModuleList([_Upsampler(out)])

        class _Decoder(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv_in = tnn.Conv2d(cfg.latent_channels, ch, 3,
                                          padding=1)
                self.mid_block = _Mid()
                ups, prev = [], ch
                for i, out in enumerate(rev):
                    ups.append(_Up(prev, out, i < len(rev) - 1))
                    prev = out
                self.up_blocks = tnn.ModuleList(ups)
                self.conv_norm_out = tnn.GroupNorm(g, rev[-1], eps=1e-6)
                self.conv_out = tnn.Conv2d(rev[-1], cfg.in_channels, 3,
                                           padding=1)

        self.decoder = _Decoder()

    def forward(self, latents):
        x = self.post_quant_conv(latents / vae_mod.SCALING_FACTOR)
        d = self.decoder
        x = d.conv_in(x)
        x = d.mid_block.resnets[0](x)
        x = d.mid_block.attentions[0](x)
        x = d.mid_block.resnets[1](x)
        for blk in d.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        x = d.conv_norm_out(x)
        return d.conv_out(F.silu(x))


def test_vae_decoder_full_golden():
    cfg = vae_mod.VAEConfig(block_out_channels=(8, 16, 24), layers_per_block=1,
                            norm_groups=4)
    torch.manual_seed(3)
    tm = TorchVAEDecoder(cfg).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray,
        sd_vae_decoder_from_torch(
            {k: v.detach() for k, v in tm.state_dict().items()}, cfg))

    rng = np.random.RandomState(3)
    lat = rng.randn(2, cfg.latent_channels, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(lat)).numpy()
    got = vae_mod.decode(params, cfg, jnp.asarray(lat.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# full PLMS + CFG trajectory vs numpy diffusers port
# ---------------------------------------------------------------------------

class NumpyPNDM:
    """diffusers PNDMScheduler (skip_prk_steps=True) in numpy, stateful like
    the original — the independent reference for our lax.scan scheduler."""

    def __init__(self, cfg: SchedulerConfig, num_inference_steps: int):
        if cfg.beta_schedule == "scaled_linear":
            betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                                cfg.num_train_timesteps,
                                dtype=np.float64) ** 2
        else:
            betas = np.linspace(cfg.beta_start, cfg.beta_end,
                                cfg.num_train_timesteps, dtype=np.float64)
        self.acp = np.cumprod(1.0 - betas)
        self.final_alpha = 1.0 if cfg.set_alpha_to_one else self.acp[0]
        self.ratio = cfg.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * self.ratio).round().astype(
            np.int64) + cfg.steps_offset
        self.timesteps = np.concatenate(
            [ts[:-1], ts[-2:-1], ts[-1:]])[::-1].copy()
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def step(self, model_output, timestep, sample):
        prev_timestep = timestep - self.ratio
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(model_output)
        else:
            prev_timestep = timestep
            timestep = timestep + self.ratio

        if len(self.ets) == 1 and self.counter == 0:
            mo = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            mo = (model_output + self.ets[-1]) / 2.0
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            mo = (3.0 * self.ets[-1] - self.ets[-2]) / 2.0
        elif len(self.ets) == 3:
            mo = (23.0 * self.ets[-1] - 16.0 * self.ets[-2]
                  + 5.0 * self.ets[-3]) / 12.0
        else:
            mo = (55.0 * self.ets[-1] - 59.0 * self.ets[-2]
                  + 37.0 * self.ets[-3] - 9.0 * self.ets[-4]) / 24.0

        a_t = self.acp[timestep]
        a_prev = self.acp[prev_timestep] if prev_timestep >= 0 \
            else self.final_alpha
        sample_coeff = (a_prev / a_t) ** 0.5
        denom = a_t * (1.0 - a_prev) ** 0.5 + (
            a_t * (1.0 - a_t) * a_prev) ** 0.5
        prev = sample_coeff * sample - (a_prev - a_t) * mo / denom
        self.counter += 1
        return prev


@pytest.mark.parametrize("steps", [6, 11])
def test_full_plms_cfg_trajectory_matches_numpy(steps):
    """End-to-end CFG denoise: our one-scan pipeline vs torch UNet + numpy
    PNDM, covering PLMS orders 1 / 1.5 / 2 / 3 / 4 (and, at 11 steps, the
    steady-state 4th-order region the 50-step run lives in)."""
    ucfg = unet_mod.tiny_unet_config()
    torch.manual_seed(7)
    tm = TorchUNet(ucfg).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, sd_unet_from_torch(tm.state_dict_diffusers(), ucfg))

    scfg = SchedulerConfig()
    guidance = 7.5
    b, size = 2, 8
    rng = np.random.RandomState(7)
    lat0 = rng.randn(b, size, size, ucfg.in_channels).astype(np.float32)
    pos = rng.randn(b, 5, ucfg.cross_attention_dim).astype(np.float32)
    neg = rng.randn(b, 5, ucfg.cross_attention_dim).astype(np.float32)

    # --- numpy + torch reference ---
    sch = NumpyPNDM(scfg, steps)
    lat = lat0.transpose(0, 3, 1, 2).astype(np.float64)
    ctx_t = torch.tensor(np.concatenate([neg, pos], axis=0))
    for t in sch.timesteps:
        lat_in = np.concatenate([lat, lat], axis=0).astype(np.float32)
        ts = np.full((2 * b,), float(t), np.float32)
        with torch.no_grad():
            eps = tm(torch.tensor(lat_in), torch.tensor(ts), ctx_t).numpy()
        eps_u, eps_t = eps[:b], eps[b:]
        eps = eps_u + guidance * (eps_t - eps_u)
        lat = sch.step(eps.astype(np.float64), int(t), lat)
    ref = lat.transpose(0, 2, 3, 1)

    # --- ours: one jitted lax.scan ---
    pcfg = SDPipelineConfig(unet=ucfg)
    pipe = StableDiffusionPipeline(pcfg, {"unet": params, "vae_decoder": None})
    ctx = jnp.asarray(np.concatenate([neg, pos], axis=0))
    got = pipe.denoise(jnp.asarray(lat0), ctx, steps, guidance)
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=2e-3)
