"""Block-level golden parity for the SD UNet: torch modules built with
diffusers' exact structure and state_dict naming, converted through
weights/convert.py, compared output-to-output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.models.sd import unet as unet_mod
from gill_tpu.weights.convert import _sd_resnet, _sd_spatial_tfm, _Tracked

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class TorchResnet(tnn.Module):
    """diffusers ResnetBlock2D (default config) with matching param names."""

    def __init__(self, in_ch, out_ch, temb_dim, groups=4):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=1e-5)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_dim, out_ch)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=1e-5)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = tnn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb):
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = F.silu(self.norm2(h))
        h = self.conv2(h)
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class TorchAttnProj(tnn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_v = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, t, d = x.shape
        h = self.heads
        q = self.to_q(x).view(b, t, h, d // h).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], h, d // h).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], h, d // h).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, t, d)
        return self.to_out[0](o)


class TorchTfmBlock(tnn.Module):
    """diffusers BasicTransformerBlock."""

    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TorchAttnProj(dim, dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TorchAttnProj(dim, ctx_dim, heads)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = tnn.ModuleList()  # placeholder for naming

    def forward(self, x, ctx, geglu, ff_out):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        h = geglu(self.norm3(x))
        val, gate = h.chunk(2, dim=-1)
        return x + ff_out(val * F.gelu(gate))


class TorchSpatialTfm(tnn.Module):
    """diffusers Transformer2DModel (use_linear_projection=False)."""

    def __init__(self, ch, ctx_dim, heads, groups=4):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = tnn.Conv2d(ch, ch, 1)
        self.transformer_blocks = tnn.ModuleList([TorchTfmBlock(ch, ctx_dim,
                                                                heads)])
        blk = self.transformer_blocks[0]
        blk.ff = tnn.Sequential()
        # diffusers names: ff.net.0.proj (GEGLU), ff.net.2 (out)
        net = tnn.ModuleDict()
        self.proj_out = tnn.Conv2d(ch, ch, 1)
        self._geglu = tnn.Linear(ch, ch * 8)
        self._ff_out = tnn.Linear(ch * 4, ch)

    def state_dict_diffusers(self):
        sd = {}
        for k, v in self.named_parameters():
            k = k.replace("_geglu", "transformer_blocks.0.ff.net.0.proj")
            k = k.replace("_ff_out", "transformer_blocks.0.ff.net.2")
            sd[k] = v.detach()
        return sd

    def forward(self, x, ctx):
        # x NCHW
        b, c, h, w = x.shape
        resid = x
        y = self.norm(x)
        y = self.proj_in(y)
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.transformer_blocks[0](y, ctx, self._geglu, self._ff_out)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + resid


def test_vae_attention_golden():
    """VAE bottleneck attention: group_norm + single-head qkv + residual
    (diffusers Attention with to_q/.../to_out naming)."""
    from gill_tpu.models.sd import vae as vae_mod
    from gill_tpu.weights.convert import _sd_vae_attn

    torch.manual_seed(2)
    ch = 16

    class TorchVaeAttn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.group_norm = tnn.GroupNorm(4, ch, eps=1e-6)
            self.to_q = tnn.Linear(ch, ch)
            self.to_k = tnn.Linear(ch, ch)
            self.to_v = tnn.Linear(ch, ch)
            self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

        def forward(self, x):
            b, c, h, w = x.shape
            y = self.group_norm(x)
            y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
            q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
            a = F.scaled_dot_product_attention(
                q[:, None], k[:, None], v[:, None])[:, 0]
            y = self.to_out[0](a).reshape(b, h, w, c).permute(0, 3, 1, 2)
            return x + y

    tm = TorchVaeAttn().eval()
    sd = _Tracked({"m." + k: v.detach() for k, v in tm.state_dict().items()})
    params = jax.tree_util.tree_map(jnp.asarray, _sd_vae_attn(sd, "m"))
    rng = np.random.RandomState(2)
    x = rng.randn(2, ch, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    got = vae_mod._attn(params, jnp.asarray(x.transpose(0, 2, 3, 1)), groups=4)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=3e-5, rtol=3e-5)


def test_resnet_block_golden():
    torch.manual_seed(0)
    tm = TorchResnet(8, 12, temb_dim=16).eval()
    sd = _Tracked({"blk." + k: v.detach() for k, v in tm.state_dict().items()})
    params = jax.tree_util.tree_map(jnp.asarray, _sd_resnet(sd, "blk"))

    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 6, 6).astype(np.float32)
    temb = rng.randn(2, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(temb)).numpy()
    got = unet_mod._resnet(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(temb), groups=4)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=3e-5, rtol=3e-5)


def test_spatial_transformer_golden():
    torch.manual_seed(1)
    ch, ctx_dim, heads = 16, 12, 2
    tm = TorchSpatialTfm(ch, ctx_dim, heads).eval()
    sd = _Tracked({"a." + k: v for k, v in tm.state_dict_diffusers().items()})
    params = jax.tree_util.tree_map(jnp.asarray, _sd_spatial_tfm(sd, "a"))

    rng = np.random.RandomState(1)
    x = rng.randn(2, ch, 4, 4).astype(np.float32)
    ctx = rng.randn(2, 7, ctx_dim).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(ctx)).numpy()
    got = unet_mod._spatial_tfm(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                jnp.asarray(ctx), num_heads=heads, groups=4)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=5e-5, rtol=5e-5)
