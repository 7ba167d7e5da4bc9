"""Component-level timing of the SD v1.5 UNet denoise step on one chip.

Times each building block (self-attn, cross-attn, GEGLU FF, resnet,
norms+projections) at every UNet resolution with the real CFG batch, plus
the full UNet step, so optimization effort lands where the time is.

Timing over the remote TPU relay: each measurement runs the op N times
inside one compiled scan returning a scalar; cost = delta between two N
values (cancels fixed dispatch overhead).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

from gill_tpu.models.sd import unet as unet_mod
from gill_tpu.nn import core as nn


def timed(fn, *args, n1=2, n2=12):
    """Carry feeds the first argument so the body can't be hoisted/DCE'd."""

    @partial(jax.jit, static_argnames=("n",))
    def rep(n, *a):
        def body(c, _):
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            return out.astype(jnp.float32).mean() * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    float(rep(n1, *args))
    t0 = time.perf_counter()
    float(rep(n1, *args))
    t1 = time.perf_counter() - t0
    float(rep(n2, *args))
    t0 = time.perf_counter()
    float(rep(n2, *args))
    t2 = time.perf_counter() - t0
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    cfg = unet_mod.UNetConfig()
    B = 2 * 4  # CFG batch for 4 images
    key = jax.random.PRNGKey(0)
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)

    # (hw, ch, n_self_attn_layers_at_this_res incl. cross/ff counts)
    # SD v1.5 at 512^2: 64x64/320 -> 5 tfm blocks, 32x32/640 -> 5,
    # 16x16/1280 -> 5, mid 8x8/1280 -> 1.
    resolutions = [(64, 320, 5), (32, 640, 5), (16, 1280, 5), (8, 1280, 1)]

    total_accounted = 0.0
    print(f"{'component':<34}{'ms':>9}{'ms*layers':>11}")
    for hw, ch, nlayers in resolutions:
        S = hw * hw
        nh = cfg.num_heads
        x = jax.random.normal(key, (B, S, ch), jnp.bfloat16) * 0.02
        ximg = x.reshape(B, hw, hw, ch)
        p_tfm = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            unet_mod._init_spatial_tfm(key, ch, 768, cfg.norm_groups,
                                       jnp.bfloat16))
        p_res = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            unet_mod._init_resnet(key, ch, ch, cfg.time_embed_dim,
                                  cfg.norm_groups, jnp.bfloat16))
        temb = jax.random.normal(key, (B, cfg.time_embed_dim), jnp.bfloat16)

        blk = p_tfm["block"]

        t_self = timed(lambda a: unet_mod._attention(blk["attn1"], a, a, nh), x)
        t_cross = timed(
            lambda a, c: unet_mod._attention(blk["attn2"], a, c, nh), x, ctx)

        def ff(a):
            h = nn.linear(blk["geglu"], a)
            val, gate = jnp.split(h, 2, axis=-1)
            return nn.linear(blk["ff_out"], val * jax.nn.gelu(gate, approximate=False))

        t_ff = timed(ff, x)
        t_tfm = timed(
            lambda a, c: unet_mod._spatial_tfm(p_tfm, a, c, nh,
                                               cfg.norm_groups), ximg, ctx)
        t_res = timed(
            lambda a, t: unet_mod._resnet(p_res, a, t, cfg.norm_groups),
            ximg, temb)

        n_res = nlayers + (2 if hw == 8 else 0)
        for name, t, mult in [
            (f"{hw}x{hw}/{ch} self-attn(S={S})", t_self, nlayers),
            (f"{hw}x{hw}/{ch} cross-attn", t_cross, nlayers),
            (f"{hw}x{hw}/{ch} geglu-ff", t_ff, nlayers),
            (f"{hw}x{hw}/{ch} spatial_tfm total", t_tfm, nlayers),
            (f"{hw}x{hw}/{ch} resnet", t_res, n_res),
        ]:
            print(f"{name:<34}{t*1e3:>9.3f}{t*mult*1e3:>11.3f}")
        total_accounted += (t_tfm + t_res) * nlayers
        print()

    # full UNet step
    up = jax.tree.map(lambda a: jnp.zeros(a.shape, jnp.bfloat16),
                      unet_mod.init(key, cfg))
    lat = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
    ts = jnp.full((B,), 500, jnp.int32)
    t_unet = timed(lambda l: unet_mod.apply(up, cfg, l, ts, ctx), lat)
    print(f"{'FULL UNET step (CFG batch 8)':<34}{t_unet*1e3:>9.3f}")
    print(f"{'  -> img/s/chip @50 steps':<34}{4/(50*t_unet):>9.3f}")
    print(f"{'accounted tfm+res (approx)':<34}{total_accounted*1e3:>9.3f}")


if __name__ == "__main__":
    main()
