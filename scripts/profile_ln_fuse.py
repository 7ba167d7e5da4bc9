"""A/B of the LN-folded attention/GEGLU path vs explicit layer_norms on the
real chip, plus a numerics smoke (fused vs composed tfm block at bf16).

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_ln_fuse.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gill_tpu.models.sd import unet as unet_mod
from gill_tpu.nn import core as nn


def timed(fn, *args, n1=4, n2=28, reps=3):
    """Quadratic carry perturbation (x + c*x^2): a plain additive shift is
    invariant under the LayerNorms at the top of every fused block, so the
    whole body would hoist out of the scan. Median of `reps` deltas."""

    @partial(jax.jit, static_argnames=("n",))
    def rep(n, *a):
        def body(c, _):
            x = a[0]
            out = fn(x + (c.astype(x.dtype) * x) * x, *a[1:])
            return out.astype(jnp.float32).mean() * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    float(rep(n1, *args))
    float(rep(n2, *args))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(rep(n1, *args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(rep(n2, *args))
        t2 = time.perf_counter() - t0
        deltas.append((t2 - t1) / (n2 - n1))
    return max(sorted(deltas)[len(deltas) // 2], 1e-9)


def composed_tfm(p, x, ctx, nh):
    """The pre-fusion block: explicit layer_norms + ln=None helpers."""
    xn = nn.layer_norm(p["ln1"], x, 1e-5)
    x = x + unet_mod._attention(p["attn1"], xn, xn, nh)
    x = x + unet_mod._attention(p["attn2"], nn.layer_norm(p["ln2"], x, 1e-5),
                                ctx, nh)
    return x + unet_mod._geglu_ff(p, nn.layer_norm(p["ln3"], x, 1e-5))


def main():
    cfg = unet_mod.UNetConfig()
    B = 8
    key = jax.random.PRNGKey(0)
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)
    nh = cfg.num_heads

    for hw, ch, nlayers in [(64, 320, 5), (32, 640, 5), (16, 1280, 5),
                            (8, 1280, 1)]:
        S = hw * hw
        x = jax.random.normal(key, (B, S, ch), jnp.bfloat16) * 0.5
        blk = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            unet_mod._init_tfm_block(key, ch, 768, jnp.bfloat16))

        # numerics: fused vs composed at bf16
        a = jax.jit(lambda p, x, c: unet_mod._tfm_block(p, x, c, nh))(
            blk, x, ctx)
        b = jax.jit(lambda p, x, c: composed_tfm(p, x, c, nh))(blk, x, ctx)
        err = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)
                            ).max())
        ref = float(jnp.abs(b.astype(jnp.float32)).max())

        t_fused = timed(lambda v, c: unet_mod._tfm_block(blk, v, c, nh),
                        x, ctx)
        t_plain = timed(lambda v, c: composed_tfm(blk, v, c, nh), x, ctx)
        print(f"{hw}x{hw}/{ch}: fused {t_fused*1e3:7.3f} ms  "
              f"plain {t_plain*1e3:7.3f} ms  "
              f"saved*{nlayers} {(t_plain-t_fused)*nlayers*1e3:7.3f} ms  "
              f"max|d|={err:.4f} (ref max {ref:.1f})", flush=True)

    # full UNet step
    up = jax.tree.map(lambda a: jnp.zeros(a.shape, jnp.bfloat16),
                      unet_mod.init(key, cfg))
    lat = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
    ts = jnp.full((B,), 500, jnp.int32)
    t_unet = timed(lambda l: unet_mod.apply(up, cfg, l, ts, ctx), lat)
    print(f"FULL UNET step: {t_unet*1e3:.3f} ms -> "
          f"{4/(50*t_unet):.3f} img/s @50 steps", flush=True)


if __name__ == "__main__":
    main()
