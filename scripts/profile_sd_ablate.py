"""Ablation timing of the SD UNet: time the FULL step with individual
components replaced by identities; component cost = full - ablated.
More reliable than isolated micro-benches over the remote relay."""

import time
from functools import partial

import jax
import jax.numpy as jnp

from gill_tpu.models.sd import unet as unet_mod
from gill_tpu.nn import core as nn


def timed(fn, *args, n1=2, n2=10):
    @partial(jax.jit, static_argnames=("n",))
    def rep(n, *a):
        def body(c, _):
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            return out.astype(jnp.float32).mean() * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    float(rep(n1, *args))
    t0 = time.perf_counter(); float(rep(n1, *args)); t1 = time.perf_counter() - t0
    float(rep(n2, *args))
    t0 = time.perf_counter(); float(rep(n2, *args)); t2 = time.perf_counter() - t0
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    cfg = unet_mod.UNetConfig()
    B = 2 * 4
    key = jax.random.PRNGKey(0)
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)
    params = jax.tree.map(lambda a: jnp.zeros(a.shape, jnp.bfloat16),
                          unet_mod.init(key, cfg))
    lat = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
    ts = jnp.full((B,), 500, jnp.int32)

    orig_tfm_block = unet_mod._tfm_block
    orig_spatial = unet_mod._spatial_tfm
    orig_resnet = unet_mod._resnet

    def run():
        return timed(lambda l: unet_mod.apply(params, cfg, l, ts, ctx), lat)

    def tfm_no(parts):
        def f(p, x, ctx, num_heads, eps=1e-5):
            if "self" not in parts:
                x = x + unet_mod._attention(
                    p["attn1"], nn.layer_norm(p["ln1"], x, eps),
                    nn.layer_norm(p["ln1"], x, eps), num_heads)
            if "cross" not in parts:
                x = x + unet_mod._attention(
                    p["attn2"], nn.layer_norm(p["ln2"], x, eps), ctx, num_heads)
            if "ff" not in parts:
                h = nn.layer_norm(p["ln3"], x, eps)
                h = nn.linear(p["geglu"], h)
                val, gate = jnp.split(h, 2, axis=-1)
                x = x + nn.linear(p["ff_out"],
                                  val * jax.nn.gelu(gate, approximate=False))
            return x
        return f

    def resnet_cheap(p, x, temb, groups):
        if "shortcut" in p:
            return nn.conv2d(p["shortcut"], x, padding=0)
        return x

    def spatial_identity(p, x, ctx, num_heads, groups):
        return x

    base = run()
    print(f"baseline                 {base*1e3:8.3f} ms", flush=True)

    for name, parts in [("self-attn", ("self",)), ("cross-attn", ("cross",)),
                        ("geglu-ff", ("ff",)),
                        ("all-attn+ff", ("self", "cross", "ff"))]:
        unet_mod._tfm_block = tfm_no(parts)
        t = run()
        unet_mod._tfm_block = orig_tfm_block
        print(f"w/o {name:<20} {t*1e3:8.3f} ms  (delta {1e3*(base-t):7.3f})",
              flush=True)

    unet_mod._spatial_tfm = spatial_identity
    t = run()
    unet_mod._spatial_tfm = orig_spatial
    print(f"w/o {'spatial-tfm (all)':<20} {t*1e3:8.3f} ms  "
          f"(delta {1e3*(base-t):7.3f})", flush=True)

    unet_mod._resnet = resnet_cheap
    t = run()
    unet_mod._resnet = orig_resnet
    print(f"w/o {'resnet bodies':<20} {t*1e3:8.3f} ms  "
          f"(delta {1e3*(base-t):7.3f})", flush=True)


if __name__ == "__main__":
    main()
