"""Probe: fast-path flash attention with TILED k-blocks on the SD 64x64
self-attention shape (B=8 CFG batch, H=8, S=4096, d=40 padded to 128).

The shipped auto-block policy picks block_k == S (single-pass): one giant
QK matmul -> a serial VPU exp over the whole (block_q, 4096) f32 score
tile -> one PV matmul, with no MXU/VPU overlap inside a loop step. The
512x512 tiling previously measured SLOWER (5.12 ms) — but that was the
EXACT online-softmax path whose per-block max/rescale chain is serial VPU
work. The FAST path's per-block body is just clamp+exp+accumulate, so
k-tiling it lets Mosaic overlap block i's exp (VPU) with block i+1's
score matmul (MXU). This sweep measures that on the production
flash_attention_bthd path (head dim padded in the projections).
"""
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from gill_tpu.ops.attention import flash_attention_bthd  # noqa: E402


def timed(fn, *args, n1=2, n2=12):
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
    B, S, H, d, dp = 8, 4096, 8, 40, 128
    scale = 1.0 / np.sqrt(d)
    rng = np.random.RandomState(0)

    def padded(x):
        return jnp.asarray(np.pad(x, ((0, 0), (0, 0), (0, 0),
                                      (0, dp - d))), jnp.bfloat16)

    q = padded(rng.randn(B, S, H, d) * 0.3)
    k = padded(rng.randn(B, S, H, d) * 0.3)
    v = padded(rng.randn(B, S, H, d) * 0.3)

    # padded-flops rate: both matmuls run at dp=128
    flops = 2 * 2 * B * H * S * S * dp

    ref = np.asarray(flash_attention_bthd(q, k, v, fast=True,
                                          scale=scale), np.float32)
    rows = []
    for bq in (512, 1024):
        for bk in (512, 1024, 2048, 4096):
            fn = partial(flash_attention_bthd, fast=True, scale=scale,
                         block_q=bq, block_k=bk)
            out = np.asarray(fn(q, k, v), np.float32)
            err = float(np.abs(out - ref).max())
            dt = timed(fn, q, k, v)
            rows.append({"block_q": bq, "block_k": bk,
                         "ms": round(dt * 1e3, 3),
                         "padded_tflops": round(flops / dt / 1e12, 1),
                         "max_err_vs_shipped": err})
            print(json.dumps(rows[-1]), flush=True)

    base = timed(partial(flash_attention_bthd, fast=True, scale=scale),
                 q, k, v)
    rows.append({"block_q": "auto(1024)", "block_k": "auto(S)",
                 "ms": round(base * 1e3, 3),
                 "padded_tflops": round(flops / base / 1e12, 1)})
    print(json.dumps(rows[-1]), flush=True)
    with open("FLASH_BLOCKK_PROBE.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
