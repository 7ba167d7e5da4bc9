"""Functional NN building blocks over explicit parameter pytrees.

Design notes (TPU-first):
  * Parameters are plain nested dicts of jnp arrays -> trivial to shard with
    jax.sharding (named rules match dict paths), to convert from torch
    state_dicts, and to checkpoint as a pytree.
  * Linear weights are stored (in_dim, out_dim) so `x @ w` maps straight onto
    the MXU with no transpose (torch stores (out, in); converters transpose).
  * Convolutions use NHWC activations and HWIO kernels - the layouts XLA:TPU
    tiles best.
  * Norms compute in fp32 regardless of activation dtype and cast back.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32):
    """Kaiming-uniform fan_in init (matches torch.nn.Linear defaults)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": _uniform(kw, (in_dim, out_dim), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_dim,), bound, dtype)
    return p


def linear(p, x):
    if "wq" in p:  # int8 W8A8 leaf (ops/quant.py)
        from gill_tpu.ops.quant import int8_linear

        return int8_linear(x, p["wq"], p["ws"], p.get("b"))
    if "w8" in p:
        # W8A16: int8 weights dequantized inside the matmul weight stream —
        # halves weight HBM traffic, the decode bottleneck (measured 3.1x
        # on the M=16 2560x10240 decode matmul vs bf16 weights). Small-M
        # calls on TPU use the Pallas kernel: the XLA formulation's dequant
        # is loop-invariant inside a decode scan and gets HOISTED into a
        # full bf16 weight copy (OOM at opt-6.7b).
        m = 1
        for d in x.shape[:-1]:
            m *= d
        if p["w8"].ndim == 3 and "layer_idx" in p:
            # STACKED per-layer weights (L, K, N) + layer index: the kernel
            # indexes the stack in its BlockSpec, so no per-layer slice is
            # materialized (a slice feeding a pallas custom-call forces a
            # full weight copy — 20 ms/token at opt-6.7b, profile_opt67.py).
            kdim, n = p["w8"].shape[1:]
            # "xla" marker = quantize_params_w8(kernel=False): force the
            # XLA dequant form even here (the stacked kernel is otherwise
            # the unrolled-path default)
            if ("xla" not in p and m <= 256
                    and jax.default_backend() == "tpu"
                    and kdim % 512 == 0 and n % 512 == 0):
                from gill_tpu.ops.w8_matmul import w8_matmul_stacked

                return w8_matmul_stacked(x, p["w8"], p["ws"], p.get("b"),
                                         p["layer_idx"])
            w8 = p["w8"][p["layer_idx"]]
        else:
            w8 = p["w8"]
            kdim, n = w8.shape
            if ("kern" in p and m <= 256 and jax.default_backend() == "tpu"
                    and kdim % 512 == 0 and n % 512 == 0):
                from gill_tpu.ops.w8_matmul import w8_matmul

                return w8_matmul(x, w8, p["ws"], p.get("b"))
        w = w8.astype(x.dtype) * p["ws"].astype(x.dtype)[None, :]
        y = x @ w
        if "b" in p:
            y = y + p["b"].astype(x.dtype)
        return y
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps: float = 1e-5):
    """Single-pass statistics (fp32 accumulation via `dtype=`), scale/shift
    applied in the input dtype — avoids materializing fp32 copies of big
    activations (a measured 24% of the SD UNet step before this)."""
    mean = jnp.mean(x, -1, keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(x), -1, keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = (inv * p["scale"].astype(jnp.float32)).astype(x.dtype)
    b = (p["bias"].astype(jnp.float32)
         - mean * inv * p["scale"].astype(jnp.float32)).astype(x.dtype)
    return x * a + b


def embedding_init(key, num: int, dim: int, dtype=jnp.float32, std: float = 0.02):
    return {"weight": jax.random.normal(key, (num, dim), dtype) * std}


def group_norm_init(channels: int, dtype=jnp.float32):
    return {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)}


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-6):
    """GroupNorm over NHWC activations. Single-pass fp32-accumulated stats,
    bf16 normalize (see layer_norm note).

    The stats reduce over (H, W) per CHANNEL first (lane-preserving — the
    last dim stays c), then the (n, g, c/g) per-channel partials combine
    into group stats on a tiny tensor. Reshaping the data tensor itself to
    (n, h, w, g, c/g) and reducing axis 4 makes XLA reduce a c/g-wide minor
    fragment (c/g=10 for SD) — measured 16.3 ms/step of reduce fusions in
    the UNet, ~30x slower than this formulation."""
    n, h, w, c = x.shape
    g = num_groups
    # per-channel partial sums over the spatial dims (last dim intact)
    s1 = jnp.sum(x, axis=(1, 2), dtype=jnp.float32)            # (n, c)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2))  # (n, c)
    cnt = h * w * (c // g)
    mean = s1.reshape(n, g, c // g).sum(-1) / cnt              # (n, g)
    mean2 = s2.reshape(n, g, c // g).sum(-1) / cnt
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)                             # (n, g) fp32
    # expand group stats to per-channel (tiny), then one elementwise pass
    inv_c = jnp.repeat(inv, c // g, axis=-1)                   # (n, c)
    mean_c = jnp.repeat(mean, c // g, axis=-1)
    scale = p["scale"].astype(jnp.float32)[None]
    bias = p["bias"].astype(jnp.float32)[None]
    a = (inv_c * scale).astype(x.dtype)                        # (n, c)
    b = (bias - mean_c * inv_c * scale).astype(x.dtype)
    return x * a[:, None, None, :] + b[:, None, None, :]


def conv2d_init(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True,
                dtype=jnp.float32):
    """HWIO kernel layout; torch Conv2d default init (kaiming-uniform fan_in)."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(kw, (kernel, kernel, in_ch, out_ch), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_ch,), bound, dtype)
    return p


def conv2d(p, x, stride: int = 1, padding="SAME"):
    """NHWC conv. `padding` may be 'SAME', 'VALID', or an int."""
    if "wq" in p:  # int8-quantized leaf (ops/quant.py)
        from gill_tpu.ops.quant import int8_conv2d

        return int8_conv2d(x, p["wq"], p["ws"], p.get("b"), stride=stride,
                           padding=padding)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# multi-head attention parameter bundles
# ---------------------------------------------------------------------------

def mha_init(key, dim: int, num_heads: int, bias: bool = True,
             kv_dim: Optional[int] = None, out_bias: bool = True,
             dtype=jnp.float32):
    """Separate q/k/v/out projections (packed torch in_proj gets split by the
    converter)."""
    kv_dim = kv_dim or dim
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": linear_init(kq, dim, dim, bias, dtype),
        "k": linear_init(kk, kv_dim, dim, bias, dtype),
        "v": linear_init(kv, kv_dim, dim, bias, dtype),
        "o": linear_init(ko, dim, dim, out_bias, dtype),
    }


def mha_apply(p, x, context=None, *, num_heads: int, causal: bool = False,
              attn_fn=None):
    """Standard MHA: projections here, the attention core in ops.attention.

    x: (B, T, D); context: (B, S, Dkv) or None for self-attention.
    """
    from gill_tpu.ops.attention import dot_product_attention

    ctx = x if context is None else context
    b, t, d = x.shape
    s = ctx.shape[1]
    hd = d // num_heads
    q = linear(p["q"], x).reshape(b, t, num_heads, hd)
    k = linear(p["k"], ctx).reshape(b, s, num_heads, hd)
    v = linear(p["v"], ctx).reshape(b, s, num_heads, hd)
    fn = attn_fn or dot_product_attention
    o = fn(q, k, v, causal=causal)
    return linear(p["o"], o.reshape(b, t, d))


# ---------------------------------------------------------------------------
# pytree utilities
# ---------------------------------------------------------------------------

def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def tree_size_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )
