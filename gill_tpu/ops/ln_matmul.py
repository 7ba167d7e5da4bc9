"""Fused LayerNorm + matmul Pallas kernel for the SD UNet attention
projections.

Computes LN(x) @ W in one kernel: the normalized tensor never round-trips
HBM. In the UNet transformer block, each of the three pre-norms wrote a
(B, S, C) bf16 tensor that the q/k/v (or GEGLU) projections immediately
re-read — at the 64x64 CFG batch that is ~2x21 MB of pure normalization
traffic per LayerNorm, 15 LayerNorms per step at that resolution alone
(reference consumer: the torch UNet's LayerNorm->Linear pairs inside
diffusers' BasicTransformerBlock, driven via gill/custom_sd.py:628-651).

LN statistics are recomputed per N-block on the VPU (row mean/var over the
resident (block_m, d) x tile) — a few microseconds against the saved HBM
passes. Statistics match nn.core.layer_norm bit-for-bit in formulation:
fp32 single-pass mean/E[x^2], var clamped at 0, scale/shift applied in the
input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_rows(x, g, b, eps):
    """LN over the last axis of a resident (m, d) tile; returns x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    gf = g.astype(jnp.float32)
    a = (inv * gf).astype(x.dtype)
    sh = (b.astype(jnp.float32) - mean * inv * gf).astype(x.dtype)
    return x * a + sh


def _kernel(x_ref, g_ref, b_ref, w_ref, o_ref, *, eps):
    xn = _ln_rows(x_ref[:], g_ref[:], b_ref[:], eps)
    o_ref[:] = jax.lax.dot_general(
        xn, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _kernel_stacked(x_ref, g_ref, b_ref, w_ref, o_ref, *, eps):
    xn = _ln_rows(x_ref[:], g_ref[:], b_ref[:], eps)
    o_ref[0] = jax.lax.dot_general(
        xn, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_m"))
def ln_matmul_stacked(x, gamma, beta, ws, *, eps: float = 1e-5,
                      block_m: int = 0):
    """x (..., d), ws (K, d, n) -> (K, M, n) where out[k] = LN(x) @ ws[k].

    For the SD self-attention q/k/v projections: the three outputs are
    leading-axis slices (contiguous, no copy), unlike a concat-then-split
    along lanes which forces strided copies of the 3.2x head-padded
    tensors. The x tile stays resident across the K grid steps (innermost
    grid dim), so x is read from HBM once per row block."""
    orig_shape = x.shape
    d = x.shape[-1]
    kk, _, n = ws.shape
    x2 = x.reshape(-1, d)
    m = x2.shape[0]

    if block_m == 0:
        block_m = 512 if d <= 640 else 256
    block_m = min(block_m, max(8, ((m + 7) // 8) * 8))
    m_pad = ((m + block_m - 1) // block_m) * block_m
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    grid = (m_pad // block_m, kk)
    out = pl.pallas_call(
        functools.partial(_kernel_stacked, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d, n), lambda i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_m, n), lambda i, j: (j, i, 0)),
        out_shape=jax.ShapeDtypeStruct((kk, m_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x2, gamma.reshape(1, d), beta.reshape(1, d), ws)
    return out[:, :m].reshape((kk,) + orig_shape[:-1] + (n,))


@functools.partial(jax.jit, static_argnames=("eps", "block_m", "block_n"))
def ln_matmul(x, gamma, beta, w, *, eps: float = 1e-5, block_m: int = 0,
              block_n: int = 0):
    """x (..., d), gamma/beta (d,), w (d, n) -> LN(x) @ w, shape (..., n).

    Bias-free by design: the SD attention q/k/v projections have no bias
    (asserted at the call site, models/sd/unet.py)."""
    orig_shape = x.shape
    d = x.shape[-1]
    n = w.shape[-1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]

    if block_m == 0:
        block_m = 512 if d <= 640 else 256
    block_m = min(block_m, max(8, ((m + 7) // 8) * 8))
    if block_n == 0:
        block_n = n
        while d * block_n * 2 * 2 > 8 * 1024 * 1024:  # w tile, double-buffered
            block_n //= 2
        block_n = max(block_n, 512)
    block_n = min(block_n, n)
    assert n % block_n == 0, (n, block_n)

    m_pad = ((m + block_m - 1) // block_m) * block_m
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    grid = (m_pad // block_m, n // block_n)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((d, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x2, gamma.reshape(1, d), beta.reshape(1, d), w)
    return out[:m].reshape(orig_shape[:-1] + (n,))
