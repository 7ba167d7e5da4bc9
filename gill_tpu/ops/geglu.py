"""Fused GEGLU feed-forward Pallas kernel for the SD UNet transformer FF.

Computes out = (gelu(x @ Wg + bg) * (x @ Wv + bv)) @ W2 + b2 in one kernel:
the (M, 4d) intermediate never round-trips HBM (the unfused version writes
and re-reads the (B, S, 8d) GEGLU activation — 67MB per 64x64 layer at the
SD CFG batch), and the gelu/multiply VPU work overlaps the MXU matmuls.

Reference behavior: diffusers GEGLU (exact-erf gelu on the second half of
one fused projection), gill/custom_sd.py's UNet FF blocks.

Layout: x (M, d); Wv/Wg (d, 4d) are the two halves of the fused projection;
W2 (4d, d). The intermediate is processed in N-chunks: per chunk, both
halves' columns are matmul'd, gated, and immediately contracted into a
resident fp32 accumulator via W2's matching rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_rows(x, g, b, eps):
    """LN over the last axis (matches nn.core.layer_norm formulation:
    fp32 single-pass stats, var clamped at 0, scale/shift in x.dtype)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    gf = g.astype(jnp.float32)
    a = (inv * gf).astype(x.dtype)
    sh = (b.astype(jnp.float32) - mean * inv * gf).astype(x.dtype)
    return x * a + sh


def _kernel(x_ref, wv_ref, wg_ref, bv_ref, bg_ref, w2_ref, b2_ref, o_ref,
            acc_ref):
    n = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(n == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    val = jax.lax.dot_general(
        x, wv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bv_ref[:].astype(jnp.float32)
    gate = jax.lax.dot_general(
        x, wg_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bg_ref[:].astype(jnp.float32)
    # Mosaic TC implements neither erf nor erfc, so the exact-erf gelu is
    # evaluated in its tanh form here: |tanh-gelu - erf-gelu| < 3.2e-4,
    # below bf16 resolution at the magnitudes where it peaks (|x|~2), so
    # the kernel matches the composed exact-gelu path at bf16.
    g2 = gate * gate
    inner = 0.7978845608028654 * gate * (1.0 + 0.044715 * g2)
    gelu_gate = 0.5 * gate * (1.0 + jnp.tanh(inner))
    h = (val * gelu_gate).astype(x.dtype)
    acc_ref[:] += jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(n == n_chunks - 1)
    def _():
        o_ref[:] = (acc_ref[:] + b2_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


def _kernel_ln(x_ref, g_ref, be_ref, wv_ref, wg_ref, bv_ref, bg_ref, w2_ref,
               b2_ref, o_ref, acc_ref, *, eps):
    """GEGLU FF with the preceding LayerNorm folded in: the normalized
    (B, S, d) tensor never exists in HBM. Stats recomputed per N-chunk on
    the VPU (the x tile is resident anyway)."""
    n = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(n == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = _ln_rows(x_ref[:], g_ref[:], be_ref[:], eps)
    val = jax.lax.dot_general(
        x, wv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bv_ref[:].astype(jnp.float32)
    gate = jax.lax.dot_general(
        x, wg_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bg_ref[:].astype(jnp.float32)
    g2 = gate * gate
    inner = 0.7978845608028654 * gate * (1.0 + 0.044715 * g2)
    gelu_gate = 0.5 * gate * (1.0 + jnp.tanh(inner))
    h = (val * gelu_gate).astype(x.dtype)
    acc_ref[:] += jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(n == n_chunks - 1)
    def _():
        o_ref[:] = (acc_ref[:] + b2_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_m", "block_n", "ln_eps"))
def geglu_ff(x, w1, b1, w2, b2, *, ln_gamma=None, ln_beta=None,
             ln_eps: float = 1e-5, block_m: int = 0, block_n: int = 0):
    """x (..., d), w1 (d, 8d) fused [val | gate], b1 (8d,), w2 (4d, d),
    b2 (d,) -> (..., d). With ln_gamma/ln_beta, the preceding LayerNorm is
    folded into the kernel (x is the RAW residual stream)."""
    orig_shape = x.shape
    d = x.shape[-1]
    inner = 4 * d
    x2 = x.reshape(-1, d)
    m = x2.shape[0]

    esize = max(jnp.dtype(x.dtype).itemsize, jnp.dtype(w1.dtype).itemsize)
    if block_m == 0:
        block_m = 512 if d <= 640 else 256
        if esize > 2:
            # f32 operands double every buffer; halve the row block (the
            # 2-byte sizing OOMed scoped VMEM at (2048, 640) f32 —
            # serving-path compile failure before the pipeline ran the
            # UNet in its params' dtype)
            block_m //= 2
    block_m = min(block_m, max(8, ((m + 7) // 8) * 8))
    if block_n == 0:
        # chunk the intermediate so resident weights stay well under VMEM
        block_n = inner
        while (d + d) * block_n * esize * 2 > 8 * 1024 * 1024:  # wv+wg+w2
            block_n //= 2
        block_n = max(block_n, 512)
    block_n = min(block_n, inner)

    m_pad = ((m + block_m - 1) // block_m) * block_m
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    assert inner % block_n == 0, (inner, block_n)

    wv, wg = w1[:, :inner], w1[:, inner:]
    bv, bg = b1[:inner].reshape(1, inner), b1[inner:].reshape(1, inner)
    b2r = b2.reshape(1, d)

    grid = (m_pad // block_m, inner // block_n)
    weight_specs = [
        pl.BlockSpec((d, block_n), lambda i, n: (0, n)),
        pl.BlockSpec((d, block_n), lambda i, n: (0, n)),
        pl.BlockSpec((1, block_n), lambda i, n: (0, n)),
        pl.BlockSpec((1, block_n), lambda i, n: (0, n)),
        pl.BlockSpec((block_n, d), lambda i, n: (n, 0)),
        pl.BlockSpec((1, d), lambda i, n: (0, 0)),
    ]
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((block_m, d), lambda i, n: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )
    x_spec = pl.BlockSpec((block_m, d), lambda i, n: (i, 0))
    if ln_gamma is not None:
        out = pl.pallas_call(
            functools.partial(_kernel_ln, eps=ln_eps),
            in_specs=[x_spec,
                      pl.BlockSpec((1, d), lambda i, n: (0, 0)),
                      pl.BlockSpec((1, d), lambda i, n: (0, 0))] + weight_specs,
            **common,
        )(x2, ln_gamma.reshape(1, d), ln_beta.reshape(1, d),
          wv, wg, bv, bg, w2, b2r)
    else:
        out = pl.pallas_call(
            _kernel,
            in_specs=[x_spec] + weight_specs,
            **common,
        )(x2, wv, wg, bv, bg, w2, b2r)
    return out[:m].reshape(orig_shape)
