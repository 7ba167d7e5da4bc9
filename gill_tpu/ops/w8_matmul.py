"""W8A16 matmul Pallas kernel: bf16 activations x int8 weights with
per-output-channel scales, dequantized tile-by-tile in VMEM.

Why a kernel instead of `x @ (w8.astype(bf16) * ws)`: inside a decode scan
the dequant is loop-invariant, and at opt-6.7b XLA HOISTS the full bf16
weight tree (13.4GB) out of the loop — int8 (6.7GB) + hoisted bf16 copies
OOM the 16GB chip. The pallas_call is opaque to the hoister, so weights
stream from HBM as int8 (half the traffic — the whole point of W8).

Decode-sized M only (M <= 256); larger M (prefill/training-free paths)
stays on the XLA formulation where straight-line fusion handles it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_stacked(idx_ref, x_ref, w8_ref, ws_ref, b_ref, o_ref, acc_ref):
    """Same math as _kernel, but w8_ref is a (1, block_k, block_n) block of
    the STACKED (L, K, N) weight array, selected by the scalar-prefetched
    layer index. Why: the per-layer slice `w8[i]` feeding a pallas
    custom-call forces XLA to MATERIALIZE the slice (operands can't be
    views), copying all 6.4GB of opt-6.7b's weights every decode step —
    traced at 20.2 ms/token vs 10.4 ms in the matmuls themselves
    (scripts/profile_opt67.py). Indexing the stack inside the BlockSpec
    streams the weights straight from HBM instead."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wbf = w8_ref[0].astype(x_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], wbf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = ((acc_ref[:] * ws_ref[:].astype(jnp.float32))
                    + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def w8_matmul_stacked(x, w8, ws, b, idx, *, block_n: int = 512,
                      block_k: int = 2048):
    """x (..., K); w8 (L, K, N) int8 stacked per-layer weights; ws (N,) f32;
    b (N,) f32 or None; idx int32 layer index (dynamic — one compiled
    kernel serves every layer)."""
    orig_shape = x.shape
    kdim = x.shape[-1]
    n = w8.shape[2]
    x2 = x.reshape(-1, kdim)
    m = x2.shape[0]
    m_pad = max(8, ((m + 7) // 8) * 8)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    block_k = min(block_k, kdim)
    block_n = min(block_n, n)
    # Non-power-of-two dims (e.g. opt-2.7b's 2560): halve until divisible —
    # the nn.linear dispatch guarantees multiples of 512.
    while kdim % block_k:
        block_k //= 2
    while n % block_n:
        block_n //= 2
    assert kdim % block_k == 0 and n % block_n == 0, (kdim, n)

    ws2 = ws.reshape(1, n)
    b2 = (b if b is not None else jnp.zeros((n,), jnp.float32)).reshape(1, n)
    idx2 = jnp.asarray(idx, jnp.int32).reshape(1)

    grid = (n // block_n, kdim // block_k)
    out = pl.pallas_call(
        _kernel_stacked,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m_pad, block_k), lambda i, k, idx: (0, k)),
                pl.BlockSpec((1, block_k, block_n),
                             lambda i, k, idx: (idx[0], k, i)),
                pl.BlockSpec((1, block_n), lambda i, k, idx: (0, i)),
                pl.BlockSpec((1, block_n), lambda i, k, idx: (0, i)),
            ],
            out_specs=pl.BlockSpec((m_pad, block_n), lambda i, k, idx: (0, i)),
            scratch_shapes=[pltpu.VMEM((m_pad, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(idx2, x2, w8, ws2, b2)
    return out[:m].reshape(orig_shape[:-1] + (n,))


def _kernel(x_ref, w8_ref, ws_ref, b_ref, o_ref, acc_ref):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wbf = w8_ref[:].astype(x_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], wbf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        # per-out-channel scale commutes with the K-sum: apply once
        o_ref[:] = ((acc_ref[:] * ws_ref[:].astype(jnp.float32))
                    + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_n", "block_k", "vmem_limit"))
def w8_matmul(x, w8, ws, b=None, *, block_n: int = 512, block_k: int = 2048,
              vmem_limit: int = 0):
    """x (..., K) bf16/f32; w8 (K, N) int8; ws (N,) f32; b (N,) or None.

    vmem_limit (bytes): raise Mosaic's 16MB scoped-VMEM cap so big weight
    tiles can double-buffer (deeper DMA pipelining on the HBM stream)."""
    orig_shape = x.shape
    kdim = x.shape[-1]
    n = w8.shape[1]
    x2 = x.reshape(-1, kdim)
    m = x2.shape[0]
    m_pad = max(8, ((m + 7) // 8) * 8)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    block_k = min(block_k, kdim)
    block_n = min(block_n, n)
    # Non-power-of-two dims (e.g. opt-2.7b's 2560): halve until divisible —
    # the nn.linear dispatch guarantees multiples of 512.
    while kdim % block_k:
        block_k //= 2
    while n % block_n:
        block_n //= 2
    assert kdim % block_k == 0 and n % block_n == 0, (kdim, n)

    ws2 = ws.reshape(1, n)
    b2 = (b if b is not None else jnp.zeros((n,), jnp.float32)).reshape(1, n)

    grid = (n // block_n, kdim // block_k)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, block_k), lambda i, k: (0, k)),
            pl.BlockSpec((block_k, block_n), lambda i, k: (k, i)),
            pl.BlockSpec((1, block_n), lambda i, k: (0, i)),
            pl.BlockSpec((1, block_n), lambda i, k: (0, i)),
        ],
        out_specs=pl.BlockSpec((m_pad, block_n), lambda i, k: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {}),
        ),
    )(x2, w8, ws2, b2)
    return out[:m].reshape(orig_shape[:-1] + (n,))
