"""Valid-prefix single-token decode attention (Pallas TPU).

The decode step's KV-cache read is the dominant HBM traffic at serving
batch sizes (e.g. opt-2.7b, 32 slots x 512-row cache: 5.4 GB/step vs
2.7 GB of int8 weights). The XLA decode path (`ops/attention.py
:_decode_attention`) reads the ENTIRE preallocated cache every step and
masks invalid rows — perfectly pipelined, but the traffic follows the
bucket size, not the true context length. The dynamic-trip-count XLA
chunked form (`_decode_attention_chunked`) reads only the valid prefix
but measured SLOWER: the data-dependent loop defeats XLA's DMA
pipelining.

This kernel gets both: per-row dynamic trip counts (a scalar-prefetched
`lengths` vector, so each batch row reads ceil(len/block) cache blocks)
with MANUAL double-buffered HBM->VMEM DMA, so the copy for block i+1 is
in flight while block i computes. Parked serving slots (engine
retirement) pass length 0 and cost zero cache traffic.

All math runs in the cache's NATIVE (rows, H, D) layout — the DMA copies
a contiguous row-block of the (B, S, H, D) cache straight into a
(block, H, D) VMEM buffer, per-head score sums are lane reductions with
keepdims (so softmax statistics live in (., H, 1) shapes and probability
-> value broadcasts are free minor-dim broadcasts), and the accumulation
is a plane reduction over rows. No MXU work at all: M=1-per-head matmuls
are latency-bound on the MXU (measured: a one-hot-matmul formulation of
this kernel ran 3-5x slower than the XLA path; this VPU form is
DMA-bound). The online softmax is exact (fp32 running max). The
deferred own-token k/v (`extra_kv` in ops/attention.py) folds in after
the loop, so cache writes stay outside the layer scan.

Reference counterpart: none — gill/models.py:443-532 re-forwards the
full prefix per token with use_cache=False; this is the TPU-native
replacement's bandwidth-optimal form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(lens_ref, q_ref, k1_ref, v1_ref, kc_ref, vc_ref, o_ref,
            kbuf, vbuf, ksem, vsem, *,
            scale: float, block: int, nheads: int, d: int):
    """Cache operands are (B, S, H, D), DMA'd straight into (block, H, D)
    buffers — hence the D % 128 == 0 scope (Pallas forces 128-lane tiling
    on HBM operands, so an unaligned D would relayout-copy the whole cache
    on entry; an in-kernel (block, H*D) -> (block, H, D) reshape of a flat
    copy is an unsupported Mosaic shape cast — both measured/attempted)."""
    b = pl.program_id(0)
    ln = lens_ref[b]
    nblk = (ln + block - 1) // block

    qv = q_ref[:].astype(jnp.float32)                     # (1, H, D)

    def kcopy(slot, i):
        return pltpu.make_async_copy(
            kc_ref.at[b, pl.ds(i * block, block)], kbuf.at[slot],
            ksem.at[slot])

    def vcopy(slot, i):
        return pltpu.make_async_copy(
            vc_ref.at[b, pl.ds(i * block, block)], vbuf.at[slot],
            vsem.at[slot])

    @pl.when(nblk > 0)
    def _():
        kcopy(0, 0).start()
        vcopy(0, 0).start()

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nblk)
        def _():
            nxt = jax.lax.rem(i + 1, 2)
            kcopy(nxt, i + 1).start()
            vcopy(nxt, i + 1).start()

        kcopy(slot, i).wait()
        vcopy(slot, i).wait()

        vb = vbuf[slot]
        kb = kbuf[slot].astype(jnp.float32)               # (block, H, D)
        logits = jnp.sum(kb * qv, axis=-1,
                         keepdims=True) * scale           # (block, H, 1)
        srow = i * block + jax.lax.broadcasted_iota(
            jnp.int32, (block, nheads, 1), 0)
        logits = jnp.where(srow < ln, logits, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))
        p = jnp.exp(logits - m_new)                       # (block, H, 1)
        alpha = jnp.exp(m - m_new)                        # (1, H, 1)
        l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
        pv = p * vb.astype(jnp.float32)                   # (block, H, D)
        acc_new = acc * alpha + jnp.sum(pv, axis=0, keepdims=True)
        return m_new, l_new, acc_new

    m0 = jnp.full((1, nheads, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, nheads, 1), jnp.float32)
    acc0 = jnp.zeros((1, nheads, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nblk, body, (m0, l0, acc0))

    # Own-token fold (joint softmax with the cache, zero cache writes).
    l1 = jnp.sum(k1_ref[:].astype(jnp.float32) * qv, axis=-1,
                 keepdims=True) * scale                   # (1, H, 1)
    m_new = jnp.maximum(m, l1)
    alpha = jnp.exp(m - m_new)
    p1 = jnp.exp(l1 - m_new)
    l = l * alpha + p1
    acc = acc * alpha + p1 * v1_ref[:].astype(jnp.float32)
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pick_block(s: int) -> int:
    for cand in (256, 128, 64):
        if s % cand == 0:
            return cand
    return 0


def supported(q, k, lengths, kv_scales) -> bool:
    """Eligibility for the valid-prefix kernel: non-int8 cache, a bucket
    divisible by a block size, per-row lengths available."""
    b, t, h, d = q.shape
    s = k.shape[1]
    return (t == 1 and kv_scales is None and _pick_block(s) > 0
            and k.dtype != jnp.int8 and lengths is not None
            and d % 128 == 0)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def prefix_decode_attention(q, k, v, lengths, k1, v1, *, scale: float,
                            interpret: bool = False):
    """q/k1/v1 (B, 1, H, D); cache k/v (B, S, H, D); lengths (B,) int32 =
    number of valid cache rows per batch element (0 = own token only).
    Returns (B, 1, H, D) in q.dtype."""
    b, _, h, d = q.shape
    s = k.shape[1]
    block = _pick_block(s)
    assert block > 0, s

    lens = jnp.clip(lengths.astype(jnp.int32), 0, s)
    k1 = k1.astype(k.dtype)
    v1 = v1.astype(v.dtype)
    buf_shape = (2, block, h, d)

    kernel = functools.partial(_kernel, scale=scale, block=block,
                               nheads=h, d=d)
    row_spec = pl.BlockSpec((None, 1, h, d), lambda i, lens: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            row_spec,
            row_spec,
            row_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, 1, h, d), lambda i, lens: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(buf_shape, k.dtype),
            pltpu.VMEM(buf_shape, v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lens, q, k1, v1, k, v)
    return out
