"""Attention cores: Pallas TPU flash-attention + XLA reference path.

The reference relies on torch SDPA inside HF OPT/CLIP and the SD UNet
(all CUDA kernels). Here the hot path is a Pallas online-softmax kernel that
keeps the (T, S) score matrix out of HBM; everything falls back to a fused
XLA einsum path on CPU, for tiny shapes, or for single-token decode where
flash has no advantage.

Layouts: q (B, T, H, D), k/v (B, S, H, D) -> out (B, T, H, D).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Tuning knobs, read ONCE at import: these feed jitted code, where a
# mid-process env change would otherwise be silently ignored after the
# first trace per signature (jit caches key on static args, not on the
# environment — ADVICE r2). Benchmarks A/B them across subprocesses.
import os as _os  # noqa: E402

FLASH_BQ_CAP = int(_os.environ.get("GILL_FLASH_BQ", "1024"))
# Carry the softmax denominator in a zero pad lane of V (callers with
# d < Dp set v[..., Dp-1] = 1.0 and pass sum_lane=True): the PV matmul's
# wasted pad lanes then compute l on the MXU and the per-row VPU
# p.sum() reduction over the (block_q, S) f32 score tile disappears.
FLASH_SUMLANE = _os.environ.get("GILL_FLASH_SUMLANE", "0") == "1"
DECODE_CHUNK_MIN = int(_os.environ.get("GILL_DECODE_CHUNK_MIN", "0"))
# Valid-prefix Pallas decode kernel (ops/decode_attn.py): minimum KV bucket
# size to take it; 0 (the default) disables. OP-LEVEL the kernel wins at
# d=128 buckets >= 512 when lengths vary (PREFIX_DECODE_PROBE.json: mixed
# 1.10-1.26x, half-parked 2x) and loses at short buckets (0.69x). But
# END-TO-END it is a measured REGRESSION: the opt-6.7b 512+256 b8 decode
# bench drops 415 -> 305 tok/s with the kernel on — inside the
# weight-bandwidth-bound W8 step, XLA overlaps the full-cache read with
# the surrounding weight streams, while the Pallas custom call is a
# scheduling boundary that serializes its DMA against them. Parked
# default-off with its tests; re-gate if a workload's cache traffic
# dominates its weight traffic (very long contexts at small models).
PREFIX_DECODE_MIN = int(_os.environ.get("GILL_PREFIX_DECODE_MIN", "0"))


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------

def _xla_attention(q, k, v, *, causal: bool, bias=None, scale: float,
                   kv_offset=None):
    b, t, h, d = q.shape
    s = k.shape[1]
    logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        # Query i attends to keys j <= i + offset. Default offset (s - t)
        # covers plain self-attention and suffix-of-sequence decode; an
        # explicit kv_offset supports a preallocated KV cache where only the
        # first (kv_offset + t) slots are valid.
        offset = (s - t) if kv_offset is None else kv_offset
        qi = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
        mask = kj <= qi + offset
        logits = jnp.where(mask[None, None], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def _decode_attention(q, k, v, *, scale: float, kv_offset=None,
                      extra_kv=None, kv_scales=None):
    """Single-token (t == 1) attention as broadcast-multiply + reduce.

    The einsum formulation lowers to B*H separate M=1 matmuls on TPU —
    latency-bound, measured 9.4 ms/step (60% of the whole opt-2.7b decode
    step at batch 16). As elementwise VPU work fused over the KV cache it
    is bandwidth-bound like the rest of the decode step.

    q (B, 1, H, D); k/v (B, S, H, D). Valid keys are positions
    <= kv_offset (the query's position); kv_offset None = all of S.

    extra_kv: optional (k1, v1), each (B, 1, H, D) — the query's OWN
    key/value, attended in addition to the cache. Lets the decode loop
    defer the cache write (a single small update-slice per step outside
    the layer scan) instead of round-tripping the whole cache through the
    scan, which XLA materializes as full-cache copies.
    """
    b, _, h, d = q.shape
    s = k.shape[1]
    qf = q[:, 0].astype(jnp.float32)                       # (B, H, D)
    logits = jnp.sum(qf[:, None] * k.astype(jnp.float32), axis=-1)  # (B,S,H)
    vdt = jnp.bfloat16 if v.dtype == jnp.int8 else v.dtype
    if kv_scales is not None:
        # int8 KV cache: per-token-per-head scales (B, S, H) fold into the
        # same elementwise passes — no extra traffic
        ks, vs = kv_scales
        logits = logits * ks.astype(jnp.float32)
    logits = logits * scale
    if kv_offset is not None:
        # kv_offset: scalar, or (B,) per-element query positions (the
        # continuous-batching engine runs slots at different depths).
        off = jnp.asarray(kv_offset)
        if off.ndim == 1:
            off = off[:, None, None]
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, s, 1), 1)
        logits = jnp.where(pos <= off, logits, _NEG_INF)
    if extra_kv is not None:
        # joint softmax over (cache logits, own-token logit) without
        # concatenating onto the cache slice (that would copy it)
        k1, v1 = extra_kv
        l1 = jnp.sum(qf * k1[:, 0].astype(jnp.float32), axis=-1) * scale
        m = jnp.maximum(logits.max(axis=1, keepdims=True), l1[:, None])
        p = jnp.exp(logits - m)                            # (B, S, H)
        p1 = jnp.exp(l1[:, None] - m)                      # (B, 1, H)
        denom = p.sum(axis=1, keepdims=True) + p1
        pfac = p / denom
        if kv_scales is not None:
            pfac = pfac * vs.astype(jnp.float32)
        acc = jnp.sum(pfac[..., None].astype(vdt) * v.astype(vdt), axis=1)
        acc = acc + (p1 / denom)[..., 0, :, None].astype(vdt) \
            * v1[:, 0].astype(vdt)
        return acc[:, None]
    m = logits.max(axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / p.sum(axis=1, keepdims=True)
    if kv_scales is not None:
        p = p * vs.astype(jnp.float32)
    out = jnp.sum(p[..., None].astype(vdt) * v.astype(vdt), axis=1)  # (B,H,D)
    return out[:, None]


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------

# Fast-softmax constants: scores are clamped at _FAST_CLAMP and shifted by
# _FAST_SHIFT before exp, replacing the per-row running max. Valid whenever
# logits are bounded (|score*scale| < _FAST_CLAMP): exp(45-15)=1e13 and
# 4096 keys sum to <5e16, well inside fp32; the smallest useful probs
# exp(-45-15) ~ 9e-27 stay normal. SD UNet attention post-LayerNorm sits at
# |score| < ~25 in practice; rows where the clamp would bind are degenerate
# (softmax already one-hot at 1e13:1 odds).
_FAST_CLAMP = 45.0
_FAST_SHIFT = 15.0


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
                  block_k: int, seq_k: int, kv_offset: int, kv_len: int,
                  fast: bool, sum_lane: bool = False):
    """One (batch*head, q-block) program: online softmax over k blocks.

    q_ref: (block_q, d); k_ref/v_ref: (seq_k, d); o_ref: (block_q, d).
    kv_offset = seq_k - seq_q (for cached decode causal alignment).
    kv_len: number of VALID keys (< seq_k when keys were padded to a block
    multiple); padded keys are masked to -inf.
    fast: skip the running max — exp(clamp(s) - shift) with fp32 accumulation
    (exact up to the clamp; ~25% faster: the max-reduce + rescale chain is
    pure serial VPU work on the critical path).
    Matmuls run with bf16 inputs + fp32 accumulation (full-rate MXU);
    softmax statistics stay fp32.
    """
    block_q, d = q_ref.shape
    qi = pl.program_id(1)

    q = q_ref[:]  # keep input dtype for the MXU

    m = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    num_kb = seq_k // block_k
    mask_pad = kv_len < seq_k

    def scores(kb):
        k_blk = k_ref[pl.ds(kb * block_k, block_k), :]
        s_blk = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (block_q, block_k) fp32
        if causal or mask_pad:
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            if causal:
                q_pos = qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0) + kv_offset
                ok = k_pos <= q_pos
                ok = jnp.logical_and(ok, k_pos < kv_len) if mask_pad else ok
            else:
                ok = k_pos < kv_len
            s_blk = jnp.where(ok, s_blk, _NEG_INF)
        return s_blk

    def pv(p, kb):
        v_blk = v_ref[pl.ds(kb * block_k, block_k), :]
        return jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if fast and sum_lane:
        # The caller planted 1.0 in V's last (zero-pad) lane, so the PV
        # matmul's wasted pad lanes compute l = sum(p) on the MXU — no
        # per-row VPU reduction over the (block_q, block_k) f32 tile.
        def body_sl(kb, acc):
            s_blk = jnp.minimum(scores(kb), _FAST_CLAMP)
            p = jnp.exp(s_blk - _FAST_SHIFT)
            return acc + pv(p.astype(v_ref.dtype), kb)

        if num_kb == 1:
            acc = body_sl(0, acc)
        else:
            acc = jax.lax.fori_loop(0, num_kb, body_sl, acc)
        l = acc[:, d - 1:d]
        o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return

    if fast:
        def body_fast(kb, carry):
            l, acc = carry
            s_blk = jnp.minimum(scores(kb), _FAST_CLAMP)
            p = jnp.exp(s_blk - _FAST_SHIFT)  # masked keys: exp(-1e30) -> 0
            l = l + p.sum(axis=-1, keepdims=True)
            acc = acc + pv(p.astype(v_ref.dtype), kb)
            return l, acc

        if num_kb == 1:
            l, acc = body_fast(0, (l, acc))
        else:
            l, acc = jax.lax.fori_loop(0, num_kb, body_fast, (l, acc))
        o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return

    def body(kb, carry):
        m, l, acc = carry
        s_blk = scores(kb)
        m_new = jnp.maximum(m, s_blk.max(axis=-1, keepdims=True))
        p = jnp.exp(s_blk - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + pv(p.astype(v_ref.dtype), kb)
        return m_new, l_new, acc_new

    if causal:
        # Skip key blocks strictly above the diagonal of this q block.
        last_q_pos = qi * block_q + block_q - 1 + kv_offset
        num_kb_needed = jnp.minimum(num_kb, last_q_pos // block_k + 1)
    else:
        num_kb_needed = num_kb
    m, l, acc = jax.lax.fori_loop(0, num_kb_needed, body, (m, l, acc))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, size: int, axis: int):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(jax.jit,
                   static_argnames=("causal", "block_q", "block_k", "fast"))
def flash_attention(q, k, v, *, causal: bool = False,
                    block_q: int = 0, block_k: int = 0, fast: bool = False):
    """Pallas flash attention. q (B,T,H,D), k/v (B,S,H,D) -> (B,T,H,D).

    block sizes 0 = auto: when the full (block_q, S) score tile fits VMEM,
    use block_k == S (single-pass softmax, no online-rescale VPU work);
    otherwise fall back to 512x512 online-softmax tiles.

    fast: replace the per-row running max with a fixed clamp+shift before
    exp (see _FAST_CLAMP) — exact for bounded logits, measured ~25% faster
    on SD's 4096-token self-attention. Callers opt in where score bounds
    are known (the SD UNet); the LM path stays exact.

    Keys are padded to a block multiple and masked in-kernel, so any kv
    length (e.g. 77-token SD cross-attention) runs on the Pallas path.
    """
    b, t, h, d = q.shape
    s = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    if block_q == 0 or block_k == 0:
        # Budget the fp32 score tile against VMEM after the resident k/v
        # blocks (bf16) are accounted for.
        kv_bytes = 2 * s * max(128, d) * 2
        vmem_budget = max(14 * 1024 * 1024 - kv_bytes, 0)
        bq_full = (vmem_budget // (4 * max(s, 1))) // 128 * 128
        if not causal and bq_full >= 128:
            # 512 measured fastest on SD's 4096-token attention with the
            # single-pass softmax (3.49ms fast / 4.67ms exact vs 5.12ms for
            # 512x512 online tiles, B=8 H=8 d=40).
            block_q, block_k = min(512, bq_full), s
        else:
            block_q, block_k = 512, 512

    # Pad head_dim to the 128-lane register width and sequences to block
    # multiples. Padded keys are masked to -inf inside the kernel (kv_len);
    # padded q rows compute garbage and are sliced off.
    d_pad = max(128, ((d + 127) // 128) * 128)
    block_q = min(block_q, max(8, ((t + 7) // 8) * 8))
    block_k = min(block_k, max(128, ((s + 127) // 128) * 128))
    t_pad = ((t + block_q - 1) // block_q) * block_q
    s_pad = ((s + block_k - 1) // block_k) * block_k

    qp = _pad_to(_pad_to(q, t_pad, 1), d_pad, 3)
    kp = _pad_to(_pad_to(k, s_pad, 1), d_pad, 3)
    vp = _pad_to(_pad_to(v, s_pad, 1), d_pad, 3)

    # (B,T,H,D) -> (B*H, T, D)
    def to_bh(x):
        bb, tt, hh, dd = x.shape
        return x.transpose(0, 2, 1, 3).reshape(bb * hh, tt, dd)

    qb, kb_, vb = to_bh(qp), to_bh(kp), to_bh(vp)

    grid = (b * h, t_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_k=block_k,
        seq_k=s_pad, kv_offset=s - t, kv_len=s, fast=fast,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d_pad), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, s_pad, d_pad), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, s_pad, d_pad), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d_pad), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qb, kb_, vb)

    out = out.reshape(b, h, t_pad, d_pad).transpose(0, 2, 1, 3)
    return out[:, :t, :, :d]


def _flash_kernel_i8(q_ref, k_ref, v_ref, o_ref, kq_s, ks_s, *, scale: float,
                     seq_k: int, kv_len: int):
    """Int8-QK flash program: q and k are dynamically quantized in VMEM
    (k once per (batch, head) program row — the int8 copy and its scale
    persist in scratch across q-block grid steps) and the score matmul runs
    on the int8 MXU at 2x the bf16 rate. Softmax is exact (row max); the
    PV matmul stays bf16 — quantizing probabilities truncates the tail of
    flat attention rows (p < 1/254 rounds to 0), which int8 cannot afford.

    Single-pass only (block_k == seq_k). Non-causal.
    """
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _():
        kf = k_ref[:].astype(jnp.float32)
        sk = jnp.maximum(jnp.max(jnp.abs(kf)) / 127.0, 1e-12)
        kq_s[:] = jnp.clip(jnp.round(kf / sk), -127, 127).astype(jnp.int8)
        ks_s[0, 0] = sk

    qf = q_ref[:].astype(jnp.float32)
    sq = jnp.maximum(jnp.max(jnp.abs(qf)) / 127.0, 1e-12)
    qq = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)

    s32 = jax.lax.dot_general(
        qq, kq_s[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    s_f = s32.astype(jnp.float32) * (sq * ks_s[0, 0] * scale)
    if kv_len < seq_k:
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s_f.shape, 1)
        s_f = jnp.where(k_pos < kv_len, s_f, _NEG_INF)
    m = s_f.max(axis=-1, keepdims=True)
    p = jnp.exp(s_f - m)
    l = p.sum(axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("causal", "block_q", "block_k", "fast",
                                    "scale", "q8", "sum_lane"))
def flash_attention_bthd(q, k, v, *, causal: bool = False, scale: float,
                         block_q: int = 0, block_k: int = 0,
                         fast: bool = False, q8: bool = False,
                         sum_lane: bool = False):
    """Flash attention over the native (B, T, H, Dp) layout, Dp % 128 == 0.

    No transposes or pads: callers keep q/k/v/out in (B, S, H, Dp) and the
    grid strides over the H axis directly ((b*h, q-block) programs whose
    index map picks (b, block, h)). For small true head dims (SD: d=40),
    pad the PROJECTION weights to Dp=128 instead of the activations — the
    pad hoists out of the denoise scan, while activation pad/transpose glue
    (6 HBM round-trips of the (B,S,H,D) tensors per layer) disappears.

    `scale` must be 1/sqrt(true_d) — it cannot be derived from Dp here.
    """
    b, t, h, dp = q.shape
    s = k.shape[1]
    assert dp % 128 == 0, dp

    if block_q == 0 or block_k == 0:
        kv_bytes = 2 * s * dp * 2
        _bq_cap = FLASH_BQ_CAP
        _budget = (14 if _bq_cap <= 512 else 40) * 1024 * 1024
        vmem_budget = max(_budget - kv_bytes, 0)
        bq_full = (vmem_budget // (4 * max(s, 1))) // 128 * 128
        if not causal and bq_full >= 128:
            block_q, block_k = min(_bq_cap, bq_full), s
        else:
            block_q, block_k = 512, 512

    block_q = min(block_q, max(8, ((t + 7) // 8) * 8))
    block_k = min(block_k, max(128, ((s + 127) // 128) * 128))
    t_pad = ((t + block_q - 1) // block_q) * block_q
    s_pad = ((s + block_k - 1) // block_k) * block_k
    # Fold H into the lane axis ((B, S, H*Dp)) — free reshape, and Mosaic
    # allows lane-dim blocking at 128-multiple offsets where blocking a
    # second-minor axis to 1 is rejected.
    qp = _pad_to(q, t_pad, 1).reshape(b, t_pad, h * dp)
    kp = _pad_to(k, s_pad, 1).reshape(b, s_pad, h * dp)
    vp = _pad_to(v, s_pad, 1).reshape(b, s_pad, h * dp)

    grid = (b * h, t_pad // block_q)
    scratch = []
    if q8 and not causal and block_k >= s_pad:
        kernel = functools.partial(
            _flash_kernel_i8, scale=scale, seq_k=s_pad, kv_len=s)
        scratch = [pltpu.VMEM((s_pad, dp), jnp.int8),
                   pltpu.SMEM((1, 1), jnp.float32)]
    else:
        kernel = functools.partial(
            _flash_kernel, scale=scale, causal=causal, block_k=block_k,
            seq_k=s_pad, kv_offset=s - t, kv_len=s, fast=fast,
            sum_lane=sum_lane and fast and not causal,
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, dp),
                         lambda bh, i: (bh // h, i, bh % h)),
            pl.BlockSpec((None, s_pad, dp),
                         lambda bh, i: (bh // h, 0, bh % h)),
            pl.BlockSpec((None, s_pad, dp),
                         lambda bh, i: (bh // h, 0, bh % h)),
        ],
        out_specs=pl.BlockSpec((None, block_q, dp),
                               lambda bh, i: (bh // h, i, bh % h)),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, h * dp), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(64 * 1024 * 1024 if block_q > 512 else None),
        ),
    )(qp, kp, vp)
    return out.reshape(b, t_pad, h, dp)[:, :t]


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------

def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def prefix_decode_eligible(q, k, kv_offset, extra_kv, kv_scales) -> bool:
    """Dispatch gate for the valid-prefix Pallas decode kernel: shape scope
    (decode_attn.supported) plus the measured-profitability heuristic
    S >= PREFIX_DECODE_MIN (the shape predicate alone admits configs where
    the kernel loses — ADVICE r3 / PREFIX_DECODE_PROBE.json)."""
    if (PREFIX_DECODE_MIN <= 0 or k.shape[1] < PREFIX_DECODE_MIN
            or kv_offset is None or extra_kv is None):
        return False
    from gill_tpu.ops import decode_attn as _pda
    return _pda.supported(q, k, kv_offset, kv_scales)


def _decode_attention_chunked(q, k, v, *, scale: float, kv_offset,
                              extra_kv=None, kv_scales=None,
                              chunk: int = 256):
    """Decode attention over ONLY the valid cache prefix, in chunks.

    The single-pass formulation reads the whole preallocated cache every
    step; for chat-length buckets (S >= 512) most of it is masked padding.
    A fori_loop with a DYNAMIC trip count (ceil((kv_offset+1)/chunk)) runs
    an online max/sum update per chunk — each step reads only the chunks
    that contain valid keys, so cache traffic follows the true context
    length instead of the bucket size.
    """
    b, _, h, d = q.shape
    s = k.shape[1]
    qf = q[:, 0].astype(jnp.float32)                       # (B, H, D)
    vdt = jnp.bfloat16 if v.dtype == jnp.int8 else v.dtype

    def body(i, carry):
        m, l, acc = carry
        k_blk = jax.lax.dynamic_slice_in_dim(k, i * chunk, chunk, 1)
        v_blk = jax.lax.dynamic_slice_in_dim(v, i * chunk, chunk, 1)
        logits = jnp.sum(qf[:, None] * k_blk.astype(jnp.float32), axis=-1)
        if kv_scales is not None:
            ks, vs = kv_scales
            ks_blk = jax.lax.dynamic_slice_in_dim(ks, i * chunk, chunk, 1)
            vs_blk = jax.lax.dynamic_slice_in_dim(vs, i * chunk, chunk, 1)
            logits = logits * ks_blk.astype(jnp.float32)
        logits = logits * scale
        pos = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk, 1), 1)
        logits = jnp.where(pos <= kv_offset, logits, _NEG_INF)
        m_new = jnp.maximum(m, logits.max(axis=1, keepdims=True))
        p = jnp.exp(logits - m_new)
        if kv_scales is not None:
            p = p * vs_blk.astype(jnp.float32)
            # l must sum raw probabilities; vs folds only into the PV term
            l_term = jnp.exp(logits - m_new).sum(axis=1, keepdims=True)
        else:
            l_term = p.sum(axis=1, keepdims=True)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + l_term
        acc_new = acc * alpha[:, 0, :, None] + jnp.sum(
            p[..., None].astype(vdt) * v_blk.astype(vdt), axis=1
        ).astype(jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((b, 1, h), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, 1, h), jnp.float32)
    acc0 = jnp.zeros((b, h, d), jnp.float32)
    n_chunks = jnp.minimum(kv_offset // chunk + 1, s // chunk)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))

    if extra_kv is not None:
        k1, v1 = extra_kv
        l1 = jnp.sum(qf * k1[:, 0].astype(jnp.float32), axis=-1) * scale
        m_new = jnp.maximum(m, l1[:, None])
        alpha = jnp.exp(m - m_new)
        p1 = jnp.exp(l1[:, None] - m_new)                  # (B, 1, H)
        l = l * alpha + p1
        acc = acc * alpha[:, 0, :, None] + (
            p1[:, 0, :, None].astype(vdt) * v1[:, 0].astype(vdt)
        ).astype(jnp.float32)
    out = acc / jnp.maximum(l[:, 0, :, None], 1e-30)
    return out[:, None].astype(q.dtype)


def dot_product_attention(q, k, v, *, causal: bool = False,
                          bias: Optional[jax.Array] = None,
                          kv_offset: Optional[jax.Array] = None,
                          impl: str = "auto", fast: bool = False,
                          extra_kv=None, kv_scales=None):
    """Attention core. q (B,T,H,D), k/v (B,S,H,D) -> (B,T,H,D).

    impl: 'auto' | 'xla' | 'flash'. 'auto' uses the Pallas kernel on TPU for
    multi-token queries with no additive bias or dynamic kv_offset; the XLA
    path otherwise (CPU tests, single-token decode, biased attention).
    fast: clamp-shift softmax for bounded logits (flash path only; see
    flash_attention) — used by the SD UNet.
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    if q.shape[1] == 1 and causal and bias is None and impl != "xla":
        # Single-token decode: mul+reduce over the cache (bandwidth-bound)
        # instead of B*H latency-bound M=1 matmuls. Long caches read only
        # the valid prefix, chunked.
        off = k.shape[1] - 1 if kv_offset is None else kv_offset
        # Valid-prefix Pallas kernel for long buckets: reads only each row's
        # valid cache prefix with double-buffered DMA (ops/decode_attn.py).
        # Gated on supported() (d % 128, bf16 KV, divisible bucket) AND
        # S >= PREFIX_DECODE_MIN — the shape-only predicate admits configs
        # where the kernel is a measured regression (PREFIX_DECODE_PROBE).
        if prefix_decode_eligible(q, k, kv_offset, extra_kv,
                                  kv_scales) and _on_tpu():
            lens = jnp.broadcast_to(jnp.asarray(kv_offset) + 1,
                                    (q.shape[0],))
            from gill_tpu.ops import decode_attn as _pda
            return _pda.prefix_decode_attention(
                q, k, v, lens, extra_kv[0], extra_kv[1], scale=scale)
        # Valid-prefix chunked reads are OFF by default: measured SLOWER on
        # v5e (491 vs 867 tok/s at opt-2.7b w8+kv8, 512-prompt/512-gen) —
        # the dynamic-trip-count loop defeats XLA's DMA pipelining, which
        # hides the full-cache read better than skipping half of it saves.
        # Available for very long buckets via GILL_DECODE_CHUNK_MIN
        # (import-time knob, see module header).
        _chunk_min = DECODE_CHUNK_MIN
        if (_chunk_min > 0 and k.shape[1] >= _chunk_min
                and k.shape[1] % 256 == 0 and kv_offset is not None
                and jnp.ndim(kv_offset) == 0):
            return _decode_attention_chunked(
                q, k, v, scale=scale, extra_kv=extra_kv,
                kv_scales=kv_scales, kv_offset=off)
        return _decode_attention(
            q, k, v, scale=scale, extra_kv=extra_kv, kv_scales=kv_scales,
            kv_offset=off).astype(q.dtype)
    assert extra_kv is None and kv_scales is None, \
        "extra_kv/kv_scales are decode-only"
    # flash pays off for multi-token queries over long KV. The >=256 KV
    # floor also keeps every TRAINING-path attention (max_len 32 LM seqs,
    # 77-token mapper) on the differentiable XLA path — pallas_call has no
    # VJP, and the SD UNet (frozen, inference-only) opts its short-KV
    # cross-attention in explicitly with impl='flash'.
    use_flash = (
        impl == "flash"
        or (impl == "auto" and _on_tpu() and bias is None and kv_offset is None
            and q.shape[1] > 1 and k.shape[1] >= 256)
    )
    if use_flash:
        return flash_attention(q, k, v, causal=causal, fast=fast)
    return _xla_attention(q, k, v, causal=causal, bias=bias, scale=scale,
                          kv_offset=kv_offset)
