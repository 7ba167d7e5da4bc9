"""Sweep flash-attention kernel variants on the SD 64x64 self-attention
shape (B=8 CFG batch, H=8, S=4096, d=40) on the real chip."""

import functools
import math
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def timed(fn, *args, n1=2, n2=12):
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


# --- variant A: current kernel (import) -------------------------------------
from gill_tpu.ops.attention import flash_attention as current_flash


# --- variant B: parameterized single-pass kernel ----------------------------

def make_flash(block_q, block_k, prob_dtype, kt: bool, heads_per: int = 1):
    """kt: k passed pre-transposed (bh, d, S)."""

    def kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_k):
        block_q_, d = q_ref.shape
        q = q_ref[:]
        m = jnp.full((block_q_, 1), _NEG_INF, jnp.float32)
        l = jnp.zeros((block_q_, 1), jnp.float32)
        acc = jnp.zeros((block_q_, d), jnp.float32)
        num_kb = seq_k // block_k

        def body(kb, carry):
            m, l, acc = carry
            if kt:
                k_blk = k_ref[:, pl.ds(kb * block_k, block_k)]
                s_blk = jax.lax.dot_general(
                    q, k_blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            else:
                k_blk = k_ref[pl.ds(kb * block_k, block_k), :]
                s_blk = jax.lax.dot_general(
                    q, k_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            v_blk = v_ref[pl.ds(kb * block_k, block_k), :]
            m_new = jnp.maximum(m, s_blk.max(axis=-1, keepdims=True))
            p = jnp.exp((s_blk - m_new).astype(prob_dtype) if prob_dtype != jnp.float32 else s_blk - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + p.astype(jnp.float32).sum(axis=-1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        if num_kb == 1:
            m, l, acc = body(0, (m, l, acc))
        else:
            m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
        o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    @jax.jit
    def run(q, k, v):
        # q (B,T,H,D) k/v (B,S,H,D)
        b, t, h, d = q.shape
        s = k.shape[1]
        scale = 1.0 / math.sqrt(d)
        d_pad = 128

        def pad_d(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))

        def to_bh(x):
            bb, tt, hh, dd = x.shape
            return x.transpose(0, 2, 1, 3).reshape(bb * hh, tt, dd)

        qb = to_bh(pad_d(q))
        kb = to_bh(pad_d(k))
        vb = to_bh(pad_d(v))
        if kt:
            kb = kb.transpose(0, 2, 1)  # (bh, d, S)

        grid = (b * h, t // block_q)
        kspec = (pl.BlockSpec((None, d_pad, s), lambda bh, i: (bh, 0, 0))
                 if kt else
                 pl.BlockSpec((None, s, d_pad), lambda bh, i: (bh, 0, 0)))
        out = pl.pallas_call(
            functools.partial(kernel, scale=scale, seq_k=s),
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, block_q, d_pad), lambda bh, i: (bh, i, 0)),
                kspec,
                pl.BlockSpec((None, s, d_pad), lambda bh, i: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((None, block_q, d_pad),
                                   lambda bh, i: (bh, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t, d_pad), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(qb, kb, vb)
        out = out.reshape(b, h, t, d_pad).transpose(0, 2, 1, 3)
        return out[..., :d]

    return run


# --- variant C: no-max softmax (scores bounded; skip running max) ------------

def make_flash_nomax(block_q, block_k):
    def kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_k):
        block_q_, d = q_ref.shape
        q = q_ref[:]
        l = jnp.zeros((block_q_, 1), jnp.float32)
        acc = jnp.zeros((block_q_, d), jnp.float32)
        num_kb = seq_k // block_k

        def body(kb, carry):
            l, acc = carry
            k_blk = k_ref[pl.ds(kb * block_k, block_k), :]
            v_blk = v_ref[pl.ds(kb * block_k, block_k), :]
            s_blk = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            p = jnp.exp(s_blk - 12.0)  # fixed shift: e^{-12..+18} fits fp32
            l = l + p.sum(axis=-1, keepdims=True)
            acc = acc + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return l, acc

        if num_kb == 1:
            l, acc = body(0, (l, acc))
        else:
            l, acc = jax.lax.fori_loop(0, num_kb, body, (l, acc))
        o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    @jax.jit
    def run(q, k, v):
        b, t, h, d = q.shape
        s = k.shape[1]
        scale = 1.0 / math.sqrt(d)
        d_pad = 128

        def pad_d(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))

        def to_bh(x):
            bb, tt, hh, dd = x.shape
            return x.transpose(0, 2, 1, 3).reshape(bb * hh, tt, dd)

        qb, kb, vb = to_bh(pad_d(q)), to_bh(pad_d(k)), to_bh(pad_d(v))
        grid = (b * h, t // block_q)
        out = pl.pallas_call(
            functools.partial(kernel, scale=scale, seq_k=s),
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, block_q, d_pad), lambda bh, i: (bh, i, 0)),
                pl.BlockSpec((None, s, d_pad), lambda bh, i: (bh, 0, 0)),
                pl.BlockSpec((None, s, d_pad), lambda bh, i: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((None, block_q, d_pad),
                                   lambda bh, i: (bh, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t, d_pad), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(qb, kb, vb)
        return out.reshape(b, h, t, d_pad).transpose(0, 2, 1, 3)[..., :d]

    return run


def main():
    B, S, H, D = 8, 4096, 8, 40
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)

    ref = None
    variants = [
        ("current(auto 256xS)", lambda q, k, v: current_flash(q, k, v, causal=False)),
    ]
    for bq in (256, 512, 1024):
        variants.append((f"single-pass bq={bq}", make_flash(bq, S, jnp.float32, False)))
    variants.append(("bq=512 online bk=1024", make_flash(512, 1024, jnp.float32, False)))
    variants.append(("bq=256 bf16-probs", make_flash(256, S, jnp.bfloat16, False)))
    variants.append(("bq=512 bf16-probs", make_flash(512, S, jnp.bfloat16, False)))
    variants.append(("bq=512 k-transposed", make_flash(512, S, jnp.float32, True)))
    variants.append(("bq=512 nomax", make_flash_nomax(512, S)))
    variants.append(("bq=1024 nomax", make_flash_nomax(1024, S)))

    for name, fn in variants:
        try:
            t = timed(fn, q, k, v)
            out = fn(q, k, v)
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                            ref.astype(jnp.float32))))
            print(f"{name:<28}{t*1e3:>8.3f} ms   maxerr={err:.2e}", flush=True)
        except Exception as e:
            print(f"{name:<28}FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
