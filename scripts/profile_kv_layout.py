"""KV-cache physical-layout tax on the decode read path.

The decode attention (ops/attention.py _decode_attention) streams the KV
cache as VPU elementwise work: logits = sum_D(q * k), out = sum_S(p * v),
with k/v logically (B, S, H, D). On TPU the last two dims are tiled
(lane = last dim): OPT's head_dim D=80 pads to lane 128 — every cache tile
is stored AND STREAMED at 1.6x its useful bytes (confirmed by an XLA OOM
dump: s8[32,16,2048,32,80] "Unpadded 2.50G / Padded 4.00G"). A transposed
arrangement (B, H, D, S) puts D=80 in the sublane dim (multiple of 8 —
exact) and S in the lane dim (multiple of 128 — exact): zero padding.

This probe times BOTH formulations of the same reduction at serving shapes
and reports achieved GB/s over the UNPADDED bytes. If (B,H,D,S) reads at
~1.6x the (B,S,H,D) rate, the padding tax is real traffic and the decode
cache should adopt the transposed layout.

A D=128 control (pad-free in BOTH arrangements) separates layout-tax from
formulation overhead (reduce over lane vs sublane).

Writes KV_LAYOUT_PROBE.json.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def bsh_d(q, k, v):
    """Current arrangement: k/v (B, S, H, D); q (B, H, D)."""
    qf = q.astype(jnp.float32)
    logits = jnp.sum(qf[:, None] * k.astype(jnp.float32), axis=-1)  # (B,S,H)
    m = logits.max(axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / p.sum(axis=1, keepdims=True)
    return jnp.sum(p[..., None].astype(v.dtype) * v, axis=1)        # (B,H,D)


def bhd_s(q, k, v):
    """Transposed arrangement: k/v (B, H, D, S); q (B, H, D)."""
    qf = q.astype(jnp.float32)
    logits = jnp.sum(qf[..., None] * k.astype(jnp.float32), axis=2)  # (B,H,S)
    m = logits.max(axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / p.sum(axis=-1, keepdims=True)
    return jnp.sum(p[:, :, None] .astype(v.dtype) * v, axis=-1)      # (B,H,D)


def make_bse(H, D):
    """Merged arrangement: k/v (B, S, H*D) — the NATIVE qkv-projection
    output, lane-exact for any E multiple of 128 (E=2560 at OPT-2.7b).
    Per-head segment sums run on the MXU via a constant 0/1 selector
    (E, H): logits = (q*k) @ sel; the value pass broadcasts p back to E
    via sel^T. If XLA fuses the elementwise products into the dots, k/v
    stream once at unpadded bytes."""
    E = H * D
    sel = np.zeros((E, H), np.float32)
    for h in range(H):
        sel[h * D:(h + 1) * D, h] = 1.0
    sel = jnp.asarray(sel)

    def bse(q, k, v):
        # q (B, E); k/v (B, S, E)
        qf = q.astype(jnp.float32)
        prod = qf[:, None] * k.astype(jnp.float32)          # (B,S,E)
        logits = jnp.einsum("bse,eh->bsh", prod, sel)       # segment sum
        m = logits.max(axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / p.sum(axis=1, keepdims=True)
        pe = jnp.einsum("bsh,eh->bse", p, sel)              # broadcast to E
        return jnp.sum(pe.astype(v.dtype) * v, axis=1)      # (B, E)
    return bse


def time_one(fn, q, k, v, steps=32, reps=5):
    """ms per step of a `steps`-long in-jit scan (one dispatch — mirrors
    the serving chunk program; q is perturbed per step to defeat CSE).
    Best of `reps` timed dispatches (relay timing is right-skewed)."""
    def scanned(q0, k, v):
        def body(q, _):
            out = fn(q, k, v).reshape(q.shape)
            return q + 0.0 * out.astype(q.dtype), ()
        q1, _ = jax.lax.scan(body, q0, None, length=steps)
        return q1
    g = jax.jit(scanned)
    g(q, k, v).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        g(q, k, v).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    report = {}
    B, H, S = 16, 32, 2048
    for D in (80, 128):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, D), jnp.bfloat16)
        k_a = jnp.asarray(rng.randn(B, S, H, D) * 0.1, jnp.bfloat16)
        v_a = jnp.asarray(rng.randn(B, S, H, D) * 0.1, jnp.bfloat16)
        k_b = jnp.transpose(k_a, (0, 2, 3, 1))          # (B,H,D,S)
        v_b = jnp.transpose(v_a, (0, 2, 3, 1))
        k_c = k_a.reshape(B, S, H * D)                  # (B,S,E)
        v_c = v_a.reshape(B, S, H * D)
        q_c = q.reshape(B, H * D)
        bse = make_bse(H, D)
        # numeric identity first
        ref = np.asarray(bsh_d(q, k_a, v_a), np.float32)
        got = np.asarray(bhd_s(q, k_b, v_b), np.float32)
        np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)
        got_c = np.asarray(bse(q_c, k_c, v_c), np.float32)
        np.testing.assert_allclose(got_c.reshape(B, H, D), ref,
                                   atol=2e-2, rtol=2e-2)
        gb = 2 * B * S * H * D * 2 / 1e9                # k+v useful bytes
        dt_a = time_one(bsh_d, q, k_a, v_a)
        dt_b = time_one(bhd_s, q, k_b, v_b)
        dt_c = time_one(bse, q_c, k_c, v_c)
        report[f"d{D}"] = {
            "useful_gb": round(gb, 3),
            "bshd_ms": round(dt_a * 1e3, 3),
            "bhds_ms": round(dt_b * 1e3, 3),
            "bse_ms": round(dt_c * 1e3, 3),
            "bshd_gb_s": round(gb / dt_a, 1),
            "bhds_gb_s": round(gb / dt_b, 1),
            "bse_gb_s": round(gb / dt_c, 1),
            "speedup_bhds": round(dt_a / dt_b, 3),
            "speedup_bse": round(dt_a / dt_c, 3),
        }
        print(json.dumps({f"d{D}": report[f"d{D}"]}), flush=True)
    with open("KV_LAYOUT_PROBE.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
