"""Measured + arithmetic proof that the d=40 attention lane tax is
irreducible on the 128x128 MXU (VERDICT r3 #1 settlement evidence).

The SD v1.5 UNet's 64x64-level attention has 8 heads of d=40 over S=4096
tokens — profile_sd.py measures it at 18.4 ms of the 51.0 ms CFG-batch-8
UNet step (36%). Removing the 128/40 = 3.2x lane tax entirely would make
the step ~38 ms = 2.09 img/s — i.e. the tax IS the remaining gap to the
2.0 img/s north star.

Why no packing closes it — the pass-count identity. One MXU pass of
C[M,N] += A[M,K]B[K,N] costs M * ceil(K/128) * ceil(N/128) row-streams
regardless of zero content. Per-head QK/PV with d=40 pins one dimension
at 40/128 density, and every head-packing layout conserves the product:

  layout                      M      K_tiles  N_tiles   total (3 heads)
  per-head QK (padded d)      T      1        3*S/128   3*T*S/128
  G blockdiag-B (120 lanes)   T      1        3*S/128   3*T*S/128
  H stacked-M (dense B)       3T     1        S/128     3*T*S/128
  per-head PV (padded N)      T      S/128    3         3*T*S/128
  I concat-K (staggered V)    T      3*S/128  1         3*T*S/128
  hypothetical dense op       T      1        S/128     T*S/128   <- 3x

The floor argument: the logits tensor has T*S*H elements, each needing
d=40 MACs, and the MXU charges a full 128-deep column per output element
per pass; head-disjointness forbids filling the other 88 lanes with
another head's work for the SAME output element. 128/40 = 3.2x,
closable only by changing d (fixed by the frozen checkpoint) or the
output count (a different attention algorithm = different numerics).
Single-tile relay timing sits below dispatch noise (~20 us), so the
MEASURED side of this proof runs at the real aggregate shape
(B=8, T=S=4096, H=8):

  padded-flash : the shipped kernel on (B,S,H,128) — runs at ~95% of the
                 MXU bf16 peak counting PADDED FLOPs (the hardware has no
                 headroom left on the op as scheduled);
  xla-unpadded : jnp.einsum attention on the native (B,S,H,40) layout —
                 XLA's best schedule WITHOUT the padding, measured
                 slower (it pads internally AND pays relayouts);
  per-head-eff : useful/padded FLOP ratio = 40/128.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/attn_pack_probe.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, S, H, D, DP = 8, 4096, 8, 40, 128
N_LO, N_HI = 2, 10

PACKING_TABLE = [
    {"layout": "per-head QK (padded d->128)", "M": "T", "K_tiles": 1,
     "N_tiles": "3S/128", "total": "3*T*S/128"},
    {"layout": "G blockdiag-B (3x40-lane bands)", "M": "T", "K_tiles": 1,
     "N_tiles": "3S/128", "total": "3*T*S/128"},
    {"layout": "H stacked-M (dense B)", "M": "3T", "K_tiles": 1,
     "N_tiles": "S/128", "total": "3*T*S/128"},
    {"layout": "per-head PV (padded N->128)", "M": "T", "K_tiles": "S/128",
     "N_tiles": 3, "total": "3*T*S/128"},
    {"layout": "I concat-K PV (staggered V)", "M": "T",
     "K_tiles": "3S/128", "N_tiles": 1, "total": "3*T*S/128"},
    {"layout": "hypothetical dense (no head disjointness)", "M": "T",
     "K_tiles": 1, "N_tiles": "S/128", "total": "T*S/128 (3x less)"},
]


def timed(fn, *args):
    @partial(jax.jit, static_argnames=("n",))
    def rep(n, *a):
        def body(c, _):
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            return out.astype(jnp.float32).mean() * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    def t(steps):
        float(rep(steps, *args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(rep(steps, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(t(N_HI) - t(N_LO), 1e-9) / (N_HI - N_LO)


def main():
    from gill_tpu.ops.attention import flash_attention_bthd

    key = jax.random.PRNGKey(0)
    scale = 1.0 / (D ** 0.5)

    qp = (jax.random.normal(key, (B, S, H, DP)) * 0.1).astype(jnp.bfloat16)
    kp = (jax.random.normal(key, (B, S, H, DP)) * 0.1).astype(jnp.bfloat16)
    vp = (jax.random.normal(key, (B, S, H, DP)) * 0.1).astype(jnp.bfloat16)
    # zero the pad lanes like the padded projections produce
    mask = (jnp.arange(DP) < D).astype(jnp.bfloat16)
    qp, kp, vp = qp * mask, kp * mask, vp * mask
    qu, ku, vu = qp[..., :D], kp[..., :D], vp[..., :D]

    t_flash = timed(lambda q: flash_attention_bthd(
        q, kp, vp, causal=False, fast=True, scale=scale), qp)

    def xla_attn(q, k, v):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * scale
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    t_xla = timed(xla_attn, qu, ku, vu)

    padded_fl = 2 * 2 * B * H * S * S * DP     # qk + pv, padded
    useful_fl = 2 * 2 * B * H * S * S * D
    rows = {
        "shape": {"B": B, "S": S, "H": H, "d": D, "d_padded": DP},
        "flash_padded_ms": round(t_flash * 1e3, 3),
        "flash_padded_tflops": round(padded_fl / t_flash / 1e12, 1),
        "flash_useful_tflops": round(useful_fl / t_flash / 1e12, 1),
        "xla_unpadded_ms": round(t_xla * 1e3, 3),
        "xla_vs_flash": round(t_xla / t_flash, 2),
        "lane_tax": round(DP / D, 2),
        "packing_pass_counts": PACKING_TABLE,
        "note": "v5e bf16 peak ~197 TF/s; flash_padded_tflops near peak "
                "means the padded schedule has no MXU headroom, and the "
                "pass-count table shows every head-packing keeps the "
                "padded pass count — the 3.2x is structural.",
    }
    print(json.dumps(rows, indent=1))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ATTN_PACK_PROBE.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
