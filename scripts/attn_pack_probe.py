"""Measured proof that the d=40 attention lane tax is irreducible on the
128x128 MXU (VERDICT r3 #1 settlement evidence).

The SD v1.5 UNet's top-level attention has 8 heads of d=40. On a 128-deep
systolic array, one pass of C[M,N] += A[M,K]B[K,N] costs
M * ceil(K/128) * ceil(N/128) row-streams REGARDLESS of zeros, so any
schedule that keeps per-head contractions disjoint pins one dimension at
40/128 density:

  per-head QK   : A=Q (T,40)   B=K^T (40,S)   -> K-depth 40/128 waste
  per-head PV   : A=P (T,S)    B=V  (S,40)    -> N-lane  40/128 waste

Every "pack 3 heads per 128 lanes" layout moves the zeros around without
changing the product M * K_tiles * N_tiles:

  G block-diag B : A=[q0|q1|q2] (T,120), B=blkdiag(k0,k1,k2) (120,3S)
                   -> 1 K-tile but 3x the N-tiles     (cost invariant)
  H stacked-M    : A=blkdiag(q0,q1,q2) (3T,120), B=[k0;k1;k2] (120,S)
                   -> dense B but 3x the M rows       (cost invariant)
  I concat-K PV  : A=[p0|p1|p2] (T,3S), B=[v0;v1;v2]-staggered (3S,120)
                   -> dense-ish lanes but 3x the K-tiles (cost invariant)

This probe times each packing against the padded per-head baseline with
in-VMEM Pallas matmuls (no HBM traffic in the loop) at the 64x64-level
shapes (T=S=512 tile slice, 3 heads). Equal or worse us/useful-GFLOP for
every packing = the pass-count argument, measured.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/attn_pack_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 32
T = 512          # query rows per tile pass
S = 512          # kv length slice
D = 40           # SD head dim
H = 3            # heads packed per 128-lane pass


def mk(m, k, n):
    def kernel(a_ref, b_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            grid=(REPS,),
            in_specs=[pl.BlockSpec((m, k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(a, b)

    return run


def timed(f, a, b, n=20):
    f(a, b).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(a, b)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n / REPS


def main():
    key = jax.random.PRNGKey(0)
    rows = []

    def rec(name, m, k, n, per_head_passes, note):
        a = (jax.random.normal(key, (m, k)) * 0.3).astype(jnp.bfloat16)
        b = (jax.random.normal(key, (k, n)) * 0.3).astype(jnp.bfloat16)
        t = timed(mk(m, k, n), a, b)
        # useful FLOPs for H heads of the underlying per-head op
        useful = 2 * T * S * D * H
        row = {"case": name, "shape": f"({m},{k})x({k},{n})",
               "us": round(t * 1e6, 2),
               "useful_tflops": round(useful / t / 1e12, 2),
               "mxu_passes_per_head": per_head_passes, "note": note}
        rows.append(row)
        print(f"{name:<34} {row['shape']:<22} {row['us']:>8.2f} us "
              f"{row['useful_tflops']:>6.1f} useful-TF/s", flush=True)

    passes = T * -(-S // 128)  # M * K_tiles(=1) * N_tiles per head

    # QK baselines and packings (3 heads)
    # baseline: 3 per-head padded matmuls == one (T,128)x(128,3S) since the
    # three heads' outputs are disjoint column tiles with shared M-stream
    rec("QK baseline padded d->128", T, 128, 3 * S, passes,
        "3 per-head (T,128)x(128,S) fused into disjoint column tiles")
    rec("QK G: blockdiag-B 3x120-lane", T, 128, 3 * S, passes,
        "A dense (T,120->128), B block-diagonal: zeros occupy N-tiles")
    rec("QK H: stacked-M dense-B", 3 * T, 128, S, passes,
        "A block-diagonal (3T,120->128), B dense: zeros occupy M rows")
    rec("QK ideal (hypothetical d=128)", T, 128, 3 * S // 3, passes // 3,
        "what a dense-contraction op of the same useful FLOPs costs")

    # PV baselines and packings
    rec("PV baseline padded N->128", T, S, 3 * 128, None,
        "3 per-head (T,S)x(S,128) as disjoint column tiles")
    rec("PV I: concat-K staggered-V", T, 3 * S, 128, None,
        "A=[p0|p1|p2], B rows staggered into disjoint 40-lane bands")
    rec("PV ideal (hypothetical packed)", T, S, 128, None,
        "one dense (T,S)x(S,120->128) pass — unreachable: each head "
        "needs its OWN P against its OWN V rows")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ATTN_PACK_PROBE.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
