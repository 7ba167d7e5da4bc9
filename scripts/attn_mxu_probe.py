"""MXU orientation/dtype probes for the SD attention shapes.

Times pallas kernels that repeat one matmul many times in-VMEM (no HBM
traffic in the loop), isolating MXU throughput:
  A: QK bf16      (512,128)@(128,4096)
  B: QK int8      same, int8 -> int32
  C: PV bf16      (512,4096)@(4096,128)   <- N padded 40->128
  D: PV^T bf16    (40,4096)@(4096,512)    <- small-M orientation
  E: PV^T bf16    (48,4096)@(4096,512)    (sublane-aligned M)
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 32


def mk(m, k, n, dt, pet):
    """Grid-based repetition: each sequential grid step re-runs the matmul
    into a revisited accumulator block — nothing is loop-invariant-hoistable
    (an in-kernel fori_loop over constant operands gets collapsed)."""

    def kernel(a_ref, b_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=pet)

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
            out_shape=jax.ShapeDtypeStruct((m, n), pet),
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
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    cases = [
        ("A QK bf16 (512,128)x(128,2048)", 512, 128, 2048, jnp.bfloat16, jnp.float32),
        ("B QK int8", 512, 128, 2048, jnp.int8, jnp.int32),
        ("C PV bf16 (512,4096)x(4096,128)", 512, 4096, 128, jnp.bfloat16, jnp.float32),
        ("C8 PV int8", 512, 4096, 128, jnp.int8, jnp.int32),
        ("D PVt bf16 (40,4096)x(4096,512)", 40, 4096, 512, jnp.bfloat16, jnp.float32),
        ("E PVt bf16 (48,4096)x(4096,512)", 48, 4096, 512, jnp.bfloat16, jnp.float32),
        ("F PVt bf16 (128,4096)x(4096,512)", 128, 4096, 512, jnp.bfloat16, jnp.float32),
    ]
    for name, m, k, n, dt, pet in cases:
        a = (jax.random.normal(key, (m, k)) * 3).astype(dt)
        b = (jax.random.normal(key, (k, n)) * 3).astype(dt)
        try:
            t = timed(mk(m, k, n, dt, pet), a, b)
            fl = 2 * m * k * n * REPS
            print(f"{name:<36} {t*1e6/REPS:8.2f} us/mm  {fl/t/1e12:7.1f} T/s",
                  flush=True)
        except Exception as e:
            print(f"{name:<36} FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
