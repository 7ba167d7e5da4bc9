"""Streaming-bandwidth probe for the W8A16 decode matmul (ops/w8_matmul.py)
at opt-6.7b decode shapes. The decode step is weight-bandwidth-bound, so
the kernel's achieved GB/s IS the serving throughput; this sweeps block
shapes (and a bf16 XLA matmul reference) to find the fastest config.

Timing: each measurement runs the op n times inside one compiled scan whose
carry perturbs x through a nonlinearity (prevents hoisting/DCE — see
memory: XLA distributes matmuls over broadcast adds); cost = delta between
two n values, cancelling fixed relay dispatch overhead.

Run (single-holder TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/w8_probe.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp


def timed(fn, *args, n1=16, n2=144):
    @partial(jax.jit, static_argnames=("n",))
    def rep(n, x, *a):
        def body(c, _):
            xp = jnp.maximum(x + c.astype(x.dtype), x)
            out = fn(xp, *a)
            return out.astype(jnp.float32).mean() * 1e-12, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    float(rep(n1, *args))
    t0 = time.perf_counter()
    float(rep(n1, *args))
    t1 = time.perf_counter() - t0
    float(rep(n2, *args))
    t0 = time.perf_counter()
    float(rep(n2, *args))
    t2 = time.perf_counter() - t0
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    from gill_tpu.ops.w8_matmul import w8_matmul

    key = jax.random.PRNGKey(0)
    M = 8
    shapes = [(4096, 4096), (4096, 16384), (16384, 4096)]
    print(f"{'shape':<16}{'config':<28}{'ms':>8}{'GB/s':>8}")
    for K, N in shapes:
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        ws = jnp.full((N,), 1e-3, jnp.float32)
        wbf = (w8.astype(jnp.bfloat16) * ws.astype(jnp.bfloat16)[None, :])
        gb = K * N / 1e9

        t = timed(lambda a, w: a @ w, x, wbf)
        print(f"{K}x{N:<10}{'bf16 XLA (2x bytes)':<28}{t*1e3:>8.3f}"
              f"{2*gb/t:>8.0f}")

        for bn, bk in [(512, 2048), (1024, 2048), (2048, 2048),
                       (512, 4096), (1024, 4096), (2048, 4096),
                       (4096, 4096)]:
            if bn > N or bk > K:
                continue
            vl = 100 * 1024 * 1024 if bn * bk >= 2048 * 4096 else 0
            f = partial(w8_matmul, block_n=bn, block_k=bk, vmem_limit=vl)
            try:
                t = timed(lambda a, w, s: f(a, w, s), x, w8, ws)
            except Exception as e:
                print(f"{K}x{N:<10}bn={bn} bk={bk}: {type(e).__name__}")
                continue
            print(f"{K}x{N:<10}{f'pallas bn={bn} bk={bk}':<28}{t*1e3:>8.3f}"
                  f"{gb/t:>8.0f}")
        print()


if __name__ == "__main__":
    main()
