"""Probe v5e int8 MXU rates vs bf16 for the SD UNet's hot shapes:
FF matmuls and 3x3 convs. Decides whether an int8 serving mode can hit
the 2.0 img/s/chip north star."""

import time
from functools import partial

import jax
import jax.numpy as jnp


def timed(fn, *args, n1=16, n2=144):
    """The perturbation goes through a max() so XLA cannot distribute the
    matmul over (x + c) and hoist it out of the loop (dot(x+c,W) ==
    dot(x,W) + c*colsum(W) -- the algebraic simplifier WILL do this)."""

    @partial(jax.jit, static_argnames=("n",))
    def rep(n, *a):
        def body(c, _):
            x = jnp.maximum(a[0].astype(jnp.float32) + c,
                            a[0].astype(jnp.float32)).astype(a[0].dtype)
            out = fn(x, *a[1:])
            return out.astype(jnp.float32).mean() * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    float(rep(n1, *args))
    t0 = time.perf_counter(); float(rep(n1, *args)); t1 = time.perf_counter() - t0
    float(rep(n2, *args))
    t0 = time.perf_counter(); float(rep(n2, *args)); t2 = time.perf_counter() - t0
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    key = jax.random.PRNGKey(0)

    # FF matmul shape at 64x64 (M=B*S, d -> 8d)
    for (m, kk, n) in [(32768, 320, 2560), (32768, 1280, 320),
                       (8192, 640, 5120), (2048, 1280, 10240)]:
        xb = (jax.random.normal(key, (m, kk)) * 10).astype(jnp.bfloat16)
        wb = (jax.random.normal(key, (kk, n))).astype(jnp.bfloat16)
        xi = (jax.random.normal(key, (m, kk)) * 10).astype(jnp.int8)
        wi = (jax.random.normal(key, (kk, n)) * 10).astype(jnp.int8)
        tb = timed(lambda a, b: jnp.dot(a, b), xb, wb)
        ti = timed(lambda a, b: jnp.dot(a, b,
                                        preferred_element_type=jnp.int32),
                   xi, wi)
        # int8 with fused dynamic quant epilogue (dequant int32->bf16)
        def qmm(a, b):
            y = jnp.dot(a, b, preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)
        tq = timed(qmm, xi, wi)
        gf = 2 * m * kk * n / 1e9
        print(f"mm {m}x{kk}x{n}: bf16 {tb*1e3:7.3f}ms ({gf/tb/1e3:6.1f} TF/s)"
              f"  int8 {ti*1e3:7.3f}ms ({gf/ti/1e3:6.1f} TOP/s)"
              f"  int8+deq {tq*1e3:7.3f}ms", flush=True)

    # 3x3 conv shapes (NHWC)
    for (b, hw, cin, cout) in [(8, 64, 320, 320), (8, 32, 640, 640),
                               (8, 16, 1280, 1280)]:
        xb = (jax.random.normal(key, (b, hw, hw, cin))).astype(jnp.bfloat16)
        wb = (jax.random.normal(key, (3, 3, cin, cout)) * 0.05).astype(jnp.bfloat16)
        xi = (jax.random.normal(key, (b, hw, hw, cin)) * 10).astype(jnp.int8)
        wi = (jax.random.normal(key, (3, 3, cin, cout)) * 10).astype(jnp.int8)

        def conv(a, w, pet=None):
            return jax.lax.conv_general_dilated(
                a, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pet)

        tb = timed(lambda a, w=wb: conv(a, w), xb)
        try:
            ti = timed(lambda a, w=wi: conv(a, w, jnp.int32), xi)
            msg = f"int8 {ti*1e3:7.3f}ms"
            gf = 2 * b * hw * hw * 9 * cin * cout / 1e9
            msg += f" ({gf/ti/1e3:6.1f} TOP/s)"
        except Exception as e:
            msg = f"int8 FAILED {type(e).__name__}"
        gf = 2 * b * hw * hw * 9 * cin * cout / 1e9
        print(f"conv {b}x{hw}^2x{cin}->{cout}: bf16 {tb*1e3:7.3f}ms "
              f"({gf/tb/1e3:6.1f} TF/s)  {msg}", flush=True)


if __name__ == "__main__":
    main()
