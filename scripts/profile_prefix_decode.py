"""A/B the valid-prefix Pallas decode-attention kernel vs the XLA
full-cache-read decode path on the real chip, at serving shapes.

Per config, times N attention calls inside one compiled scan (the repo's
standard delta timing — dispatch overhead cancels, q threads through the
carry so iterations can't CSE) for:
  xla     — ops/attention._decode_attention (reads the whole bucket)
  pallas  — ops/decode_attn.prefix_decode_attention (reads valid prefix)
at three occupancy mixes: full (every row at bucket), mixed (uniform
[1, S] — the continuous-batching steady state), half-parked (half the
rows length 0 — burst-drain tail / retired slots).

Usage: python scripts/profile_prefix_decode.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("GILL_JAX_CACHE", "/root/.cache/jax_compilation")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gill_tpu.ops.attention import _decode_attention
    from gill_tpu.ops.decode_attn import prefix_decode_attention

    def timed(fn, *args):
        """Median-of-3 wall time of one dispatch (no overhead correction —
        callers take deltas between two iteration counts instead)."""
        float(fn(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    CONFIGS = [
        # d % 128 == 0 only (the kernel's scope — opt-6.7b head shape)
        ("serve67_s16", 16, 512, 32, 128),   # 6.7b 16-slot pool
        ("serve67_s32", 32, 512, 32, 128),   # 6.7b 32-slot pool
        ("long67_b8", 8, 768, 32, 128),      # 6.7b 512+256 long context
        ("short67_b64", 64, 128, 32, 128),   # 6.7b b64 throughput config
    ]
    N_LO, N_HI = 16, 80
    rng = np.random.RandomState(0)
    results = []
    for name, b, s, h, d in CONFIGS:
        scale = 1.0 / np.sqrt(d)
        k = jnp.asarray(rng.randn(b, s, h, d) * 0.3, jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, s, h, d) * 0.3, jnp.bfloat16)
        q = jnp.asarray(rng.randn(b, 1, h, d) * 0.3, jnp.bfloat16)
        k1 = jnp.asarray(rng.randn(b, 1, h, d) * 0.3, jnp.bfloat16)
        v1 = jnp.asarray(rng.randn(b, 1, h, d) * 0.3, jnp.bfloat16)

        # halfpark derives from the SAME sampled lengths as mixed (every
        # other row zeroed) so the parked-slot effect is isolated from
        # length-sampling variance (ADVICE r3).
        mixed_lens = rng.randint(1, s + 1, size=b)
        mixes = {
            "full": np.full((b,), s, np.int64),
            "mixed": mixed_lens,
            "halfpark": np.where(np.arange(b) % 2 == 0, mixed_lens, 0),
        }

        @partial(jax.jit, static_argnames=("which", "n"))
        def run_n(q, k, v, lens, k1, v1, which, n):
            def step(qc, _):
                if which == "xla":
                    o = _decode_attention(qc, k, v, scale=scale,
                                          kv_offset=lens - 1,
                                          extra_kv=(k1, v1))
                else:
                    o = prefix_decode_attention(qc, k, v, lens, k1, v1,
                                                scale=scale)
                return (qc + o.astype(qc.dtype) * 1e-6), ()
            qf, _ = jax.lax.scan(step, q, None, length=n)
            return qf.astype(jnp.float32).sum()

        dn = N_HI - N_LO
        for mix, lens_np in mixes.items():
            lens = jnp.asarray(lens_np, jnp.int32)
            t_x = (timed(lambda: run_n(q, k, v, lens, k1, v1, "xla", N_HI))
                   - timed(lambda: run_n(q, k, v, lens, k1, v1, "xla",
                                         N_LO))) / dn
            t_p = (timed(lambda: run_n(q, k, v, lens, k1, v1, "pallas", N_HI))
                   - timed(lambda: run_n(q, k, v, lens, k1, v1, "pallas",
                                         N_LO))) / dn
            t_x, t_p = max(t_x, 1e-9), max(t_p, 1e-9)
            rec = {"config": name, "mix": mix,
                   "xla_us": round(t_x * 1e6, 1),
                   "pallas_us": round(t_p * 1e6, 1),
                   "speedup": round(t_x / t_p, 3)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PREFIX_DECODE_PROBE.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
