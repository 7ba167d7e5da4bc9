"""Compare serving schedulers on the real chip: synchronous run() vs the
asynchronous chunk pipeline run_pipelined(), across chunk sizes.

The trace matches bench.bench_serve (48 requests, prompts U[16,240], gens
U[16,192], no EOS). Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_serve_sched.py
Env: GILL_BENCH_MODEL (facebook/opt-2.7b), GILL_BENCH_SLOTS (16),
     GILL_SCHED_CHUNKS (comma list, default "32,16,8").
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gill_tpu.config import OPTConfig
from gill_tpu.models import opt as opt_mod
from gill_tpu.serve.engine import DecodeEngine, ServeRequest

import bench

bench._enable_compile_cache()

MODEL = os.environ.get("GILL_BENCH_MODEL", "facebook/opt-2.7b")
SLOTS = int(os.environ.get("GILL_BENCH_SLOTS", "16"))
CHUNKS = [int(c) for c in
          os.environ.get("GILL_SCHED_CHUNKS", "32,16,8").split(",")]

cfg = OPTConfig.from_name(MODEL)


def q(leaf):
    L, i, o = leaf["w"].shape
    out = {"w8": jnp.zeros((L, i, o), jnp.int8),
           "ws": jnp.full((L, o), 1e-4, jnp.float32)}
    if "b" in leaf:
        out["b"] = leaf["b"]
    if cfg.hidden_size >= 4096:
        out["kern"] = ()
    return out


def make_params():
    p = opt_mod.init_dummy(cfg, jnp.bfloat16)
    layers = dict(p["layers"])
    layers["attn"] = {k: q(v) for k, v in layers["attn"].items()}
    layers["fc1"] = q(layers["fc1"])
    layers["fc2"] = q(layers["fc2"])
    p = dict(p)
    p["layers"] = layers
    return p


params = jax.jit(make_params)()


def trace(n, seed=7):
    rng = np.random.RandomState(seed)
    return [ServeRequest(
        uid=i,
        prompt=rng.randint(2, 1000, size=int(rng.randint(16, 241))).tolist(),
        max_new_tokens=int(rng.randint(16, 193))) for i in range(n)]


reqs = trace(int(os.environ.get("GILL_SCHED_NREQ", "48")))
n_tok = sum(r.max_new_tokens for r in reqs)

for chunk in CHUNKS:
    eng = DecodeEngine(params, cfg, slots=SLOTS, max_seq=512, chunk=chunk,
                       prefill_buckets=(64, 128, 256), unroll_layers=True)
    eng.warmup()
    eng.run([ServeRequest(uid=0, prompt=[5] * p, max_new_tokens=4)
             for p in (20, 100, 200)])

    t0 = time.perf_counter()
    out = eng.run(list(reqs))
    dt_sync = time.perf_counter() - t0
    assert sum(len(v) for v in out.values()) == n_tok

    for depth in (2, 3):
        t0 = time.perf_counter()
        outp = eng.run_pipelined(list(reqs), depth=depth)
        dt_p = time.perf_counter() - t0
        assert outp == out
        print(f"chunk={chunk:3d} depth={depth}  sync {n_tok/dt_sync:7.1f} "
              f"tok/s   pipelined {n_tok/dt_p:7.1f} tok/s", flush=True)
    del eng
