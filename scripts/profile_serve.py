"""Isolate the serving-engine cost components on the real chip.

Times (a) the decode chunk program alone, (b) one prefill per bucket,
(c) a pure host round-trip, so the engine's end-to-end rate can be
attributed to device compute vs link overhead vs the per-slot scatter.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_serve.py
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
CHUNK = int(os.environ.get("GILL_BENCH_CHUNK", "32"))

cfg = OPTConfig.from_name(MODEL)
params = opt_mod.init_dummy(cfg, jnp.bfloat16)


def q(leaf):
    L, i, o = leaf["w"].shape
    out = {"w8": jnp.zeros((L, i, o), jnp.int8),
           "ws": jnp.full((L, o), 1e-4, jnp.float32)}
    if "b" in leaf:
        out["b"] = leaf["b"]
    if cfg.hidden_size >= 4096:
        out["kern"] = ()
    return out


layers = dict(params["layers"])
layers["attn"] = {k: q(v) for k, v in layers["attn"].items()}
layers["fc1"] = q(layers["fc1"])
layers["fc2"] = q(layers["fc2"])
params = dict(params)
params["layers"] = layers

eng = DecodeEngine(params, cfg, slots=SLOTS, max_seq=512, chunk=CHUNK,
                   prefill_buckets=(64, 128, 256), unroll_layers=True)

# warm up every program
eng.run([ServeRequest(uid=0, prompt=[5] * p, max_new_tokens=4)
         for p in (20, 100, 200)])

# (a) chunk program alone, steady state
state = {"pos": jnp.asarray(np.full(SLOTS, 300, np.int32)),
         "tok": jnp.asarray(np.full(SLOTS, 7, np.int32)),
         "active": jnp.asarray(np.ones(SLOTS, bool)),
         "limit": jnp.asarray(np.full(SLOTS, 511, np.int32))}
cache = opt_mod.init_cache(cfg, SLOTS, 512, dtype=jnp.bfloat16)
c, state, toks = eng._chunk_fn(eng.params, cache, state, eng.max_seq)
jax.block_until_ready(toks)
N = 8
t0 = time.perf_counter()
for _ in range(N):
    c, state, toks = eng._chunk_fn(eng.params, c, state, eng.max_seq)
jax.block_until_ready(toks)
dt = (time.perf_counter() - t0) / N
print(f"chunk({CHUNK} steps, {SLOTS} slots): {dt*1e3:.1f} ms "
      f"-> {dt/CHUNK*1e3:.2f} ms/step, {SLOTS*CHUNK/dt:.0f} tok/s")

# (b) batched prefill per (bucket, wave size) — fire-and-forget like the
# scheduler (no sync; cost shows up when the next chunk is awaited)
for pb in (64, 128, 256):
    for nreq in (1, 4, SLOTS):
        toks_in = jnp.asarray(np.full((nreq, pb), 5, np.int32))
        lens = jnp.asarray(np.full((nreq,), pb, np.int32))
        sids = jnp.asarray(np.arange(nreq, dtype=np.int32))
        lims = jnp.asarray(np.full((nreq,), 511, np.int32))
        c, state, first = eng._prefill_fn(eng.params, c, state, toks_in,
                                          lens, sids, lims, plen=pb,
                                          nreq=nreq)
        jax.block_until_ready(first)
        t0 = time.perf_counter()
        M = 8
        for _ in range(M):
            c, state, first = eng._prefill_fn(eng.params, c, state, toks_in,
                                              lens, sids, lims, plen=pb,
                                              nreq=nreq)
            jax.block_until_ready(first)
        dt = (time.perf_counter() - t0) / M
        print(f"prefill bucket {pb} x{nreq:2d} reqs: {dt*1e3:.1f} ms "
              f"({dt/nreq*1e3:.1f} ms/req)")

# (c) bare link round-trip
x = jnp.zeros((), jnp.float32)
f = jax.jit(lambda v: v + 1)
_ = float(f(x))
t0 = time.perf_counter()
M = 20
for _ in range(M):
    _ = float(f(x))
dt = (time.perf_counter() - t0) / M
print(f"bare dispatch+sync round-trip: {dt*1e3:.2f} ms")
