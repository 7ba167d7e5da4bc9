"""Measure prefix-caching value on a chat-shaped trace (real chip).

Workload: every request shares one SYSTEM-PROMPT prefix (e.g. the
reference demo's conversation context) plus a short per-user suffix —
the shape prefix caching exists for. Compares end-to-end run() time and
per-request prefill compute:

  plain : every prefill recomputes prefix+suffix at the full bucket
  prefix: register_prefix() once, then suffix-only prefills at a static
          offset (engine._prefix_prefill_fn)

The win scales with prefix_len/suffix_len and with how weight-bound the
prefill is (W8: one full LM weight stream per prefill launch either way,
so the saving is the prefix FLOPs + the larger bucket's pad tax).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_prefix.py
Env: GILL_PFX_MODEL (default facebook/opt-2.7b), GILL_PFX_LEN (192),
     GILL_PFX_SFX (32), GILL_PFX_NREQ (48), GILL_PFX_NEW (64)
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

MODEL = os.environ.get("GILL_PFX_MODEL", "facebook/opt-2.7b")
PFX = int(os.environ.get("GILL_PFX_LEN", "192"))
SFX = int(os.environ.get("GILL_PFX_SFX", "32"))
NREQ = int(os.environ.get("GILL_PFX_NREQ", "48"))
NEW = int(os.environ.get("GILL_PFX_NEW", "64"))
SLOTS = int(os.environ.get("GILL_PFX_SLOTS", "16"))

cfg = OPTConfig.from_name(MODEL)
params = jax.jit(lambda: opt_mod.quantize_params_w8(
    opt_mod.init_dummy(cfg, jnp.bfloat16)))()

rng = np.random.RandomState(0)
prefix = rng.randint(2, 1000, size=PFX).tolist()
suffixes = [rng.randint(2, 1000, size=SFX).tolist() for _ in range(NREQ)]
max_seq = 1
while max_seq < PFX + SFX + NEW:
    max_seq *= 2


def make_engine():
    return DecodeEngine(params, cfg, slots=SLOTS, max_seq=max_seq, chunk=32,
                        prefill_buckets=(32, 64, 128, 256, 512),
                        unroll_layers=True)


def run(use_prefix: bool):
    eng = make_engine()
    pid = eng.register_prefix(prefix) if use_prefix else None
    reqs = [ServeRequest(uid=i, prompt=prefix + sfx, max_new_tokens=NEW,
                         prefix_id=pid) for i, sfx in enumerate(suffixes)]
    eng.warmup()
    # compile the live prefill variants outside the timed run
    warm = [ServeRequest(uid=10 ** 6 + i, prompt=prefix + suffixes[0],
                         max_new_tokens=1, prefix_id=pid)
            for i in range(SLOTS)]
    eng.run(warm)
    t0 = time.perf_counter()
    out = eng.run(reqs)
    dt = time.perf_counter() - t0
    assert all(len(v) == NEW for v in out.values())
    return dt, eng.stats


print(f"model={MODEL} prefix={PFX} suffix={SFX} new={NEW} nreq={NREQ} "
      f"slots={SLOTS} max_seq={max_seq}")
dt_plain, st_plain = run(False)
dt_pfx, st_pfx = run(True)
tok = NREQ * NEW
print(f"plain : {dt_plain:.2f}s  {tok / dt_plain:8.1f} tok/s  "
      f"prefills={st_plain['prefills']}")
print(f"prefix: {dt_pfx:.2f}s  {tok / dt_pfx:8.1f} tok/s  "
      f"prefills={st_pfx['prefills']}  hits={st_pfx['prefix_hits']}  "
      f"saved={st_pfx['prefix_tokens_saved']} prefill tokens")
print(f"speedup: {dt_plain / dt_pfx:.3f}x")
