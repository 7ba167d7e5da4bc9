"""Attribute GILL-serving-engine cost on the real chip: chunk program vs
prefill wave vs host transfers, compared with the plain-LM engine chunk.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_gill_serve.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gill_tpu.config import CLIPVisionConfig, GILLConfig, OPTConfig
from gill_tpu.models import opt as opt_mod
from gill_tpu.models.gill import GILLCore
from gill_tpu.serve.engine import DecodeEngine, ServeRequest
from gill_tpu.serve.gill_engine import GillDecodeEngine, GillServeRequest

import bench

bench._enable_compile_cache()

MODEL = os.environ.get("GILL_BENCH_MODEL", "facebook/opt-2.7b")
SLOTS = int(os.environ.get("GILL_BENCH_SLOTS", "16"))
CHUNK = int(os.environ.get("GILL_BENCH_CHUNK", "32"))

opt_cfg = OPTConfig.from_name(MODEL)
nt = 8
cfg = GILLConfig(opt_version=MODEL, num_tokens=nt)
vis_cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_layers=2, num_heads=2, image_size=32,
                           patch_size=16)
core = GILLCore(cfg=cfg, opt_cfg=opt_cfg, vis_cfg=vis_cfg,
                vocab_len=opt_cfg.vocab_size + nt + 1,
                img_start=opt_cfg.vocab_size + 1,
                pad_token_id=1, bos_token_id=2)


def make_params():
    lm = opt_mod.init_dummy(opt_cfg, jnp.bfloat16)
    lm = opt_mod.resize_embeddings(lm, core.vocab_len)
    lm = opt_mod.quantize_params_w8(lm)
    img = jnp.zeros((nt, opt_cfg.word_embed_proj_dim), jnp.bfloat16)
    return {"lm": lm, "adapters": {"img_embeddings": img}}


params = jax.jit(make_params)()
E = opt_cfg.word_embed_proj_dim

eng = GillDecodeEngine(core, params, slots=SLOTS, max_seq=512, chunk=CHUNK,
                       prefill_buckets=(64, 128, 256))
eng.run([GillServeRequest(uid=j, embs=np.zeros((p, E), np.float32),
                          num_words=4)
         for j, p in enumerate((20, 100, 200))])

# (a) chunk program steady state
eng._dstate, eng._dtap = eng._fresh_state()
st = eng._dstate
st = dict(st)
st["pos"] = jnp.full((SLOTS,), 300, jnp.int32)
st["tok"] = jnp.full((SLOTS,), 7, jnp.int32)
st["valid"] = jnp.ones((SLOTS,), bool)
st["nw"] = jnp.full((SLOTS,), 10_000, jnp.int32)
eng._dstate = st
for _ in range(2):
    out = eng._chunk_fn(eng.params, eng.cache, eng._dstate, eng._dtap,
                        eng.max_seq)
    eng.cache, eng._dstate, eng._dtap = out[0], out[1], out[2]
    jax.block_until_ready(out[3])
t0 = time.perf_counter()
N = 5
for _ in range(N):
    out = eng._chunk_fn(eng.params, eng.cache, eng._dstate, eng._dtap,
                        eng.max_seq)
    eng.cache, eng._dstate, eng._dtap = out[0], out[1], out[2]
jax.block_until_ready(out[3])
dt = (time.perf_counter() - t0) / N
print(f"gill chunk ({CHUNK} steps): {dt*1e3:.1f} ms -> "
      f"{SLOTS*CHUNK/dt:.0f} tok/s ceiling", flush=True)

# (b) prefill wave cost (bucket 256, 16 reqs)
embs = np.zeros((16, 256, E), np.float32)
t0 = time.perf_counter()
for _ in range(3):
    eng.cache, eng._dstate, eng._dtap = eng._prefill_fn(
        eng.params, eng.cache, eng._dstate, eng._dtap,
        jnp.asarray(embs, jnp.bfloat16), jnp.ones((16,), jnp.int32),
        jnp.full((16,), eng.slots, jnp.int32), jnp.ones((16,), jnp.int32),
        jnp.zeros((16,), jnp.int32), jnp.ones((16,), jnp.float32),
        jnp.zeros((16,), jnp.float32), jnp.ones((16,), jnp.float32),
        jnp.zeros((16,), jnp.int32), 256, 16)
    jax.block_until_ready(eng._dstate["pos"])
dt = (time.perf_counter() - t0) / 3
print(f"gill prefill wave (16x256): {dt*1e3:.1f} ms", flush=True)

# host->device transfer share of the wave
t0 = time.perf_counter()
for _ in range(3):
    x = jax.device_put(jnp.asarray(embs, jnp.bfloat16))
    jax.block_until_ready(x)
dt = (time.perf_counter() - t0) / 3
print(f"  embs host->device (21 MB): {dt*1e3:.1f} ms", flush=True)

# (c) plain-LM engine chunk at the same shape, for contrast
del eng
peng = DecodeEngine(params["lm"], opt_cfg, slots=SLOTS, max_seq=512,
                    chunk=CHUNK, prefill_buckets=(64, 128, 256),
                    unroll_layers=True)
peng.run([ServeRequest(uid=0, prompt=[5] * 20, max_new_tokens=4)])
peng._dstate = {"pos": jnp.full((SLOTS,), 300, jnp.int32),
                "tok": jnp.full((SLOTS,), 7, jnp.int32),
                "active": jnp.ones((SLOTS,), bool),
                "limit": jnp.full((SLOTS,), 511, jnp.int32)}
for _ in range(2):
    peng.cache, peng._dstate, toks = peng._chunk_fn(
        peng.params, peng.cache, peng._dstate, peng.max_seq)
    jax.block_until_ready(toks)
t0 = time.perf_counter()
for _ in range(N):
    peng.cache, peng._dstate, toks = peng._chunk_fn(
        peng.params, peng.cache, peng._dstate, peng.max_seq)
jax.block_until_ready(toks)
dt = (time.perf_counter() - t0) / N
print(f"plain chunk ({CHUNK} steps): {dt*1e3:.1f} ms -> "
      f"{SLOTS*CHUNK/dt:.0f} tok/s ceiling", flush=True)
