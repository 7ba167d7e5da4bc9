"""A/B the per-slot KV write inside the decode chunk (delta-scan timing).

Hypothesis: the vector-cache_pos scatter (opt.forward assemble) makes XLA
copy the whole KV cache every step (2.7GB at 2.7b/16x512). Methodology per
the relay timing rules: K decode steps inside ONE compiled scan returning a
data-dependent scalar, timed at K and 2K, delta = K steps of pure device
time (removes dispatch/relay constants).
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_scatter_probe.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gill_tpu.config import OPTConfig
from gill_tpu.models import opt as opt_mod

import bench

bench._enable_compile_cache()

cfg = OPTConfig.from_name("facebook/opt-2.7b")
SLOTS, SEQ = 16, 512

params = opt_mod.init_dummy(cfg, jnp.bfloat16)


def q(leaf):
    L, i, o = leaf["w"].shape
    out = {"w8": jnp.zeros((L, i, o), jnp.int8),
           "ws": jnp.full((L, o), 1e-4, jnp.float32)}
    if "b" in leaf:
        out["b"] = leaf["b"]
    return out


layers = dict(params["layers"])
layers["attn"] = {k: q(v) for k, v in layers["attn"].items()}
layers["fc1"] = q(layers["fc1"])
layers["fc2"] = q(layers["fc2"])
params = dict(params)
params["layers"] = layers


def make_runner(pos_kind, steps):
    @functools.partial(jax.jit, static_argnames=())
    def run(params, cache, pos, tok):
        def step(carry, _):
            cache, pos, tok = carry
            emb = opt_mod.embed_tokens(params, tok[:, None])
            cp = pos if pos_kind != "scalar" else pos[0]
            out = opt_mod.forward(params, cfg, emb, cache=cache,
                                  cache_pos=cp, unroll_layers=True)
            nxt = jnp.argmax(out["logits"][:, -1], axis=-1).astype(jnp.int32)
            # keep positions bounded and the carry data-dependent
            pos = jnp.where(pos >= SEQ - 2, 256, pos + 1)
            return (out["cache"], pos, nxt), None

        (cache, pos, tok), _ = jax.lax.scan(
            step, (cache, pos, tok), None, length=steps)
        return tok.sum() + pos.sum()

    return run


for kind in ("scalar", "scatter"):
    cache = opt_mod.init_cache(cfg, SLOTS, SEQ, dtype=jnp.bfloat16)
    pos = jnp.asarray(np.full(SLOTS, 300, np.int32))
    tok = jnp.asarray(np.full(SLOTS, 7, np.int32))
    t1 = bench._timed_scalar(make_runner(kind, 32), params, cache, pos, tok)
    t2 = bench._timed_scalar(make_runner(kind, 96), params, cache, pos, tok)
    ms = (t2 - t1) / 64 * 1e3
    print(f"{kind}: {ms:.2f} ms/step ({SLOTS/ms*1000:.0f} tok/s)")
