"""Measure the speculative-decoding round mechanics on the real chip.

No real weights exist in this environment, so ACCEPTANCE cannot be
measured here (zero-weight draft/target argmax agreement is meaningless).
What can be measured honestly is the machinery: the cost of one
draft-K+verify round vs one plain decode step, from which tokens/s follows
as a function of the per-token acceptance rate a:

    E[tokens/round] = (1 - a^K) / (1 - a)   (commit cap at K-1 + correction)
    spec_tps(a)     = E[tokens/round] / round_time
    breakeven a     : spec_tps(a) == 1 / plain_step_time

Timing per the relay rules: N rounds inside ONE compiled scan (the
decoder's rounds_fn already is that), delta between two N values.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_specdec.py
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from gill_tpu.config import OPTConfig
from gill_tpu.models import opt as opt_mod
from gill_tpu.serve.speculative import SpeculativeDecoder

import bench

bench._enable_compile_cache()

TARGET = os.environ.get("GILL_SPEC_TARGET", "facebook/opt-6.7b")
DRAFT = os.environ.get("GILL_SPEC_DRAFT", "facebook/opt-125m")
K = int(os.environ.get("GILL_SPEC_K", "8"))

tcfg = OPTConfig.from_name(TARGET)
dcfg = OPTConfig.from_name(DRAFT)
dcfg.vocab_size = tcfg.vocab_size


def w8_params(cfg):
    p = opt_mod.init_dummy(cfg, jnp.bfloat16)

    def q(leaf):
        L, i, o = leaf["w"].shape
        out = {"w8": jnp.zeros((L, i, o), jnp.int8),
               "ws": jnp.full((L, o), 1e-4, jnp.float32)}
        if "b" in leaf:
            out["b"] = leaf["b"]
        if cfg.hidden_size >= 4096:
            out["kern"] = ()
        return out

    layers = dict(p["layers"])
    layers["attn"] = {k: q(v) for k, v in layers["attn"].items()}
    layers["fc1"] = q(layers["fc1"])
    layers["fc2"] = q(layers["fc2"])
    p = dict(p)
    p["layers"] = layers
    return p


# build INSIDE jit: only the int8 outputs materialize — an eager build
# holds the full bf16 tree (13.4GB at 6.7b) before quantizing and OOMs
tparams = jax.jit(lambda: w8_params(tcfg))()
dparams = jax.jit(lambda: opt_mod.init_dummy(dcfg, jnp.bfloat16))()

PLEN = 64


def timed_rounds(n_rounds):
    dec = SpeculativeDecoder(tparams, tcfg, dparams, dcfg, k=K, max_seq=512,
                             prefill_buckets=(64,), rounds_per_call=n_rounds,
                             unroll_layers=True)
    prompt = [5] * PLEN
    toks = np.full((1, 64), 1, np.int32)
    toks[0, :PLEN] = prompt
    tc, dc, first = dec._prefill_fn(dec.tparams, dec.dparams,
                                    jnp.asarray(toks),
                                    jnp.asarray(PLEN, jnp.int32), plen=64)
    pos = jnp.asarray(PLEN, jnp.int32)
    last = jnp.asarray(int(first), jnp.int32)

    def call(tp, dp, tc, dc):
        out = dec._rounds_fn(tp, dp, tc, dc, pos, last)
        return out[5].sum()  # counts — forces the whole chain

    # _timed_scalar re-executes; donated caches would be invalidated, so
    # re-wrap with fresh copies via jax.block... simpler: no-donate timing
    # path: clone caches per sample is too slow; instead time without
    # donation by calling the underlying rounds through a fresh jit.
    import functools

    fn = dec._rounds_fn
    samples = []
    import time
    res = fn(tparams, dparams, tc, dc, pos, last)
    jax.block_until_ready(res[4])
    tc2, dc2 = res[0], res[1]
    for _ in range(3):
        t0 = time.perf_counter()
        res = fn(tparams, dparams, tc2, dc2, pos, last)
        jax.block_until_ready(res[4])
        samples.append(time.perf_counter() - t0)
        tc2, dc2 = res[0], res[1]
    return sorted(samples)[1]


t_small = timed_rounds(4)
t_big = timed_rounds(12)
round_ms = (t_big - t_small) / 8 * 1e3
print(f"spec round (K={K}, {TARGET.split('/')[-1]} W8 + "
      f"{DRAFT.split('/')[-1]} bf16 draft): {round_ms:.2f} ms")

# plain single-token decode step at batch 1, same methodology
def plain_steps(n):
    @jax.jit
    def run(params, cache, pos, tok):
        def step(carry, _):
            cache, pos, tok = carry
            emb = opt_mod.embed_tokens(params, tok[None, None])
            out = opt_mod.forward(params, tcfg, emb, cache=cache,
                                  cache_pos=pos, unroll_layers=True)
            nxt = jnp.argmax(out["logits"][0, -1]).astype(jnp.int32)
            return (out["cache"], pos + 1, nxt), None

        (cache, pos, tok), _ = jax.lax.scan(step, (cache, pos, tok), None,
                                            length=n)
        return tok + pos

    cache = opt_mod.init_cache(tcfg, 1, 512, dtype=jnp.bfloat16)
    pos = jnp.asarray(PLEN, jnp.int32)
    tok = jnp.asarray(7, jnp.int32)
    return bench._timed_scalar(run, tparams, cache, pos, tok)


s_small = plain_steps(32)
s_big = plain_steps(96)
step_ms = (s_big - s_small) / 64 * 1e3
print(f"plain decode step (batch 1): {step_ms:.2f} ms "
      f"({1000 / step_ms:.0f} tok/s)")

print("\nacceptance -> tokens/s (spec) vs plain:")
for a in (0.0, 0.3, 0.5, 0.6, 0.7, 0.8, 0.9):
    e = (1 - a ** K) / (1 - a) if a < 1 else K
    tps = e / (round_ms / 1e3)
    print(f"  a={a:.1f}: E[tok/round]={e:.2f} -> {tps:6.1f} tok/s "
          f"({tps * step_ms / 1000:.2f}x plain)")
lo, hi = 0.0, 1.0
for _ in range(40):
    mid = (lo + hi) / 2
    e = (1 - mid ** K) / (1 - mid) if mid < 1 else K
    if e / round_ms >= 1 / step_ms:
        hi = mid
    else:
        lo = mid
print(f"breakeven acceptance: a = {hi:.3f}")
