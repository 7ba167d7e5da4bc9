"""Speculative decoding (gill_tpu/serve/speculative.py).

The invariant: output tokens are EXACTLY the target model's greedy decode,
for any draft — agreeing (draft == target, max acceptance), disagreeing
(independent random draft, near-zero acceptance), or degenerate. The draft
may only change wall-clock, never content.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.config import OPTConfig
from gill_tpu.models import opt as opt_mod
from gill_tpu.serve.speculative import SpeculativeDecoder


def _cfg(seed_dims=64):
    return OPTConfig(num_layers=2, hidden_size=seed_dims, ffn_dim=128,
                     num_heads=4, vocab_size=128, max_positions=512,
                     word_embed_proj_dim=seed_dims)


@pytest.fixture(scope="module")
def target():
    cfg = _cfg()
    return opt_mod.init(jax.random.PRNGKey(21), cfg), cfg


def _target_greedy(params, cfg, prompt, n_new):
    cache = opt_mod.init_cache(cfg, 1, 256, dtype=jnp.float32)
    emb = opt_mod.embed_tokens(params, jnp.asarray([prompt], jnp.int32))
    out = opt_mod.forward(params, cfg, emb, cache=cache, cache_pos=0)
    tok = int(jnp.argmax(out["logits"][0, len(prompt) - 1]))
    cache = out["cache"]
    gen, pos = [tok], len(prompt)
    for _ in range(n_new - 1):
        emb = opt_mod.embed_tokens(params, jnp.asarray([[tok]], jnp.int32))
        out = opt_mod.forward(params, cfg, emb, cache=cache,
                              cache_pos=jnp.asarray(pos))
        cache = out["cache"]
        tok = int(jnp.argmax(out["logits"][0, -1]))
        gen.append(tok)
        pos += 1
    return gen


def _run(target, dparams, dcfg, k=4, rounds=3, n_new=17, seed=5):
    tparams, tcfg = target
    rng = np.random.RandomState(seed)
    prompt = rng.randint(2, 120, size=9).tolist()
    ref = _target_greedy(tparams, tcfg, prompt, n_new)
    dec = SpeculativeDecoder(tparams, tcfg, dparams, dcfg, k=k, max_seq=256,
                             prefill_buckets=(16,), rounds_per_call=rounds,
                             unroll_layers=False, kv_dtype=jnp.float32)
    out = dec.generate(prompt, n_new)
    assert out == ref, (out, ref)
    return dec


def test_agreeing_draft_exact(target):
    """Draft == target: maximum acceptance exercises the commit-k-1 cap."""
    tparams, tcfg = target
    _run(target, tparams, tcfg)


def test_disagreeing_draft_exact(target):
    """Independent random draft: rejections dominate; output unchanged."""
    dcfg = _cfg(32)
    dparams = opt_mod.init(jax.random.PRNGKey(99), dcfg)
    _run(target, dparams, dcfg)


def test_various_k_and_lengths(target):
    tparams, tcfg = target
    dcfg = _cfg(32)
    dparams = opt_mod.init(jax.random.PRNGKey(3), dcfg)
    for k, rounds, n_new, seed in ((2, 2, 5, 0), (6, 4, 23, 1),
                                   (3, 1, 1, 2)):
        _run(target, dparams, dcfg, k=k, rounds=rounds, n_new=n_new,
             seed=seed)
    # draft == target at the same sweep
    for k, rounds, n_new, seed in ((2, 2, 5, 0), (6, 4, 23, 1)):
        _run(target, tparams, tcfg, k=k, rounds=rounds, n_new=n_new,
             seed=seed)


def test_eos_truncates(target):
    tparams, tcfg = target
    rng = np.random.RandomState(7)
    prompt = rng.randint(2, 120, size=6).tolist()
    free = _target_greedy(tparams, tcfg, prompt, 12)
    eos = free[5]
    dec = SpeculativeDecoder(tparams, tcfg, tparams, tcfg, k=4, max_seq=256,
                             prefill_buckets=(8,), rounds_per_call=2,
                             unroll_layers=False, kv_dtype=jnp.float32,
                             eos_id=eos)
    out = dec.generate(prompt, 12)
    assert out == free[:free.index(eos) + 1]


def test_unrolled_layers_matches(target):
    """unroll_layers=True is the TPU serving DEFAULT — pin it to the same
    tokens as the scan path (previously only unroll=False was tested)."""
    tparams, tcfg = target
    rng = np.random.RandomState(9)
    prompt = rng.randint(2, 120, size=9).tolist()
    ref = _target_greedy(tparams, tcfg, prompt, 13)
    dec = SpeculativeDecoder(tparams, tcfg, tparams, tcfg, k=4, max_seq=256,
                             prefill_buckets=(16,), rounds_per_call=3,
                             unroll_layers=True, kv_dtype=jnp.float32)
    assert dec.generate(prompt, 13) == ref


def test_prompt_longer_than_configured_buckets(target):
    """Buckets extend to max_seq: a prompt between the largest configured
    bucket and max_seq must decode, not crash on bucket lookup."""
    tparams, tcfg = target
    rng = np.random.RandomState(10)
    prompt = rng.randint(2, 120, size=40).tolist()     # > bucket 16
    ref = _target_greedy(tparams, tcfg, prompt, 6)
    dec = SpeculativeDecoder(tparams, tcfg, tparams, tcfg, k=4, max_seq=64,
                             prefill_buckets=(16,), rounds_per_call=3,
                             unroll_layers=False, kv_dtype=jnp.float32)
    assert dec.buckets[-1] == 64
    assert dec.generate(prompt, 6) == ref
