"""Valid-prefix Pallas decode attention vs the XLA decode path.

The kernel (ops/decode_attn.py) must reproduce `_decode_attention`'s
joint-softmax-with-own-token semantics exactly: per-row valid prefix
(vector kv_offset), deferred own-token k/v, any mix of lengths including
0 (parked serving slot: own token only) and full buckets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gill_tpu.ops.attention import _decode_attention
from gill_tpu.ops import decode_attn


def _ref(q, k, v, lens, k1, v1, scale):
    # _decode_attention semantics: valid keys are pos <= kv_offset, i.e.
    # kv_offset = lens - 1 (lens == 0 -> all cache masked, own token only).
    return _decode_attention(q, k, v, scale=scale,
                             kv_offset=lens - 1, extra_kv=(k1, v1))


@pytest.mark.parametrize("b,s,h,d", [
    (3, 256, 4, 64),      # hd=256
    (2, 512, 8, 80),      # hd=640 (opt-2.7b head shape)
    (2, 128, 2, 128),     # hd=256 (opt-6.7b head shape)
])
def test_matches_xla_decode(b, s, h, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, 1, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k1 = jnp.asarray(rng.randn(b, 1, h, d).astype(np.float32))
    v1 = jnp.asarray(rng.randn(b, 1, h, d).astype(np.float32))
    # lengths: parked slot (0), mid, full bucket
    lens_np = np.array([0, s // 3, s], np.int32)[:b]
    lens = jnp.asarray(lens_np)
    scale = 1.0 / np.sqrt(d)

    want = _ref(q, k, v, lens, k1, v1, scale)
    got = decode_attn.prefix_decode_attention(
        q, k, v, lens, k1, v1, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_matches_xla_decode_bf16():
    rng = np.random.RandomState(1)
    b, s, h, d = 4, 256, 4, 64
    q = jnp.asarray(rng.randn(b, 1, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
    k1 = jnp.asarray(rng.randn(b, 1, h, d), jnp.bfloat16)
    v1 = jnp.asarray(rng.randn(b, 1, h, d), jnp.bfloat16)
    lens = jnp.asarray([1, 17, 255, 256], jnp.int32)
    scale = 1.0 / np.sqrt(d)

    want = _ref(q, k, v, lens, k1, v1, scale).astype(jnp.float32)
    got = decode_attn.prefix_decode_attention(
        q, k, v, lens, k1, v1, scale=scale,
        interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1.5e-2, rtol=1.5e-2)


def test_parked_slot_returns_own_value():
    """length 0 = pure own-token attention: softmax over one logit -> v1."""
    rng = np.random.RandomState(2)
    b, s, h, d = 2, 128, 2, 64
    q = jnp.asarray(rng.randn(b, 1, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k1 = jnp.asarray(rng.randn(b, 1, h, d).astype(np.float32))
    v1 = jnp.asarray(rng.randn(b, 1, h, d).astype(np.float32))
    lens = jnp.zeros((b,), jnp.int32)
    got = decode_attn.prefix_decode_attention(
        q, k, v, lens, k1, v1, scale=0.125, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(v1),
                               atol=1e-5, rtol=1e-5)


def test_dispatch_gate(monkeypatch):
    """The dispatcher takes the kernel only for supported shapes AND long
    buckets (S >= PREFIX_DECODE_MIN): the shape predicate alone admits
    configs where the kernel is a measured regression (short67_b64 in
    PREFIX_DECODE_PROBE.json). The default MIN is 0 (disabled — the
    kernel is an end-to-end regression inside the weight-bound decode
    step, see ops/attention.py); the gate is tested at MIN=512."""
    from gill_tpu.ops import attention as attn_mod
    monkeypatch.setattr(attn_mod, "PREFIX_DECODE_MIN", 512)
    lens = jnp.full((2,), 7, jnp.int32)
    kv1 = (jnp.zeros((2, 1, 4, 128), jnp.bfloat16),) * 2

    def mk(s, d):
        return (jnp.zeros((2, 1, 4, d), jnp.bfloat16),
                jnp.zeros((2, s, 4, d), jnp.bfloat16))

    q, k = mk(512, 128)
    assert attn_mod.prefix_decode_eligible(q, k, lens - 1, kv1, None)
    # short bucket: measured regression -> XLA path
    q, k = mk(128, 128)
    assert not attn_mod.prefix_decode_eligible(q, k, lens - 1, kv1, None)
    # unsupported head dim
    q, k = mk(512, 64)
    assert not attn_mod.prefix_decode_eligible(q, k, lens - 1, kv1, None)
    # no offset vector / no deferred own-token kv -> XLA path
    q, k = mk(512, 128)
    assert not attn_mod.prefix_decode_eligible(q, k, None, kv1, None)
    assert not attn_mod.prefix_decode_eligible(q, k, lens - 1, None, None)
    # int8 KV out of scope
    assert not attn_mod.prefix_decode_eligible(q, k, lens - 1, kv1,
                                               ("s", "s"))


def test_supported_predicate():
    # d % 128 == 0 is the kernel's scope (the DMA copies row-blocks in the
    # cache's native (block, H, D) layout; unaligned D would relayout-copy
    # the whole cache on entry — decode_attn.py:_kernel docstring).
    q = jnp.zeros((2, 1, 4, 128), jnp.bfloat16)
    k = jnp.zeros((2, 512, 4, 128), jnp.bfloat16)
    lens = jnp.zeros((2,), jnp.int32)
    assert decode_attn.supported(q, k, lens, None)
    assert not decode_attn.supported(q, k, lens, ("s", "s"))   # int8 KV
    assert not decode_attn.supported(q, k, None, None)
    k8 = jnp.zeros((2, 512, 4, 128), jnp.int8)
    assert not decode_attn.supported(q, k8, lens, None)
    # d = 64 and d = 40 are both out of scope (d % 128 != 0)
    q64 = jnp.zeros((2, 1, 4, 64), jnp.bfloat16)
    k64 = jnp.zeros((2, 512, 4, 64), jnp.bfloat16)
    assert not decode_attn.supported(q64, k64, lens, None)
    q2 = jnp.zeros((2, 1, 3, 40), jnp.bfloat16)
    k2 = jnp.zeros((2, 512, 3, 40), jnp.bfloat16)
    assert not decode_attn.supported(q2, k2, lens, None)
    # bucket not divisible by any block
    k3 = jnp.zeros((2, 96, 4, 128), jnp.bfloat16)
    assert not decode_attn.supported(q, k3, lens, None)


def test_decode_step_logits_through_kernel(monkeypatch):
    """Dispatch plumbing from the serving engines: a (B,) cache_pos vector
    flows through models/opt.py's deferred-write decode as kv_offset, the
    dispatcher turns it into the kernel's per-row lengths, and the decode
    step's logits match the XLA full-read path. One step with tolerance —
    greedy TOKEN equality across the two fp32 reduction orders is the TPU
    probe's job (scripts/profile_serve_prefix_decode.py: 24/24 requests
    identical on chip); exact-token CPU comparison is tie-flaky."""
    from gill_tpu.config import OPTConfig
    from gill_tpu.models import opt as opt_mod
    from gill_tpu.ops import attention as attn_mod

    cfg = OPTConfig(num_layers=2, hidden_size=256, ffn_dim=512, num_heads=2,
                    vocab_size=128, max_positions=256,
                    word_embed_proj_dim=256)
    params = opt_mod.init(jax.random.PRNGKey(5), cfg)
    b, s = 3, 64
    cache = opt_mod.init_cache(cfg, b, s, dtype=jnp.float32)
    rng = np.random.RandomState(4)
    # engine state mid-decode: mixed per-slot offsets incl. a parked slot
    cache = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.1),
        cache)
    pos = jnp.asarray([13, 0, s - 1], jnp.int32)
    emb = opt_mod.embed_tokens(params, jnp.asarray([[7], [9], [11]],
                                                   jnp.int32))

    def step():
        out = opt_mod.forward(params, cfg, emb, cache=cache, cache_pos=pos)
        return np.asarray(out["logits"][:, -1])

    base = step()

    calls = {"n": 0}
    real = decode_attn.prefix_decode_attention

    def interp(*args, **kw):
        calls["n"] += 1
        kw["interpret"] = True
        return real(*args, **kw)

    monkeypatch.setattr(attn_mod, "PREFIX_DECODE_MIN", 64)
    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(decode_attn, "prefix_decode_attention", interp)
    gated = step()

    # the layer scan traces attention ONCE for all stacked layers
    assert calls["n"] >= 1, "kernel path not taken"
    np.testing.assert_allclose(gated, base, atol=1e-4, rtol=1e-4)
