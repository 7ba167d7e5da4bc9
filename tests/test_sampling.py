"""Sampling ops (ops/sampling.py): the exact top-k prefilter must be
indistinguishable from the full-vocab sort — same filtered support, same
drawn tokens — including when the fallback fires."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.ops.sampling import sample_per_row, top_p_filter


def _keys(n, seed=0):
    return jax.vmap(jax.random.PRNGKey)(jnp.arange(seed, seed + n))


def test_prefilter_matches_full_sort_peaked():
    """Peaked distributions (the decoding-typical case): nuclei fit inside
    the top-k, fast path fires, tokens identical to the full sort."""
    rng = np.random.RandomState(0)
    B, V = 8, 4096
    logits = jnp.asarray(rng.randn(B, V).astype(np.float32) * 4.0)
    temp = jnp.asarray(rng.uniform(0.5, 1.5, B).astype(np.float32))
    topp = jnp.asarray(rng.uniform(0.7, 0.95, B).astype(np.float32))
    keys = _keys(B)
    full = sample_per_row(keys, logits, temp, topp, prefilter_k=0)
    fast = sample_per_row(keys, logits, temp, topp, prefilter_k=256)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(fast))


def test_prefilter_fallback_flat_distribution():
    """Near-uniform logits at high temperature: the nucleus exceeds the
    top-k window, so the lax.cond fallback must fire and still reproduce
    the full sort exactly."""
    rng = np.random.RandomState(1)
    B, V = 4, 2048
    logits = jnp.asarray(rng.randn(B, V).astype(np.float32) * 0.01)
    temp = jnp.full((B,), 10.0, jnp.float32)
    topp = jnp.full((B,), 0.99, jnp.float32)
    keys = _keys(B, seed=7)
    full = sample_per_row(keys, logits, temp, topp, prefilter_k=0)
    fast = sample_per_row(keys, logits, temp, topp, prefilter_k=64)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(fast))

    # sanity: the nucleus really is bigger than the prefilter window
    filt = top_p_filter(logits / temp[:, None], topp[:, None])
    assert int(jnp.isfinite(filt).sum(axis=-1).min()) > 64


def test_prefilter_threshold_support_identical():
    """Beyond token equality: the kept SUPPORT itself matches (the
    prefilter computes the same shifted-mask threshold from the top-k
    prefix as the full sort does from the whole vocab)."""
    rng = np.random.RandomState(2)
    B, V, K = 6, 1024, 128
    scaled = jnp.asarray(rng.randn(B, V).astype(np.float32) * 3.0)
    topp = jnp.asarray(rng.uniform(0.5, 0.95, B).astype(np.float32))[:, None]
    ref = jnp.isfinite(top_p_filter(scaled, topp))

    log_z = jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)
    vals, _ = jax.lax.top_k(scaled, K)
    probs = jnp.exp(vals - log_z)
    cum = jnp.cumsum(probs, axis=-1)
    assert bool(jnp.all(cum[:, -1:] >= topp))    # nuclei fit in top-K
    keep = (cum - probs) <= topp
    kth = jnp.maximum(keep.sum(axis=-1) - 1, 0)
    thresh = jnp.take_along_axis(vals, kth[..., None], axis=-1)
    fast = scaled >= thresh
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fast))


def test_greedy_rows_ignore_sampling_params():
    rng = np.random.RandomState(3)
    B, V = 4, 512
    logits = jnp.asarray(rng.randn(B, V).astype(np.float32))
    temp = jnp.asarray([0.0, 1.0, 0.0, 2.0], jnp.float32)
    topp = jnp.asarray([1.0, 0.9, 1.0, 0.8], jnp.float32)
    out = np.asarray(sample_per_row(_keys(B), logits, temp, topp,
                                    prefilter_k=64))
    greedy = np.asarray(jnp.argmax(logits, axis=-1))
    assert out[0] == greedy[0] and out[2] == greedy[2]
