import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.ops.attention import _xla_attention, dot_product_attention, flash_attention


def _ref(q, k, v, causal):
    b, t, h, d = q.shape
    s = k.shape[1]
    logits = np.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d)
    if causal:
        qi = np.arange(t)[:, None]
        kj = np.arange(s)[None, :]
        logits = np.where(kj <= qi + (s - t), logits, -1e30)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    return np.einsum("bhts,bshd->bthd", np.asarray(probs), v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t,s", [(16, 16), (8, 24)])
def test_xla_attention_matches_ref(causal, t, s):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, t, 4, 32))
    k = jax.random.normal(kk, (2, s, 4, 32))
    v = jax.random.normal(kv, (2, s, 4, 32))
    out = dot_product_attention(q, k, v, causal=causal, impl="xla")
    ref = _ref(np.asarray(q), np.asarray(k), np.asarray(v), causal)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t,d", [(128, 64), (256, 128), (96, 40)])
def test_flash_matches_xla_interpret(causal, t, d):
    """Pallas kernel in interpret mode (CPU) vs the XLA path."""
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, t, 2, d))
    k = jax.random.normal(kk, (1, t, 2, d))
    v = jax.random.normal(kv, (1, t, 2, d))
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, causal=causal, block_q=64, block_k=64)
    ref = dot_product_attention(q, k, v, causal=causal, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("fast", [False, True])
@pytest.mark.parametrize("s", [77, 130])
def test_flash_padded_kv_interpret(fast, s):
    """KV lengths that aren't block multiples (e.g. SD's 77-token
    cross-attention) are padded and masked inside the kernel."""
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 64, 2, 40))
    k = jax.random.normal(kk, (2, s, 2, 40))
    v = jax.random.normal(kv, (2, s, 2, 40))
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, causal=False, block_q=64, block_k=128,
                              fast=fast)
    ref = dot_product_attention(q, k, v, causal=False, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_fast_softmax_matches_exact(causal):
    """fast (clamp-shift, no running max) == exact softmax for bounded
    logits — the SD UNet regime."""
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 128, 2, 64))
    k = jax.random.normal(kk, (1, 128, 2, 64))
    v = jax.random.normal(kv, (1, 128, 2, 64))
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, causal=causal, block_q=64, block_k=64,
                              fast=True)
    ref = dot_product_attention(q, k, v, causal=causal, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("fast", [False, True])
def test_flash_bthd_matches_xla_interpret(fast):
    """Native-layout kernel (padded head dim, no transposes) vs XLA."""
    from gill_tpu.ops.attention import flash_attention_bthd

    key = jax.random.PRNGKey(4)
    kq, kk, kv = jax.random.split(key, 3)
    d = 40
    q = jax.random.normal(kq, (2, 128, 3, d))
    k = jax.random.normal(kk, (2, 96, 3, d))
    v = jax.random.normal(kv, (2, 96, 3, d))
    pad = [(0, 0), (0, 0), (0, 0), (0, 128 - d)]
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_bthd(
            jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
            causal=False, scale=1.0 / np.sqrt(d), block_q=64, block_k=128,
            fast=fast)
    ref = dot_product_attention(q, k, v, causal=False, impl="xla")
    np.testing.assert_allclose(np.asarray(out[..., :d]), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_bthd_int8_qk_close_to_xla():
    """Int8-QK kernel (in-VMEM dynamic quantization) vs exact attention."""
    from gill_tpu.ops.attention import flash_attention_bthd

    key = jax.random.PRNGKey(5)
    kq, kk, kv = jax.random.split(key, 3)
    d = 40
    q = jax.random.normal(kq, (2, 128, 2, d))
    k = jax.random.normal(kk, (2, 128, 2, d))
    v = jax.random.normal(kv, (2, 128, 2, d))
    pad = [(0, 0), (0, 0), (0, 0), (0, 128 - d)]
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_bthd(
            jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
            causal=False, scale=1.0 / np.sqrt(d), block_q=64, block_k=128,
            q8=True)
    ref = dot_product_attention(q, k, v, causal=False, impl="xla")
    # int8 q/k quantization error bound: scores err ~1e-2 -> post-softmax
    # output err well under bf16 resolution
    err = float(jnp.max(jnp.abs(out[..., :d] - ref)))
    assert err < 0.02, err


@pytest.mark.parametrize("kv_offset", [None, 5, 23])
def test_decode_attention_matches_xla(kv_offset):
    """Single-token mul+reduce decode path == the einsum formulation."""
    key = jax.random.PRNGKey(6)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (3, 1, 4, 32))
    k = jax.random.normal(kk, (3, 24, 4, 32))
    v = jax.random.normal(kv, (3, 24, 4, 32))
    out = dot_product_attention(q, k, v, causal=True, kv_offset=kv_offset)
    ref = dot_product_attention(q, k, v, causal=True, kv_offset=kv_offset,
                                impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("with_extra", [False, True])
@pytest.mark.parametrize("with_scales", [False, True])
def test_chunked_decode_attention_matches_plain(with_extra, with_scales):
    """Valid-prefix chunked decode attention == the single-pass version
    (long caches read only the chunks holding valid keys)."""
    from gill_tpu.ops.attention import (_decode_attention,
                                        _decode_attention_chunked)

    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    b, s, h, d = 2, 768, 2, 16
    q = jax.random.normal(kq, (b, 1, h, d))
    k = jax.random.normal(kk, (b, s, h, d))
    v = jax.random.normal(kv, (b, s, h, d))
    extra = None
    if with_extra:
        ek = jax.random.normal(jax.random.PRNGKey(8), (b, 1, h, d))
        ev = jax.random.normal(jax.random.PRNGKey(9), (b, 1, h, d))
        extra = (ek, ev)
    scales = None
    if with_scales:
        ks = jnp.abs(jax.random.normal(jax.random.PRNGKey(10), (b, s, h))) + 0.5
        vs = jnp.abs(jax.random.normal(jax.random.PRNGKey(11), (b, s, h))) + 0.5
        scales = (ks, vs)
    for off in (3, 300, 767):
        kv_offset = jnp.asarray(off)
        ref = _decode_attention(q, k, v, scale=0.25, kv_offset=kv_offset,
                                extra_kv=extra, kv_scales=scales)
        out = _decode_attention_chunked(q, k, v, scale=0.25,
                                        kv_offset=kv_offset, extra_kv=extra,
                                        kv_scales=scales)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)
