"""Fused LayerNorm+matmul kernel and LN-folded GEGLU vs composed XLA ops
(interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gill_tpu.nn import core as nn
from gill_tpu.ops.geglu import geglu_ff
from gill_tpu.ops.ln_matmul import ln_matmul, ln_matmul_stacked


@pytest.mark.parametrize("m,d,n,block_m,block_n",
                         [(64, 32, 96, 32, 96), (96, 64, 256, 32, 128),
                          (130, 32, 64, 64, 64)])
def test_ln_matmul_matches_composition(m, d, n, block_m, block_n):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (2, m // 2, d)) * 2.0 + 0.3
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (d,))
    beta = 0.1 * jax.random.normal(ks[2], (d,))
    w = jax.random.normal(ks[3], (d, n)) * 0.05

    with pltpu.force_tpu_interpret_mode():
        out = ln_matmul(x, gamma, beta, w, block_m=block_m, block_n=block_n)

    ref = nn.layer_norm({"scale": gamma, "bias": beta}, x, 1e-5) @ w
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_geglu_ff_with_folded_ln_matches_composition():
    m, d = 64, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 7)
    x = jax.random.normal(ks[0], (2, m // 2, d)) * 1.5 - 0.2
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (d,))
    beta = 0.1 * jax.random.normal(ks[2], (d,))
    w1 = jax.random.normal(ks[3], (d, 8 * d)) * 0.05
    b1 = jax.random.normal(ks[4], (8 * d,)) * 0.05
    w2 = jax.random.normal(ks[5], (4 * d, d)) * 0.05
    b2 = jax.random.normal(ks[6], (d,)) * 0.05

    with pltpu.force_tpu_interpret_mode():
        out = geglu_ff(x, w1, b1, w2, b2, ln_gamma=gamma, ln_beta=beta,
                       block_m=32, block_n=64)

    xn = nn.layer_norm({"scale": gamma, "bias": beta}, x, 1e-5)
    h = xn @ w1 + b1
    val, gate = jnp.split(h, 2, axis=-1)
    ref = (val * jax.nn.gelu(gate, approximate=False)) @ w2 + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=2e-3)


def test_geglu_ff_ln_none_unchanged():
    """ln_gamma=None must be byte-identical to the pre-existing kernel."""
    m, d = 32, 32
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    x = jax.random.normal(ks[0], (m, d))
    w1 = jax.random.normal(ks[1], (d, 8 * d)) * 0.05
    b1 = jnp.zeros((8 * d,))
    w2 = jax.random.normal(ks[2], (4 * d, d)) * 0.05
    b2 = jnp.zeros((d,))
    with pltpu.force_tpu_interpret_mode():
        a = geglu_ff(x, w1, b1, w2, b2, block_m=32, block_n=64)
        b = geglu_ff(x, w1, b1, w2, b2, ln_gamma=None, ln_beta=None,
                     block_m=32, block_n=64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ln_matmul_stacked_matches_composition():
    m, d, n = 96, 32, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    x = jax.random.normal(ks[0], (2, m // 2, d)) * 1.5
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (d,))
    beta = 0.1 * jax.random.normal(ks[2], (d,))
    ws = jax.random.normal(ks[3], (3, d, n)) * 0.05

    with pltpu.force_tpu_interpret_mode():
        out = ln_matmul_stacked(x, gamma, beta, ws, block_m=32)

    xn = nn.layer_norm({"scale": gamma, "bias": beta}, x, 1e-5)
    assert out.shape == (3, 2, m // 2, n)
    for k in range(3):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(xn @ ws[k]),
                                   atol=2e-5, rtol=2e-5)
