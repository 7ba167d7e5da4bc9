"""Fused GEGLU FF kernel vs the composed XLA ops (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gill_tpu.ops.geglu import geglu_ff


@pytest.mark.parametrize("m,d,block_m,block_n",
                         [(64, 32, 32, 64), (96, 32, 32, 128),
                          (128, 64, 64, 128)])
def test_geglu_ff_matches_composition(m, d, block_m, block_n):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (2, m // 2, d))
    w1 = jax.random.normal(ks[1], (d, 8 * d)) * 0.05
    b1 = jax.random.normal(ks[2], (8 * d,)) * 0.05
    w2 = jax.random.normal(ks[3], (4 * d, d)) * 0.05
    b2 = jax.random.normal(ks[4], (d,)) * 0.05

    with pltpu.force_tpu_interpret_mode():
        out = geglu_ff(x, w1, b1, w2, b2, block_m=block_m, block_n=block_n)

    h = x @ w1 + b1
    val, gate = jnp.split(h, 2, axis=-1)
    ref = (val * jax.nn.gelu(gate, approximate=False)) @ w2 + b2
    # kernel evaluates exact gelu in tanh form (Mosaic has no erf):
    # |delta| < 3.2e-4 per element, below bf16 resolution in the UNet
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=2e-3)
