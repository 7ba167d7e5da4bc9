"""Int8 W8A8 quantization: exactness of the dequant math and end-to-end
error bounds on a tiny UNet."""

import jax
import jax.numpy as jnp
import numpy as np

from gill_tpu.ops.quant import (dynamic_quantize, int8_conv2d, int8_linear,
                                quantize_weight)


def test_quantize_weight_roundtrip_exact_for_representable():
    # weights already on the int8 grid scaled per channel -> exact roundtrip
    rng = np.random.RandomState(0)
    q = rng.randint(-127, 128, size=(16, 8)).astype(np.float32)
    scale = np.abs(rng.randn(8)).astype(np.float32) + 0.1
    w = jnp.asarray(q * scale)
    wq, ws = quantize_weight(w, reduce_axes=(0,))
    # max |w| per channel is 127*scale only if some row hits +-127; force it
    w = w.at[0].set(127.0 * scale)
    wq, ws = quantize_weight(w, reduce_axes=(0,))
    np.testing.assert_allclose(np.asarray(wq, np.float32) * np.asarray(ws),
                               np.asarray(w), rtol=1e-6, atol=1e-6)


def test_int8_linear_close_to_fp32():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 48).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(48).astype(np.float32) * 0.1)
    wq, ws = quantize_weight(w, reduce_axes=(0,))
    out = int8_linear(x, wq, ws, b)
    ref = x @ w + b
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_conv_close_to_fp32():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 16, 24).astype(np.float32) * 0.1)
    wq, ws = quantize_weight(w, reduce_axes=(0, 1, 2))
    out = int8_conv2d(x, wq, ws, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_dynamic_quantize_scale():
    x = jnp.asarray([[1.0, -254.0]])
    xq, s = dynamic_quantize(x)
    assert float(s) == 2.0
    np.testing.assert_array_equal(np.asarray(xq), [[0, -127]])


def test_quantized_tiny_unet_close_to_fp32():
    from gill_tpu.models.sd import unet as unet_mod

    cfg = unet_mod.tiny_unet_config()
    key = jax.random.PRNGKey(3)
    params = unet_mod.init(key, cfg)
    qparams = unet_mod.quantize_params(params)
    # attention projections stay unquantized; convs/linears carry wq
    assert "wq" in qparams["conv_in"]
    assert "w" in qparams["down"][0]["attns"][0]["block"]["attn1"]["q"]
    assert "wq" in qparams["down"][0]["attns"][0]["block"]["geglu"]

    lat = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 4))
    ts = jnp.full((2,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 24))
    ref = unet_mod.apply(params, cfg, lat, ts, ctx)
    out = unet_mod.apply(qparams, cfg, lat, ts, ctx)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.06, rel
