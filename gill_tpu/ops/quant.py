"""Int8 W8A8 inference quantization for the SD UNet serving path.

v5e's int8 MXU runs at 2x the bf16 rate (measured 1.4-1.8x end-to-end on
the UNet's conv/FF shapes — scripts/int8_probe.py); weights are quantized
once at load with per-output-channel symmetric scales, activations
dynamically per-tensor on device (amax/127). The int32 accumulator is
dequantized in a fused epilogue.

This is an OPT-IN serving mode (precision quality gate documented in
ROADMAP.md: with real SD weights, VIST CLIP-sim bf16-vs-int8 must agree
within the <=1% north-star budget before int8 becomes a default anywhere).
The parity/bf16 path is untouched.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_weight(w, *, reduce_axes) -> tuple:
    """Symmetric per-output-channel int8 quantization.

    reduce_axes: axes reduced by the contraction (e.g. (0,) for a (in, out)
    linear weight; (0, 1, 2) for an HWIO conv kernel). The remaining axis is
    the output-channel axis that keeps its own scale.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale.reshape(-1)  # (out_channels,)


import os

# Diagnostic: GILL_QUANT_STATIC=1 replaces the dynamic amax reduce with a
# fixed scale — numerically meaningless, but times the ceiling a calibrated
# static-scale path would reach (the quantize then fuses into the previous
# elementwise op instead of costing a reduce + full extra pass).
_STATIC = os.environ.get("GILL_QUANT_STATIC", "0") == "1"


def dynamic_quantize(x) -> tuple:
    """Per-tensor symmetric dynamic activation quantization (on device)."""
    if _STATIC:
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16.0), -127, 127
                      ).astype(jnp.int8)
        return xq, jnp.float32(1.0 / 16.0)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                  ).astype(jnp.int8)
    return xq, scale


def int8_linear(x, wq, wscale, b=None):
    """x (..., in) @ int8 weight (in, out) with fused dequant epilogue."""
    xq, sx = dynamic_quantize(x)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (sx * wscale.astype(jnp.float32))
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def int8_conv2d(x, wq, wscale, b=None, *, stride: int = 1, padding="SAME"):
    """NHWC x, int8 HWIO kernel, per-out-channel dequant epilogue."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    xq, sx = dynamic_quantize(x)
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (sx * wscale.astype(jnp.float32))
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)
