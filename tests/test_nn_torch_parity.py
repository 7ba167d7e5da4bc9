"""Low-level op parity vs torch for the SD building blocks — the places
where layout/padding conventions could silently diverge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.nn import core as nn

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _conv_params(w, b=None):
    p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if b is not None:
        p["b"] = jnp.asarray(b)
    return p


@pytest.mark.parametrize("stride,pad,size", [(1, 1, 16), (2, 1, 16),
                                             (1, 0, 8), (4, 2, 16)])
def test_conv2d_matches_torch(stride, pad, size):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, size, size).astype(np.float32)   # NCHW for torch
    w = rng.randn(7, 5, 3, 3).astype(np.float32)
    b = rng.randn(7).astype(np.float32)
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   stride=stride, padding=pad).numpy()
    got = nn.conv2d(_conv_params(w, b), jnp.asarray(x.transpose(0, 2, 3, 1)),
                    stride=stride, padding=pad)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=2e-5, rtol=2e-5)


def test_group_norm_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 4, 4).astype(np.float32)  # NCHW
    scale = rng.randn(8).astype(np.float32)
    bias = rng.randn(8).astype(np.float32)
    ref = F.group_norm(torch.tensor(x), 4, torch.tensor(scale),
                       torch.tensor(bias), eps=1e-6).numpy()
    got = nn.group_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
                        jnp.asarray(x.transpose(0, 2, 3, 1)), num_groups=4,
                        eps=1e-6)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=3e-5, rtol=3e-5)


def test_geglu_matches_torch():
    """diffusers GEGLU: proj to 2*inner, x * gelu(gate) (exact tanh-free)."""
    rng = np.random.RandomState(2)
    x = rng.randn(3, 10).astype(np.float32)
    xt = torch.tensor(x)
    val, gate = xt.chunk(2, dim=-1)
    ref = (val * F.gelu(gate)).numpy()
    v, g = jnp.split(jnp.asarray(x), 2, axis=-1)
    got = v * jax.nn.gelu(g, approximate=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-6)


def test_timestep_embedding_values():
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0):
    emb = [cos(t*e^(-ln(1e4)*i/half)), sin(...)] — verified analytically."""
    from gill_tpu.models.sd.unet import timestep_embedding

    t = jnp.asarray([0.0, 1.0, 999.0])
    dim = 8
    got = np.asarray(timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    for bi, tv in enumerate([0.0, 1.0, 999.0]):
        np.testing.assert_allclose(got[bi, :half], np.cos(tv * freqs),
                                   atol=1e-5)
        np.testing.assert_allclose(got[bi, half:], np.sin(tv * freqs),
                                   atol=1e-5)


def test_vae_encoder_downsample_asymmetric_pad():
    """diffusers VAE encoder downsamples with F.pad(x,(0,1,0,1)) + stride-2
    VALID conv; verify our encode path matches that convention."""
    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    w = rng.randn(4, 4, 3, 3).astype(np.float32)
    ref = F.conv2d(F.pad(torch.tensor(x), (0, 1, 0, 1)), torch.tensor(w),
                   stride=2).numpy()
    xp = jnp.pad(jnp.asarray(x.transpose(0, 2, 3, 1)),
                 ((0, 0), (0, 1), (0, 1), (0, 0)))
    got = nn.conv2d(_conv_params(w), xp, stride=2, padding="VALID")
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=2e-5, rtol=2e-5)
