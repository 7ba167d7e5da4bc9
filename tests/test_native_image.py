"""Native C++ image engine (JPEG/PNG decode + CLIP preprocess) vs the PIL
path. Skipped when no C++ toolchain / image libs are available."""

import io

import numpy as np
import pytest
from PIL import Image

from gill_tpu.utils.image import CLIP_MEAN, CLIP_STD, clip_preprocess


def _engine_or_skip():
    from gill_tpu.native import decode_preprocess

    probe = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    buf = io.BytesIO()
    probe.save(buf, "PNG")
    if decode_preprocess(buf.getvalue(), 8, CLIP_MEAN.reshape(-1),
                         CLIP_STD.reshape(-1)) is None:
        pytest.skip("native image engine unavailable")
    return decode_preprocess


@pytest.mark.parametrize("fmt", ["JPEG", "PNG"])
@pytest.mark.parametrize("wh", [(320, 240), (100, 467), (224, 224), (37, 61)])
def test_matches_pil_preprocess(fmt, wh):
    decode_preprocess = _engine_or_skip()
    rng = np.random.RandomState(hash((fmt, wh)) % 2**31)
    img = Image.fromarray(rng.randint(0, 255, (wh[1], wh[0], 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, fmt, quality=95)
    data = buf.getvalue()
    out = decode_preprocess(data, 224, CLIP_MEAN.reshape(-1),
                            CLIP_STD.reshape(-1))
    ref = clip_preprocess(Image.open(io.BytesIO(data)), 224)
    assert out.shape == ref.shape == (224, 224, 3)
    # PIL resamples uint8 in 8-bit fixed point; ~1/255 pre-normalization
    assert np.abs(out - ref).max() < 0.02, np.abs(out - ref).max()


def test_grayscale_and_palette_png():
    decode_preprocess = _engine_or_skip()
    rng = np.random.RandomState(3)
    gray = Image.fromarray(rng.randint(0, 255, (96, 128), np.uint8), "L")
    buf = io.BytesIO()
    gray.save(buf, "PNG")
    out = decode_preprocess(buf.getvalue(), 64, CLIP_MEAN.reshape(-1),
                            CLIP_STD.reshape(-1))
    ref = clip_preprocess(Image.open(io.BytesIO(buf.getvalue())), 64)
    assert np.abs(out - ref).max() < 0.02


def test_bad_data_returns_none():
    decode_preprocess = _engine_or_skip()
    assert decode_preprocess(b"not an image", 32, CLIP_MEAN.reshape(-1),
                             CLIP_STD.reshape(-1)) is None
    assert decode_preprocess(b"\xff\xd8\xffgarbage", 32,
                             CLIP_MEAN.reshape(-1),
                             CLIP_STD.reshape(-1)) is None
