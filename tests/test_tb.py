"""Tests for the pure-Python TensorBoard event writer (gill_tpu/utils/tb.py).

The reference logs through torch.utils.tensorboard (reference
main.py:299-303); our writer replaces it with a dependency-free
implementation of the same on-disk format. Round-trip through our own
reader, and cross-validate both directions against torch's real
SummaryWriter where torch is importable: (a) torch's reader-side
(tensorboard's loader semantics) is approximated by parsing torch's own
event file with OUR reader — if the framing/CRC/proto layout differ,
parsing fails; (b) the scalar values must match bit-for-bit as float32.
"""

import glob
import os
import zlib

import numpy as np
import pytest

from gill_tpu.utils.tb import SummaryWriter, encode_png_rgb, read_events


def test_roundtrip_scalars_and_image(tmp_path):
    d = str(tmp_path / "run")
    w = SummaryWriter(d)
    w.add_scalar("loss/train", 1.5, 0)
    w.add_scalar("loss/train", 0.75, 1)
    w.add_scalar("lr", 1e-3, 1)
    img = np.linspace(0, 1, 3 * 8 * 6, dtype=np.float32).reshape(3, 8, 6)
    w.add_image("grid/example", img, 2)
    w.close()

    files = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0], verify_crc=True)
    assert events[0]["file_version"] == "brain.Event:2"

    scalars = {}
    for ev in events:
        for tag, val in ev["scalars"].items():
            scalars[(tag, ev["step"])] = val
    assert scalars[("loss/train", 0)] == pytest.approx(1.5)
    assert scalars[("loss/train", 1)] == pytest.approx(0.75)
    assert scalars[("lr", 1)] == pytest.approx(1e-3, rel=1e-6)

    imgs = [ev["images"] for ev in events if ev["images"]]
    assert len(imgs) == 1
    png = imgs[0]["grid/example"]
    assert png.startswith(b"\x89PNG\r\n\x1a\n")


def test_png_decodable_by_pil(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    rgb = (np.arange(5 * 7 * 3, dtype=np.uint32) % 256).astype(np.uint8)
    rgb = rgb.reshape(5, 7, 3)
    png = encode_png_rgb(rgb)
    p = tmp_path / "x.png"
    p.write_bytes(png)
    back = np.asarray(PIL.open(str(p)).convert("RGB"))
    np.testing.assert_array_equal(back, rgb)


def test_image_chw_float_and_hwc_uint8(tmp_path):
    d = str(tmp_path / "run")
    w = SummaryWriter(d)
    w.add_image("chw", np.zeros((3, 4, 5), np.float32), 0)
    w.add_image("hwc", np.full((4, 5, 3), 255, np.uint8), 1)
    w.close()
    events = read_events(glob.glob(os.path.join(d, "*tfevents*"))[0])
    images = {t: v for ev in events for t, v in ev["images"].items()}
    assert set(images) == {"chw", "hwc"}


def test_corrupt_crc_detected(tmp_path):
    d = str(tmp_path / "run")
    w = SummaryWriter(d)
    w.add_scalar("a", 1.0, 0)
    w.close()
    path = glob.glob(os.path.join(d, "*tfevents*"))[0]
    data = bytearray(open(path, "rb").read())
    data[-5] ^= 0xFF  # flip a payload byte of the last record
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        read_events(path, verify_crc=True)
    # non-verifying parse still walks the framing
    read_events(path, verify_crc=False)


def test_crc32c_against_known_vectors():
    # Published CRC32C (Castagnoli) test vectors (RFC 3720 appendix B.4).
    from gill_tpu.utils.tb import _crc32c
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283  # the canonical check value
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA  # RFC 3720 B.4 "32 zeroes"
    assert _crc32c(b"\xff" * 32) == 0x62A8AB43  # RFC 3720 B.4 "32 ones"
    # and it is NOT zlib's crc32 (different polynomial)
    assert _crc32c(b"123456789") != zlib.crc32(b"123456789")


def test_parses_torch_summarywriter_output(tmp_path):
    """Golden cross-check: torch's SummaryWriter writes the real format;
    our reader must parse it and recover the same scalar values."""
    torch_tb = pytest.importorskip("torch.utils.tensorboard")
    d = str(tmp_path / "torch_run")
    tw = torch_tb.SummaryWriter(d)
    tw.add_scalar("x", 2.25, 3)
    tw.add_scalar("y/z", -1.0, 4)
    tw.close()
    files = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert files
    events = read_events(files[0], verify_crc=True)
    scalars = {(t, ev.get("step", 0)): v
               for ev in events for t, v in ev["scalars"].items()}
    assert scalars[("x", 3)] == pytest.approx(2.25)
    assert scalars[("y/z", 4)] == pytest.approx(-1.0)
