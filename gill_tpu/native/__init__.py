"""Native (C++) components, loaded via ctypes with build-on-demand.

`get_bpe_engine(vocab, bpe_ranks)` returns a fast merge engine for
byte-level BPE, or None when no C++ toolchain is available (callers fall
back to the pure-Python implementation).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence, Tuple

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _cached_lib_path(src: str, name: str) -> str:
    """Build-artifact path keyed by the SOURCE HASH, in a cache dir outside
    the repo. Binaries are never committed and never trusted by mtime: a
    changed source hashes to a new artifact name, so a stale or
    ABI-mismatched .so can never be picked up (ADVICE r2)."""
    import hashlib

    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "GILL_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "gill_tpu"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"lib{name}-{digest}.so")


def _build_lib(src: str, name: str, extra_flags=()):
    """Compile src into the hash-keyed cache (no-op when current) and return
    the artifact path, or None when the toolchain/build fails."""
    path = _cached_lib_path(src, name)
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 src, "-o", tmp, *extra_flags],
                check=True, capture_output=True, timeout=180)
            os.replace(tmp, path)
        except Exception:
            try:
                os.remove(tmp)
            except OSError:
                pass
            return None
    return path


def _load_lib():
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        path = _build_lib(os.path.join(_HERE, "bpe.cpp"), "gillbpe")
        if path is None:
            _BUILD_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.bpe_new.restype = ctypes.c_void_p
            lib.bpe_new.argtypes = [ctypes.POINTER(ctypes.c_int32)] * 3 + [
                ctypes.c_int32]
            lib.bpe_encode.restype = ctypes.c_int32
            lib.bpe_encode.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
            lib.bpe_free.restype = None
            lib.bpe_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
        except OSError:
            _BUILD_FAILED = True
        return _LIB


class BPEEngine:
    """Int-space BPE: symbols are vocab ids; merges from bpe_ranks."""

    def __init__(self, lib, handle):
        self._lib = lib
        self._handle = handle

    def encode(self, sym_ids: Sequence[int]) -> list:
        n = len(sym_ids)
        if n <= 1:
            return list(sym_ids)
        arr = (ctypes.c_int32 * n)(*sym_ids)
        out = (ctypes.c_int32 * n)()
        m = self._lib.bpe_encode(self._handle, arr, n, out)
        return list(out[:m])

    def __del__(self):
        try:
            if self._handle:
                self._lib.bpe_free(self._handle)
        except Exception:
            pass


def get_bpe_engine(vocab: Dict[str, int],
                   bpe_ranks: Dict[Tuple[str, str], int]
                   ) -> Optional[BPEEngine]:
    """Builds the int-space rule table from string merges. Returns None when
    the native library is unavailable or a merge result is not in vocab."""
    lib = _load_lib()
    if lib is None or not bpe_ranks:
        return None
    n = len(bpe_ranks)
    left = (ctypes.c_int32 * n)()
    right = (ctypes.c_int32 * n)()
    merged = (ctypes.c_int32 * n)()
    for (a, b), rank in bpe_ranks.items():
        m = vocab.get(a + b)
        la, rb = vocab.get(a), vocab.get(b)
        if m is None or la is None or rb is None:
            return None  # exotic vocab; python fallback
        left[rank], right[rank], merged[rank] = la, rb, m
    handle = lib.bpe_new(left, right, merged, n)
    if not handle:
        return None
    return BPEEngine(lib, handle)


# ---------------------------------------------------------------------------
# image engine (JPEG/PNG decode + CLIP preprocess; image.cpp)
# ---------------------------------------------------------------------------

_IMG_LIB = None
_IMG_BUILD_FAILED = False


def _load_image_lib():
    global _IMG_LIB, _IMG_BUILD_FAILED
    with _LOCK:
        if _IMG_LIB is not None or _IMG_BUILD_FAILED:
            return _IMG_LIB
        path = _build_lib(os.path.join(_HERE, "image.cpp"), "gillimage",
                          ("-ljpeg", "-lpng"))
        if path is None:
            _IMG_BUILD_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.gill_image_decode_preprocess.restype = ctypes.c_int
            lib.gill_image_decode_preprocess.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)]
            lib.gill_image_probe.restype = ctypes.c_int
            lib.gill_image_probe.argtypes = [ctypes.c_char_p, ctypes.c_long]
            _IMG_LIB = lib
        except OSError:
            _IMG_BUILD_FAILED = True
        return _IMG_LIB


def image_engine_available() -> bool:
    """True when the native decode engine is loadable (toolchain + libjpeg/
    libpng present, build succeeded). decode_preprocess returns None BOTH
    for an unavailable engine and for an unrecognized file format, so
    callers that want to warn about engine breakage (rather than silently
    eating the PIL-path perf loss forever) must ask this explicitly."""
    if os.environ.get("GILL_NO_NATIVE_IMAGE") == "1":
        return False
    return _load_image_lib() is not None


def decode_preprocess(data: bytes, image_size: int, mean, std):
    """JPEG/PNG bytes -> CLIP-normalized float32 (S, S, 3), or None when the
    native engine is unavailable / the format unrecognized (callers fall
    back to the PIL path). Matches utils.image.clip_preprocess within PIL's
    8-bit fixed-point resample error (~2/255 pre-normalization)."""
    if os.environ.get("GILL_NO_NATIVE_IMAGE") == "1":
        return None
    lib = _load_image_lib()
    if lib is None:
        return None
    import numpy as np

    if lib.gill_image_probe(data, len(data)) < 0:
        return None
    out = np.empty((image_size, image_size, 3), np.float32)
    m = (ctypes.c_float * 3)(*[float(x) for x in mean])
    s = (ctypes.c_float * 3)(*[float(x) for x in std])
    rc = lib.gill_image_decode_preprocess(
        data, len(data), image_size, m, s,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out
