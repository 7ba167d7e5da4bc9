"""Frozen-backbone weight loading.

One-time import of HF torch checkpoints into our pytrees (the reference
downloads from the hub at runtime, gill/models.py:56-96; this environment is
offline so weights come from local directories).

Search order for `<weights_root>/<model-name-with-dashes>/`:
`*.safetensors` (no torch needed) then `pytorch_model*.bin` (torch.load).
Falls back to seeded random init with a loud warning — useful for smoke
runs and benchmarks where real weights are unavailable.
"""

from __future__ import annotations

import glob
import json
import os
import struct
from typing import Dict, Optional

import numpy as np

_SAFETENSORS_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal pure-numpy safetensors reader (BF16 upcast to F32)."""
    out = {}
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        base = 8 + hlen
        for name, info in header.items():
            if name == "__metadata__":
                continue
            start, end = info["data_offsets"]
            f.seek(base + start)
            raw = f.read(end - start)
            dt = info["dtype"]
            if dt == "BF16":
                u16 = np.frombuffer(raw, np.uint16)
                arr = (u16.astype(np.uint32) << 16).view(np.float32)
            else:
                arr = np.frombuffer(raw, _SAFETENSORS_DTYPES[dt])
            out[name] = arr.reshape(info["shape"]).copy()
    return out


def load_state_dict_dir(model_dir: str) -> Dict[str, np.ndarray]:
    """Merge all weight shards in a directory into one state dict."""
    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st_files:
        for p in st_files:
            sd.update(read_safetensors(p))
        return sd
    bin_files = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    if bin_files:
        import torch

        for p in bin_files:
            blob = torch.load(p, map_location="cpu", weights_only=True)
            sd.update({k: v.float().numpy() for k, v in blob.items()})
        return sd
    raise FileNotFoundError(f"No *.safetensors or pytorch_model*.bin in {model_dir}")


def _model_dir(name: str, weights_root: Optional[str]) -> Optional[str]:
    candidates = []
    if weights_root:
        candidates += [os.path.join(weights_root, name.replace("/", "--")),
                       os.path.join(weights_root, name.split("/")[-1]),
                       weights_root]
    env = os.environ.get("GILL_TPU_WEIGHTS_DIR")
    if env:
        candidates += [os.path.join(env, name.replace("/", "--")),
                       os.path.join(env, name.split("/")[-1])]
    for c in candidates:
        if c and os.path.isdir(c) and (
                glob.glob(os.path.join(c, "*.safetensors"))
                or glob.glob(os.path.join(c, "pytorch_model*.bin"))):
            return c
    return None


def load_opt(name: str, cfg, vocab_len: int, weights_root=None, seed: int = 0):
    """Frozen OPT params (+ embedding table resized to vocab_len)."""
    import jax
    import jax.numpy as jnp

    from gill_tpu.models import opt as opt_mod
    from gill_tpu.weights.convert import opt_from_torch

    d = _model_dir(name, weights_root)
    if d is None:
        print(f"WARNING: no local weights for {name}; using random init "
              f"(set GILL_TPU_WEIGHTS_DIR for real weights).", flush=True)
        params = opt_mod.init(jax.random.PRNGKey(seed), cfg)
    else:
        sd = load_state_dict_dir(d)
        params = jax.tree_util.tree_map(jnp.asarray, opt_from_torch(sd, cfg))
    return opt_mod.resize_embeddings(params, vocab_len,
                                     key=jax.random.PRNGKey(seed + 1))


def load_clip_vision(name: str, cfg, weights_root=None, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from gill_tpu.models import clip as clip_mod
    from gill_tpu.weights.convert import clip_vision_from_torch

    d = _model_dir(name, weights_root)
    if d is None:
        print(f"WARNING: no local weights for {name}; using random init.",
              flush=True)
        return clip_mod.init_vision(jax.random.PRNGKey(seed), cfg)
    sd = load_state_dict_dir(d)
    return jax.tree_util.tree_map(jnp.asarray, clip_vision_from_torch(sd, cfg))
