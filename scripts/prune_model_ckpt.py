"""Prune a training checkpoint into the small deployment checkpoint.

Protocol parity: reference scripts/prune_model_ckpt.py — drop
epoch/optimizer/scheduler state, keep only the trainable adapters (our
checkpoints never store frozen weights to begin with, matching the ~96MB
deployment blob of the reference).

Example:
  python scripts/prune_model_ckpt.py runs/gill_exp
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gill_tpu.utils.ckpt import _flatten, load_checkpoint  # noqa: E402


def main():
    model_dir = sys.argv[1]
    src = os.path.join(model_dir, "ckpt_best")
    if not os.path.exists(os.path.join(src, "state.npz")):
        src = os.path.join(model_dir, "ckpt")
    tree, meta = load_checkpoint(src)

    adapters = tree["adapters"]
    flat = _flatten(adapters)
    out_path = os.path.join(model_dir, "pretrained_ckpt.npz")
    np.savez(out_path, **flat)
    size_mb = os.path.getsize(out_path) / 1e6
    print(f"Wrote {out_path} ({size_mb:.1f} MB, step {meta.get('step')})")


if __name__ == "__main__":
    main()
