"""Device mesh construction.

The reference's only parallelism is DDP data parallelism over NCCL
(main.py:216,236-237,321-326). Here the equivalent is a ("data", "model")
mesh: gradients reduce over "data" via XLA psum (inserted by GSPMD), and
"model" > 1 additionally tensor-shards the frozen OPT — parallelism the
reference never had but OPT-30B/66B presets require.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(dp_size: int = -1, tp_size: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp_size == -1:
        assert n % tp_size == 0, (n, tp_size)
        dp_size = n // tp_size
    assert dp_size * tp_size == n, (dp_size, tp_size, n)
    arr = np.asarray(devices).reshape(dp_size, tp_size)
    return Mesh(arr, ("data", "model"))
