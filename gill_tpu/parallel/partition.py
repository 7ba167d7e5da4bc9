"""Sharding rules: parameter pytree paths -> PartitionSpecs.

Megatron-style tensor parallelism for the frozen OPT over the "model" axis:
attention q/k/v and fc1 shard their output dim, out-proj and fc2 shard their
input dim, so each layer needs exactly one psum (inserted by GSPMD) per
attention/MLP block and activations stay sharded by heads between. Stacked
layer leaves carry a leading L axis, so specs gain a leading None.

Everything else (vision tower, adapters, norms, embeddings) is replicated —
they are tiny next to the LM. Batches shard over "data".
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _opt_layer_spec(path_tail: str, leaf) -> P:
    """Spec for leaves under lm/layers/* (leading dim = L)."""
    two = leaf.ndim == 3  # (L, in, out) matrices; (L, dim) vectors
    if path_tail in ("attn.q.w", "attn.k.w", "attn.v.w", "fc1.w"):
        return P(None, None, "model") if two else P(None, "model")
    if path_tail in ("attn.q.b", "attn.k.b", "attn.v.b", "fc1.b"):
        return P(None, "model")
    if path_tail in ("attn.o.w", "fc2.w"):
        return P(None, "model", None)
    return P()  # norms, biases of row-parallel layers: replicated


def _path_str(path) -> str:
    out = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            out.append(str(k.key))
        elif isinstance(k, jax.tree_util.SequenceKey):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return ".".join(out)


def param_pspecs(params: Any) -> Any:
    """PartitionSpec pytree matching `params` (GILL layout or any subtree)."""

    def rule(path, leaf):
        p = _path_str(path)
        if ".layers." in p or p.startswith("layers."):
            idx = p.index("layers.") + len("layers.")
            tail = p[idx:]
            if p.startswith("lm.") or ".lm." in p or p.startswith("layers."):
                return _opt_layer_spec(tail, leaf)
            return P()
        return P()

    return jax.tree_util.tree_map_with_path(rule, params)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_local_rows(x):
    """This process's rows of a (possibly) multi-process batch-sharded
    jax.Array, in row order, deduped across replicating axes. np.asarray on
    an array spanning non-addressable devices raises in multi-controller
    runs; single-process / fully-addressable inputs pass through whole."""
    import numpy as np

    if not (isinstance(x, jax.Array) and not x.is_fully_addressable):
        return np.asarray(x)
    rows, seen = [], set()
    for s in sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0):
        start = s.index[0].start or 0
        if start not in seen:
            seen.add(start)
            rows.append(np.asarray(s.data))
    return np.concatenate(rows, axis=0)
