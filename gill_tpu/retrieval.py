"""CC3M retrieval index: load, score, top-k.

Parity target: the reference's in-memory (N, 256) matrix premultiplied by
logit_scale with normalized rows (gill/models.py:824-839, 895-900) queried by
a single matmul + topk(3) with seen-image -1000 downweighting
(models.py:671-693).

TPU-first: the ~3GB index lives HBM-resident, sharded over the mesh's
"data" axis; scoring is a sharded matvec and the top-k reduces with a local
top-k per shard followed by a global merge (jax.lax.top_k over gathered
shard candidates) — no 3GB host round-trips.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def load_embeddings(model_dir: str, pattern: str = "cc3m*.npy"
                    ) -> Tuple[Optional[List[str]], Optional[np.ndarray]]:
    """Reads the pickled {'paths', 'embeddings'} blobs
    (reference gill/models.py:827-839). Returns (paths, (N, D) float32)."""
    paths: List[str] = []
    embs: List[np.ndarray] = []
    for p in sorted(glob.glob(os.path.join(model_dir, pattern))):
        with open(p, "rb") as f:
            blob = pickle.load(f)
        paths.extend(blob["paths"])
        embs.extend(blob["embeddings"])
    if not paths:
        return None, None
    mat = np.stack(embs, axis=0).astype(np.float32)
    assert len(paths) == mat.shape[0], (len(paths), mat.shape)
    return paths, mat


class RetrievalIndex:
    """Device-resident normalized, logit_scale-premultiplied index."""

    def __init__(self, paths: Sequence[str], emb_matrix: np.ndarray,
                 logit_scale: float, mesh: Optional[Mesh] = None):
        self.paths = list(paths)
        mat = np.asarray(emb_matrix, np.float32)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat * float(logit_scale)
        self.n = mat.shape[0]
        self.mesh = mesh
        if mesh is not None:
            # pad to a shard multiple, shard rows over the data axis
            shards = mesh.shape["data"]
            pad = (-self.n) % shards
            if pad:
                mat = np.concatenate(
                    [mat, np.zeros((pad, mat.shape[1]), np.float32)])
            self.matrix = jax.device_put(
                jnp.asarray(mat), NamedSharding(mesh, P("data", None)))
        else:
            self.matrix = jnp.asarray(mat)
        self._topk = jax.jit(self._topk_impl, static_argnames=("k",))

    def _topk_impl(self, query, downweight_mask, k: int):
        """query (D,) normalized; downweight_mask (N_padded,) float added to
        scores (seen images get -1000, padding -inf)."""
        scores = self.matrix @ query  # sharded matvec; psum'd by GSPMD
        scores = scores + downweight_mask
        return jax.lax.top_k(scores, k)

    def topk(self, query: np.ndarray, k: int = 3,
             seen_idx: Sequence[int] = ()) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (scores (k,), indices (k,)). `seen_idx` rows are
        downweighted by -1000 (reference models.py:679-680)."""
        n_pad = self.matrix.shape[0]
        mask = np.zeros((n_pad,), np.float32)
        if n_pad > self.n:
            mask[self.n:] = -np.inf
        for i in seen_idx:
            mask[int(i)] -= 1000.0
        scores, idx = self._topk(jnp.asarray(np.asarray(query, np.float32)),
                                 jnp.asarray(mask), k)
        return np.asarray(scores), np.asarray(idx)

    def scores_for(self, query: np.ndarray, idx: Sequence[int]) -> np.ndarray:
        s = self.matrix[jnp.asarray(list(idx))] @ jnp.asarray(query)
        return np.asarray(s)


def save_embeddings(out_path: str, paths: Sequence[str],
                    embeddings: np.ndarray):
    """Writes the reference-compatible pickled blob
    (scripts/extract_img_embs.py output format)."""
    with open(out_path, "wb") as f:
        pickle.dump({"paths": list(paths),
                     "embeddings": np.asarray(embeddings)}, f)
