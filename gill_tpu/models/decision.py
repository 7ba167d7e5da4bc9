"""Decision classifier: routes each [IMG] request to generation vs retrieval.

Parity target: reference nn.Sequential(Dropout(0.5), Linear(4096, 2)) over
the [IMG0] LLM hidden state with idx2dec = {0:'gen', 1:'ret', 2:'same'} and
a 0.5 softmax threshold (gill/models.py:545,553-561,695-701); trained
offline on PartiPrompts human annotations (TrainDecisionClassifier.ipynb:
AdamW lr 1e-3, 2000 steps). Training lives in
scripts/train_decision_classifier.py.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IDX2DEC = {0: "gen", 1: "ret", 2: "same"}


def init(key, in_dim: int = 4096, num_classes: int = 2, dtype=jnp.float32):
    import math

    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, num_classes), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (num_classes,), dtype, -bound, bound),
    }


def apply(params, x, *, train: bool = False, rng=None,
          dropout_rate: float = 0.5):
    """x (N, in_dim) -> logits (N, num_classes)."""
    x = x.astype(jnp.float32)
    if train:
        assert rng is not None
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
    return x @ params["w"].astype(jnp.float32) + params["b"].astype(jnp.float32)


def decide(params, hidden: jnp.ndarray) -> Tuple[str, List[float]]:
    """[IMG0] hidden (1, in_dim) -> ('gen'|'ret', [probs]) — the inference
    routing (reference gill/models.py:695-701)."""
    logits = apply(params, hidden)
    probs = jax.nn.softmax(logits, axis=-1)
    label = IDX2DEC[int(jnp.argmax(logits))]
    return label, np.asarray(probs).tolist()
