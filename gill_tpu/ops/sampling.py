"""On-device sampling ops for the decode loop.

The reference samples on host with torch.sort/cumsum/multinomial per step
(gill/models.py:491-515); here filtering and sampling are fused jnp ops that
live inside the decode lax.scan, so decoding never leaves the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def top_p_filter(logits, top_p):
    """Nucleus filtering: keep the smallest prefix of the sorted distribution
    with cumulative probability > top_p, first token always kept (matches the
    reference's shifted-mask semantics, gill/models.py:499-512). top_p may be
    a scalar or a per-row (B, 1) array (the serving engines carry it as
    request data)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) <= top_p          # keep j iff cum[j-1] <= top_p
    kth = jnp.maximum(keep.sum(axis=-1) - 1, 0)
    thresh = jnp.take_along_axis(sorted_logits, kth[..., None], axis=-1)
    return jnp.where(logits < thresh, NEG_INF, logits)


def sample_per_row(keys, logits, temperature, top_p, prefilter_k: int = 0):
    """Per-row sampling for the serving engines: temperature (B,) and
    top_p (B,) are DATA (each slot carries its request's values), keys is
    a (B,)-stacked key array (one independent stream per request). Rows
    with temperature == 0 decode greedily; others follow the reference
    order (scale by temperature, then nucleus-filter, then draw —
    gill/models.py:494-515).

    prefilter_k > 0 replaces the full-vocab sort with an EXACT top-k
    prefilter: the nucleus threshold is computed from the top-k logits
    (probabilities normalized over the full vocabulary), and a lax.cond
    falls back to the full sort only when some row's nucleus does not fit
    inside the top-k (e.g. extreme temperature flattening) — identical
    results to the full sort, ~vocab/k less sorting work on the hot path."""
    lf = logits.astype(jnp.float32)
    t = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = lf / t
    tp = top_p[:, None]
    if prefilter_k and prefilter_k < scaled.shape[-1]:
        log_z = jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)
        vals, _ = jax.lax.top_k(scaled, prefilter_k)       # (B, K) desc
        probs = jnp.exp(vals - log_z)                      # full-vocab norm
        cum = jnp.cumsum(probs, axis=-1)
        covered = cum[:, -1:] >= tp                        # nucleus in top-k?
        keep = (cum - probs) <= tp
        kth = jnp.maximum(keep.sum(axis=-1) - 1, 0)
        thresh_k = jnp.take_along_axis(vals, kth[..., None], axis=-1)

        def fast(_):
            return jnp.where(scaled < thresh_k, NEG_INF, scaled)

        def slow(_):
            return top_p_filter(scaled, tp)

        filtered = jax.lax.cond(jnp.all(covered), fast, slow, None)
    else:
        filtered = top_p_filter(scaled, tp)
    drawn = jax.vmap(jax.random.categorical)(keys, filtered)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temperature > 0, drawn, greedy).astype(jnp.int32)


def sample(rng, logits, temperature: float, top_p: float):
    """Greedy when temperature == 0; else temperature + nucleus sampling.

    `temperature`/`top_p` are static floats -> two compiled variants max.
    """
    if temperature == 0.0:
        if top_p < 1.0:
            raise ValueError("top_p cannot be set if temperature is 0")
        return jnp.argmax(logits, axis=-1)
    logits = logits.astype(jnp.float32) / temperature
    if top_p < 1.0:
        logits = top_p_filter(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1)
