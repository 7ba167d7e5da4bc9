"""Checkpoint IO.

Native format: a directory with `state.npz` (flattened trainable pytree +
optimizer state + step) and `meta.json`. Only the trainable adapters are
saved — the frozen backbones are re-derived from their own weight files —
mirroring the reference's stripped state_dict (main.py:414-419) and ~96MB
deployment checkpoint (scripts/prune_model_ckpt.py).

Also imports reference torch checkpoints (`pretrained_ckpt.pth.tar`,
`decision_model.pth.tar`) into our pytrees.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import numpy as np

SEP = "//"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{SEP}{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{SEP}#{i}" if prefix else f"#{i}"))
        if len(tree) == 0:
            out[prefix + SEP + "#empty"] = np.zeros((0,))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def finalize(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.startswith("#") for k in keys):
            if keys == ["#empty"]:
                return ()
            items = sorted(((int(k[1:]), v) for k, v in node.items()))
            return tuple(finalize(v) for _, v in items)
        return {k: finalize(v) for k, v in node.items()}

    return finalize(root)


def save_checkpoint(state_tree, ckpt_dir: str, *, step: int,
                    is_best: bool = False, meta: Optional[dict] = None):
    """Writes `<ckpt_dir>/ckpt/state.npz` (+ `_best` copy when is_best),
    reference utils.py:122-125 semantics."""
    path = os.path.join(ckpt_dir, "ckpt")
    os.makedirs(path, exist_ok=True)
    flat = _flatten(state_tree)
    np.savez(os.path.join(path, "state.npz"), **flat)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"step": step, **(meta or {})}, f)
    if is_best:
        best = os.path.join(ckpt_dir, "ckpt_best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)


def load_checkpoint(ckpt_dir: str) -> Tuple[Any, dict]:
    path = ckpt_dir if os.path.exists(os.path.join(ckpt_dir, "state.npz")) \
        else os.path.join(ckpt_dir, "ckpt")
    with np.load(os.path.join(path, "state.npz"), allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return _unflatten(flat), meta


# ---------------------------------------------------------------------------
# Orbax backend (multi-host / sharded arrays; SURVEY §5 checkpoint aux)
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(state_tree, ckpt_dir: str, *, step: int,
                          meta: Optional[dict] = None):
    """Sharding-aware checkpoint via orbax (use for multi-host runs; the
    npz format above stays the single-host default). Collective: EVERY
    process must call this with its (globally sharded) arrays — each host
    writes the shards it owns. meta.json is written by process 0 only."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"orbax_{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state_tree, force=True)
    if jax.process_index() == 0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"step": step, **(meta or {})}, f)


def latest_orbax_step(ckpt_dir: str) -> Optional[int]:
    """Largest step with an `orbax_<step>` checkpoint under ckpt_dir (the
    dir itself may also BE a single orbax_<step> directory); None if no
    orbax checkpoints exist."""
    import glob as _glob

    base = os.path.basename(os.path.normpath(ckpt_dir))
    if base.startswith("orbax_") and base[6:].isdigit():
        return int(base[6:])
    cands = [p for p in _glob.glob(os.path.join(ckpt_dir, "orbax_*"))
             if p.rsplit("_", 1)[1].isdigit()]
    if not cands:
        return None
    return max(int(p.rsplit("_", 1)[1]) for p in cands)


def load_checkpoint_orbax(ckpt_dir: str, step: Optional[int] = None,
                          target=None):
    """Restore an orbax checkpoint. With `target` (a pytree of jax arrays
    with the desired shardings — e.g. the freshly initialized train state
    already placed on the mesh), arrays are restored DIRECTLY onto those
    shardings (each host reads only the shards it owns); without it,
    arrays restore as host-replicated numpy."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_orbax_step(ckpt_dir)
        assert step is not None, f"no orbax checkpoints under {ckpt_dir}"
    base = os.path.basename(os.path.normpath(ckpt_dir))
    if base == f"orbax_{step}":
        path = ckpt_dir
    else:
        path = os.path.join(ckpt_dir, f"orbax_{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            restore_args = ocp.checkpoint_utils.construct_restore_args(
                target)
            tree = ckptr.restore(os.path.abspath(path), item=target,
                                 restore_args=restore_args)
        else:
            tree = ckptr.restore(os.path.abspath(path))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return tree, meta


# ---------------------------------------------------------------------------
# reference torch checkpoint import
# ---------------------------------------------------------------------------

def load_reference_gill_checkpoint(path: str, core) -> dict:
    """`pretrained_ckpt.pth.tar` -> adapters pytree.

    The reference ckpt stores (with optional DDP 'module.' prefixes):
      model.input_embeddings.weight      -> the 8 [IMG] rows only
      model.visual_embeddings.{w,b}      -> visual->LM projection
      model.visual_fc.{w,b}              -> retrieval image head
      model.logit_scale
      model.ret_text_hidden_fcs.0.*      -> linear retrieval text head
      model.gen_text_hidden_fcs.0.*      -> gill_mapper generation head
    (reference load_gill, gill/models.py:879-893)
    """
    import torch

    from gill_tpu.weights.convert import _lin, _np, text_fc_layer_from_torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k.replace("module.", ""): v for k, v in ckpt["state_dict"].items()}

    adapters = {
        "img_embeddings": _np(sd["model.input_embeddings.weight"])[
            -core.cfg.num_tokens:],
        "visual_embeddings": _lin(sd, "model.visual_embeddings"),
        "visual_fc": _lin(sd, "model.visual_fc"),
        "logit_scale": _np(sd["model.logit_scale"]),
    }
    # One mapper pair per text_emb_layers entry (ModuleList index i in the
    # reference maps to our ret_fc / ret_fc_{i} suffix convention).
    for i, (suffix, _, _) in enumerate(core.tap_specs()):
        adapters[f"ret_fc{suffix}"] = text_fc_layer_from_torch(
            sd, f"model.ret_text_hidden_fcs.{i}.", core.cfg.ret_text_fc_mode)
        adapters[f"gen_fc{suffix}"] = text_fc_layer_from_torch(
            sd, f"model.gen_text_hidden_fcs.{i}.", core.cfg.text_fc_mode)
    return adapters


def load_reference_decision_model(path: str) -> dict:
    """decision_model.pth.tar (torch) or .npz (ours) ->
    {"w": (4096, 2), "b": (2,)} (reference gill/models.py:553-561)."""
    if path.endswith(".npz"):
        z = np.load(path)
        return {"w": z["w"], "b": z["b"]}
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    w = None
    b = None
    for k, v in sd.items():
        if k.endswith("weight"):
            w = v.detach().float().numpy().T
        elif k.endswith("bias"):
            b = v.detach().float().numpy()
    assert w is not None and b is not None, list(sd)
    return {"w": w, "b": b}
