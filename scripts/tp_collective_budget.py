"""Measures the TP-sharded serving-decode collective budget from compiled
HLO (VERDICT r2 #7): compiles the real TP decode step over a virtual CPU
mesh at full opt-6.7b dimensions and counts every cross-device collective's
bytes, then applies the v5e ICI cost model. No TPU needed — the collectives
GSPMD inserts are a property of the partitioning, not the backend.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/tp_collective_budget.py
"""

import os
import re
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gill_tpu.config import OPTConfig  # noqa: E402
from gill_tpu.models import opt as opt_mod  # noqa: E402
from gill_tpu.parallel import create_mesh, param_shardings  # noqa: E402
from gill_tpu.parallel.partition import replicated  # noqa: E402

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "s64": 8, "f64": 8}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _bytes_of(shape_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collective_stats(hlo: str):
    """Per-op-kind (count, bytes) for cross-device collectives in HLO."""
    stats = {}
    for line in hlo.splitlines():
        m = re.search(
            r"=\s*(\S+)\s+(all-reduce|all-gather|reduce-scatter|"
            r"collective-permute|all-to-all)(?:-start)?\(", line)
        if not m:
            continue
        shape, kind = m.group(1), m.group(2)
        if "-done" in line:
            continue
        c, b = stats.get(kind, (0, 0))
        stats[kind] = (c + 1, b + _bytes_of(shape))
    return stats


def main():
    tp = int(os.environ.get("TP", "8"))
    batch = int(os.environ.get("B", "8"))
    model = os.environ.get("MODEL", "facebook/opt-6.7b")
    cfg = OPTConfig.from_name(model)
    mesh = create_mesh(dp_size=8 // tp, tp_size=tp)

    p_shapes = jax.eval_shape(lambda: opt_mod.init_dummy(cfg, jnp.bfloat16))
    shardings = param_shardings(mesh, {"lm": p_shapes})["lm"]
    max_len = 128

    def decode_step(params, emb, cache, pos):
        # unroll_layers: a lax.scan over layers hides per-layer collectives
        # inside one loop-body HLO computation (counted once, executed L
        # times); unrolled, every executed collective appears in the text.
        out = opt_mod.forward(params, cfg, emb, cache=cache, cache_pos=pos,
                              unroll_layers=True)
        return out["logits"][:, -1], out["cache"]

    emb = jax.ShapeDtypeStruct((batch, 1, cfg.word_embed_proj_dim),
                               jnp.bfloat16)
    cache_shapes = jax.eval_shape(
        lambda: opt_mod.init_cache(cfg, batch, max_len, dtype=jnp.bfloat16))
    pos = jax.ShapeDtypeStruct((), jnp.int32)

    with jax.sharding.set_mesh(mesh):
        lowered = jax.jit(
            decode_step,
            in_shardings=(shardings, replicated(mesh),
                          jax.tree_util.tree_map(
                              lambda _: replicated(mesh), cache_shapes),
                          replicated(mesh)),
        ).lower(p_shapes, emb, cache_shapes, pos)
        compiled = lowered.compile()
    hlo = compiled.as_text()
    stats = collective_stats(hlo)

    print(f"model={model} tp={tp} batch={batch} (one decode step, "
          f"{cfg.num_layers} layers, hidden {cfg.hidden_size})")
    total_bytes = 0
    total_count = 0
    for kind, (c, b) in sorted(stats.items()):
        total_bytes += b
        total_count += c
        print(f"  {kind:<20} count={c:<4} bytes={b/1e6:8.3f} MB")
    # v5e ICI: ~45 GB/s/link/dir, 1 hop on the ring for TP<=8 within a
    # tray; per-collective launch latency ~5-10 us dominates at B*1*4096.
    bw = 45e9
    t_bytes = total_bytes / bw * 1e6
    t_lat = total_count * 7.5
    print(f"  TOTAL {total_bytes/1e6:.3f} MB/token, {total_count} collectives")
    print(f"  cost model: {t_bytes:.1f} us bandwidth + {t_lat:.1f} us launch "
          f"latency = {(t_bytes+t_lat)/1e3:.3f} ms/token")
    print(f"  expected: 2 all-reduces/layer of (B,1,{cfg.hidden_size}); "
          f"bf16 would be {2*cfg.num_layers*batch*cfg.hidden_size*2/1e6:.3f} "
          f"MB — measured 2x that means XLA reduces in f32 (a bf16 psum of "
          f"the block outputs would halve ICI bytes; latency dominates at "
          f"decode shapes so it matters only for the train step)")


if __name__ == "__main__":
    main()
