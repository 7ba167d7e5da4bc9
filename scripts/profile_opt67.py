"""On-chip trace profile of the opt-6.7b W8A16 decode step (bench config:
batch 8, unrolled layers, AUTO layouts). Captures a jax.profiler trace of a
short decode and aggregates per-op device time by name family, so the gap
between measured tok/s and the weight-streaming bound is attributable.

Run (single-holder TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/profile_opt67.py
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("GILL_BENCH_W8", "1")

import bench  # noqa: E402


def build(model="facebook/opt-6.7b", batch=8, prompt_len=32, gen_len=16):
    from gill_tpu.config import OPTConfig
    from gill_tpu.models import opt as opt_mod

    cfg = OPTConfig.from_name(model)

    def make_params():
        p = opt_mod.init_dummy(cfg, jnp.bfloat16)

        def q(leaf):
            out = {"w8": jnp.zeros(leaf["w"].shape, jnp.int8),
                   "ws": jnp.full(leaf["w"].shape[::2], 1e-4, jnp.float32)}
            if "b" in leaf:
                out["b"] = leaf["b"]
            out["kern"] = ()
            return out

        layers = dict(p["layers"])
        layers["attn"] = {k: q(v) for k, v in layers["attn"].items()}
        layers["fc1"] = q(layers["fc1"])
        layers["fc2"] = q(layers["fc2"])
        p = dict(p)
        p["layers"] = layers
        return p

    emb_dim = cfg.word_embed_proj_dim
    prompt = jax.random.normal(
        jax.random.PRNGKey(1), (batch, prompt_len, emb_dim),
        jnp.bfloat16) * 0.02
    max_len = prompt_len + gen_len

    def decode(params, prompt):
        cache = opt_mod.init_cache(cfg, batch, max_len, dtype=jnp.bfloat16)
        pre = opt_mod.forward(params, cfg, prompt, cache=cache, cache_pos=0,
                              unroll_layers=True)
        logits0, cache = pre["logits"][:, -1], pre["cache"]

        def step(carry, _):
            logits, cache, pos = carry
            tok = jnp.argmax(logits, axis=-1)
            emb = opt_mod.embed_tokens(params, tok[:, None]).astype(
                jnp.bfloat16)
            out = opt_mod.forward(params, cfg, emb, cache=cache,
                                  cache_pos=pos, unroll_layers=True)
            return (out["logits"][:, -1], out["cache"], pos + 1), tok.sum()

        (_, _, _), s = jax.lax.scan(
            step, (logits0, cache, jnp.asarray(prompt_len)), None,
            length=gen_len)
        return s.sum()

    from jax.experimental import layout as jlayout

    auto = jlayout.Format(jlayout.Layout.AUTO)
    p_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.eval_shape(make_params))
    auto_tree = jax.tree_util.tree_map(lambda _: auto, p_shapes)
    compiled = jax.jit(decode, in_shardings=(auto_tree, auto)).lower(
        p_shapes, jax.ShapeDtypeStruct(prompt.shape, prompt.dtype)).compile()
    fmts = compiled.input_formats[0]
    params = jax.tree_util.tree_map(
        lambda x, f: jax.device_put(x, f), jax.jit(make_params)(), fmts[0])
    prompt = jax.device_put(prompt, fmts[1])
    return compiled, params, prompt, gen_len


FAMS = [
    ("w8_matmul", r"w8_matmul|custom-call"),
    ("attention(decode)", r"reduce(?!-scatter).*|multiply"),
    ("lm_head/logits", r"dot"),
    ("cache DUS", r"dynamic-update-slice"),
    ("copy/transpose", r"copy|transpose|bitcast"),
    ("fusion(other)", r"fusion"),
]


def classify(name):
    for fam, pat in FAMS:
        if re.match(pat, name):
            return fam
    return "other"


def main():
    bench._enable_compile_cache()
    compiled, params, prompt, gen_len = build()
    float(compiled(params, prompt))  # warm

    trace_dir = "/tmp/opt67_trace"
    jax.profiler.start_trace(trace_dir)
    float(compiled(params, prompt))
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace written", file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # Device-side complete events: aggregate by HLO op name prefix family.
    fam_time = defaultdict(float)
    fam_count = defaultdict(int)
    op_time = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        args = ev.get("args") or {}
        # device lanes carry HLO op metadata; host lanes don't
        if "run_id" in args or "device_id" in args or ev.get("tid") == 1:
            pass
        name = ev.get("name", "")
        if not args.get("long_name") and "hlo_category" not in args:
            continue
        dur = float(ev["dur"])  # us
        total += dur
        base = re.sub(r"[.\d]+$", "", name)
        op_time[base] += dur
        fam_time[args.get("hlo_category", classify(name))] += dur
        fam_count[args.get("hlo_category", classify(name))] += 1

    n_tok = gen_len
    print(f"total device time: {total/1e3:.2f} ms "
          f"({total/1e3/n_tok:.3f} ms/token over {n_tok} tokens + prefill)")
    print("\nby hlo_category:")
    for fam, t in sorted(fam_time.items(), key=lambda kv: -kv[1]):
        print(f"  {fam:<28}{t/1e3:>9.2f} ms  n={fam_count[fam]}")
    print("\ntop ops:")
    for op, t in sorted(op_time.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {op:<48}{t/1e3:>9.2f} ms")


if __name__ == "__main__":
    main()
