"""Valid-prefix Pallas decode kernel in the SERVING engines (round-5
candidate 2): the engines' per-slot cache_pos vectors already flow through
models/opt.py's deferred-write decode as a (B,) kv_offset, and
ops/decode_attn.py takes per-row lengths natively — so the kernel needs no
new plumbing, only the GILL_PREFIX_DECODE_MIN gate. The eligible shape is
opt-6.7b (d=128; 2.7b's d=80 is outside the kernel's lane scope).

Two phases:
  1. correctness — tiny d=128 config, same trace, gate off vs on:
     generated tokens must be identical.
  2. perf — opt-6.7b W8, the serve-bench trace, gate off vs on.

Each phase runs in subprocesses because the gate is an import-time knob.
Writes SERVE_PREFIX_DECODE_PROBE.json.
"""
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from gill_tpu.config import OPTConfig
from gill_tpu.models import opt as opt_mod
from gill_tpu.serve.engine import DecodeEngine, ServeRequest

mode = sys.argv[1]
if mode == "tiny":
    cfg = OPTConfig(vocab_size=512, hidden_size=1024, num_layers=4,
                    num_heads=8, ffn_dim=2048, max_positions=640,
                    word_embed_proj_dim=1024)
    def make_params():
        key = jax.random.PRNGKey(0)
        p = opt_mod.init_dummy(cfg, jnp.bfloat16)
        leaves, tdef = jax.tree_util.tree_flatten(p)
        keys = jax.random.split(key, len(leaves))
        leaves = [jax.random.normal(k, x.shape, x.dtype) * 0.05
                  for k, x in zip(keys, leaves)]
        return jax.tree_util.tree_unflatten(tdef, leaves)
    params = jax.jit(make_params)()
    rng = np.random.RandomState(3)
    reqs = [ServeRequest(uid=i,
                         prompt=rng.randint(2, 500,
                                            size=int(rng.randint(8, 200))
                                            ).tolist(),
                         max_new_tokens=int(rng.randint(8, 96)))
            for i in range(24)]
    eng = DecodeEngine(params, cfg, slots=8, max_seq=512, chunk=16,
                       prefill_buckets=(64, 128, 256))
    out = eng.run_pipelined(reqs)
    print("TOKENS " + json.dumps({str(k): v for k, v in out.items()}))
else:
    model = "facebook/opt-6.7b"
    cfg = OPTConfig.from_name(model)
    def make_params():
        p = opt_mod.init_dummy(cfg, jnp.bfloat16)
        def q(leaf):
            L, i, o = leaf["w"].shape
            out = {"w8": jnp.zeros((L, i, o), jnp.int8),
                   "ws": jnp.full((L, o), 1e-4, jnp.float32)}
            if "b" in leaf:
                out["b"] = leaf["b"]
            if cfg.hidden_size >= 4096:
                out["kern"] = ()
            return out
        layers = dict(p["layers"])
        layers["attn"] = {k: q(v) for k, v in layers["attn"].items()}
        layers["fc1"] = q(layers["fc1"])
        layers["fc2"] = q(layers["fc2"])
        p = dict(p)
        p["layers"] = layers
        return p
    params = jax.jit(make_params)()
    rng = np.random.RandomState(7)
    # the serve-bench trace shape (prompts U[16,240], gens U[16,192]) at
    # the long-context end: all slots carry deep valid prefixes, which is
    # the kernel's favorable regime; plus the bench's own mixed trace.
    trace_name = os.environ.get("PROBE_TRACE", "mixed")
    if trace_name == "mixed":
        reqs = [ServeRequest(uid=i,
                             prompt=rng.randint(2, 1000,
                                                size=int(rng.randint(16, 241))
                                                ).tolist(),
                             max_new_tokens=int(rng.randint(16, 193)))
                for i in range(48)]
    else:  # deep: near-full 512-row contexts the entire run
        reqs = [ServeRequest(uid=i,
                             prompt=rng.randint(2, 1000, size=240).tolist(),
                             max_new_tokens=192) for i in range(32)]
    eng = DecodeEngine(params, cfg, slots=16, max_seq=512, chunk=32,
                       prefill_buckets=(64, 128, 256), unroll_layers=True)
    eng.warmup()
    eng.run([ServeRequest(uid=0, prompt=[5] * p, max_new_tokens=4)
             for p in (20, 100, 200)])
    n_tok = sum(r.max_new_tokens for r in reqs)
    t0 = time.perf_counter()
    out = eng.run_pipelined(list(reqs))
    dt = time.perf_counter() - t0
    assert sum(len(v) for v in out.values()) == n_tok
    print("TPS " + json.dumps({"tok_per_s": n_tok / dt}))
"""


def run(mode, gate, trace="mixed"):
    env = dict(os.environ)
    env["GILL_PREFIX_DECODE_MIN"] = str(gate)
    env["PROBE_TRACE"] = trace
    r = subprocess.run([sys.executable, "-c", WORKER, mode],
                       capture_output=True, text=True, env=env,
                       timeout=1500, cwd=os.path.dirname(
                           os.path.dirname(os.path.abspath(__file__))))
    for line in r.stdout.splitlines():
        if line.startswith(("TOKENS ", "TPS ")):
            return json.loads(line.split(" ", 1)[1])
    raise RuntimeError(f"worker failed rc={r.returncode}:\n"
                       f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main():
    phase = os.environ.get("PROBE_PHASE", "all")  # tiny | perf | all
    report = {}
    if os.path.exists("SERVE_PREFIX_DECODE_PROBE.json"):
        with open("SERVE_PREFIX_DECODE_PROBE.json") as f:
            report = json.load(f)
    if phase in ("tiny", "all"):
        base = run("tiny", 0)
        gated = run("tiny", 256)
        match = base == gated
        report["tiny_token_match"] = match
        print(json.dumps({"tiny_token_match": match}), flush=True)
        if not match:
            diffs = [k for k in base if base[k] != gated.get(k)]
            report["tiny_mismatch_uids"] = diffs
            print(json.dumps({"mismatch_uids": diffs}), flush=True)
    if phase in ("perf", "all") and report.get("tiny_token_match"):
        for trace in ("mixed", "deep"):
            try:
                off = run("serve67", 0, trace)["tok_per_s"]
                on = run("serve67", 512, trace)["tok_per_s"]
                report[f"serve67_{trace}"] = {
                    "off_tok_s": round(off, 1), "on_tok_s": round(on, 1),
                    "speedup": round(on / off, 3)}
            except Exception as e:  # record and keep going
                report[f"serve67_{trace}"] = {"error": str(e)[-500:]}
            print(json.dumps({trace: report[f"serve67_{trace}"]}),
                  flush=True)
            with open("SERVE_PREFIX_DECODE_PROBE.json", "w") as f:
                json.dump(report, f, indent=1)
    with open("SERVE_PREFIX_DECODE_PROBE.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
