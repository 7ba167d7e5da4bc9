"""KV read-window bucketing in the serving engines (serve/engine.py
_kv_window / run_chunk): the decode chunk slices the cache pool to rows
[0, kv_hi) once at entry, carries the small window through the decode scan,
and merges it back; one chunk variant compiles per window bucket and the
scheduler dispatches the smallest window covering every slot's position
bound, so decode KV traffic follows the ACTUAL context depth instead of the
provisioned max_seq.

The claim to measure is provisioning-independence: a pool built with
max_seq 2048 for occasional long requests, serving the ordinary bench trace
(prompts U[16,240], gens U[16,192]), should run at ~the max_seq=512 rate
instead of paying a 4x cache read every step.

Phases (subprocesses — one engine per process keeps HBM clean):
  1. tiny  — token identity, buckets on vs off, same trace.
  2. perf  — opt-2.7b W8, 16 slots, chunk 32, the serve-bench trace;
             max_seq in {512, 1024, 2048} x buckets {off, on}.
Writes KV_WINDOW_PROBE.json.
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
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("GILL_JAX_CACHE",
                                     "/root/.cache/jax_compilation"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp
from gill_tpu.config import OPTConfig
from gill_tpu.models import opt as opt_mod
from gill_tpu.serve.engine import DecodeEngine, ServeRequest

mode = sys.argv[1]
max_seq = int(sys.argv[2])
buckets = "auto" if sys.argv[3] == "on" else None
# int8 KV pool: at max_seq 2048 x 16 slots the bf16 pool alone is 10.7 GB
# (32L x 16 x 2048 x 2560 x 2 x 2B) -- with 2.7 GB W8 weights + program
# temps it cannot be buffer-assigned on a 15.75 GB chip (measured OOM), so
# the deep-pool config only exists with the int8 KV capacity lever.
kv8 = os.environ.get("PROBE_KV8", "0") == "1"

if mode == "tiny":
    cfg = OPTConfig(vocab_size=512, hidden_size=1024, num_layers=4,
                    num_heads=8, ffn_dim=2048, max_positions=1024,
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
    eng = DecodeEngine(params, cfg, slots=8, max_seq=max_seq, chunk=16,
                       prefill_buckets=(64, 128, 256),
                       kv_read_buckets=buckets)
    out = eng.run_pipelined(reqs)
    print("TOKENS " + json.dumps({str(k): v for k, v in out.items()}))
else:
    cfg = OPTConfig.from_name("facebook/opt-2.7b")
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
    # the serve-bench trace (bench.py bench_serve): ordinary chat-scale
    # requests; max_seq is the PROVISIONED pool depth under test
    reqs = [ServeRequest(uid=i,
                         prompt=rng.randint(2, 1000,
                                            size=int(rng.randint(16, 241))
                                            ).tolist(),
                         max_new_tokens=int(rng.randint(16, 193)))
            for i in range(48)]
    eng = DecodeEngine(params, cfg, slots=16, max_seq=max_seq, chunk=32,
                       prefill_buckets=(64, 128, 256), unroll_layers=True,
                       kv_read_buckets=buckets,
                       kv_dtype=jnp.int8 if kv8 else jnp.bfloat16)
    eng.warmup()
    eng.run([ServeRequest(uid=0, prompt=[5] * p, max_new_tokens=4)
             for p in (20, 100, 200)])
    n_tok = sum(r.max_new_tokens for r in reqs)
    t0 = time.perf_counter()
    out = eng.run_pipelined(list(reqs))
    dt = time.perf_counter() - t0
    assert sum(len(v) for v in out.values()) == n_tok
    frac = (eng.stats["kv_rows_read"]
            / max(eng.stats["chunks"], 1) / max_seq)
    print("TPS " + json.dumps({"tok_per_s": n_tok / dt,
                               "mean_window_frac": round(frac, 3)}))
"""


def run(mode, max_seq, gate):
    r = subprocess.run(
        [sys.executable, "-c", WORKER, mode, str(max_seq), gate],
        capture_output=True, text=True, timeout=2400,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for line in r.stdout.splitlines():
        if line.startswith(("TOKENS ", "TPS ")):
            return json.loads(line.split(" ", 1)[1])
    raise RuntimeError(f"worker failed rc={r.returncode}:\n"
                       f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main():
    phase = os.environ.get("PROBE_PHASE", "all")  # tiny | perf | all
    report = {}
    if os.path.exists("KV_WINDOW_PROBE.json"):
        with open("KV_WINDOW_PROBE.json") as f:
            report = json.load(f)
    if phase in ("tiny", "all"):
        base = run("tiny", 1024, "off")
        gated = run("tiny", 1024, "on")
        report["tiny_token_match"] = base == gated
        print(json.dumps({"tiny_token_match": report["tiny_token_match"]}),
              flush=True)
    if phase in ("perf", "all") and report.get("tiny_token_match", True):
        seqs = tuple(int(s) for s in os.environ.get(
            "PROBE_SEQS", "512,1024").split(","))
        kv8 = os.environ.get("PROBE_KV8", "0") == "1"
        for max_seq in seqs:
            ent = {}
            for gate in ("off", "on"):
                # a gate variant can be INFEASIBLE on its own (the full-read
                # chunk at max_seq 2048 OOMs compilation: XLA keeps the pool
                # argument compact but materializes padded head_dim-80->128
                # copies of the whole carried cache in the decode loop;
                # the windowed variant only pads the window) — record the
                # failure and keep measuring the other gate
                try:
                    r = run("serve27", max_seq, gate)
                except RuntimeError as e:
                    msg = str(e)
                    ent[f"{gate}_tok_s"] = ("oom" if "hbm" in msg
                                            or "emory" in msg else "failed")
                    print(json.dumps({f"s{max_seq}_{gate}": ent[
                        f"{gate}_tok_s"]}), flush=True)
                    continue
                ent[f"{gate}_tok_s"] = round(r["tok_per_s"], 1)
                if gate == "on":
                    ent["window_frac"] = r["mean_window_frac"]
                print(json.dumps({f"s{max_seq}_{gate}": r}), flush=True)
            if isinstance(ent.get("off_tok_s"), float) and \
                    isinstance(ent.get("on_tok_s"), float):
                ent["speedup"] = round(ent["on_tok_s"] / ent["off_tok_s"], 3)
            key = f"serve27_seq{max_seq}" + ("_kv8" if kv8 else "")
            report[key] = ent
            with open("KV_WINDOW_PROBE.json", "w") as f:
                json.dump(report, f, indent=1)
    with open("KV_WINDOW_PROBE.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
