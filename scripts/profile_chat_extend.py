"""Per-turn latency of a rolling chat session on the GILL serving engine:
incremental prefix extension (extend_prefix: prefill only the new turn)
vs cold full-history prefill each turn.

Workload: opt-2.7b W8, one chat session, turn = 16 new embedding rows +
24 generated tokens folded back into the prefix (40 rows/turn of history
growth). Reports per-turn wall time at increasing history depths.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gill_tpu.config import CLIPVisionConfig, GILLConfig, OPTConfig
    from gill_tpu.models import opt as opt_mod
    from gill_tpu.models.gill import GILLCore
    from gill_tpu.serve.gill_engine import GillDecodeEngine, GillServeRequest

    model = os.environ.get("GILL_BENCH_MODEL", "facebook/opt-2.7b")
    opt_cfg = OPTConfig.from_name(model)
    nt = 8
    cfg = GILLConfig(opt_version=model, num_tokens=nt)
    vis_cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                               num_layers=2, num_heads=2, image_size=32,
                               patch_size=16)
    core = GILLCore(cfg=cfg, opt_cfg=opt_cfg, vis_cfg=vis_cfg,
                    vocab_len=opt_cfg.vocab_size + nt + 1,
                    img_start=opt_cfg.vocab_size + 1,
                    pad_token_id=1, bos_token_id=2)

    def make_params():
        lm = opt_mod.init_dummy(opt_cfg, jnp.bfloat16)
        lm = opt_mod.resize_embeddings(lm, core.vocab_len)
        lm = opt_mod.quantize_params_w8(lm)
        img = jnp.zeros((nt, opt_cfg.word_embed_proj_dim), jnp.bfloat16)
        return {"lm": lm, "adapters": {"img_embeddings": img}}

    params = jax.jit(make_params)()
    E = opt_cfg.word_embed_proj_dim
    rng = np.random.RandomState(0)
    bf16 = np.dtype(jnp.bfloat16)

    TURN_ROWS, NEW_TOK, TURNS = 16, 24, 12
    max_seq = 1024
    eng = GillDecodeEngine(core, params, slots=4, max_seq=max_seq,
                           chunk=16, prefill_buckets=(16, 64, 256, 512))
    eng.warmup()

    def turn_embs():
        return (rng.randn(TURN_ROWS, E) * 0.02).astype(bf16)

    def fold_embs():
        # the turn prompt + generated reply re-embedded
        return (rng.randn(TURN_ROWS + NEW_TOK, E) * 0.02).astype(bf16)

    # warm the suffix-prefill variant + extension programs at each offset
    # class (first visit compiles; chat reuse is the steady state measured)
    rows = []

    def run_incremental():
        pid = eng.register_prefix(turn_embs())
        per_turn = []
        for t in range(TURNS):
            t0 = time.perf_counter()
            out = eng.run([GillServeRequest(uid=t, embs=turn_embs(),
                                            num_words=NEW_TOK,
                                            prefix_id=pid)])
            pid = eng.extend_prefix(pid, fold_embs())
            per_turn.append((time.perf_counter() - t0,
                             eng._prefixes[pid]["n"]))
            assert len(out[t]["tokens"]) >= 1
        return per_turn

    def run_cold():
        hist = turn_embs()
        per_turn = []
        for t in range(TURNS):
            t0 = time.perf_counter()
            out = eng.run([GillServeRequest(
                uid=t, embs=np.concatenate([hist, turn_embs()]),
                num_words=NEW_TOK)])
            hist = np.concatenate([hist, fold_embs()])
            per_turn.append((time.perf_counter() - t0, hist.shape[0]))
            assert len(out[t]["tokens"]) >= 1
        return per_turn

    # compile pass (both modes), then the measured pass
    run_incremental()
    run_cold()
    inc = run_incremental()
    cold = run_cold()
    for (ti, ni), (tc, nc) in zip(inc, cold):
        rows.append({"history_rows": nc,
                     "incremental_ms": round(ti * 1e3, 1),
                     "cold_ms": round(tc * 1e3, 1),
                     "speedup": round(tc / ti, 2)})
        print(json.dumps(rows[-1]), flush=True)
    out = {"model": model, "turn_rows": TURN_ROWS, "new_tokens": NEW_TOK,
           "turns": rows}
    with open("CHAT_EXTEND_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
