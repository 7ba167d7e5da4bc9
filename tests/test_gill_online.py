"""Online GILL serving (GillOnlineEngine + the /v1/gill HTTP route):
streamed full-GILL decode must match the batch GILL engine, and the HTTP
surface must run the whole multimodal pipeline (decode -> [IMG] -> mapper
-> SD) for concurrent requests."""
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from gill_tpu.serve.gill_engine import GillDecodeEngine, GillServeRequest
from gill_tpu.serve.online import GillOnlineEngine

from test_gill_forward import make_core, IMG_START, NUM_TOKENS


@pytest.fixture(scope="module")
def core_params():
    core = make_core()
    params = core.init_params(jax.random.PRNGKey(3))
    return core, params


def _engine(core, params):
    return GillDecodeEngine(core, params, slots=2, max_seq=64, chunk=3,
                            prefill_buckets=(8, 16), unroll_layers=False,
                            kv_dtype=jnp.float32)


def test_gill_online_matches_batch(core_params):
    core, params = core_params
    rng = np.random.RandomState(2)
    cases = []
    for uid in range(5):
        embs = rng.randn(int(rng.randint(3, 12)),
                         core.lm_dim).astype(np.float32) * 0.02
        cases.append((uid, embs, int(rng.randint(2, 7)),
                      100.0 if uid % 2 == 0 else 1.0))

    batch = _engine(core, params).run(
        [GillServeRequest(uid=u, embs=e, num_words=nw, img_scale=sc)
         for u, e, nw, sc in cases])

    online = GillOnlineEngine(_engine(core, params))
    try:
        handles = [online.submit(e, nw, img_scale=sc)
                   for _, e, nw, sc in cases]
        for (u, *_), h in zip(cases, handles):
            toks = h.result(timeout=120)
            assert toks == batch[u]["tokens"], f"uid {u}"
            np.testing.assert_allclose(h.img_hidden,
                                       batch[u]["img_hidden"], atol=1e-5)
    finally:
        online.close()


def test_gill_online_streams_incrementally(core_params):
    core, params = core_params
    rng = np.random.RandomState(3)
    embs = rng.randn(6, core.lm_dim).astype(np.float32) * 0.02
    batch = _engine(core, params).run(
        [GillServeRequest(uid=0, embs=embs, num_words=8)])

    online = GillOnlineEngine(_engine(core, params))
    try:
        h = online.submit(embs, 8)
        streamed = list(h.stream())
        assert streamed == batch[0]["tokens"]
    finally:
        online.close()


def test_online_scheduler_crash_fails_handles(core_params):
    """A scheduler-side crash must FAIL the in-flight handles (raising
    from result()/stream()) rather than stranding their callers forever,
    and later submits must be rejected."""
    core, params = core_params
    online = GillOnlineEngine(_engine(core, params))

    def boom(*a, **k):
        raise RuntimeError("induced device failure")

    online.eng._chunk_fn = boom
    rng = np.random.RandomState(4)
    h = online.submit(rng.randn(5, core.lm_dim).astype(np.float32), 4)
    with pytest.raises(RuntimeError, match="induced device failure"):
        h.result(timeout=120)
    online._thread.join(timeout=60)
    with pytest.raises(RuntimeError, match="closed"):
        online.submit(rng.randn(5, core.lm_dim).astype(np.float32), 4)


def test_gill_online_cancel(core_params):
    """cancel() on the GILL engine: queued requests complete empty,
    in-flight ones return the streamed valid prefix (img taps stay None),
    the freed slot serves waiting work, finished handles are unaffected."""
    core, params = core_params
    rng = np.random.RandomState(9)
    embs = rng.randn(6, core.lm_dim).astype(np.float32) * 0.02
    full = _engine(core, params).run(
        [GillServeRequest(uid=0, embs=embs, num_words=30)])[0]["tokens"]
    short = _engine(core, params).run(
        [GillServeRequest(uid=0, embs=embs, num_words=4)])[0]["tokens"]

    online = GillOnlineEngine(_engine(core, params))   # 2 slots
    try:
        a = online.submit(embs, 30)
        it = a.stream()
        first = next(it)                  # a is in-flight
        b = online.submit(embs, 30)       # second slot
        c = online.submit(embs, 4)        # queued (2 slots)
        c.cancel()                        # queued cancel: completes empty
        assert c.result(timeout=60) == []
        a.cancel()                        # in-flight cancel: valid prefix
        got = a.result(timeout=60)
        assert [first] + list(it) == got
        assert 1 <= len(got) < 30
        assert got == full[:len(got)]
        assert a.img_hidden is None and a.img_runs is None
        # the other in-flight request is untouched...
        assert b.result(timeout=120) == full
        # ...and the freed slot serves new work to completion
        d = online.submit(embs, 4)
        assert d.result(timeout=120) == short
        d.cancel()                        # post-done cancel: no-op
        assert d.result(timeout=10) == short
        assert online.eng.stats["cancelled"] == 2
    finally:
        online.close()


def _tiny_gill():
    """Minimal GILL with tiny SD for the HTTP pipeline test (mirrors the
    test_api fixture, without retrieval/decision)."""
    from gill_tpu.api import GILL
    from gill_tpu.config import GILLConfig
    from gill_tpu.models.gill import GILLCore
    from gill_tpu.models.sd import unet as unet_mod
    from gill_tpu.models.sd import vae as vae_mod
    from gill_tpu.models.sd.pipeline import (StableDiffusionPipeline,
                                             tiny_sd_config)
    from gill_tpu.tokenizer import GPT2BPETokenizer, setup_gill_tokenizer

    from test_gill_forward import OPT_TINY, VIS_TINY

    tok = GPT2BPETokenizer.tiny()
    img_ids = setup_gill_tokenizer(tok, NUM_TOKENS)
    cfg = GILLConfig(n_visual_tokens=2, num_tokens=NUM_TOKENS,
                     num_clip_tokens=16, ret_emb_dim=8, gen_emb_dim=24,
                     image_size=16)
    core = GILLCore(cfg=cfg, opt_cfg=OPT_TINY, vis_cfg=VIS_TINY,
                    vocab_len=len(tok), img_start=img_ids[0],
                    pad_token_id=tok.pad_token_id,
                    bos_token_id=tok.bos_token_id)
    params = core.init_params(jax.random.PRNGKey(0))
    sd_cfg = tiny_sd_config()
    sd_cfg.unet.cross_attention_dim = 24
    sd_cfg.text.max_positions = 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    sd_params = {"unet": unet_mod.init(k1, sd_cfg.unet),
                 "vae_decoder": vae_mod.init_decoder(k2, sd_cfg.vae)}
    sd_pipe = StableDiffusionPipeline(sd_cfg, sd_params, tokenizer=None)
    return GILL(core, params, tok, sd_pipe=sd_pipe, num_gen_images=1)


def test_http_gill_route_end_to_end():
    from gill_tpu.serve.http import make_server

    model = _tiny_gill()
    srv = make_server(gill=model, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        import base64
        import io

        img = Image.fromarray(np.random.RandomState(0).randint(
            0, 255, (20, 24, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, "PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()

        bodies = [
            {"prompts": [{"image_b64": b64}, "Q: what?\nA:"],
             "num_words": 3, "gen_scale_factor": 1e6,
             "num_inference_steps": 2},
            {"prompts": ["a photo of"], "num_words": 3,
             "gen_scale_factor": 1e6, "num_inference_steps": 2},
            # multi-[IMG]: max_num_rets=2 through HTTP (tap ring)
            {"prompts": ["two pictures of"], "num_words": 3,
             "gen_scale_factor": 1e6, "num_inference_steps": 2,
             "max_num_rets": 2},
        ]
        results = [None] * len(bodies)

        def post(i):
            rq = urllib.request.Request(
                f"{base}/v1/gill", data=json.dumps(bodies[i]).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(rq, timeout=600) as r:
                results[i] = json.loads(r.read())["outputs"]

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(bodies))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        for i, outs in enumerate(results):
            assert outs is not None, f"request {i} did not complete"
            assert isinstance(outs[0], str) and "[IMG0]" in outs[0]
            d = outs[1]
            assert d["gen"] and "image_b64" in d["gen"][0]
            png = base64.b64decode(d["gen"][0]["image_b64"])
            im = Image.open(io.BytesIO(png))
            assert im.size == (16, 16)
        # the boosted max_num_rets=2 request emits two [IMG] runs -> two
        # image_outputs dicts (caption, dict, caption, dict)
        assert sum(isinstance(x, dict) for x in results[2]) == 2, results[2]

        # no-prompts -> 400
        rq = urllib.request.Request(
            f"{base}/v1/gill", data=b"{}",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(rq, timeout=60)
        assert e.value.code == 400

        # garbage image payload -> 400 (PIL raises an OSError subclass)
        bad = base64.b64encode(b"definitely not a PNG").decode()
        rq = urllib.request.Request(
            f"{base}/v1/gill",
            data=json.dumps({"prompts": [{"image_b64": bad}],
                             "num_words": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(rq, timeout=60)
        assert e.value.code == 400
    finally:
        srv.shutdown()
        for online in getattr(model, "_online_engines", {}).values():
            online.close()


def test_gill_online_prefix_caching_matches(core_params):
    """register_prefix rides the scheduler thread; suffix-only prefixed
    submissions produce the full-prompt tokens/taps and record hits."""
    core, params = core_params
    rng = np.random.RandomState(7)
    prefix = rng.randn(9, core.lm_dim).astype(np.float32) * 0.02
    suffixes = [rng.randn(int(rng.randint(1, 7)),
                          core.lm_dim).astype(np.float32) * 0.02
                for _ in range(4)]
    batch = _engine(core, params).run(
        [GillServeRequest(uid=i, embs=np.concatenate([prefix, sfx]),
                          num_words=5, img_scale=100.0)
         for i, sfx in enumerate(suffixes)])

    online = GillOnlineEngine(_engine(core, params))
    try:
        pid = online.register_prefix(prefix)
        # admission-time validation fails the caller, not the scheduler
        with pytest.raises(ValueError, match="unknown prefix_id"):
            online.submit(suffixes[0], 2, prefix_id=pid + 1)
        with pytest.raises(ValueError, match="prefix embs must be"):
            online.register_prefix(np.zeros((3,), np.float32))
        handles = [online.submit(sfx, 5, img_scale=100.0, prefix_id=pid)
                   for sfx in suffixes]
        for i, h in enumerate(handles):
            assert h.result(timeout=120) == batch[i]["tokens"], f"req {i}"
            np.testing.assert_allclose(h.img_hidden,
                                       batch[i]["img_hidden"], atol=2e-4)
        assert online.eng.stats["prefix_hits"] == len(suffixes)
    finally:
        online.close()


def test_http_gill_prefix_route():
    """/v1/gill_prefix registers a conversation prefix; /v1/gill calls
    with that prefix_id + suffix-only prompts reproduce the full-prompt
    caption (chat sessions do not resend history)."""
    from gill_tpu.serve.http import make_server

    model = _tiny_gill()
    srv = make_server(gill=model, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body):
        rq = urllib.request.Request(
            f"{base}{path}", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(rq, timeout=600) as r:
            return json.loads(r.read())

    try:
        history = ["You are a helpful assistant.\nQ: hi\nA: hello\n"]
        turn = ["Q: describe a dog\nA:"]
        full = post("/v1/gill", {"prompts": history + turn, "num_words": 4,
                                 "num_inference_steps": 2})["outputs"]

        pid = post("/v1/gill_prefix", {"prompts": history})["prefix_id"]
        cached = post("/v1/gill", {"prompts": turn, "num_words": 4,
                                   "num_inference_steps": 2,
                                   "prefix_id": pid})["outputs"]
        assert cached[0] == full[0], (cached[0], full[0])
        eng = next(iter(model._online_engines.values())).eng
        assert eng.stats["prefix_hits"] == 1

        # unknown prefix -> 400, not a scheduler crash
        with pytest.raises(urllib.error.HTTPError) as e:
            post("/v1/gill", {"prompts": turn, "num_words": 4,
                              "prefix_id": pid + 7})
        assert e.value.code == 400
    finally:
        srv.shutdown()


def test_http_gill_prefix_extend_incremental_chat():
    """Incremental chat over HTTP: register turn-1 history, extend with
    the turn-2 exchange (user prompt + generated reply text), and the
    turn-3 decode matches a fresh registration of the full history."""
    from gill_tpu.serve.http import make_server

    model = _tiny_gill()
    srv = make_server(gill=model, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body):
        rq = urllib.request.Request(
            f"{base}{path}", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(rq, timeout=600) as r:
            return json.loads(r.read())

    try:
        h1 = ["Q: one\nA: yes\n"]
        h2 = ["Q: two\nA: maybe\n"]
        turn = ["Q: three\nA:"]
        pid_full = post("/v1/gill_prefix", {"prompts": h1 + h2})["prefix_id"]
        want = post("/v1/gill", {"prompts": turn, "num_words": 4,
                                 "num_inference_steps": 2,
                                 "prefix_id": pid_full})["outputs"]

        pid0 = post("/v1/gill_prefix", {"prompts": h1})["prefix_id"]
        pid1 = post("/v1/gill_prefix", {"extend": pid0,
                                        "prompts": h2})["prefix_id"]
        got = post("/v1/gill", {"prompts": turn, "num_words": 4,
                                "num_inference_steps": 2,
                                "prefix_id": pid1})["outputs"]
        assert got[0] == want[0], (got[0], want[0])

        assert post("/v1/gill_prefix", {"drop": pid0}) == {"ok": True}
        with pytest.raises(urllib.error.HTTPError) as e:
            post("/v1/gill_prefix", {"extend": pid0, "prompts": h2})
        assert e.value.code == 400
    finally:
        srv.shutdown()
