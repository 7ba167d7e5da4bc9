"""Online serving layer (gill_tpu/serve/online.py + http.py): asynchronous
submission, token streaming, and the stdlib HTTP front-end must all produce
exactly the tokens the batch scheduler produces."""
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.config import OPTConfig
from gill_tpu.models import opt as opt_mod
from gill_tpu.serve.engine import DecodeEngine, ServeRequest
from gill_tpu.serve.http import make_server
from gill_tpu.serve.online import OnlineEngine


@pytest.fixture(scope="module")
def tiny():
    cfg = OPTConfig(num_layers=2, hidden_size=64, ffn_dim=128, num_heads=4,
                    vocab_size=128, max_positions=256,
                    word_embed_proj_dim=64)
    params = opt_mod.init(jax.random.PRNGKey(11), cfg)
    return params, cfg


def _engine(tiny, **kw):
    params, cfg = tiny
    kw.setdefault("slots", 3)
    kw.setdefault("max_seq", 64)
    kw.setdefault("chunk", 4)
    kw.setdefault("prefill_buckets", (8, 32))
    kw.setdefault("unroll_layers", False)
    kw.setdefault("kv_dtype", jnp.float32)
    params, cfg = tiny
    return DecodeEngine(params, cfg, **kw)


def _mk_reqs(n, seed):
    rng = np.random.RandomState(seed)
    return [(rng.randint(2, 120, size=int(rng.randint(3, 20))).tolist(),
             int(rng.randint(2, 12))) for _ in range(n)]


def test_online_matches_batch(tiny):
    reqs = _mk_reqs(8, 0)
    batch = _engine(tiny).run(
        [ServeRequest(uid=i, prompt=p, max_new_tokens=m)
         for i, (p, m) in enumerate(reqs)])

    online = OnlineEngine(_engine(tiny))
    try:
        handles = [online.submit(p, m) for p, m in reqs]
        for i, h in enumerate(handles):
            assert h.result(timeout=120) == batch[i], f"req {i}"
    finally:
        online.close()


def test_online_streaming_is_incremental(tiny):
    """stream() must yield the same tokens, and late-submitted requests
    must join the running batch (continuous intake)."""
    reqs = _mk_reqs(4, 1)
    batch = _engine(tiny).run(
        [ServeRequest(uid=i, prompt=p, max_new_tokens=m)
         for i, (p, m) in enumerate(reqs)])

    online = OnlineEngine(_engine(tiny))
    try:
        h0 = online.submit(*reqs[0])
        streamed = []
        it = h0.stream()
        streamed.append(next(it))        # first token arrives...
        # ...then submit more work mid-flight
        rest = [online.submit(p, m) for p, m in reqs[1:]]
        streamed.extend(it)
        assert streamed == batch[0]
        for i, h in enumerate(rest, start=1):
            assert h.result(timeout=120) == batch[i], f"req {i}"
    finally:
        online.close()


def test_online_submit_validates(tiny):
    online = OnlineEngine(_engine(tiny))
    try:
        with pytest.raises(ValueError):
            online.submit([5] * 60, 30)      # 60+30 > max_seq 64
    finally:
        online.close()


def test_http_server_end_to_end(tiny):
    reqs = _mk_reqs(3, 2)
    batch = _engine(tiny).run(
        [ServeRequest(uid=i, prompt=p, max_new_tokens=m)
         for i, (p, m) in enumerate(reqs)])

    online = OnlineEngine(_engine(tiny))
    srv = make_server(online, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read()) == {"ok": True}

        # concurrent non-stream posts share the slot pool
        results = [None] * len(reqs)

        def post(i):
            p, m = reqs[i]
            body = json.dumps({"prompt": p, "max_new_tokens": m}).encode()
            rq = urllib.request.Request(
                f"{base}/v1/generate", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(rq, timeout=300) as r:
                results[i] = json.loads(r.read())["tokens"]

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(reqs))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        for i in range(len(reqs)):
            assert results[i] == batch[i], f"req {i}"

        # streaming: NDJSON lines, one per token, then done
        p, m = reqs[0]
        body = json.dumps({"prompt": p, "max_new_tokens": m,
                           "stream": True}).encode()
        rq = urllib.request.Request(
            f"{base}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(rq, timeout=300) as r:
            lines = [json.loads(ln) for ln in r.read().splitlines() if ln]
        assert lines[-1]["done"] is True and lines[-1]["n"] == m
        assert [ln["token"] for ln in lines[:-1]] == batch[0]

        # bad request -> 400
        rq = urllib.request.Request(
            f"{base}/v1/generate", data=b'{"text": "hi"}',
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(rq, timeout=30)
        assert e.value.code == 400

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["lm"]["tokens_out"] >= sum(m for _, m in reqs)
    finally:
        srv.shutdown()
        online.close()


def test_cancel_queued_in_flight_and_done(tiny):
    """cancel() semantics: a queued request completes immediately with no
    tokens; an in-flight one completes with the streamed partial prefix
    and frees its slot for waiting work; a finished one is unaffected."""
    full = _engine(tiny, slots=1).run(
        [ServeRequest(uid=0, prompt=[7, 9, 11], max_new_tokens=40)])[0]
    want_c = _engine(tiny, slots=1).run(
        [ServeRequest(uid=0, prompt=[8, 4], max_new_tokens=5)])[0]

    online = OnlineEngine(_engine(tiny, slots=1))
    try:
        a = online.submit([7, 9, 11], 40)
        it = a.stream()
        first = next(it)                  # a is in-flight
        b = online.submit([5, 6], 30)     # queued behind a (1 slot)
        c = online.submit([8, 4], 5)      # queued
        b.cancel()                        # queued cancel: completes empty
        assert b.result(timeout=60) == []
        assert b.cancelled
        a.cancel()                        # in-flight cancel: partial prefix
        got = a.result(timeout=60)
        assert [first] + list(it) == got  # stream simply ends
        assert 1 <= len(got) < 40
        assert got == full[:len(got)]
        # the freed slot serves the still-waiting request to completion
        assert c.result(timeout=120) == want_c
        c.cancel()                        # post-done cancel: no-op
        assert c.result(timeout=10) == want_c
        assert online.eng.stats["cancelled"] == 2
    finally:
        online.close()


def test_http_stream_client_disconnect_cancels(tiny):
    """A client dropping mid-NDJSON-stream must cancel its request: the
    slot frees at the next chunk boundary and serves waiting work instead
    of decoding to completion for nobody."""
    import socket
    import struct
    import time

    want = _engine(tiny, slots=1).run(
        [ServeRequest(uid=0, prompt=[5, 6], max_new_tokens=4)])[0]
    online = OnlineEngine(_engine(tiny, slots=1))
    srv = make_server(online, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        body = json.dumps({"prompt": [7, 9, 11], "max_new_tokens": 50,
                           "stream": True}).encode()
        raw = (b"POST /v1/generate HTTP/1.1\r\nHost: t\r\n"
               b"Content-Type: application/json\r\n"
               + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        s = socket.create_connection(("127.0.0.1", port))
        s.sendall(raw)
        assert s.recv(1)                  # stream started (headers landed)
        # abort with RST so the server's next unbuffered chunk write fails
        s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                     struct.pack("ii", 1, 0))
        s.close()
        deadline = time.time() + 60
        while (online.eng.stats.get("cancelled", 0) < 1
               and time.time() < deadline):
            time.sleep(0.02)
        assert online.eng.stats.get("cancelled", 0) == 1
        # the freed slot still serves new work correctly
        assert online.submit([5, 6], 4).result(timeout=120) == want
    finally:
        srv.shutdown()
        online.close()


def test_online_prefix_caching_matches(tiny):
    """register_prefix rides the scheduler thread; prefixed submissions
    produce the full-prefill tokens and record prefix hits."""
    rng = np.random.RandomState(5)
    prefix = rng.randint(2, 120, size=9).tolist()
    suffixes = [rng.randint(2, 120, size=int(rng.randint(1, 8))).tolist()
                for _ in range(4)]
    batch = _engine(tiny).run(
        [ServeRequest(uid=i, prompt=prefix + sfx, max_new_tokens=5)
         for i, sfx in enumerate(suffixes)])

    online = OnlineEngine(_engine(tiny))
    try:
        pid = online.register_prefix(prefix)
        # admission-time validation: bad references fail the caller
        with pytest.raises(ValueError, match="unknown prefix_id"):
            online.submit(prefix + [9], 2, prefix_id=pid + 1)
        with pytest.raises(ValueError, match="extend prefix"):
            online.submit([9] + prefix, 2, prefix_id=pid)
        handles = [online.submit(prefix + sfx, 5, prefix_id=pid)
                   for sfx in suffixes]
        for i, h in enumerate(handles):
            assert h.result(timeout=120) == batch[i], f"req {i}"
        assert online.eng.stats["prefix_hits"] == len(suffixes)
    finally:
        online.close()


def test_http_prefix_route(tiny):
    rng = np.random.RandomState(6)
    prefix = rng.randint(2, 120, size=7).tolist()
    sfx = rng.randint(2, 120, size=4).tolist()
    batch = _engine(tiny).run(
        [ServeRequest(uid=0, prompt=prefix + sfx, max_new_tokens=5)])

    online = OnlineEngine(_engine(tiny))
    srv = make_server(online, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        rq = urllib.request.Request(
            f"{base}/v1/prefix", data=json.dumps({"prompt": prefix}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(rq, timeout=300) as r:
            reg = json.loads(r.read())
        assert reg["len"] == len(prefix)

        body = json.dumps({"prompt": prefix + sfx, "max_new_tokens": 5,
                           "prefix_id": reg["prefix_id"]}).encode()
        rq = urllib.request.Request(
            f"{base}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(rq, timeout=300) as r:
            assert json.loads(r.read())["tokens"] == batch[0]

        # bad prefix reference -> 400, engine stays alive
        body = json.dumps({"prompt": [9, 9], "max_new_tokens": 2,
                           "prefix_id": 999}).encode()
        rq = urllib.request.Request(
            f"{base}/v1/generate", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(rq, timeout=30)
        assert e.value.code == 400
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read()) == {"ok": True}
    finally:
        srv.shutdown()
        online.close()


def test_http_prefix_extend_and_drop(tiny):
    """/v1/prefix {"extend": pid} grows a prefix by prefilling only the
    new tokens; {"drop": pid} frees it and later references 400."""
    rng = np.random.RandomState(8)
    base = rng.randint(2, 120, size=6).tolist()
    turn = rng.randint(2, 120, size=4).tolist()
    sfx = rng.randint(2, 120, size=3).tolist()
    want = _engine(tiny).run(
        [ServeRequest(uid=0, prompt=base + turn + sfx, max_new_tokens=5)])

    online = OnlineEngine(_engine(tiny))
    srv = make_server(online, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    addr = f"http://127.0.0.1:{port}"

    def post(body):
        rq = urllib.request.Request(
            f"{addr}/v1/prefix", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(rq, timeout=120) as r:
            return json.loads(r.read())

    try:
        pid0 = post({"prompt": base})["prefix_id"]
        ext = post({"extend": pid0, "prompt": turn})
        assert ext["len"] == len(turn)
        pid1 = ext["prefix_id"]
        rq = urllib.request.Request(
            f"{addr}/v1/generate",
            data=json.dumps({"prompt": base + turn + sfx,
                             "max_new_tokens": 5,
                             "prefix_id": pid1}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(rq, timeout=120) as r:
            assert json.loads(r.read())["tokens"] == want[0]

        assert post({"drop": pid0}) == {"ok": True}
        with pytest.raises(urllib.error.HTTPError) as e:
            post({"extend": pid0, "prompt": turn})
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            post({"drop": pid0})
        assert e.value.code == 400
    finally:
        srv.shutdown()
        online.close()
