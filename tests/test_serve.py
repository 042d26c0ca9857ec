"""Serving endpoint tests: POST /predict parity (reference serving.py:42-55)
with ids-mode requests over a live stdlib HTTP server on tiny models."""

import http.client
import json
import threading

import numpy as np

from llmspeculativesampling_tpu.core.synthetic import synthetic_pair
from llmspeculativesampling_tpu.serve import (
    BatchedInferenceServer,
    InferenceServer,
    ServerConfig,
    make_http_server,
)


def _tiny_server():
    bd, pd, bt, pt = synthetic_pair(
        "llama", hidden_size=64, num_layers=4, draft_layers=2, num_heads=4,
        vocab_size=256, max_position=512, dtype="float32")
    return InferenceServer(bd, pd, bt, pt, None, ServerConfig(num_tokens=8))


def test_process_request_ids_mode():
    srv = _tiny_server()
    prompt = list(np.random.default_rng(0).integers(5, 250, 16))
    text, out = srv.process_request({"prompt_ids": prompt})
    assert text is None
    assert out[:16].tolist() == prompt
    assert len(out) > 16
    assert srv.stats.snapshot()["requests"] == 1


def test_http_predict_roundtrip():
    srv = _tiny_server()
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        prompt = list(range(10, 26))

        # wrong content type -> error body (serving.py:45-46)
        conn.request("POST", "/predict", "x", {"Content-Type": "text/plain"})
        assert json.loads(conn.getresponse().read())["error"] == "Invalid content type"

        body = json.dumps({"prompt_ids": prompt, "max_tokens": 8})
        conn.request("POST", "/predict", body, {"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert resp["output_ids"][:16] == prompt
        assert len(resp["output_ids"]) > 16

        # text prompt without a tokenizer -> 500 with message
        conn.request("POST", "/predict", json.dumps({"prompt": "hi"}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 500 and "tokenizer" in json.loads(r.read())["error"]

        conn.request("GET", "/health")
        assert json.loads(conn.getresponse().read())["status"] == "ok"
        conn.request("GET", "/stats")
        assert json.loads(conn.getresponse().read())["requests"] >= 1
    finally:
        httpd.shutdown()


def test_paged_engine_behind_http_front_door():
    """--paged serving path (VERDICT r1 #8): the paged block-pool engine
    behind the BatchedInferenceServer condition-variable front end, driven
    through a live HTTP round trip with prefix caching on."""
    from llmspeculativesampling_tpu.serve.paged import PagedEngine

    base = _tiny_server()
    c = base.config
    engine = PagedEngine(
        base.bundle_d, base.params_d, base.bundle_t, base.params_t,
        batch_rows=2, num_blocks=16, page=32, gamma=c.gamma,
        eos_token_id=c.eos_token_id, temperature=c.temperature,
        top_k=c.top_k, top_p=c.top_p, prefix_cache=True, prompt_bucket=16,
    )
    srv = BatchedInferenceServer(base, engine=engine)
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        prompt = list(range(10, 26))
        for _ in range(2):  # second request repeats the prefix (cache hit path)
            body = json.dumps({"prompt_ids": prompt, "max_tokens": 6})
            conn.request("POST", "/predict", body,
                         {"Content-Type": "application/json"})
            resp = json.loads(conn.getresponse().read())
            assert resp["output_ids"][:16] == prompt
            assert len(resp["output_ids"]) > 16
        conn.request("GET", "/stats")
        assert json.loads(conn.getresponse().read())["requests"] == 2
    finally:
        httpd.shutdown()
        srv.shutdown()


def test_server_cli_paged_flags():
    """python -m ...serve.server --paged --prefix_cache wires a PagedEngine
    (flag plumbing only; no socket)."""
    import llmspeculativesampling_tpu.serve.server as S
    from llmspeculativesampling_tpu.serve.paged import PagedEngine

    captured = {}

    def fake_http(srv, host, port):
        captured["srv"] = srv

        class Dummy:
            def serve_forever(self):
                pass

        return Dummy()

    orig = S.make_http_server
    orig_pre = S.InferenceServer.from_pretrained
    S.make_http_server = fake_http
    S.InferenceServer.from_pretrained = classmethod(
        lambda cls, a, t, config=None: _tiny_server())
    try:
        S.main(["--paged", "--prefix_cache", "--num_slots", "2",
                "--num_blocks", "8", "--page", "32"])
        srv = captured["srv"]
        assert isinstance(srv.engine, PagedEngine)
        assert srv.engine.prefix_cache
        srv.shutdown()
    finally:
        S.make_http_server = orig
        S.InferenceServer.from_pretrained = orig_pre


def test_batched_server_concurrent_requests():
    """Concurrent POSTs share the slot batch (continuous batching, M7)."""
    srv = BatchedInferenceServer(_tiny_server(), num_slots=3, max_total_len=256)
    try:
        rng = np.random.default_rng(1)
        prompts = [list(rng.integers(5, 250, int(n))) for n in (12, 20, 7, 16)]
        results = [None] * len(prompts)

        def work(i):
            _, out = srv.process_request(
                {"prompt_ids": prompts[i], "max_tokens": 6 + i})
            results[i] = out

        threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i, out in enumerate(results):
            assert out is not None, f"request {i} did not complete"
            p = len(prompts[i])
            assert out[:p].tolist() == prompts[i]
            assert len(out) > p
        assert srv.stats.snapshot()["requests"] == 4
    finally:
        srv.shutdown()


def test_paged_multihost_driver_single_process():
    """PagedMultiHostDriver at process_count=1: trivial broadcast, but the
    full release-plan / inject / step cadence runs, with completions
    identical to direct engine submission."""
    import jax

    from llmspeculativesampling_tpu.core.config import LlamaConfig
    from llmspeculativesampling_tpu.engine.types import ModelBundle
    from llmspeculativesampling_tpu.models import llama
    from llmspeculativesampling_tpu.serve.multihost import PagedMultiHostDriver
    from llmspeculativesampling_tpu.serve.paged import PagedEngine

    def build():
        cfg_t = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=4, max_position=2048,
            dtype="float32")
        cfg_d = LlamaConfig(**{**cfg_t.__dict__, "num_layers": 1})
        pt = llama.init_params(cfg_t, jax.random.key(0))
        pd = {
            "embed": pt["embed"], "ln_final": pt["ln_final"],
            "lm_head": pt["lm_head"],
            "layers": jax.tree.map(lambda x: x[:1], pt["layers"]),
        }
        return PagedEngine(
            ModelBundle("llama", cfg_d, llama.forward), pd,
            ModelBundle("llama", cfg_t, llama.forward), pt,
            batch_rows=2, num_blocks=16, page=32, max_pages_per_req=4,
            max_new_cap=16, gamma=2, eos_token_id=-1, top_k=10, top_p=0.9,
            prompt_bucket=16, steps_per_sync=2)

    prompts = [list(range(5, 15)), list(range(30, 42)), list(range(50, 60))]

    ref = build()
    ref_rids = [ref.submit(p, 8) for p in prompts]
    ref.run_until_idle()
    ref_outs = {r: ref.result(r).output_ids for r in ref_rids}

    drv = PagedMultiHostDriver(build(), prompt_cap=32, batch_cap=2)
    rids = [drv.submit(p, 8) for p in prompts]
    drv.run_until_idle()
    for rid in rids:
        c = drv.result(rid)
        assert c is not None
        np.testing.assert_array_equal(c.output_ids, ref_outs[rid])


def test_stats_percentiles_and_streaming():
    """VERDICT r3 ask #8: /stats reports TTFT/latency percentiles and
    POST /predict {"stream": true} returns SSE events with tokens
    arriving incrementally (multiple data events before done)."""
    from llmspeculativesampling_tpu.serve.paged import PagedEngine

    base = _tiny_server()
    base.config.eos_token_id = -1  # random weights: never end early
    c = base.config
    engine = PagedEngine(
        base.bundle_d, base.params_d, base.bundle_t, base.params_t,
        batch_rows=2, num_blocks=16, page=32, gamma=2,
        eos_token_id=c.eos_token_id, temperature=c.temperature,
        top_k=c.top_k, top_p=c.top_p, prompt_bucket=16, steps_per_sync=2,
    )
    srv = BatchedInferenceServer(base, engine=engine)
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        prompt = list(range(10, 26))
        body = json.dumps({"prompt_ids": prompt, "max_tokens": 24,
                           "stream": True})
        conn.request("POST", "/predict", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.getheader("Content-Type") == "text/event-stream"
        events = []
        for line in resp.read().decode().splitlines():
            if line.startswith("data: "):
                events.append(json.loads(line[len("data: "):]))
        assert events[-1] == {"done": True}
        tok_events = [e for e in events[:-1]]
        # several chunks: at gamma=2 / steps_per_sync=2 a 24-token
        # generation spans multiple sync chunks
        assert len(tok_events) >= 2, events
        streamed = [t for e in tok_events for t in e["token_ids"]]
        assert len(streamed) >= 24

        # non-streaming request on the same engine must agree on shape
        conn.request("POST", "/predict",
                     json.dumps({"prompt_ids": prompt, "max_tokens": 8}),
                     {"Content-Type": "application/json"})
        r2 = json.loads(conn.getresponse().read())
        assert len(r2["output_ids"]) > 16

        conn.request("GET", "/stats")
        st = json.loads(conn.getresponse().read())
        assert st["requests"] == 2
        assert st["ttft_p50_s"] is not None and st["ttft_p50_s"] >= 0
        assert st["ttft_p95_s"] >= st["ttft_p50_s"]
        assert st["latency_p50_s"] > 0 and st["latency_p95_s"] > 0
    finally:
        httpd.shutdown()
        srv.shutdown()


def test_streaming_on_slotted_engine():
    """process_request_stream works on the slotted engine too (both
    engines expose partial_result)."""
    srv = BatchedInferenceServer(_tiny_server(), num_slots=2,
                                 max_total_len=256)
    try:
        prompt = list(range(10, 26))
        chunks = list(srv.process_request_stream(
            {"prompt_ids": prompt, "max_tokens": 16}))
        assert len(chunks) >= 1
        total = sum(len(c) for c in chunks)
        assert total >= 16
        st = srv.stats.snapshot()
        assert st["requests"] == 1 and st["ttft_p50_s"] is not None
    finally:
        srv.shutdown()


class _SpacedTok:
    """Fake tokenizer whose decode is context-dependent (like BPE
    leading-space markers): tokens join with spaces, so decoding a chunk
    in isolation loses the separator a cumulative decode would emit."""

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


def test_sse_text_is_cumulative_suffix_decode():
    """ADVICE r4: SSE events must carry the SUFFIX of a cumulative
    decode, not per-chunk isolated decodes — concatenating the streamed
    text must reproduce the full decode exactly."""
    base = _tiny_server()
    base.config.eos_token_id = -1
    base.tokenizer = _SpacedTok()
    srv = BatchedInferenceServer(base, num_slots=2, max_total_len=256)
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        body = json.dumps({"prompt_ids": list(range(10, 26)),
                           "max_tokens": 16, "stream": True})
        conn.request("POST", "/predict", body,
                     {"Content-Type": "application/json"})
        events = [json.loads(l[6:])
                  for l in conn.getresponse().read().decode().splitlines()
                  if l.startswith("data: ")]
        assert events[-1] == {"done": True}
        toks = [t for e in events[:-1] for t in e["token_ids"]]
        text = "".join(e["text"] for e in events[:-1])
        assert text == _SpacedTok().decode(toks), (text, toks)
    finally:
        httpd.shutdown()
        srv.shutdown()


def test_stream_disconnect_does_not_leak_results():
    """ADVICE r4: a client that disappears mid-stream must not leave the
    finished request's Completion parked in _results forever."""
    import time

    base = _tiny_server()
    base.config.eos_token_id = -1
    srv = BatchedInferenceServer(base, num_slots=2, max_total_len=256)
    try:
        gen = srv.process_request_stream(
            {"prompt_ids": list(range(10, 26)), "max_tokens": 24})
        next(gen)        # first chunk arrives...
        gen.close()      # ...then the client goes away
        deadline = time.time() + 60
        while time.time() < deadline:
            with srv._cv:
                idle = (not srv.engine._pending
                        and srv.engine.num_active == 0
                        and not srv._results and not srv._abandoned)
            if idle:
                break
            time.sleep(0.05)
        assert not srv._results, srv._results
        assert not srv._abandoned
    finally:
        srv.shutdown()


def test_streaming_fallback_on_plain_server():
    """Without a batching engine the SSE route degrades to one final
    chunk + done (the lock-serialized path has no incremental state)."""
    srv = _tiny_server()
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        body = json.dumps({"prompt_ids": list(range(10, 26)),
                           "max_tokens": 8, "stream": True})
        conn.request("POST", "/predict", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.getheader("Content-Type") == "text/event-stream"
        events = [json.loads(l[6:]) for l in resp.read().decode().splitlines()
                  if l.startswith("data: ")]
        assert events[-1] == {"done": True}
        assert len(events) == 2 and len(events[0]["token_ids"]) >= 16 + 8
    finally:
        httpd.shutdown()


class _HalfCharTok:
    """Emulates byte-level BPE at a split multi-byte character: an ODD
    trailing id decodes as U+FFFD (incomplete UTF-8 bytes, like GPT-2 /
    Llama byte-level tokenizers); once a further id follows, the pair
    decodes as one complete character — i.e. a cumulative decode can
    REWRITE its tail, not just extend it."""

    def decode(self, ids, skip_special_tokens=True):
        out, i, ids = [], 0, [int(x) for x in ids]
        while i < len(ids):
            if ids[i] % 2 == 1:
                if i + 1 < len(ids):
                    out.append(chr(0x100 + (ids[i] + ids[i + 1]) % 0x100))
                    i += 2
                else:
                    out.append("�")
                    i += 1
            else:
                out.append(chr(0x30 + ids[i] % 10))
                i += 1
        return "".join(out)


def test_sse_holds_back_incomplete_multibyte_tail():
    """A chunk boundary that lands mid-character makes the cumulative
    decode end in U+FFFD, which the NEXT chunk rewrites into the real
    character — naive suffix emission (full[len(prev):]) then drops the
    correction and streams garbage. The handler must withhold the
    unresolved tail and flush it at the end, so the concatenated streamed
    text equals the full decode exactly."""
    base = _tiny_server()
    base.config.eos_token_id = -1
    base.tokenizer = _HalfCharTok()
    srv = BatchedInferenceServer(base, num_slots=2, max_total_len=256)
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        body = json.dumps({"prompt_ids": list(range(10, 26)),
                           "max_tokens": 24, "stream": True})
        conn.request("POST", "/predict", body,
                     {"Content-Type": "application/json"})
        events = [json.loads(l[6:])
                  for l in conn.getresponse().read().decode().splitlines()
                  if l.startswith("data: ")]
        assert events[-1] == {"done": True}
        toks = [t for e in events[:-1] for t in e["token_ids"]]
        text = "".join(e.get("text", "") for e in events[:-1])
        assert text == _HalfCharTok().decode(toks), (text, toks)
    finally:
        httpd.shutdown()
        srv.shutdown()
