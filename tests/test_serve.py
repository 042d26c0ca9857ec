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
