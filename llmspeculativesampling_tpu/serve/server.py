"""Serving endpoint (L4) — reference ``serving.py`` equivalent, TPU-native.

Parity surface (/root/reference/serving.py:15-61): a ``Server`` that loads
a draft + target pair at startup, a ``POST /predict`` JSON route with a
content-type check (:45-46), defaults num_tokens=40 top_k=10 top_p=0.9
(:25-27), and speculative sampling under the hood (:33-37).

TPU-native differences:
  * stdlib ``ThreadingHTTPServer`` instead of Flask (not in the image);
  * requests are serialized through a lock around the jitted engine call —
    the decode step is one compiled program per (bucket, gamma) so repeat
    requests hit the jit cache (first request pays compilation);
  * ids-in/ids-out mode ({"prompt_ids": [...]}) works with no tokenizer,
    keeping the engine/tokenizer split (SURVEY.md §7.3);
  * /health and /stats endpoints for load balancers — /stats includes
    TTFT and latency p50/p95 over the last 1024 requests;
  * SSE streaming: POST /predict {"stream": true} emits committed-token
    chunks incrementally (behind a batching engine; the reference's
    serving.py is strictly blocking).

Both continuous-batching engines run behind this same front door:
``--num_slots`` wires the slotted scheduler (serve/scheduler.py) and
``--paged`` the paged engine (serve/paged.py, optional ``--prefix_cache``
/ ``--kv_quant``) through ``BatchedInferenceServer``; without either, the
single-request lock-serialized path above is used.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np
import jax

from ..engine import speculative_generate
from ..engine.types import ModelBundle


@dataclass
class ServerConfig:
    num_tokens: int = 40          # serving.py:25
    top_k: int = 10               # serving.py:26
    top_p: float = 0.9            # serving.py:27
    temperature: float = 1.0
    gamma: int = 4
    eos_token_id: int = 2


@dataclass
class ServerStats:
    requests: int = 0
    tokens_generated: int = 0
    total_time_s: float = 0.0
    window: int = 1024            # last-N window for the percentiles
    _ttfts: "collections.deque" = None
    _lats: "collections.deque" = None
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def __post_init__(self):
        import collections

        self._ttfts = collections.deque(maxlen=self.window)
        self._lats = collections.deque(maxlen=self.window)

    def record(self, tokens: int, dt: float, ttft_s: Optional[float] = None):
        with self._lock:
            self.requests += 1
            self.tokens_generated += tokens
            self.total_time_s += dt
            self._lats.append(dt)
            if ttft_s is not None:
                self._ttfts.append(ttft_s)

    @staticmethod
    def _pct(xs, q):
        return round(float(np.percentile(list(xs), q)), 4) if xs else None

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "requests": self.requests,
                "tokens_generated": self.tokens_generated,
                "total_time_s": round(self.total_time_s, 3),
                "tokens_per_s": round(
                    self.tokens_generated / self.total_time_s, 2
                ) if self.total_time_s else 0.0,
                # per-request latency percentiles over the last `window`
                # requests; TTFT comes from the batching engines'
                # admission timestamps (VERDICT r3 ask #8) and is null on
                # the lock-serialized single-request path
                "ttft_p50_s": self._pct(self._ttfts, 50),
                "ttft_p95_s": self._pct(self._ttfts, 95),
                "latency_p50_s": self._pct(self._lats, 50),
                "latency_p95_s": self._pct(self._lats, 95),
            }


class InferenceServer:
    """Reference ``Server`` equivalent (serving.py:15-39)."""

    def __init__(
        self,
        bundle_d: ModelBundle,
        params_d,
        bundle_t: ModelBundle,
        params_t,
        tokenizer=None,
        config: Optional[ServerConfig] = None,
        seed: int = 0,
    ):
        self.bundle_d, self.params_d = bundle_d, params_d
        self.bundle_t, self.params_t = bundle_t, params_t
        self.tokenizer = tokenizer
        self.config = config or ServerConfig()
        self.stats = ServerStats()
        self._key = jax.random.key(seed)
        self._lock = threading.Lock()

    @classmethod
    def from_pretrained(cls, approx_model_name: str, target_model_name: str,
                        config: Optional[ServerConfig] = None):
        """Load local checkpoint dirs (or 'synthetic') like serving.py:16-23."""
        if "synthetic" in (approx_model_name, target_model_name):
            from ..core.synthetic import synthetic_pair

            bd, pd, bt, pt = synthetic_pair()
            return cls(bd, pd, bt, pt, None, config)
        from ..core.loader import load_pretrained
        from ..models import llama as llama_mod
        from ..models import opt as opt_mod

        fwd = {"llama": llama_mod.forward, "opt": opt_mod.forward}
        fam_d, cfg_d, pd = load_pretrained(approx_model_name)
        fam_t, cfg_t, pt = load_pretrained(target_model_name)
        tokenizer = None
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(approx_model_name)
        except Exception:
            pass
        cfg = config or ServerConfig()
        if tokenizer is not None and tokenizer.eos_token_id is not None:
            cfg.eos_token_id = tokenizer.eos_token_id
        return cls(ModelBundle(fam_d, cfg_d, fwd[fam_d]), pd,
                   ModelBundle(fam_t, cfg_t, fwd[fam_t]), pt, tokenizer, cfg)

    def process_request(self, request: dict):
        """serving.py:29-38 equivalent; accepts 'prompt' (text, needs a
        tokenizer) or 'prompt_ids' (raw ids). Returns (text|None, ids)."""
        c = self.config
        if "prompt_ids" in request:
            ids = np.asarray(request["prompt_ids"], np.int32).reshape(-1)
        else:
            if self.tokenizer is None:
                raise ValueError("text prompt requires a tokenizer; send prompt_ids")
            ids = np.asarray(self.tokenizer.encode(request["prompt"]), np.int32)
        num_tokens = int(request.get("max_tokens", c.num_tokens))
        t0 = time.perf_counter()
        with self._lock:
            self._key, sub = jax.random.split(self._key)
            out = speculative_generate(
                self.bundle_d, self.params_d, self.bundle_t, self.params_t,
                ids, num_tokens, gamma=c.gamma, eos_token_id=c.eos_token_id,
                temperature=c.temperature, top_k=c.top_k, top_p=c.top_p, key=sub,
            )
        dt = time.perf_counter() - t0
        out = np.asarray(out)
        self.stats.record(len(out) - len(ids), dt)
        text = None
        if self.tokenizer is not None:
            text = self.tokenizer.decode(out.tolist(), skip_special_tokens=True)
        return text, out


class BatchedInferenceServer:
    """Continuous-batching front end: concurrent ``process_request`` calls
    share the slot batch of a ``ContinuousBatchingEngine`` (or, via the
    ``engine=`` hook, the paged engine) instead of serializing through a
    lock — replacing the reference's blocking one-at-a-time loop
    (serving.py:29-38).

    A daemon thread advances the engine whenever work is queued; request
    threads block on a condition until their rid completes.
    """

    def __init__(self, server: InferenceServer, num_slots: int = 4,
                 max_total_len: int = 1024, max_new_cap: int = 256,
                 engine=None):
        c = server.config
        self.tokenizer = server.tokenizer
        self.config = c
        self.stats = server.stats
        if engine is not None:
            # any engine with the scheduler interface (submit / step /
            # result / completions / _pending / num_active) — used to put
            # the paged engine behind the HTTP front door (VERDICT r1 #8)
            self.engine = engine
        else:
            from .scheduler import ContinuousBatchingEngine

            self.engine = ContinuousBatchingEngine(
                server.bundle_d, server.params_d, server.bundle_t,
                server.params_t,
                num_slots=num_slots, max_total_len=max_total_len,
                max_new_cap=max_new_cap, gamma=c.gamma,
                eos_token_id=c.eos_token_id,
                temperature=c.temperature, top_k=c.top_k, top_p=c.top_p,
            )
        self._cv = threading.Condition()
        self._results: dict = {}
        # rids whose client went away mid-stream: their completion (which
        # may arrive many steps later) is discarded instead of parking in
        # _results forever (ADVICE r4: unbounded growth on long-running
        # servers)
        self._abandoned: set = set()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while not self._stop:
            with self._cv:
                busy = bool(self.engine._pending) or self.engine.num_active > 0
                if not busy:
                    self._cv.wait(timeout=0.05)
                    continue
                self.engine.step()
                if self.engine.completions:
                    for rid in list(self.engine.completions):
                        comp = self.engine.result(rid)
                        if rid in self._abandoned:
                            self._abandoned.discard(rid)
                        else:
                            self._results[rid] = comp
                # wake after every step (not only on completions):
                # streaming requests poll partial_result between steps
                self._cv.notify_all()
            # hand the lock over for one scheduler tick — without this
            # the loop re-acquires before any woken waiter can run
            # (lock barging) and streams only ever see the final state
            time.sleep(0.001)

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=5)

    def process_request(self, request: dict):
        c = self.config
        if "prompt_ids" in request:
            ids = np.asarray(request["prompt_ids"], np.int32).reshape(-1)
        else:
            if self.tokenizer is None:
                raise ValueError("text prompt requires a tokenizer; send prompt_ids")
            ids = np.asarray(self.tokenizer.encode(request["prompt"]), np.int32)
        num_tokens = int(request.get("max_tokens", c.num_tokens))
        t0 = time.perf_counter()
        with self._cv:
            rid = self.engine.submit(ids, num_tokens)
            self._cv.notify_all()
            while rid not in self._results:
                self._cv.wait(timeout=1.0)
            comp = self._results.pop(rid)
        self.stats.record(comp.details["tokens_generated"],
                          time.perf_counter() - t0,
                          ttft_s=comp.details.get("ttft_s"))
        text = None
        if self.tokenizer is not None:
            text = self.tokenizer.decode(comp.output_ids.tolist(), skip_special_tokens=True)
        return text, comp.output_ids

    def process_request_stream(self, request: dict):
        """Streaming variant: yields ``np.ndarray`` chunks of NEW token
        ids as the engine commits them (the speculative accept loop
        commits several per verify step), ending after the final chunk.
        Powers the SSE mode of ``POST /predict`` (``"stream": true``) —
        the reference's serving.py has no streaming; this surfaces the
        continuous-batching engines' incremental progress at the API."""
        c = self.config
        if "prompt_ids" in request:
            ids = np.asarray(request["prompt_ids"], np.int32).reshape(-1)
        else:
            if self.tokenizer is None:
                raise ValueError("text prompt requires a tokenizer; send prompt_ids")
            ids = np.asarray(self.tokenizer.encode(request["prompt"]), np.int32)
        num_tokens = int(request.get("max_tokens", c.num_tokens))
        t0 = time.perf_counter()
        sent = len(ids)
        rid = None
        comp = None
        try:
            with self._cv:
                rid = self.engine.submit(ids, num_tokens)
                self._cv.notify_all()
                while True:
                    if rid in self._results:
                        comp = self._results.pop(rid)
                        break
                    part = self.engine.partial_result(rid)
                    if part is not None and len(part) > sent:
                        chunk = np.asarray(part[sent:])
                        # committed-but-not-yet-truncated tokens can trail
                        # the EOS; cut the stream there (harvest will
                        # truncate output_ids the same way)
                        eos_at = np.nonzero(chunk == c.eos_token_id)[0]
                        if eos_at.size:
                            chunk = chunk[: int(eos_at[0]) + 1]
                        sent += len(chunk)
                        # release the lock while the consumer writes
                        self._cv.release()
                        try:
                            yield chunk
                        finally:
                            self._cv.acquire()
                        if eos_at.size:
                            while rid not in self._results:
                                self._cv.wait(timeout=0.05)
                        continue
                    self._cv.wait(timeout=0.05)
            out = np.asarray(comp.output_ids)
            if len(out) > sent:
                yield out[sent:]
        finally:
            # client disconnect closes the generator at a yield: still
            # account the request and make sure its completion doesn't
            # park in _results forever (ADVICE r4)
            if comp is not None:
                self.stats.record(comp.details["tokens_generated"],
                                  time.perf_counter() - t0,
                                  ttft_s=comp.details.get("ttft_s"))
            elif rid is not None:
                with self._cv:
                    if rid in self._results:
                        comp = self._results.pop(rid)
                        self.stats.record(comp.details["tokens_generated"],
                                          time.perf_counter() - t0,
                                          ttft_s=comp.details.get("ttft_s"))
                    else:
                        self._abandoned.add(rid)


def make_http_server(server, host: str = "0.0.0.0",
                     port: int = 5000) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            elif self.path == "/stats":
                snap = server.stats.snapshot()
                # device observability: HBM occupancy per accelerator.
                # (TPU power draw is not exposed by the runtime — the
                # reference's gpu_power_monitor.py has no TPU analogue;
                # utils/power.py provides the host-RAPL J/token proxy.)
                try:
                    d = jax.devices()[0]
                    ms = d.memory_stats() or {}
                    snap["device"] = str(d)
                    if "bytes_in_use" in ms:
                        snap["hbm_bytes_in_use"] = int(ms["bytes_in_use"])
                    if "bytes_limit" in ms:
                        snap["hbm_bytes_limit"] = int(ms["bytes_limit"])
                except Exception:  # noqa: BLE001 — stats must never 500
                    pass
                self._send(200, snap)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "not found"})
                return
            # content-type check: serving.py:45-46
            if "application/json" not in self.headers.get("Content-Type", ""):
                self._send(200, {"error": "Invalid content type"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                if req.get("stream"):
                    self._stream(req)
                    return
                text, ids = server.process_request(req)
                resp = {"output_ids": ids.tolist()}
                if text is not None:
                    resp["text"] = text
                self._send(200, resp)
            except Exception as e:  # noqa: BLE001 — surface as JSON like Flask
                self._send(500, {"error": str(e)})

        def _stream(self, req):
            """SSE response: one ``data:`` event per committed chunk of
            new tokens (several per verify step under speculation), then
            a ``done`` event. Requires a batching engine
            (process_request_stream); the lock-serialized path falls
            back to a single final chunk."""
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()

            def emit(obj):
                self.wfile.write(f"data: {json.dumps(obj)}\n\n".encode())
                self.wfile.flush()

            tok = getattr(server, "tokenizer", None)
            try:
                if hasattr(server, "process_request_stream"):
                    # decode cumulatively and emit the text SUFFIX per
                    # event: BPE/byte-level tokenizers produce wrong text
                    # when chunks are decoded in isolation (split
                    # multi-byte chars, leading-space markers; ADVICE r4).
                    # Bounded cost: once the live tail exceeds 384
                    # tokens, everything but the last 128 is FROZEN
                    # (decoded once) — re-decoding the whole sequence per
                    # event is O(n^2) over a long stream, and tokenizer
                    # context effects never reach 128 tokens back.
                    all_ids: list = []
                    frozen_n, frozen_text, prev_text = 0, "", ""
                    for chunk in server.process_request_stream(req):
                        ev = {"token_ids": np.asarray(chunk).tolist()}
                        if tok is not None:
                            all_ids.extend(ev["token_ids"])
                            if len(all_ids) - frozen_n > 384:
                                # freeze only at a SEAM-SAFE cut: the
                                # local split must reproduce the joined
                                # decode (BPE boundary / leading-space
                                # effects), else retry next event
                                cut = len(all_ids) - 128
                                w0 = max(frozen_n, cut - 8)
                                joined = tok.decode(
                                    all_ids[w0:cut + 8], skip_special_tokens=True)
                                split = (tok.decode(all_ids[w0:cut],
                                                    skip_special_tokens=True)
                                         + tok.decode(all_ids[cut:cut + 8],
                                                      skip_special_tokens=True))
                                if joined == split:
                                    frozen_text += tok.decode(
                                        all_ids[frozen_n:cut],
                                        skip_special_tokens=True)
                                    frozen_n = cut
                            full = frozen_text + tok.decode(
                                all_ids[frozen_n:], skip_special_tokens=True)
                            # hold back an incomplete multi-byte tail: a
                            # byte-level tokenizer decodes a half-done
                            # UTF-8 character as U+FFFD, then REWRITES it
                            # once the next chunk completes the bytes —
                            # `full` would no longer extend prev_text and
                            # the suffix would emit garbage / drop the
                            # corrected character. Trailing U+FFFD is
                            # therefore withheld until resolved (the done
                            # event flushes any genuine trailing U+FFFD).
                            safe = full.rstrip("�")
                            if safe.startswith(prev_text):
                                ev["text"] = safe[len(prev_text):]
                                prev_text = safe
                            else:
                                # tail rewrite slipped through anyway
                                # (tokenizer context effect): emit nothing
                                # rather than a garbled suffix — clients
                                # have token_ids as ground truth
                                ev["text"] = ""
                        emit(ev)
                    if tok is not None and all_ids:
                        # flush text withheld by the U+FFFD hold-back
                        full = frozen_text + tok.decode(
                            all_ids[frozen_n:], skip_special_tokens=True)
                        if full.startswith(prev_text) and len(full) > len(prev_text):
                            emit({"token_ids": [], "text": full[len(prev_text):]})
                else:
                    text, ids = server.process_request(req)
                    ev = {"token_ids": np.asarray(ids).tolist()}
                    if text is not None:
                        ev["text"] = text
                    emit(ev)
                emit({"done": True})
            except Exception as e:  # noqa: BLE001 — headers already sent;
                # a late _send(500) would corrupt the SSE stream (ADVICE
                # r4), so surface the failure as a terminal event instead
                try:
                    emit({"error": str(e), "done": True})
                except OSError:
                    pass  # client already gone

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU speculative-decoding server")
    p.add_argument("--approx_model_name", default="synthetic")
    p.add_argument("--target_model_name", default="synthetic")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--num_tokens", type=int, default=40)
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--num_slots", type=int, default=0,
                   help=">0 enables continuous batching with that many slots")
    p.add_argument("--max_total_len", type=int, default=1024)
    p.add_argument("--paged", action="store_true",
                   help="serve through the paged-KV engine (block-pool "
                        "cache, best-throughput path per docs/PERFORMANCE.md)")
    p.add_argument("--prefix_cache", action="store_true",
                   help="with --paged: automatic prefix caching — repeated "
                        "page-aligned prompt prefixes skip their prefill")
    p.add_argument("--kv_quant", action="store_true",
                   help="with --paged: int8 KV pools")
    p.add_argument("--num_blocks", type=int, default=64)
    p.add_argument("--page", type=int, default=128)
    args = p.parse_args(argv)
    srv = InferenceServer.from_pretrained(
        args.approx_model_name, args.target_model_name,
        ServerConfig(num_tokens=args.num_tokens, gamma=args.gamma))
    if args.paged:
        from .paged import PagedEngine

        c = srv.config
        engine = PagedEngine(
            srv.bundle_d, srv.params_d, srv.bundle_t, srv.params_t,
            batch_rows=args.num_slots or 8, num_blocks=args.num_blocks,
            page=args.page, gamma=c.gamma, eos_token_id=c.eos_token_id,
            temperature=c.temperature, top_k=c.top_k, top_p=c.top_p,
            kv_quant=args.kv_quant, prefix_cache=args.prefix_cache,
        )
        srv = BatchedInferenceServer(srv, engine=engine)
    elif args.num_slots > 0:
        srv = BatchedInferenceServer(srv, num_slots=args.num_slots,
                                     max_total_len=args.max_total_len)
    httpd = make_http_server(srv, args.host, args.port)
    print(f"serving on {args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
