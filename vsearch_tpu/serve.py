"""Minimal production serving layer: HTTP search/embed endpoints.

The reference has no serving story (retrieval happens in scripts). For
deployment, this wraps a ``Retriever`` + index behind a threaded stdlib
HTTP server with request micro-batching-by-lock (the TPU runs one search
program at a time; concurrent requests queue on the device anyway) and
step-time observability.

Endpoints:
  POST /search  {"queries": [...], "k": 5, "rerank": false,
                 "return_texts": false}
  POST /embed   {"texts": [...], "sparse": true}
  GET  /healthz
  GET  /stats
"""
from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

from .utils.profiling import StepTimer

logger = logging.getLogger(__name__)


class RetrieverService:
    """Thread-safe facade over a Retriever + index."""

    def __init__(self, retriever, default_k: int = 10):
        self.retriever = retriever
        self.default_k = default_k
        self.search_timer = StepTimer(window=256)
        self.embed_timer = StepTimer(window=256)
        self._lock = threading.Lock()

    def search(self, queries, k: Optional[int] = None,
               rerank: bool = False, return_texts: bool = False
               ) -> Dict[str, Any]:
        k = k or self.default_k
        with self._lock, self.search_timer.step(items=len(queries)):
            res = self.retriever.retrieve(queries, k=k, rerank=rerank)
        ids = np.asarray(res.ids)
        out = {
            "ids": ids.tolist(),
            "scores": np.asarray(res.scores).tolist(),
        }
        if return_texts and self.retriever.index is not None:
            out["texts"] = [
                [self.retriever.index.get_sample(int(i)) for i in row]
                for row in ids]
        return out

    def embed(self, texts, sparse: bool = True) -> Dict[str, Any]:
        with self._lock, self.embed_timer.step(items=len(texts)):
            enc = self.retriever.encoder_q
            if sparse and hasattr(enc, "embed_sparse"):
                cols, vals = enc.embed_sparse(texts)
                keep = [np.nonzero(v > 0)[0] for v in vals]
                return {"sparse": True,
                        "dims": [c[kp].tolist()
                                 for c, kp in zip(cols, keep)],
                        "values": [v[kp].tolist()
                                   for v, kp in zip(vals, keep)]}
            emb = enc.embed(texts)
            return {"sparse": False, "embeddings": emb.tolist()}

    def stats(self) -> Dict[str, Any]:
        return {"search": self.search_timer.summary(),
                "embed": self.embed_timer.summary()}


def make_handler(service: RetrieverService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.debug(fmt, *args)

        def _reply(self, code: int, payload: Dict[str, Any]):
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            elif self.path == "/stats":
                self._reply(200, service.stats())
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/search":
                    out = service.search(
                        req["queries"], k=req.get("k"),
                        rerank=bool(req.get("rerank", False)),
                        return_texts=bool(req.get("return_texts",
                                                  False)))
                    self._reply(200, out)
                elif self.path == "/embed":
                    out = service.embed(req["texts"],
                                        sparse=bool(req.get("sparse",
                                                            True)))
                    self._reply(200, out)
                else:
                    self._reply(404, {"error": "not found"})
            except Exception as exc:  # surface errors as 400s
                logger.exception("request failed")
                self._reply(400, {"error": str(exc)})

    return Handler


def serve(retriever, host: str = "0.0.0.0", port: int = 8080,
          default_k: int = 10) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .serve_forever())."""
    service = RetrieverService(retriever, default_k=default_k)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    server.service = service
    logger.info("serving retriever on %s:%d", host, port)
    return server
