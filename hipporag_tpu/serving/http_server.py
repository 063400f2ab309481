"""Minimal production HTTP front-end for :class:`RetrievalService`.

Stdlib-only (``http.server.ThreadingHTTPServer``) so it runs in any
deployment image — each connection gets a handler thread, the handler
blocks on the service Future, and the micro-batcher does the real
concurrency work of merging those threads into device batches.

Endpoints (JSON in/out):

- ``GET  /health``  — liveness + graph info
- ``GET  /stats``   — batcher/latency counters
- ``POST /retrieve`` ``{"query": str, "top_k": int?}`` → ranked docs
- ``POST /qa``       same body → docs + generated answer
- ``POST /index``   ``{"docs": [str, ...]}`` → add docs to the live index
- ``POST /delete``  same body → remove docs from the live index

The reference exposes no server (its ``main.py`` is a one-shot batch
experiment); this is TPU-native serving surface.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple

from ..utils.logging import get_logger
from ..utils.misc import QuerySolution
from .batcher import BatcherSaturated
from .service import RetrievalService

logger = get_logger(__name__)

__all__ = ["solution_to_json", "make_server", "serve_forever"]

MAX_BODY_BYTES = 1 << 20  # 1 MiB — a retrieval query is a sentence, not a corpus
MAX_INDEX_BODY_BYTES = 64 << 20  # /index and /delete carry document batches


def solution_to_json(sol: QuerySolution) -> Dict[str, Any]:
    """Full (un-truncated) wire form of one solution."""
    return {
        "question": sol.question,
        "answer": sol.answer,
        "docs": list(sol.docs),
        "doc_scores": (
            [round(float(v), 6) for v in sol.doc_scores]
            if sol.doc_scores is not None
            else None
        ),
    }


class _Handler(BaseHTTPRequestHandler):
    # set by make_server()
    service: RetrievalService = None  # type: ignore[assignment]
    request_timeout_s: Optional[float] = None

    # silence the default stderr-per-request log; route to our logger
    def log_message(self, fmt: str, *args: Any) -> None:  # noqa: A003
        logger.debug("http %s", fmt % args)

    # ----------------------------------------------------------- plumbing
    def _send(self, code: int, payload: Dict[str, Any]) -> None:
        body = json.dumps(payload).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_json(
        self, max_bytes: int = MAX_BODY_BYTES
    ) -> Tuple[Optional[Dict[str, Any]], Optional[str]]:
        try:
            length = int(self.headers.get("Content-Length", "0"))
        except ValueError:
            return None, "invalid Content-Length"
        if length <= 0:
            return None, "empty body"
        if length > max_bytes:
            return None, "body too large"
        try:
            data = json.loads(self.rfile.read(length).decode("utf-8"))
        except (ValueError, UnicodeDecodeError) as exc:
            return None, f"invalid JSON: {exc}"
        if not isinstance(data, dict):
            return None, "body must be a JSON object"
        return data, None

    # ----------------------------------------------------------- routes
    def do_GET(self) -> None:  # noqa: N802 — stdlib naming
        if self.path == "/health":
            self._send(200, self.service.health())
        elif self.path == "/stats":
            self._send(200, self.service.stats())
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self) -> None:  # noqa: N802 — stdlib naming
        if self.path in ("/index", "/delete"):
            self._handle_update()
            return
        if self.path not in ("/retrieve", "/qa"):
            self._send(404, {"error": f"unknown path {self.path}"})
            return
        data, err = self._read_json()
        if err:
            self._send(400, {"error": err})
            return
        query = data.get("query")
        if not isinstance(query, str) or not query.strip():
            self._send(400, {"error": "'query' must be a non-empty string"})
            return
        top_k = data.get("top_k")
        if top_k is not None and (not isinstance(top_k, int) or top_k < 1):
            self._send(400, {"error": "'top_k' must be a positive integer"})
            return
        try:
            if self.path == "/qa":
                sol = self.service.qa(query, top_k, timeout=self.request_timeout_s)
            else:
                sol = self.service.retrieve(
                    query, top_k, timeout=self.request_timeout_s
                )
        except BatcherSaturated as exc:
            self._send(503, {"error": f"overloaded: {exc}"})
            return
        except TimeoutError:
            self._send(504, {"error": "request timed out"})
            return
        except Exception as exc:  # noqa: BLE001 — surface, don't crash the handler
            logger.exception("serving %s failed", self.path)
            self._send(500, {"error": f"{type(exc).__name__}: {exc}"})
            return
        self._send(200, solution_to_json(sol))

    def _handle_update(self) -> None:
        data, err = self._read_json(max_bytes=MAX_INDEX_BODY_BYTES)
        if err:
            self._send(400, {"error": err})
            return
        docs = data.get("docs")
        if (
            not isinstance(docs, list)
            or not docs
            or not all(isinstance(d, str) and d.strip() for d in docs)
        ):
            self._send(
                400, {"error": "'docs' must be a non-empty list of strings"}
            )
            return
        try:
            if self.path == "/index":
                self.service.index(docs)
            else:
                self.service.delete(docs)
        except Exception as exc:  # noqa: BLE001 — surface, don't crash the handler
            logger.exception("serving %s failed", self.path)
            self._send(500, {"error": f"{type(exc).__name__}: {exc}"})
            return
        self._send(200, {"ok": True, "docs": len(docs)})


def make_server(
    service: RetrievalService,
    host: str = "127.0.0.1",
    port: int = 8734,
    request_timeout_s: Optional[float] = 120.0,
) -> ThreadingHTTPServer:
    """Build (but don't start) the threaded HTTP server. ``port=0`` picks
    a free port — read it back from ``server.server_address[1]``."""
    handler = type(
        "BoundHandler",
        (_Handler,),
        {"service": service, "request_timeout_s": request_timeout_s},
    )
    # request_queue_size is the LISTEN BACKLOG and stdlib defaults it to
    # 5 — measured: a 16-client closed-loop burst already gets connection
    # resets. It's read during server_bind, so it must be a class
    # attribute before construction.
    server_cls = type(
        "BoundServer", (ThreadingHTTPServer,), {"request_queue_size": 128}
    )
    server = server_cls((host, port), handler)
    # non-daemon handler threads: server_close() then JOINS in-flight
    # handlers, so a graceful shutdown finishes writing every response
    # instead of the interpreter killing handlers mid-write. Stuck
    # handlers are bounded by request_timeout_s on the service futures.
    server.daemon_threads = False
    return server


def serve_forever(
    service: RetrievalService, host: str = "127.0.0.1", port: int = 8734
) -> None:
    """Blocking entry point used by ``main.py --serve``.

    SIGTERM (the orchestrator's stop signal) and Ctrl-C both drain
    gracefully: stop accepting connections, finish queued batches
    (MicroBatcher.close drains), then return."""
    import signal
    import threading

    server = make_server(service, host, port)
    addr = server.server_address
    logger.info("serving on http://%s:%d (POST /retrieve, /qa)", addr[0], addr[1])

    def _term(signum, frame):  # pragma: no cover — signal path
        logger.info("signal %d: draining and shutting down", signum)
        # shutdown() blocks until serve_forever returns — call it off
        # the signal frame so the main thread can unwind
        threading.Thread(target=server.shutdown, daemon=True).start()

    prev = None
    try:
        try:
            prev = signal.signal(signal.SIGTERM, _term)
        except ValueError:  # not the main thread — serve without the hook
            pass
        server.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover — interactive shutdown
        pass
    finally:
        if prev is not None:
            signal.signal(signal.SIGTERM, prev)
        server.server_close()
        service.close()
