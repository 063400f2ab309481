"""Front-end-agnostic HTTP route dispatch for :class:`RetrievalService`.

One dispatcher, two transports: the stdlib threaded server
(``http_server.py``) and the native C++ epoll front-end
(``native_http.py``) both feed parsed requests through
:func:`dispatch`, so the wire contract (paths, validation, status
codes, error strings) is defined exactly once and contract tests cover
both front-ends by construction.

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
from typing import Any, Dict, Optional, Tuple

from ..utils.logging import get_logger
from ..utils.misc import QuerySolution
from .batcher import BatcherSaturated

logger = get_logger(__name__)

__all__ = [
    "MAX_BODY_BYTES",
    "MAX_INDEX_BODY_BYTES",
    "body_limit",
    "solution_to_json",
    "dispatch",
]

MAX_BODY_BYTES = 1 << 20  # 1 MiB — a retrieval query is a sentence, not a corpus
MAX_INDEX_BODY_BYTES = 64 << 20  # /index and /delete carry document batches

_GET_PATHS = ("/health", "/stats")
_POST_PATHS = ("/retrieve", "/qa", "/index", "/delete")


def body_limit(path: str) -> int:
    """Max request-body bytes for a POST path (front-ends may enforce it
    before buffering the body; :func:`dispatch` re-checks regardless)."""
    return MAX_INDEX_BODY_BYTES if path in ("/index", "/delete") else MAX_BODY_BYTES


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


def dispatch(
    service,
    method: str,
    path: str,
    body: bytes,
    request_timeout_s: Optional[float] = None,
) -> Tuple[int, Dict[str, Any]]:
    """Route one parsed HTTP request; returns ``(status, json_payload)``.

    Never raises: service failures map to 5xx payloads so a transport
    can always write a well-formed JSON response.
    """
    if method == "GET":
        if path not in _GET_PATHS:
            return 404, {"error": f"unknown path {path}"}
        try:
            payload = service.health() if path == "/health" else service.stats()
        except Exception as exc:  # noqa: BLE001 — degraded service, not a crash
            logger.exception("serving %s failed", path)
            return 500, {"error": f"{type(exc).__name__}: {exc}"}
        return 200, payload
    if method != "POST":
        return 405, {"error": f"unsupported method {method}"}
    if path not in _POST_PATHS:
        return 404, {"error": f"unknown path {path}"}
    if not body:
        return 400, {"error": "empty body"}
    if len(body) > body_limit(path):
        # 413 to match the native front-end, which rejects at header-parse
        # time before the body is ever buffered
        return 413, {"error": "body too large"}
    try:
        data = json.loads(body.decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as exc:
        return 400, {"error": f"invalid JSON: {exc}"}
    if not isinstance(data, dict):
        return 400, {"error": "body must be a JSON object"}
    if path in ("/index", "/delete"):
        return _handle_update(service, path, data)
    return _handle_query(service, path, data, request_timeout_s)


def _handle_query(
    service, path: str, data: Dict[str, Any], request_timeout_s: Optional[float]
) -> Tuple[int, Dict[str, Any]]:
    query = data.get("query")
    if not isinstance(query, str) or not query.strip():
        return 400, {"error": "'query' must be a non-empty string"}
    top_k = data.get("top_k")
    if top_k is not None and (not isinstance(top_k, int) or top_k < 1):
        return 400, {"error": "'top_k' must be a positive integer"}
    try:
        if path == "/qa":
            sol = service.qa(query, top_k, timeout=request_timeout_s)
        else:
            sol = service.retrieve(query, top_k, timeout=request_timeout_s)
    except BatcherSaturated as exc:
        return 503, {"error": f"overloaded: {exc}"}
    except TimeoutError:
        return 504, {"error": "request timed out"}
    except Exception as exc:  # noqa: BLE001 — surface, don't crash the transport
        logger.exception("serving %s failed", path)
        return 500, {"error": f"{type(exc).__name__}: {exc}"}
    return 200, solution_to_json(sol)


def _handle_update(
    service, path: str, data: Dict[str, Any]
) -> Tuple[int, Dict[str, Any]]:
    docs = data.get("docs")
    if (
        not isinstance(docs, list)
        or not docs
        or not all(isinstance(d, str) and d.strip() for d in docs)
    ):
        return 400, {"error": "'docs' must be a non-empty list of strings"}
    try:
        if path == "/index":
            service.index(docs)
        else:
            service.delete(docs)
    except Exception as exc:  # noqa: BLE001 — surface, don't crash the transport
        logger.exception("serving %s failed", path)
        return 500, {"error": f"{type(exc).__name__}: {exc}"}
    return 200, {"ok": True, "docs": len(docs)}
