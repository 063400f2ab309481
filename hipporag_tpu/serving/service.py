"""Thread-safe online serving facade over a prepared HippoRAG instance.

``RetrievalService`` is what a production deployment instantiates once
per replica: concurrent callers (HTTP handler threads, RPC workers)
call :meth:`retrieve` / :meth:`qa` from any thread; a per-lane
:class:`~hipporag_tpu.serving.batcher.MicroBatcher` coalesces them into
device batches and serializes access to the underlying (not
thread-safe) :class:`~hipporag_tpu.hipporag.HippoRAG`.

The reference has no online serving surface at all — its entry point is
a one-shot batch experiment script (ref ``main.py:113-160``). This
module is TPU-native added value: batching is how a TPU earns its keep
under concurrent load (see ``batcher.py`` for the measured economics).
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional

from ..utils.logging import get_logger
from ..utils.misc import QuerySolution
from .batcher import MicroBatcher

logger = get_logger(__name__)

__all__ = ["RetrievalService"]


def _slice_solution(sol: QuerySolution, top_k: int) -> QuerySolution:
    """Trim a batched solution down to one caller's requested top_k."""
    return QuerySolution(
        question=sol.question,
        docs=sol.docs[:top_k],
        doc_scores=(sol.doc_scores[:top_k] if sol.doc_scores is not None else None),
        answer=sol.answer,
        thoughts=sol.thoughts,
        doc_metadata=(
            sol.doc_metadata[:top_k] if sol.doc_metadata is not None else None
        ),
    )


class RetrievalService:
    """Concurrent retrieve/QA serving over one HippoRAG index replica.

    Parameters
    ----------
    rag:
        An indexed :class:`HippoRAG` (or :class:`StandardRAG`-compatible)
        instance. Retrieval state is prepared eagerly at construction so
        the first request doesn't pay graph upload + executable warmup.
    max_batch_size:
        Coalescing cap per lane; defaults to the engine's
        ``ppr_batch_size`` (the largest pre-compiled sub-bucket).
    max_wait_ms:
        Coalescing window — the p50 latency tax a lone request pays to
        let concurrent arrivals merge. Keep it well under one link RTT
        (~30 ms on the tunneled v5e); 8 ms default.
    """

    def __init__(
        self,
        rag,
        *,
        max_batch_size: Optional[int] = None,
        max_wait_ms: float = 8.0,
    ):
        self._rag = rag
        cfg = rag.global_config
        if max_batch_size is None:
            max_batch_size = max(1, int(getattr(cfg, "ppr_batch_size", 128)))
        self._default_top_k = int(getattr(cfg, "retrieval_top_k", 200))
        if getattr(rag, "ready_to_retrieve", True) is False:
            rag.prepare_retrieval_objects()
        # Both lane workers call into the same (not thread-safe) engine;
        # this lock serializes them. A QA batch holds it across its LLM
        # round trips, so heavy QA traffic delays retrieve batches — the
        # price of one shared replica. Run separate replicas to decouple.
        self._engine_lock = threading.Lock()
        self._retrieve_lane = MicroBatcher(
            self._retrieve_batch,
            max_batch_size=max_batch_size,
            max_wait_ms=max_wait_ms,
            name="serve-retrieve",
        )
        self._qa_lane = MicroBatcher(
            self._qa_batch,
            max_batch_size=max_batch_size,
            max_wait_ms=max_wait_ms,
            name="serve-qa",
        )
        self._lock = threading.Lock()
        self._latency_sums = {"retrieve": 0.0, "qa": 0.0}
        self._latency_counts = {"retrieve": 0, "qa": 0}
        self._started = time.time()
        self._closed = False

    # ------------------------------------------------------- batch fns
    # Run on the lane worker thread — the only thread touching self._rag.
    def _retrieve_batch(self, items: List[tuple]) -> List[QuerySolution]:
        queries = [q for q, _ in items]
        max_k = max(k for _, k in items)
        with self._engine_lock:
            sols = self._rag.retrieve(queries, num_to_retrieve=max_k)
        return [
            sol if k == max_k else _slice_solution(sol, k)
            for sol, (_, k) in zip(sols, items)
        ]

    def _qa_batch(self, items: List[tuple]) -> List[QuerySolution]:
        queries = [q for q, _ in items]
        max_k = max(k for _, k in items)
        with self._engine_lock:
            sols = self._rag.retrieve(queries, num_to_retrieve=max_k)
            sols, _responses, _metadata = self._rag.qa(sols)
        return [
            sol if k == max_k else _slice_solution(sol, k)
            for sol, (_, k) in zip(sols, items)
        ]

    # -------------------------------------------------------- requests
    def retrieve_async(self, query: str, top_k: Optional[int] = None) -> Future:
        return self._retrieve_lane.submit((query, int(top_k or self._default_top_k)))

    def qa_async(self, query: str, top_k: Optional[int] = None) -> Future:
        return self._qa_lane.submit((query, int(top_k or self._default_top_k)))

    def retrieve(
        self, query: str, top_k: Optional[int] = None, timeout: Optional[float] = None
    ) -> QuerySolution:
        t0 = time.perf_counter()
        sol = self.retrieve_async(query, top_k).result(timeout=timeout)
        self._record("retrieve", time.perf_counter() - t0)
        return sol

    def qa(
        self, query: str, top_k: Optional[int] = None, timeout: Optional[float] = None
    ) -> QuerySolution:
        t0 = time.perf_counter()
        sol = self.qa_async(query, top_k).result(timeout=timeout)
        self._record("qa", time.perf_counter() - t0)
        return sol

    def warmup(self, query: str = "warmup query") -> None:
        """Compile/prime the single-request path before taking traffic."""
        self.retrieve(query, top_k=1)

    # ----------------------------------------------------------- admin
    def _record(self, lane: str, elapsed_s: float) -> None:
        with self._lock:
            self._latency_sums[lane] += elapsed_s
            self._latency_counts[lane] += 1

    def health(self) -> Dict[str, Any]:
        info: Dict[str, Any] = {"status": "ok", "uptime_s": round(time.time() - self._started, 1)}
        get_info = getattr(self._rag, "get_graph_info", None)
        if callable(get_info):
            try:
                info["graph"] = get_info()
            except Exception as exc:  # pragma: no cover — degraded, not dead
                info["graph_error"] = str(exc)
        return info

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            lat = {
                lane: (
                    round(1e3 * self._latency_sums[lane] / n, 2)
                    if (n := self._latency_counts[lane])
                    else None
                )
                for lane in ("retrieve", "qa")
            }
        return {
            "mean_latency_ms": lat,
            "retrieve": self._retrieve_lane.stats(),
            "qa": self._qa_lane.stats(),
        }

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self._retrieve_lane.close()
        self._qa_lane.close()

    def __enter__(self) -> "RetrievalService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
