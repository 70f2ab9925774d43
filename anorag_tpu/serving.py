"""ServingEngine: cross-request pipelined serving over one QueryProcessor.

Production-serving layer (no reference analogue — the reference is
CLI-only). The round-2 server serialized whole HTTP requests behind one
lock, so request B's device retrieval could not start until request A's
host answer stages finished. This engine splits the pipeline at the
device/host boundary:

  * ONE dispatcher thread owns device submission order: it encodes and
    dispatches each sub-batch's hybrid retrieval (JAX dispatch is async —
    the device computes while the host moves on), bounded by `depth`
    in-flight batches;
  * host answer stages (finalize + assemble: evidence rerank, EFSA, span
    pick) run in a host worker pool as each batch's results land;
  * callers get a Future per request; sub-batch results re-assemble in
    request order.

Requests of any size pipeline against each other: while request A is in
host stages, requests B..E are already queued on the device. On the
tunneled bench rig the host is 1 core, so host_workers defaults to 1
(host stages serialize anyway); on attached multi-core hardware raise it.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Sequence

from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.serving")

_STOP = object()


class ServingEngine:
    def __init__(self, qp, sub_batch: int = 64, depth: int = 4,
                 host_workers: int = 1):
        self.qp = qp
        self.sub_batch = max(1, int(sub_batch))
        self._inflight = threading.Semaphore(max(1, int(depth)))
        self._q: "queue.Queue" = queue.Queue()
        self._host_pool = ThreadPoolExecutor(max_workers=max(1, int(host_workers)),
                                             thread_name_prefix="anorag-host")
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True,
                                            name="anorag-dispatch")
        self._closed = False
        self._dispatcher.start()

    # ------------------------------------------------------------ public
    def submit(self, queries: Sequence[str], top_k: Optional[int] = None,
               dataset: Optional[str] = None) -> "Future[List[Dict[str, Any]]]":
        """Enqueue a request; returns a Future resolving to one result row
        per query, in order. The request is split into sub_batch chunks
        that pipeline with every other in-flight request's chunks."""
        if self._closed:
            raise RuntimeError("engine closed")
        queries = [str(q) for q in queries]
        chunks = [queries[i:i + self.sub_batch]
                  for i in range(0, len(queries), self.sub_batch)] or [[]]
        sub_futures: List[Future] = [Future() for _ in chunks]
        for chunk, sf in zip(chunks, sub_futures):
            self._q.put((chunk, top_k, dataset, sf))
        out: "Future[List[Dict[str, Any]]]" = Future()

        def _gather():
            try:
                rows: List[Dict[str, Any]] = []
                for sf in sub_futures:
                    rows.extend(sf.result())
                out.set_result(rows)
            except Exception as e:               # propagate the first failure
                out.set_exception(e)

        threading.Thread(target=_gather, daemon=True).start()
        return out

    def process(self, queries: Sequence[str], top_k: Optional[int] = None,
                dataset: Optional[str] = None,
                timeout: Optional[float] = None) -> List[Dict[str, Any]]:
        """Blocking submit()."""
        return self.submit(queries, top_k=top_k, dataset=dataset).result(timeout)

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._q.put(_STOP)
            self._dispatcher.join(timeout=5)
            self._host_pool.shutdown(wait=True)

    # ------------------------------------------------------------ internals
    def _dispatch_loop(self) -> None:
        while True:
            item = self._q.get()
            if item is _STOP:
                break
            chunk, top_k, dataset, sf = item
            if not chunk:
                sf.set_result([])
                continue
            self._inflight.acquire()
            try:
                handle = self.qp.retriever.hybrid_search_dispatch(
                    chunk, top_k=top_k or self.qp.cfg.get(
                        "context.max_notes_for_llm", 20))
            except Exception as e:
                self._inflight.release()
                sf.set_exception(e)
                continue
            self._host_pool.submit(self._host_stage, handle, chunk, dataset, sf)

    def _host_stage(self, handle, chunk, dataset, sf: Future) -> None:
        try:
            rows = self.qp.retriever.hybrid_search_finalize(handle)
            out = self.qp._assemble_batch(rows, chunk, dataset)
            sf.set_result(out)
        except Exception as e:
            logger.exception("host stage failed")
            sf.set_exception(e)
        finally:
            self._inflight.release()
