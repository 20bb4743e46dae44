"""Serving flow control — Spark-side analogs of the reference's V3-V6/V8
operators (SURVEY.md §2.5).

The reference implements these as gRPC in-process middleware:

- V3 token-bucket rate limiter (server/query_service.cpp:639-677): bucket
  starts at ``burst_size`` tokens, refills at ``requests_per_second``,
  ``try_acquire`` is non-blocking, ``acquire`` spins.
- V4 circuit breaker (server/load_balancer.cpp:34-72,192-269): per-service
  success/error counters; error rate > 50% opens the circuit; open circuits
  shed requests with UNAVAILABLE; a request after the 30s timeout closes it
  again (half-open probe); counters decay ×0.95 every 5s health tick and a
  circuit stuck open for 2× the timeout is force-reset; success latency
  feeds an EMA (alpha=0.1) that drives an adaptive timeout of 3×avg clamped
  to [1s, 30s] (load_balancer.cpp:87-101).
- V5 adaptive batch sizing (server/load_balancer.cpp:75-85): load < 0.3 →
  16, < 0.7 → 32, else 64.
- V6 priority queue (server/load_balancer.cpp:273-329): four priorities,
  higher first, FIFO within a priority.
- V8 health checks (server/health_service.cpp:84-156): SERVING iff compute
  is reachable, ≥10% accelerator memory free, and the service has its
  state loaded.

In Spark the natural seams differ: micro-batches arrive from a streaming
trigger rather than a request socket, so the limiter/breaker wrap the
``foreachBatch`` handler (driver-side, one decision per micro-batch — cheap
and scale-independent: the controlled unit is a fused batch, never a row).
All classes take an injectable ``clock`` so tests are deterministic, and
none of them touch executor state — at 1000 executors this is still one
driver-side decision per trigger.
"""

from __future__ import annotations

import heapq
import itertools
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import SparkSession

__all__ = [
    "TokenBucket",
    "CircuitOpenError",
    "OverloadedError",
    "LoadController",
    "optimal_batch_size",
    "PriorityRequestQueue",
    "Priority",
    "health_check",
    "HealthWatch",
]


class TokenBucket:
    """V3: token-bucket rate limiter (server/query_service.cpp:639-677).

    Same semantics as the reference: the bucket is created full at
    ``burst_size``; ``refill`` adds ``elapsed / refill_period`` tokens
    capped at ``burst_size``; ``try_acquire`` never blocks; ``acquire``
    waits. Intended use: ``acquire(n_queries)`` at the top of a
    ``foreachBatch`` handler — blocking the handler IS Spark backpressure
    (the next trigger waits), which is the honest analog of the reference
    blocking its gRPC thread.
    """

    def __init__(
        self,
        requests_per_second: float,
        burst_size: int = 100,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        if requests_per_second <= 0:
            raise ValueError("requests_per_second must be positive")
        self.max_tokens = int(burst_size)
        self.tokens = float(burst_size)
        self._clock = clock
        self._sleep = sleep
        self._refill_period = 1.0 / float(requests_per_second)
        self._last_refill = clock()

    def _refill(self) -> None:
        now = self._clock()
        elapsed = now - self._last_refill
        if elapsed >= self._refill_period:
            self.tokens = min(
                float(self.max_tokens), self.tokens + elapsed / self._refill_period
            )
            self._last_refill = now

    def try_acquire(self, tokens: int = 1) -> bool:
        self._refill()
        if self.tokens >= tokens:
            self.tokens -= tokens
            return True
        return False

    def acquire(self, tokens: int = 1) -> None:
        while not self.try_acquire(tokens):
            self._sleep(0.001)

    def update_rate(self, requests_per_second: float) -> None:
        if requests_per_second <= 0:
            raise ValueError("requests_per_second must be positive")
        self._refill_period = 1.0 / float(requests_per_second)


class CircuitOpenError(RuntimeError):
    """Shed: the service's circuit is open (reference returns UNAVAILABLE,
    load_balancer.cpp:40-43)."""


class OverloadedError(RuntimeError):
    """Shed: at max concurrency (reference returns RESOURCE_EXHAUSTED,
    load_balancer.cpp:46-50)."""


@dataclass
class _ServiceMetrics:
    success_count: float = 0.0
    error_count: float = 0.0
    avg_latency_ms: float = 0.0
    circuit_open: bool = False
    last_failure: float = field(default=float("-inf"))

    def error_rate(self) -> float:
        total = self.success_count + self.error_count
        return self.error_count / total if total > 0 else 0.0


class LoadController:
    """V4+V5: circuit breaker, load shedding, adaptive batch sizing and
    timeouts (server/load_balancer.cpp:34-101,192-269).

    ``handle(service, fn)`` wraps one unit of work (in Spark: one
    micro-batch or one ``search_batch`` param-group) with the reference's
    exact policy: shed if the circuit is open, shed if at max concurrency
    (counted as an error, load_balancer.cpp:47), otherwise run and record
    success latency (EMA alpha=0.1) or error. Error rate above the
    threshold opens the circuit; the first call after ``breaker_timeout_s``
    closes it again (the reference's recovery probe,
    load_balancer.cpp:199-206). ``decay()`` is the 5s health-tick body
    (counters ×0.95, force-reset circuits stuck open 2× the timeout,
    load_balancer.cpp:247-268) — call it from a timer or once per trigger.
    """

    def __init__(
        self,
        max_concurrent: int = 100,
        breaker_threshold: float = 0.5,
        breaker_timeout_s: float = 30.0,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.max_concurrent = max_concurrent
        self.breaker_threshold = breaker_threshold
        self.breaker_timeout_s = breaker_timeout_s
        self._clock = clock
        self._current = 0
        self._services: dict[str, _ServiceMetrics] = {}

    def _metrics(self, service: str) -> _ServiceMetrics:
        return self._services.setdefault(service, _ServiceMetrics())

    def is_circuit_open(self, service: str) -> bool:
        m = self._services.get(service)
        if m is None or not m.circuit_open:
            return False
        if self._clock() - m.last_failure > self.breaker_timeout_s:
            m.circuit_open = False  # recovery probe
            return False
        return True

    def record_success(self, service: str, latency_ms: float) -> None:
        m = self._metrics(service)
        m.success_count += 1
        if m.avg_latency_ms == 0.0:
            m.avg_latency_ms = latency_ms
        else:
            m.avg_latency_ms = m.avg_latency_ms * 0.9 + latency_ms * 0.1
        if m.error_rate() < self.breaker_threshold:
            m.circuit_open = False

    def record_error(self, service: str) -> None:
        m = self._metrics(service)
        m.error_count += 1
        m.last_failure = self._clock()
        if m.error_rate() > self.breaker_threshold:
            m.circuit_open = True

    def handle(self, service: str, fn: Callable[[], object]) -> object:
        if self.is_circuit_open(service):
            raise CircuitOpenError(f"{service}: circuit open")
        if self._current >= self.max_concurrent:
            self.record_error(service)
            raise OverloadedError(f"{service}: at max concurrency")
        self._current += 1
        t0 = self._clock()
        try:
            result = fn()
        except Exception:
            self.record_error(service)
            raise
        else:
            self.record_success(service, (self._clock() - t0) * 1000.0)
            return result
        finally:
            self._current -= 1

    def optimal_batch_size(self, mode: str = "latency") -> int:
        return optimal_batch_size(self._current, self.max_concurrent, mode)

    def request_timeout_s(self, service: str) -> float:
        """3× EMA latency clamped to [1s, 30s]; 5s when unknown
        (load_balancer.cpp:87-101)."""
        m = self._services.get(service)
        if m is None or m.avg_latency_ms == 0.0:
            return 5.0
        return max(1.0, min(30.0, 3.0 * m.avg_latency_ms / 1000.0))

    def decay(self) -> None:
        for m in self._services.values():
            m.success_count *= 0.95
            m.error_count *= 0.95
            if m.circuit_open and (
                self._clock() - m.last_failure > 2.0 * self.breaker_timeout_s
            ):
                m.circuit_open = False
                m.error_count = 0.0
                m.success_count = 1.0  # give it a chance


# The fused scan's measured saturation point (r11,
# scripts/batch_scaling_768d.py at the reference's published 10M x 768-d
# shape; artifact scripts/artifacts_batch_scaling_768d.json): per-query
# cost falls 67x from batch 1 to 1000 and flattens past ~256, where even
# the recall>=0.9 nprobe premium collapses to ~5%. The reference's
# adaptive 16/32/64 (server/load_balancer.cpp:75-85) is kept as
# LATENCY-mode parity; THROUGHPUT mode drains at this measured knee.
THROUGHPUT_BATCH_SIZE = 256


def optimal_batch_size(
    current_load: int, max_concurrent: int, mode: str = "latency"
) -> int:
    """V5 (server/load_balancer.cpp:75-85). In streaming this is the value
    to feed ``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger`` between
    restarts; in ``search_batch`` it is the fusion-group cap.

    ``mode="latency"`` is the reference's adaptive 16/32/64 —
    reference-parity only: r11 measured that those sizes sit far below
    the fused scan's saturation knee, paying up to ~4x per-query cost
    versus draining at ``THROUGHPUT_BATCH_SIZE`` (see the constant).
    ``mode="throughput"`` returns that measured knee."""
    if mode == "throughput":
        return THROUGHPUT_BATCH_SIZE
    if mode != "latency":
        raise ValueError(f"mode must be 'latency' or 'throughput', got {mode!r}")
    load = current_load / max_concurrent if max_concurrent > 0 else 1.0
    if load < 0.3:
        return 16
    if load < 0.7:
        return 32
    return 64


class Priority:
    """server/load_balancer.cpp:275-280."""

    LOW = 0
    NORMAL = 1
    HIGH = 2
    URGENT = 3


class PriorityRequestQueue:
    """V6: higher priority first, FIFO within a priority
    (server/load_balancer.cpp:273-329).

    Driver-side request staging in front of a micro-batch: ``drain(n)``
    yields the next fusion group in priority order (n from
    ``optimal_batch_size``). For cluster-level isolation map priorities to
    fair-scheduler pools (``spark.scheduler.pool``) — see ``pool_name``.
    """

    _POOLS = {0: "low", 1: "normal", 2: "high", 3: "urgent"}

    def __init__(self) -> None:
        self._heap: list[tuple[int, int, object]] = []
        self._seq = itertools.count()

    def enqueue(self, priority: int, request: object) -> None:
        heapq.heappush(self._heap, (-int(priority), next(self._seq), request))

    def dequeue(self) -> object | None:
        if not self._heap:
            return None
        return heapq.heappop(self._heap)[2]

    def drain(self, n: int) -> list[object]:
        out = []
        while self._heap and len(out) < n:
            out.append(heapq.heappop(self._heap)[2])
        return out

    def __len__(self) -> int:
        return len(self._heap)

    @staticmethod
    def pool_name(priority: int) -> str:
        return PriorityRequestQueue._POOLS.get(int(priority), "normal")

    @staticmethod
    def set_pool(spark: SparkSession, priority: int) -> None:
        """Route subsequent jobs on this thread to the priority's fair pool
        (the cluster-level analog of the reference's worker pools,
        load_balancer.cpp:18-21)."""
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", PriorityRequestQueue.pool_name(priority)
        )


try:  # StreamingQueryListener needs a streaming-capable build; import-gate
    from pyspark.sql.streaming import StreamingQueryListener as _SQListener
except Exception:  # pragma: no cover
    _SQListener = object


class HealthWatch(_SQListener):
    """V8 streaming Watch analog (server/health_service.cpp:37-79): the
    reference's health service exposes a Watch RPC that PUSHES status
    changes to subscribers, alongside the poll-style Check. ``health_check``
    below is Check; this listener is Watch — register it with
    ``spark.streams.addListener(watch)`` and every streaming lifecycle
    event (started / progress / idle / terminated) recomputes the health
    payload and hands it to ``on_update``.

    A query that terminated WITH an exception marks the payload NOT_SERVING
    (``streams`` check false, the error recorded per query id) until that
    query id is restarted — mirroring the reference pushing NOT_SERVING to
    watchers on service failure. ``last`` always holds the newest payload
    for poll-style reads; ``history`` is bounded.
    """

    def __init__(
        self,
        spark: SparkSession,
        indices: dict | None = None,
        on_update: Callable[[dict], None] | None = None,
    ) -> None:
        self._spark = spark
        self._indices = indices or {}
        self._on_update = on_update
        self._failed: dict[str, str] = {}
        self.last: dict | None = None
        self.history: list[dict] = []

    def _push(self, event: str, query_id: str | None, error: str | None = None) -> None:
        if query_id is not None:
            if error is not None:
                self._failed[query_id] = error
            else:
                self._failed.pop(query_id, None)
        payload = health_check(self._spark, self._indices)
        payload["streams"] = not self._failed
        if self._failed:
            payload["status"] = "NOT_SERVING"
            payload["stream_errors"] = dict(self._failed)
        payload["event"] = event
        payload["query_id"] = query_id
        self.last = payload
        self.history.append(payload)
        if len(self.history) > 200:
            del self.history[:100]
        if self._on_update is not None:
            try:
                self._on_update(payload)
            except Exception:
                pass  # a broken subscriber must not kill the listener bus

    # Spark listener API casing
    def onQueryStarted(self, event) -> None:  # noqa: N802
        self._push("started", str(event.id))

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self._push("progress", str(event.progress.id))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        self._push("idle", str(event.id))

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self._push("terminated", str(event.id), error=event.exception)


def health_check(spark: SparkSession, indices: dict | None = None) -> dict:
    """V8 (server/health_service.cpp:84-156): SERVING iff compute is
    reachable, memory is not critically full, and state is loaded.

    Reference checks: CUDA device present (→ here: an alive SparkContext
    with schedulable cores), ≥10% GPU memory free (→ executor/driver JVM
    memory probe via the status tracker where exposed; local mode reports
    the driver block manager), and indices loaded (→ every supplied index
    resolves an ACTIVE epoch). Returns a dict so callers can export it as a
    one-row DataFrame or a /healthz payload.
    """
    checks: dict[str, bool] = {}
    sc = spark.sparkContext
    try:
        checks["compute"] = (not sc._jsc.sc().isStopped()) and sc.defaultParallelism >= 1
    except Exception:
        checks["compute"] = False

    try:
        # ≥10% free on every live block manager (driver in local mode) —
        # the analog of the reference's cudaMemGetInfo 10%-free floor.
        statuses = sc._jsc.sc().getExecutorMemoryStatus()
        it = statuses.iterator()
        mem_ok, saw_any = True, False
        while it.hasNext():
            entry = it.next()
            total, free = entry._2()._1(), entry._2()._2()
            saw_any = True
            if total > 0 and free / total < 0.10:
                mem_ok = False
        checks["memory"] = mem_ok and saw_any
    except Exception:
        checks["memory"] = True  # JVM internals unavailable → don't flap

    loaded = True
    for name, index in (indices or {}).items():
        try:
            # both handle types (IVFIndex, IVFPQIndex) carry a manifest and a
            # resolved epoch; either proves state is loaded — don't flap
            # NOT_SERVING on a handle that lacks one of the two attributes
            loaded = loaded and (
                getattr(index, "manifest", None) is not None
                or getattr(index, "epoch", None) is not None
            )
        except Exception:
            loaded = False
    checks["indices_loaded"] = loaded

    status = "SERVING" if all(checks.values()) else "NOT_SERVING"
    return {"status": status, **checks}
