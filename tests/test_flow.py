"""Serving flow-control analogs (V3-V6, V8 — SURVEY.md §2.5).

All policy classes take an injectable clock, so every reference behavior
(token refill, circuit open/recover windows, counter decay) is tested
deterministically; the streaming integration test at the bottom exercises
the limiter+breaker seam around a real foreachBatch search.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.operators.ivf import IVFIndex
from cuda_acceleratedvectordatabaseengine_spark.sources import tables
from cuda_acceleratedvectordatabaseengine_spark.streaming.flow import (
    CircuitOpenError,
    LoadController,
    OverloadedError,
    Priority,
    PriorityRequestQueue,
    TokenBucket,
    health_check,
    optimal_batch_size,
)


class FakeClock:
    def __init__(self) -> None:
        self.t = 0.0

    def __call__(self) -> float:
        return self.t

    def advance(self, s: float) -> None:
        self.t += s


# -- V3 token bucket (query_service.cpp:639-677) ---------------------------


def test_token_bucket_burst_then_refill():
    clk = FakeClock()
    tb = TokenBucket(requests_per_second=10, burst_size=5, clock=clk)
    # starts full at burst
    assert tb.try_acquire(5)
    assert not tb.try_acquire(1)
    # 10 rps -> ~0.3s = 3 tokens (nudge past float rounding of 0.3/0.1)
    clk.advance(0.301)
    assert tb.try_acquire(3)
    assert not tb.try_acquire(1)
    # refill caps at burst_size
    clk.advance(100.0)
    assert tb.try_acquire(5)
    assert not tb.try_acquire(1)


def test_token_bucket_update_rate_and_blocking_acquire():
    clk = FakeClock()
    tb = TokenBucket(
        requests_per_second=1,
        burst_size=1,
        clock=clk,
        sleep=lambda s: clk.advance(1.0),  # sleeping advances the fake clock
    )
    assert tb.try_acquire(1)
    tb.update_rate(2)  # 2 rps from now on
    tb.acquire(1)  # blocks until refill; fake sleep advances time
    assert clk.t >= 0.5
    with pytest.raises(ValueError):
        tb.update_rate(0)
    with pytest.raises(ValueError):
        TokenBucket(requests_per_second=0)


# -- V4 circuit breaker / shedding (load_balancer.cpp:34-72,192-269) -------


def _fail():
    raise RuntimeError("boom")


def test_circuit_opens_on_error_rate_and_sheds():
    clk = FakeClock()
    lc = LoadController(breaker_timeout_s=30.0, clock=clk)
    lc.handle("svc", lambda: "ok")
    # 2 errors out of 3 -> error rate > 0.5 -> open
    for _ in range(2):
        with pytest.raises(RuntimeError):
            lc.handle("svc", _fail)
    assert lc.is_circuit_open("svc")
    with pytest.raises(CircuitOpenError):
        lc.handle("svc", lambda: "ok")
    # after the timeout the next check is the recovery probe -> closed again
    clk.advance(31.0)
    assert not lc.is_circuit_open("svc")
    assert lc.handle("svc", lambda: "ok") == "ok"


def test_overload_shed_counts_as_error():
    lc = LoadController(max_concurrent=1)

    def nested():
        # a second request while one is in flight -> RESOURCE_EXHAUSTED
        with pytest.raises(OverloadedError):
            lc.handle("svc", lambda: "inner")
        return "outer"

    assert lc.handle("svc", nested) == "outer"
    assert lc._services["svc"].error_count == 1


def test_latency_ema_and_adaptive_timeout():
    clk = FakeClock()
    lc = LoadController(clock=clk)
    # unknown service -> 5s default (load_balancer.cpp:92-94)
    assert lc.request_timeout_s("svc") == 5.0

    def work():
        clk.advance(2.0)  # 2000 ms

    lc.handle("svc", work)
    assert lc._services["svc"].avg_latency_ms == pytest.approx(2000.0)
    # 3 x 2s = 6s, within [1, 30]
    assert lc.request_timeout_s("svc") == pytest.approx(6.0)

    def fast():
        clk.advance(0.1)

    lc.handle("svc", fast)  # EMA alpha=0.1: 0.9*2000 + 0.1*100 = 1810
    assert lc._services["svc"].avg_latency_ms == pytest.approx(1810.0)
    # clamping
    lc._services["svc"].avg_latency_ms = 50.0
    assert lc.request_timeout_s("svc") == 1.0
    lc._services["svc"].avg_latency_ms = 60000.0
    assert lc.request_timeout_s("svc") == 30.0


def test_decay_and_forced_circuit_reset():
    clk = FakeClock()
    lc = LoadController(breaker_timeout_s=30.0, clock=clk)
    with pytest.raises(RuntimeError):
        lc.handle("svc", _fail)
    m = lc._services["svc"]
    assert m.circuit_open
    lc.decay()
    assert m.error_count == pytest.approx(0.95)
    # is_circuit_open's own probe would close it after 1x timeout; decay's
    # forced reset (2x timeout) also restores the counters
    clk.advance(61.0)
    lc.decay()
    assert not m.circuit_open
    assert m.error_count == 0.0 and m.success_count == 1.0


# -- V5 adaptive batch sizing (load_balancer.cpp:75-85) --------------------


def test_optimal_batch_size_thresholds():
    assert optimal_batch_size(0, 100) == 16
    assert optimal_batch_size(29, 100) == 16
    assert optimal_batch_size(30, 100) == 32
    assert optimal_batch_size(69, 100) == 32
    assert optimal_batch_size(70, 100) == 64
    assert optimal_batch_size(100, 100) == 64
    assert optimal_batch_size(5, 0) == 64  # degenerate: treat as full load


# -- V6 priority queue (load_balancer.cpp:273-329) -------------------------


def test_priority_queue_order_and_fifo():
    q = PriorityRequestQueue()
    q.enqueue(Priority.LOW, "low-1")
    q.enqueue(Priority.URGENT, "urgent-1")
    q.enqueue(Priority.NORMAL, "normal-1")
    q.enqueue(Priority.URGENT, "urgent-2")
    q.enqueue(Priority.HIGH, "high-1")
    assert len(q) == 5
    assert q.drain(3) == ["urgent-1", "urgent-2", "high-1"]
    assert q.dequeue() == "normal-1"
    assert q.dequeue() == "low-1"
    assert q.dequeue() is None
    assert PriorityRequestQueue.pool_name(Priority.URGENT) == "urgent"
    assert PriorityRequestQueue.pool_name(42) == "normal"


# -- V8 health check (health_service.cpp:84-156) ---------------------------


def test_health_check_serving_and_index_gate(spark):
    h = health_check(spark)
    assert h["status"] == "SERVING" and h["compute"]

    class Broken:
        @property
        def manifest(self):
            raise RuntimeError("not loaded")

    h2 = health_check(spark, indices={"bad": Broken()})
    assert h2["status"] == "NOT_SERVING"
    assert not h2["indices_loaded"]


# -- integration: limiter + breaker around a served query stream -----------


def test_serve_query_stream_with_flow_control(spark, sf_dir):
    from cuda_acceleratedvectordatabaseengine_spark.streaming.search_stream import (
        serve_query_stream,
    )

    emb = tables.load(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    tmp = tempfile.mkdtemp(prefix="cavde-flow-")
    try:
        index = IVFIndex.build(
            corpus, f"{tmp}/index", "emb_flow", nlist=8, metric="l2", seed=42
        )
        expected = sorted(
            tuple(r) for r in index.search(queries, k=3, nprobe=8).collect()
        )
        queries.write.mode("overwrite").parquet(f"{tmp}/qs")

        # generous bucket (never actually blocks) + healthy breaker: stream
        # must still produce exactly the batch results
        clk = FakeClock()
        limiter = TokenBucket(
            requests_per_second=1e6, burst_size=1000, clock=clk,
            sleep=lambda s: clk.advance(1.0),
        )
        controller = LoadController(clock=clk)
        collected: list = []
        stream = (
            spark.readStream.schema(queries.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(f"{tmp}/qs")
        )
        q = serve_query_stream(
            index,
            stream,
            k=3,
            nprobe=8,
            output_sink=lambda df, bid: collected.extend(
                tuple(r) for r in df.collect()
            ),
            checkpoint_dir=f"{tmp}/ckpt",
            rate_limiter=limiter,
            controller=controller,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert sorted(collected) == expected
        # every query paid a token; the breaker recorded only successes
        assert limiter.tokens <= 1000 - 6
        svc = controller._services[index.manifest.index_name]
        assert svc.error_count == 0.0 and svc.success_count > 0

        # open circuit -> micro-batches are shed (dropped), stream survives
        controller2 = LoadController(clock=clk)
        controller2.record_error(index.manifest.index_name)  # rate 1.0 -> open
        assert controller2.is_circuit_open(index.manifest.index_name)
        shed: list = []
        stream2 = (
            spark.readStream.schema(queries.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(f"{tmp}/qs")
        )
        q2 = serve_query_stream(
            index,
            stream2,
            k=3,
            nprobe=8,
            output_sink=lambda df, bid: shed.extend(tuple(r) for r in df.collect()),
            checkpoint_dir=f"{tmp}/ckpt2",
            controller=controller2,
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        assert shed == []  # everything shed while open, no crash
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
