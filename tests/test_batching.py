"""Server-side query micro-batching (batching.py): coalescing,
per-parameter grouping, error delivery, and HTTP integration."""

import threading
import time

import numpy as np
import pytest

from modular_rag_system_tpu.batching import QueryBatcher


class FakeEngine:
    """Records batch shapes; returns per-text markers."""

    def __init__(self, delay_s=0.0, fail=False):
        self.calls = []
        self.delay_s = delay_s
        self.fail = fail

    def query_batch(self, texts, max_results=5, similarity_threshold=None,
                    source_filters=None, metadata_filters=None):
        if self.fail:
            raise RuntimeError("backend down")
        time.sleep(self.delay_s)
        self.calls.append((list(texts), max_results))
        return [f"res:{t}:k{max_results}" for t in texts]


def test_concurrent_submits_coalesce():
    eng = FakeEngine()
    b = QueryBatcher(eng, window_ms=30, max_batch=64)
    try:
        results = {}

        def worker(i):
            results[i] = b.submit(f"q{i}")

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == {i: f"res:q{i}:k5" for i in range(16)}
        # 16 concurrent queries inside one 30 ms window -> far fewer
        # dispatches than queries (typically 1)
        assert b.stats["flushes"] < 16
        assert b.stats["max_flush"] > 1
        assert sum(len(c[0]) for c in eng.calls) == 16
    finally:
        b.close()


def test_max_batch_flushes_immediately():
    eng = FakeEngine()
    b = QueryBatcher(eng, window_ms=10_000, max_batch=4)
    try:
        results = {}

        def worker(i):
            results[i] = b.submit(f"q{i}")

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # flushed on max_batch, not the 10 s window
        assert time.monotonic() - t0 < 5.0
        assert len(results) == 4
    finally:
        b.close()


def test_parameter_groups_stay_separate():
    eng = FakeEngine()
    b = QueryBatcher(eng, window_ms=20, max_batch=64)
    try:
        out = {}

        def worker(i, k):
            out[(i, k)] = b.submit(f"q{i}", max_results=k)

        threads = [threading.Thread(target=worker, args=(i, 3 + (i % 2)))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for (i, k), r in out.items():
            assert r == f"res:q{i}:k{k}"
        # every flushed batch was parameter-homogeneous
        for texts, k in eng.calls:
            assert all(int(t[1:]) % 2 == (k - 3) for t in texts)
    finally:
        b.close()


def test_backend_error_delivered_to_all_waiters():
    b = QueryBatcher(FakeEngine(fail=True), window_ms=5, max_batch=8)
    try:
        with pytest.raises(RuntimeError, match="backend down"):
            b.submit("boom")
    finally:
        b.close()


def test_http_query_path_batches(fake_config):
    """Concurrent non-enhanced HTTP queries coalesce into fewer device
    dispatches and return the same payloads as sequential ones."""
    import json
    import urllib.request

    from modular_rag_system_tpu.facade import EnhancedRAGSystem
    from modular_rag_system_tpu.serving import RAGHTTPServer

    cfg = fake_config.merged({
        "serving": {"file_server_port": 0, "query_batch_window_ms": 25.0},
        "retrieval": {"similarity_threshold": 0.0},
    })
    s = EnhancedRAGSystem(cfg, llm_client=False)
    server = RAGHTTPServer(s, port=0)
    try:
        s.engine.add_document("alpha neural networks compile", source="a")
        s.engine.add_document("beta fruit salad recipe", source="b")
        port = server.start()

        def post(query):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/query",
                data=json.dumps({"query": query, "enhanced": False,
                                 "max_results": 2}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read())

        outs = {}

        def worker(i):
            outs[i] = post("neural networks" if i % 2 == 0 else "fruit salad")

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, o in outs.items():
            top = o["results"][0]["source"]
            assert top == ("a" if i % 2 == 0 else "b")
        assert server.batcher.stats["queries"] == 10
        assert server.batcher.stats["flushes"] < 10
    finally:
        server.stop()
        s.shutdown()


def test_submit_after_close_raises():
    """ADVICE r2: a submit racing close must fail fast, not park for the
    full timeout (the collector has already exited without flushing)."""
    b = QueryBatcher(FakeEngine(), window_ms=5, max_batch=8)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit("late")


def test_close_fails_parked_submitters_immediately():
    eng = FakeEngine()
    b = QueryBatcher(eng, window_ms=60_000, max_batch=64)
    errs = {}

    def worker():
        try:
            b.submit("parked", timeout_s=30)
        except BaseException as e:  # noqa: BLE001 - recorded for assert
            errs["e"] = e

    t = threading.Thread(target=worker)
    t.start()
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline:  # wait for the pending to enqueue
        with b._lock:
            if b._groups:
                break
        time.sleep(0.01)
    t0 = time.monotonic()
    b.close()
    t.join(timeout=10)
    assert not t.is_alive()
    assert time.monotonic() - t0 < 5.0, "close left the submitter parked"
    assert isinstance(errs.get("e"), RuntimeError)


def test_oversized_group_is_split_at_flush():
    """ADVICE r2: a group grown past max_batch between collector wakeups
    must flush in max_batch-sized chunks (bounded compiled batch shapes)."""
    from modular_rag_system_tpu.batching import _Pending

    eng = FakeEngine()
    b = QueryBatcher(eng, window_ms=60_000, max_batch=4)
    try:
        key = (5, None, None, None)
        pendings = [_Pending(f"q{i}") for i in range(10)]
        with b._cond:
            # simulate submits racing a held-open window
            b._groups[key] = (time.monotonic() - 120.0, list(pendings))
            b._cond.notify()
        for p in pendings:
            assert p.event.wait(10)
        assert eng.calls and all(len(c[0]) <= 4 for c in eng.calls)
        assert sum(len(c[0]) for c in eng.calls) == 10
    finally:
        b.close()
