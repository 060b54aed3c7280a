#!/usr/bin/env python3
"""HTTP serving throughput: query micro-batching on vs off.

Spawns an engine with a populated index, serves it over the JSON API,
and hammers ``POST /query`` (non-enhanced) from concurrent client
threads — once with the ``QueryBatcher`` enabled and once with every
request dispatching alone.  The delta is the practical value of
coalescing single-query HTTP traffic onto the kernel's batch-scaling
curve (87.9k -> 112.2k QPS from Q=128 to Q=256 at the kernel level).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    import modular_rag_system_tpu as mrs
    from modular_rag_system_tpu.serving import RAGHTTPServer
    from modular_rag_system_tpu.types import Document

    on_tpu = jax.default_backend() == "tpu"
    N = 200_000 if on_tpu else 10_000
    d = 384
    clients = 48 if on_tpu else 8
    per_client = 20 if on_tpu else 5

    def note(msg):
        print(f"[serve] {msg}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((N, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    def run_mode(window_ms: float):
        storage = tempfile.mkdtemp(prefix="serving_bench_")
        cfg = mrs.RAGConfig.load(overrides={
            "embedding.model": "fake",
            "embedding.dim": d,
            "store.storage_path": storage,
            "store.snapshot_on_shutdown": False,
            "retrieval.similarity_threshold": 0.0,
            "index.tier": "bf16",
            "index.store_dtype": "bfloat16",
            "index.initial_capacity": N,
            "serving.file_server_port": 0,
            "serving.query_batch_window_ms": window_ms,
        })
        from modular_rag_system_tpu.facade import EnhancedRAGSystem

        s = EnhancedRAGSystem(cfg, llm_client=False)
        server = RAGHTTPServer(s, port=0)
        try:
            note(f"ingesting {N} docs (window={window_ms})")
            B = 8192
            for lo in range(0, N, B):
                s.engine.add_documents([
                    Document(content=f"doc {i} text", source="bench",
                             embedding=emb[i])
                    for i in range(lo, min(lo + B, N))
                ])
            port = server.start()

            def post(query, timeout=600):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/query",
                    data=json.dumps({"query": query, "enhanced": False,
                                     "max_results": 5}).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=timeout) as r:
                    return json.loads(r.read())

            lat = []
            lock = threading.Lock()

            def worker(ci, record):
                for j in range(per_client):
                    t0 = time.perf_counter()
                    out = post(f"query {ci} {j} words")
                    dt = time.perf_counter() - t0
                    assert out["results"], "empty results"
                    if record:
                        with lock:
                            lat.append(dt)

            def run_round(record):
                threads = [
                    threading.Thread(target=worker, args=(ci, record))
                    for ci in range(clients)
                ]
                t0 = time.perf_counter()
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                return time.perf_counter() - t0

            # untimed warm-up round: compiles the dispatch path and the
            # flush-size batch shapes (each padded Q compiles once)
            note("warm-up round")
            post("warm up the dispatch path")
            run_round(record=False)
            note("timed round")
            wall = run_round(record=True)
            lat.sort()
            n = clients * per_client
            stats = dict(server.batcher.stats) if server.batcher else {}
            return {
                "qps": round(n / wall, 1),
                "p50_ms": round(lat[n // 2] * 1000, 1),
                "p99_ms": round(lat[int(n * 0.99)] * 1000, 1),
                "batcher": stats,
            }
        finally:
            server.stop()
            s.shutdown()
            shutil.rmtree(storage, ignore_errors=True)

    batched = run_mode(4.0)
    unbatched = run_mode(0.0)
    print(json.dumps({
        "metric": "HTTP serving QPS, 48 concurrent clients",
        "value": batched["qps"],
        "unit": "QPS",
        "vs_baseline": round(batched["qps"] / max(unbatched["qps"], 1e-9), 2),
        "corpus": N,
        "batched": batched,
        "unbatched": unbatched,
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
