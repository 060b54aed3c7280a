#!/usr/bin/env python3
"""Benchmark harness for the five BASELINE.json configs (SURVEY §7 step 9).

Each config prints one JSON line; run them all with ``--config all``.

  1 basic-parity : examples/basic_usage.py-style flow — encoder + exact
                   cosine top-5 over a small doc set; checks correctness
                   invariants (self-retrieval, threshold, idempotency)
  2 ingest-100k  : batched chunk-and-embed of 100k chunks -> exact f32
                   index; reports ingest chunks/s and query QPS (recall 1.0
                   by construction)
  3 quant-1m     : 1M-row quantized index (bf16 + int8) searched by the
                   fused kernel; QPS, recall@10 vs exact, memory
  4 ivf-sweep    : IVF with on-device k-means; build time + QPS/recall
                   curve over nprobe
  5 sharded-e2e  : mesh-sharded index across all devices + end-to-end
                   RAG query (encode -> search -> store fetch -> prompt
                   assembly); p50/p99 latency, aggregate QPS

``--scale small`` (default off-TPU) shrinks row counts ~16x for smoke
runs; ``--scale full`` is the TPU sizing.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _normalized(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _sync(x):
    import jax

    jax.block_until_ready(x)
    return x


def _recall(ref_ids, got_ids, k):
    return float(np.mean([
        len(set(ref_ids[i]) & set(got_ids[i])) / k for i in range(len(ref_ids))
    ]))


def _emit(payload):
    print(json.dumps(payload), flush=True)


# ---------------------------------------------------------------------------
def config1_basic_parity(scale):
    import shutil

    import modular_rag_system_tpu as mrs
    from modular_rag_system_tpu.types import Document

    path = "/tmp/bench_cfg1"
    shutil.rmtree(path, ignore_errors=True)
    cfg = mrs.RAGConfig.load(overrides={
        "embedding.model": "fake",  # hermetic: checks engine semantics
        "store.storage_path": path,
        "retrieval.similarity_threshold": 0.0,
    })
    eng = mrs.create_engine(cfg)
    docs = [Document(content=f"document {i} about subject {i % 7} details") for i in range(50)]
    eng.add_documents(docs)
    checks = {}
    # self-retrieval: querying a document's own text returns it first
    res = eng.query(docs[13].content, max_results=1)
    checks["self_retrieval"] = res.documents[0].id == docs[13].id
    # threshold filtering
    checks["threshold"] = eng.query("zzz qqq xxx", similarity_threshold=0.999).documents == []
    # idempotent re-ingest
    n0 = eng.index.count
    eng.add_documents(docs)
    checks["idempotent"] = eng.index.count == n0
    # top-5 ordering is descending
    r5 = eng.query("subject 3 details", max_results=5)
    checks["sorted"] = all(a >= b for a, b in zip(r5.similarities, r5.similarities[1:]))
    eng.shutdown()
    _emit({"config": 1, "name": "basic-parity", "passed": all(checks.values()),
           "checks": checks})


def config2_ingest_100k(scale):
    import jax

    from modular_rag_system_tpu.config import RAGConfig
    from modular_rag_system_tpu.engine import RAGEngine
    import shutil

    n_chunks = 100_000 if scale == "full" else 6_000
    path = "/tmp/bench_cfg2"
    shutil.rmtree(path, ignore_errors=True)
    cfg = RAGConfig.load(overrides={
        "embedding.model": "minilm",
        "embedding.max_seq_len": 64,
        "embedding.batch_size": 512,
        "store.storage_path": path,
        "index.initial_capacity": n_chunks,
    })
    eng = RAGEngine(cfg)
    texts = [f"chunk number {i} containing synthetic words w{i%997} w{i%89} w{i%13}"
             for i in range(n_chunks)]
    from modular_rag_system_tpu.types import Document

    # warm the WHOLE ingest pipeline (encode_device shapes, index
    # append, dedup programs) with a full multi-batch-group add so the
    # reported rate is the steady state, not one-time jit compiles —
    # measured ~20 s of XLA compilation otherwise (r3.6); the r3.7
    # multi-batch dispatch adds one (G=16, bs, bucket) program that
    # must also be warmed
    warm_n = min(cfg.embedding.batch_size * 16, len(texts))
    eng.add_documents([Document(content=t) for t in texts[:warm_n]])
    rest = texts[warm_n:]
    t0 = time.perf_counter()
    eng.add_documents([Document(content=t) for t in rest])
    ingest_s = time.perf_counter() - t0
    n_timed = len(rest)
    # query QPS (batched)
    queries = [f"synthetic words w{i%997}" for i in range(128)]
    eng.query_batch(queries, max_results=10)  # warm/compile (same shape)
    t0 = time.perf_counter()
    eng.query_batch(queries, max_results=10)
    query_s = time.perf_counter() - t0
    eng.shutdown()
    _emit({"config": 2, "name": "ingest-100k", "chunks": n_chunks,
           "ingest_chunks_per_s": round(n_timed / ingest_s, 1),
           "ingest_s": round(ingest_s, 2),
           "qps": round(128 / query_s, 1), "recall_at_10": 1.0,
           "backend": jax.default_backend()})


def config3_quant_1m(scale):
    import jax
    import jax.numpy as jnp

    from modular_rag_system_tpu.ops.binmax_topk import (
        twopass_topk,
        twopass_topk_int8,
    )
    from modular_rag_system_tpu.ops.exact import exact_topk
    from modular_rag_system_tpu.ops.quantize import quantize_rows

    N = 1_048_576 if scale == "full" else 65_536
    d, Q, k = 384, 128, 10
    rng = np.random.default_rng(0)
    E = _normalized(rng, N, d)
    q = _normalized(rng, Q, d)
    Ej, qj, cnt = jnp.asarray(E), jnp.asarray(q), jnp.int32(N)
    _, eids = exact_topk(Ej, cnt, qj, k)
    eids = np.asarray(_sync(eids))
    out = {"config": 3, "name": "quant-1m", "rows": N,
           "backend": jax.default_backend()}
    for tier, prep in (
        ("bf16", lambda: (Ej.astype(jnp.bfloat16),)),
        ("int8", lambda: quantize_rows(Ej)),
    ):
        arrs = prep()
        _sync(arrs[0])
        if tier == "bf16":
            fn = lambda: twopass_topk(arrs[0], cnt, qj, k)
            mem = N * d * 2
        else:
            fn = lambda: twopass_topk_int8(arrs[0], arrs[1], cnt, qj, k)
            mem = N * d + N * 4
        vals, ids = fn()
        np.asarray(vals)
        iters = 20 if scale == "full" else 5
        t0 = time.perf_counter()
        for _ in range(iters):
            vals, ids = fn()
        np.asarray(vals)
        dt = (time.perf_counter() - t0) / iters
        out[tier] = {
            "qps": round(Q / dt, 1),
            "recall_at_10": round(_recall(eids, np.asarray(ids), k), 4),
            "index_mb": round(mem / 1e6, 1),
        }
    out["f32_index_mb"] = round(N * d * 4 / 1e6, 1)
    _emit(out)


def config4_ivf_sweep(scale):
    import jax
    import jax.numpy as jnp

    from modular_rag_system_tpu.ops.exact import exact_topk
    from modular_rag_system_tpu.ops.ivf2 import IVF2, ivf2_search_core

    N = 4_194_304 if scale == "full" else 16_384
    # interpret-mode Pallas (CPU smoke) pays a Python-loop fine kernel;
    # keep the smoke tiny
    d, Q, k = 384, (64 if scale == "full" else 8), 10
    rng = np.random.default_rng(0)
    # clustered corpus: uniformly random vectors have no neighborhood
    # structure for IVF to exploit (recall == fraction scanned); real
    # embedding spaces cluster, so the sweep uses center+noise data
    n_centers = max(N // 1024, 64)
    sigma = 0.35 / np.sqrt(d)  # total noise norm ~0.35 vs unit centers
    centers = jnp.asarray(_normalized(rng, n_centers, d))

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def sample(key, n_static_shape):
        k1, k2 = jax.random.split(key)
        assign = jax.random.randint(k1, (n_static_shape,), 0, n_centers)
        x = centers[assign] + sigma * jax.random.normal(
            k2, (n_static_shape, d), dtype=jnp.float32
        )
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    # generate on device: 4M x 384 host RNG takes minutes single-threaded
    Ej = _sync(sample(jax.random.PRNGKey(0), N))
    qj = _sync(sample(jax.random.PRNGKey(1), Q))
    _, eids = exact_topk(Ej, jnp.int32(N), qj, k)
    eids = np.asarray(_sync(eids))
    n_clusters = int(round(N ** 0.5))
    t0 = time.perf_counter()
    ivf = IVF2.build(Ej, N, n_clusters=n_clusters, iters=8,
                     fine_dtype="bf16" if scale != "full" else "int8",
                     balance=1.5)  # the tier default (LBG splits)
    _sync(ivf.E_c3)
    build_s = time.perf_counter() - t0
    sc3 = (ivf.scales3 if ivf.scales3 is not None
           else jnp.zeros((1, 1), jnp.float32))
    curve = []
    U = 4
    probe_list = (1, 2, 4, 8, 16, 32) if scale == "full" else (2, 8)
    for nprobe in probe_list:
        if nprobe > n_clusters:
            break
        L = ivf.slots_for_nprobe(nprobe)
        L = ((L + U - 1) // U) * U
        from modular_rag_system_tpu.ops.fused_topk import _use_interpret

        core = jax.jit(functools.partial(
            ivf2_search_core, k=k, nprobe=nprobe, L=L, tail_max=0, U=U,
            interpret=_use_interpret()))
        cnt = jnp.int32(N)
        args = (Ej, ivf.E_c3, sc3, ivf.perm, ivf.centroids, ivf.blk_start,
                ivf.nblk, ivf.counts, cnt, cnt, qj)
        vals, ids = core(*args)
        np.asarray(vals)
        iters = 10 if scale == "full" else 3
        t0 = time.perf_counter()
        for _ in range(iters):
            vals, ids = core(*args)
        np.asarray(vals)
        dt = (time.perf_counter() - t0) / iters
        curve.append({"nprobe": nprobe, "qps": round(Q / dt, 1),
                      "recall_at_10": round(_recall(eids, np.asarray(ids), k), 4)})
    _emit({"config": 4, "name": "ivf-sweep (ivf2 cluster-contiguous)",
           "rows": N, "clusters": n_clusters, "build_s": round(build_s, 2),
           "nblocks": ivf.nblocks, "curve": curve,
           "backend": jax.default_backend()})


def config5_sharded_e2e(scale):
    import shutil

    import jax

    from modular_rag_system_tpu.config import RAGConfig
    from modular_rag_system_tpu.engine import RAGEngine
    from modular_rag_system_tpu.parallel.mesh import default_devices
    from modular_rag_system_tpu.types import Document

    devices = default_devices()
    shards = len(devices)
    n_docs = 50_000 if scale == "full" else 4_000
    path = "/tmp/bench_cfg5"
    shutil.rmtree(path, ignore_errors=True)
    cfg = RAGConfig.load(overrides={
        "embedding.model": "minilm",
        "embedding.max_seq_len": 64,
        "embedding.batch_size": 512,
        "store.storage_path": path,
        "index.tier": "fused",
        "index.block_rows": 256,
        "mesh.index_shards": shards,
        "retrieval.similarity_threshold": 0.0,
    })
    eng = RAGEngine(cfg)
    eng.add_documents([
        Document(content=f"sharded corpus doc {i} tokens t{i%503} t{i%47}")
        for i in range(n_docs)
    ])
    # end-to-end single-query latency: encode -> sharded search -> store
    for i in range(3):  # warm the single-query program (compile excluded)
        eng.query(f"tokens t{i % 503}", max_results=5)
    lat = []
    for i in range(40):
        t0 = time.perf_counter()
        res = eng.query(f"tokens t{i % 503}", max_results=5)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.array(sorted(lat)) * 1000
    # aggregate throughput via batch path
    queries = [f"tokens t{i % 503}" for i in range(128)]
    eng.query_batch(queries)  # warm/compile (same shape)
    t0 = time.perf_counter()
    eng.query_batch(queries)
    agg = 128 / (time.perf_counter() - t0)
    eng.shutdown()
    _emit({"config": 5, "name": "sharded-e2e", "docs": n_docs,
           "shards": shards,
           "p50_ms": round(float(lat_ms[len(lat_ms) // 2]), 2),
           "p99_ms": round(float(lat_ms[int(len(lat_ms) * 0.99)]), 2),
           "aggregate_qps": round(agg, 1),
           "backend": jax.default_backend()})


CONFIGS = {
    "1": config1_basic_parity,
    "2": config2_ingest_100k,
    "3": config3_quant_1m,
    "4": config4_ivf_sweep,
    "5": config5_sharded_e2e,
}


def main() -> int:
    import jax

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="all", help="1-5 or 'all'")
    ap.add_argument("--scale", default=None, choices=["small", "full"])
    args = ap.parse_args()
    scale = args.scale or ("full" if jax.default_backend() == "tpu" else "small")
    names = list(CONFIGS) if args.config == "all" else [args.config]
    unknown = [n for n in names if n not in CONFIGS]
    if unknown:
        ap.error(f"unknown config(s) {unknown}; choose from {list(CONFIGS)} or 'all'")
    for name in names:
        CONFIGS[name](scale)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
