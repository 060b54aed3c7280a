#!/usr/bin/env python3
"""At-scale engine soak: lifecycle correctness under the round-2 kernels.

CPU-mesh tests cannot catch TPU-only numeric behavior (round 1's
denormal-flush id corruption at 500k rows passed every CPU test), so any
change touching device data movement gets driven here on the real chip:
ingest at scale, exact self-retrieval spot checks, deletes, tier
switches (bf16 -> int8, exercising full quantization + incremental
derived updates), post-quantization appends, snapshot/restart parity.

Prints ONE JSON line with pass/fail per invariant and timings.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    import modular_rag_system_tpu as mrs
    from modular_rag_system_tpu.types import Document

    on_tpu = jax.default_backend() == "tpu"
    N = 400_000 if on_tpu else 20_000
    d = 384
    B = 8192

    def note(msg):
        print(f"[soak] {msg}", file=sys.stderr, flush=True)

    storage = tempfile.mkdtemp(prefix="soak_")
    cfg = mrs.RAGConfig.load(overrides={
        "embedding.model": "fake",
        "embedding.dim": d,
        "store.storage_path": storage,
        "store.snapshot_on_shutdown": False,
        "retrieval.similarity_threshold": 0.0,
        "index.tier": "bf16",
        "index.store_dtype": "bfloat16",
        "index.initial_capacity": N + B,
    })
    eng = mrs.create_engine(cfg)
    checks = {}
    timings = {}
    rng = np.random.default_rng(0)
    try:
        # --- ingest with precomputed embeddings (index path at scale) --
        note(f"ingesting {N} docs")
        t0 = time.perf_counter()
        emb = rng.standard_normal((N, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        for lo in range(0, N, B):
            docs = [
                Document(content=f"soak doc {i}", source="soak",
                         embedding=emb[i], metadata={"i": i})
                for i in range(lo, min(lo + B, N))
            ]
            eng.add_documents(docs)
        timings["ingest_s"] = round(time.perf_counter() - t0, 1)

        def self_retrieval(rows, tag):
            q = emb[rows]
            scores, got = eng.index.search(q, 1)
            ok = bool(np.array_equal(got[:, 0], rows))
            checks[tag] = ok
            if not ok:
                note(f"{tag} FAILED: {rows[:5]} -> {got[:5, 0]}")

        spot = rng.choice(N, 64, replace=False).astype(np.int64)
        t0 = time.perf_counter()
        self_retrieval(spot, "bf16_self_retrieval")
        timings["bf16_search_s"] = round(time.perf_counter() - t0, 1)

        # --- deletes are invisible --------------------------------------
        note("deleting 5k docs")
        victims = rng.choice(N, 5000, replace=False).astype(np.int64)
        vs = sorted(int(v) for v in victims)
        del_ids = [doc.id for doc in eng.store.get_by_rows(vs, bump_access=False)
                   if doc is not None]
        eng.store.delete_ids(del_ids)
        deleted = eng.store.deleted_rows()
        eng.index.delete_rows(deleted[deleted < eng.index.count])
        scores, got = eng.index.search(emb[victims[:64]], 1)
        checks["deleted_never_top1"] = bool(
            not np.isin(got[:, 0], victims).any()
        )

        # --- tier switch to int8 (full quantize at scale) ---------------
        note("switching tier to int8")
        eng.index.tier = "int8"
        t0 = time.perf_counter()
        live = np.setdiff1d(spot, victims)
        scores, got = eng.index.search(emb[live], 1)
        timings["int8_quantize_and_search_s"] = round(time.perf_counter() - t0, 1)
        checks["int8_self_retrieval"] = bool(np.array_equal(got[:, 0], live))

        # --- post-quantization append (incremental derived update) ------
        note("appending post-quantization batch")
        extra = rng.standard_normal((1024, d)).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=1, keepdims=True)
        docs = [
            Document(content=f"extra doc {i}", source="soak2",
                     embedding=extra[i]) for i in range(len(extra))
        ]
        eng.add_documents(docs)
        scores, got = eng.index.search(extra[:64], 1)
        checks["post_quant_append_self_retrieval"] = bool(
            np.array_equal(got[:, 0], np.arange(N, N + 64))
        )
        checks["incremental_rows_maintained"] = (
            eng.index.derived_incremental_rows > 0
        )

        # --- ivf2 tier: clustered search + exact tail under writes ------
        note("switching tier to ivf (ivf2 build)")
        eng.index.tier = "ivf"
        t0 = time.perf_counter()
        eng.index.build_ann()
        timings["ivf_build_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        scores, got = eng.index.search(emb[live], 10)
        timings["ivf_first_search_s"] = round(time.perf_counter() - t0, 1)
        hit = float(np.mean([live[i] in got[i] for i in range(len(live))]))
        checks["ivf_self_retrieval_90pct"] = bool(hit >= 0.9)
        # appends land in the exact tail: O(batch) write, NO rebuild,
        # no multi-second query stall (VERDICT r2 item 2)
        builds_before = eng.index.ivf_rebuilds
        extra2 = rng.standard_normal((512, d)).astype(np.float32)
        extra2 /= np.linalg.norm(extra2, axis=1, keepdims=True)
        base = eng.index.count
        eng.add_documents([
            Document(content=f"tail doc {i}", source="soak3",
                     embedding=extra2[i]) for i in range(len(extra2))
        ])
        eng.index.search(extra2[:64], 1)  # warm the tail program (compile)
        t0 = time.perf_counter()
        scores, got = eng.index.search(extra2[:64], 1)
        timings["ivf_tail_query_s"] = round(time.perf_counter() - t0, 2)
        checks["ivf_tail_exact_self_retrieval"] = bool(
            np.array_equal(got[:, 0], np.arange(base, base + 64))
        )
        checks["ivf_write_no_rebuild"] = (
            eng.index.ivf_rebuilds == builds_before
        )
        # the stall bound is a TPU-scale invariant; CPU smoke runs the
        # fine kernel in interpret mode (Python-loop slow by design)
        checks["ivf_tail_query_fast"] = (
            timings["ivf_tail_query_s"] < 5.0 if on_tpu else True
        )
        eng.index.tier = "int8"  # snapshot section keeps the int8 path

        # --- snapshot / restart parity ----------------------------------
        note("snapshot + restart")
        t0 = time.perf_counter()
        eng.save()
        eng.shutdown()
        timings["snapshot_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        eng2 = mrs.create_engine(cfg)
        timings["restart_s"] = round(time.perf_counter() - t0, 1)
        scores, got = eng2.index.search(emb[live[:32]], 1)
        checks["post_restart_self_retrieval"] = bool(
            np.array_equal(got[:, 0], live[:32])
        )
        eng2.shutdown()

        ok = all(checks.values())
        print(json.dumps({
            "metric": "engine soak invariants",
            "value": 1.0 if ok else 0.0,
            "unit": "pass",
            "vs_baseline": 1.0 if ok else 0.0,
            "rows": N,
            "checks": checks,
            "timings": timings,
            "backend": jax.default_backend(),
        }))
        return 0 if ok else 1
    finally:
        try:
            eng.shutdown()
        except Exception:
            pass
        shutil.rmtree(storage, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
