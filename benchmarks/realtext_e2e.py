#!/usr/bin/env python3
"""End-to-end text retrieval benchmark: ingest -> fine-tune -> query.

VERDICT r1 item 9: the kernel benchmarks measure QPS on random vectors;
this one measures the number a RAG user recognizes — paraphrase recall
and latency over an actual TEXT corpus driven through the full engine
(chunker -> device encoder -> HBM index -> store fetch).

Protocol
  1. generate a fact corpus (``models/synth.py``): ~100k single-fact
     documents whose queries share zero words with them, plus long-form
     filler texts that exercise the chunker and act as distractors;
  2. fine-tune the engine's serving encoder in-framework on the train
     split (``ContrastiveTrainer`` + ``sync_encoder``);
  3. batch-ingest everything through ``engine.add_documents`` /
     ``engine.add_text`` (device-resident bulk path), timed;
  4. query with held-out paraphrases through ``engine.query_batch`` (QPS)
     and single ``engine.query`` calls (p50/p99 latency, includes the
     full store fetch + post-processing path);
  5. score semantic recall@10 by gold fact id in result metadata.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import numpy as np
    import jax

    import modular_rag_system_tpu as mrs
    from modular_rag_system_tpu.models.synth import make_paraphrase_corpus
    from modular_rag_system_tpu.models.train import ContrastiveTrainer
    from modular_rag_system_tpu.parallel.mesh import default_devices, make_train_mesh
    from modular_rag_system_tpu.types import Document

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        n_entities, n_relations = 352, 290        # ~102k fact docs
        steps, batch, lr = 500, 256, 5e-4
        n_filler, eval_n, lat_n = 200, 1000, 40
        enc_over = {"embedding.num_layers": 4, "embedding.max_seq_len": 32,
                    "embedding.dtype": "float32"}
    else:
        n_entities, n_relations = 24, 16          # smoke: 384 facts
        steps, batch, lr = 200, 64, 3e-3
        n_filler, eval_n, lat_n = 8, 60, 10
        enc_over = {"embedding.dim": 128, "embedding.num_layers": 2,
                    "embedding.num_heads": 4, "embedding.mlp_dim": 256,
                    "embedding.vocab_size": 4096, "embedding.max_seq_len": 12,
                    "embedding.dtype": "float32"}

    def note(msg):
        print(f"[e2e] {msg}", file=sys.stderr, flush=True)

    corpus = make_paraphrase_corpus(n_entities=n_entities,
                                    n_relations=n_relations, seed=0)
    note(f"corpus: {len(corpus.docs)} facts, "
         f"{len(corpus.eval_queries)} held-out queries")

    import shutil
    import tempfile

    storage = tempfile.mkdtemp(prefix="realtext_e2e_")
    cfg = mrs.RAGConfig.load(overrides={
        "embedding.model": "minilm",
        "store.storage_path": storage,
        "store.snapshot_on_shutdown": False,
        "retrieval.similarity_threshold": 0.0,
        "retrieval.time_weight": 0.0,
        "index.tier": "bf16",
        "index.store_dtype": "bfloat16",
        "index.initial_capacity": len(corpus.docs) + 65536,
        **enc_over,
    })
    eng = mrs.create_engine(cfg)
    try:
        # --- 2. fine-tune the serving encoder -------------------------
        devices = default_devices()
        mesh = make_train_mesh(len(devices), 1, devices=devices)
        trainer = ContrastiveTrainer(eng.encoder, mesh, learning_rate=lr,
                                     warmup_steps=min(100, steps // 4))
        pairs = list(zip(corpus.train_queries,
                         [corpus.docs[i] for i in corpus.train_doc_idx]))
        rng = random.Random(1)
        t0 = time.perf_counter()
        for step in range(steps):
            sample = [pairs[rng.randrange(len(pairs))] for _ in range(batch)]
            loss, acc = trainer.step([q for q, _ in sample],
                                     [p for _, p in sample])
            if step % 200 == 0:
                note(f"train step {step} loss={float(loss):.3f} "
                     f"acc={float(acc):.2f}")
        train_s = time.perf_counter() - t0
        trainer.sync_encoder()
        note(f"trained {steps} steps in {train_s:.0f}s")

        # --- 3. ingest -------------------------------------------------
        wrng = random.Random(2)
        vocab = [w for cn, al in corpus.entities for w in (cn + " " + al).split()]
        t0 = time.perf_counter()
        B = 4096
        for lo in range(0, len(corpus.docs), B):
            docs = [
                Document(content=corpus.docs[i], source="facts",
                         metadata={"fact": i})
                for i in range(lo, min(lo + B, len(corpus.docs)))
            ]
            eng.add_documents(docs)
        n_chunks = len(corpus.docs)
        # long-form filler through the chunker (distractors)
        for f in range(n_filler):
            text = " ".join(wrng.choice(vocab) for _ in range(2000))
            n_chunks += len(eng.add_text(text, source="filler"))
        ingest_s = time.perf_counter() - t0
        note(f"ingested {n_chunks} chunks in {ingest_s:.0f}s "
             f"({n_chunks / ingest_s:.0f} chunks/s)")

        # --- 4+5. query: recall, QPS, latency --------------------------
        erng = random.Random(3)
        eval_ids = list(range(len(corpus.eval_queries)))
        erng.shuffle(eval_ids)
        eval_ids = eval_ids[:eval_n]
        qtexts = [corpus.eval_queries[i] for i in eval_ids]
        golds = [corpus.eval_doc_idx[i] for i in eval_ids]

        QB = 128
        # warm both query shapes UNTIMED: the first call per shape pays
        # the remote compile (tens of seconds), which is not a serving
        # number
        eng.query_batch(qtexts[:QB], max_results=10)
        eng.query(qtexts[0], max_results=10)
        hits = 0
        t0 = time.perf_counter()
        for lo in range(0, len(qtexts), QB):
            res = eng.query_batch(qtexts[lo:lo + QB], max_results=10)
            for r, gold in zip(res, golds[lo:lo + QB]):
                if any(d.metadata.get("fact") == gold for d in r.documents):
                    hits += 1
        batch_s = time.perf_counter() - t0
        recall = hits / len(qtexts)
        qps = len(qtexts) / batch_s

        lats = []
        for qt in qtexts[:lat_n]:
            t0 = time.perf_counter()
            eng.query(qt, max_results=10)
            lats.append(time.perf_counter() - t0)
        lats.sort()
        p50 = lats[len(lats) // 2] * 1000
        p99 = lats[min(len(lats) - 1, int(len(lats) * 0.99))] * 1000

        print(json.dumps({
            "metric": "end-to-end text RAG: semantic recall@10 + QPS",
            "value": round(recall, 4),
            "unit": "recall",
            "vs_baseline": round(recall / max(10 / len(corpus.docs), 1e-9), 1),
            "corpus_chunks": n_chunks,
            "query_qps_batch128": round(qps, 1),
            "latency_p50_ms": round(p50, 1),
            "latency_p99_ms": round(p99, 1),
            "ingest_chunks_per_s": round(n_chunks / ingest_s, 1),
            "train_seconds": round(train_s, 1),
            "eval_queries": len(qtexts),
            "note": "single-query latency includes the host relay round-trip",
            "backend": jax.default_backend(),
        }))
        return 0
    finally:
        eng.shutdown()
        shutil.rmtree(storage, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
