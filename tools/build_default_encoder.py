#!/usr/bin/env python3
"""Build the bundled default encoder assets (VERDICT r2 item 3).

Pipeline (everything in-framework, zero egress):
  1. harvest English sentences from the container (models/corpus.py),
  2. train a WordPiece vocab on them (models/wordpiece_train.py),
  3. train a from-scratch MiniLM-class encoder with ContrastiveTrainer
     on crop + synonym-substitution pairs mixed with compositional
     synthetic paraphrase facts (models/synth.py),
  4. evaluate out-of-the-box retrieval vs the hash and random-init
     baselines on held-out English and zero-overlap synthetic evals,
  5. write modular_rag_system_tpu/assets/default_encoder/
     (vocab.txt + params.npz f16 + arch.json) for
     models/default_ckpt.try_build_default_encoder.

Run on the TPU (takes a few minutes); CPU works for smoke runs with
--smoke.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(f"[default-encoder] {msg}", file=sys.stderr, flush=True)


def english_eval(encoder, docs, queries, k=10):
    D = np.asarray(encoder.encode(list(docs)), dtype=np.float32)
    Q = np.asarray(encoder.encode(list(queries)), dtype=np.float32)
    D /= np.maximum(np.linalg.norm(D, axis=1, keepdims=True), 1e-9)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-9)
    s = Q @ D.T
    top = np.argpartition(-s, min(k, s.shape[1] - 1), axis=1)[:, :k]
    return float(np.mean([i in top[i] for i in range(len(queries))]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny corpus/model for CPU smoke runs")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--vocab-size", type=int, default=8192)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from modular_rag_system_tpu.models.corpus import (
        _WORDISH,
        _crop,
        _substitute,
        harvest_container_text,
        make_pairs,
        synonym_table,
        SYNONYMS,
    )
    from modular_rag_system_tpu.models.default_ckpt import save_default_encoder
    from modular_rag_system_tpu.models.encoder import MiniLMEncoder
    from modular_rag_system_tpu.models.fake import FeatureHashEncoder
    from modular_rag_system_tpu.models.synth import make_paraphrase_corpus
    from modular_rag_system_tpu.models.tokenizer import WordPieceTokenizer
    from modular_rag_system_tpu.models.train import ContrastiveTrainer
    from modular_rag_system_tpu.models.wordpiece_train import train_wordpiece
    from modular_rag_system_tpu.parallel.mesh import make_train_mesh

    if args.smoke:
        args.steps = min(args.steps, 60)
        args.vocab_size = 2048
        max_sent, max_py = 20_000, 800
        n_ent, n_rel = 30, 12
        max_len = 48
    else:
        max_sent, max_py = 300_000, 8_000
        n_ent, n_rel = 120, 50
        max_len = 128

    t0 = time.time()
    sents = harvest_container_text(max_sentences=max_sent, max_py_files=max_py)
    log(f"harvested {len(sents)} sentences in {time.time()-t0:.0f}s")
    rng = random.Random(0)
    rng.shuffle(sents)
    n_eval = min(5000, len(sents) // 10)
    eval_sents, train_sents = sents[:n_eval], sents[n_eval:]

    synth = make_paraphrase_corpus(n_entities=n_ent, n_relations=n_rel,
                                   seed=0)
    vocab_text = train_sents + synth.docs + synth.train_queries + [
        a + " " + b for a, b in SYNONYMS
    ]
    t0 = time.time()
    vocab = train_wordpiece(vocab_text, vocab_size=args.vocab_size)
    log(f"vocab {len(vocab)} pieces in {time.time()-t0:.0f}s")

    # training pairs: english crops/synonyms + synthetic facts + raw
    # synonym word pairs
    n_pairs = args.steps * args.batch
    qs, ps = make_pairs(train_sents, int(n_pairs * 0.75), seed=1)
    synth_q = synth.train_queries
    synth_p = [synth.docs[i] for i in synth.train_doc_idx]
    while len(qs) < n_pairs * 0.95:
        i = rng.randrange(len(synth_q))
        qs.append(synth_q[i])
        ps.append(synth_p[i])
    while len(qs) < n_pairs:
        a, b = SYNONYMS[rng.randrange(len(SYNONYMS))]
        if rng.random() < 0.5:
            a, b = b, a
        qs.append(a)
        ps.append(b)
    order = list(range(len(qs)))
    rng.shuffle(order)
    qs = [qs[i] for i in order]
    ps = [ps[i] for i in order]
    log(f"{len(qs)} training pairs")

    tok = WordPieceTokenizer(vocab, max_len=max_len)
    arch = dict(num_layers=args.layers, hidden=384, heads=12,
                mlp_dim=1536, vocab_size=len(vocab), max_len=max_len)
    enc = MiniLMEncoder(
        dim=384, max_seq_len=max_len, batch_size=256, dtype="bfloat16",
        num_layers=args.layers, num_heads=12, mlp_dim=1536,
        vocab_size=len(vocab), tokenizer=tok,
    )
    mesh = make_train_mesh(1, 1)
    trainer = ContrastiveTrainer(enc, mesh, learning_rate=1e-3,
                                 warmup_steps=max(args.steps // 20, 10))

    # held-out English eval: synonym-substituted crops as queries
    table = synonym_table()
    erng = random.Random(7)
    e_docs, e_queries = [], []
    for s in eval_sents[:2000]:
        words = _WORDISH.findall(s.lower())
        if len(words) < 6:
            continue
        e_docs.append(s.lower())
        e_queries.append(_substitute(
            _WORDISH.findall(_crop(words, erng)), table, erng))
    log(f"english eval: {len(e_docs)} docs")

    t0 = time.time()
    for step in range(args.steps):
        lo = (step * args.batch) % len(qs)
        hi = lo + args.batch
        loss, acc = trainer.step(qs[lo:hi], ps[lo:hi])
        if step % max(args.steps // 20, 1) == 0:
            log(f"step {step}/{args.steps} loss={loss:.4f} acc={acc:.3f}")
    log(f"trained in {time.time()-t0:.0f}s")
    trainer.sync_encoder()

    from modular_rag_system_tpu.models.synth import recall_at_k

    results = {}
    hash_enc = FeatureHashEncoder(dim=384)
    rand_enc = MiniLMEncoder(dim=384, max_seq_len=max_len, batch_size=256,
                             dtype="bfloat16", num_layers=args.layers,
                             num_heads=12, mlp_dim=1536,
                             vocab_size=len(vocab), tokenizer=tok, seed=3)
    for name, e in (("hash", hash_enc), ("random-init", rand_enc),
                    ("trained", enc)):
        results[f"english_recall@10/{name}"] = round(
            english_eval(e, e_docs, e_queries), 4)
        results[f"synth_recall@10/{name}"] = round(
            recall_at_k(e, synth, 10), 4)
        log(f"{name}: english {results[f'english_recall@10/{name}']} "
            f"synth {results[f'synth_recall@10/{name}']}")

    params_host = __import__("jax").tree.map(np.asarray, enc.params)
    out = save_default_encoder(params_host, arch, vocab, args.out)
    size_mb = sum(f.stat().st_size for f in Path(out).iterdir()) / 1e6
    log(f"assets written to {out} ({size_mb:.1f} MB)")
    print(json.dumps({"assets": out, "size_mb": round(size_mb, 1),
                      "steps": args.steps, **results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
