"""External (non-synthetic) retrieval eval — VERDICT r3 item 3.

Every other semantic number in this repo is scored on corpora emitted
by ``models/synth.py`` — the same generator the bundled encoder is
trained on, so a generator bug or a train/eval pool leak would inflate
all of them at once.  This module breaks that circularity: it scores
retrieval on ``assets/eval/external_qa.json``, a HAND-WRITTEN set of
304 query->passage pairs (38 topics x 8; grown from 96 in round 5,
VERDICT r4 item 5, for statistical legibility) with same-topic
passages as hard distractors, whose data path never touches
``synth.py`` or ``models/corpus.py``.  The reference's de-facto
quality bar was a real pretrained model on real text
(``embedding_pipeline.py:424``, all-MiniLM-L6-v2); this is the
in-repo equivalent measurement.

Scoring: encode all passages and all queries with the SAME encoder
(the framework's one-encoder contract), cosine top-k, report the
fraction of queries whose gold passage appears in the top k, with a
95% Wilson binomial interval.  Chance at k=10 over 304 docs is
~0.033.

Train/eval discipline: this file is eval-only by construction, and
``tests/test_external_eval.py`` additionally asserts that no eval
passage text leaks into the bundled training assets
(``assets/train/``) or the encoder's training-pair generators.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Tuple

import numpy as np

EVAL_PATH = (Path(__file__).resolve().parent.parent / "assets" / "eval"
             / "external_qa.json")


def load_external_qa(path: str | None = None) -> Tuple[List[str], List[str]]:
    """Returns (queries, passages); queries[i]'s gold passage is
    passages[i]."""
    data = json.loads(Path(path or EVAL_PATH).read_text())
    items = data["items"]
    return ([it["query"] for it in items],
            [it["passage"] for it in items])


def wilson_interval(p: float, n: int, z: float = 1.96) -> Tuple[float, float]:
    """95% Wilson score interval for a binomial proportion — reported
    next to the recall so round-over-round encoder progress is
    statistically legible (VERDICT r4 item 5)."""
    if n <= 0:
        return (0.0, 1.0)
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z / denom) * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5)
    return (max(0.0, center - half), min(1.0, center + half))


def pool_recall_at_k(encoder, queries, passages, k: int = 10) -> float:
    """recall@k of queries[i] -> passages[i] over the given pool.

    THE single scoring implementation (tie-break, normalization
    epsilon) shared by the full-set and legacy-96 metrics so the fixed
    instrument stays comparable across rounds.  ``encoder`` is anything
    with ``encode(list[str]) -> (n, d)``; rows are re-normalized here
    so encoders that do not L2-normalize are scored fairly."""
    D = np.asarray(encoder.encode(list(passages)), np.float32)
    Q = np.asarray(encoder.encode(list(queries)), np.float32)
    D /= np.maximum(np.linalg.norm(D, axis=1, keepdims=True), 1e-9)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-9)
    s = Q @ D.T
    kk = min(k, s.shape[1])
    top = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
    return float(np.mean([i in top[i] for i in range(len(queries))]))


def recall_at_k_external(encoder, k: int = 10,
                         path: str | None = None) -> float:
    """recall@k of the gold passage over the full external set."""
    queries, passages = load_external_qa(path)
    return pool_recall_at_k(encoder, queries, passages, k)


def recall_at_k_legacy96(encoder, k: int = 10,
                         path: str | None = None) -> float:
    """recall@k over the FIRST 96 items as their own retrieval pool —
    the eval exactly as it existed in round 4 (those items are
    unchanged), so round-over-round encoder progress is measured on a
    fixed instrument while the full set keeps growing."""
    queries, passages = load_external_qa(path)
    return pool_recall_at_k(encoder, queries[:96], passages[:96], k)


def bundled_encoder_external_recall(k: int = 10) -> float:
    """recall@k of the BUNDLED default encoder on the external set.

    Raises if the bundled assets are absent (callers treat that as
    'skip', same as every other optional-asset path)."""
    from modular_rag_system_tpu.config import RAGConfig
    from modular_rag_system_tpu.models.default_ckpt import (
        try_build_default_encoder,
    )

    enc = try_build_default_encoder(RAGConfig())
    if enc is None:
        raise RuntimeError("bundled default encoder assets not available")
    return recall_at_k_external(enc, k=k)
