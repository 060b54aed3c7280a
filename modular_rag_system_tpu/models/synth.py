"""Synthetic paraphrase corpus for semantic-retrieval evaluation.

The reference's retrieval quality rests on pretrained embeddings
(``embedding_pipeline.py:424`` real MiniLM forward, ``:363-370`` Ollama
nomic-embed-text).  This zero-egress container has neither, so semantic
quality is *measured* instead of assumed: this module generates a corpus
where lexical matching provably fails and only *learned* semantics can
retrieve — (entity, relation) facts where queries use an entity ALIAS
and a relation PARAPHRASE that share **zero words** with the document.

* each entity has a canonical name (used in documents) and an alias
  (used in queries) with disjoint vocabulary;
* each relation has a document phrasing and a query phrasing, also
  word-disjoint;
* the eval split holds out (entity, relation) COMBINATIONS — every
  entity and every relation appears in training, but the tested pairings
  never do, so recall@k on the eval split measures compositional
  semantic generalization, not memorization.

A hashed-n-gram lexical embedder scores ~chance here (no shared
tokens); an encoder fine-tuned with ``ContrastiveTrainer`` on the train
split must place alias<->canonical and paraphrase<->phrasing nearby to
score at all.  Used by ``benchmarks/semantic_eval.py`` (the headline
semantic number) and ``tests/test_semantic.py``.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import List, Tuple

_CONS = "bdfgklmnprstvz"
_VOWS = "aeiou"


def _word_maker(rng: random.Random):
    """Unique pronounceable pseudo-words (2-3 syllables)."""
    seen = set()

    def make() -> str:
        while True:
            n_syll = rng.choice((2, 3))
            w = "".join(
                rng.choice(_CONS) + rng.choice(_VOWS) for _ in range(n_syll)
            )
            if w not in seen:
                seen.add(w)
                return w

    return make


@dataclass
class ParaphraseCorpus:
    """(entity, relation) fact corpus with word-disjoint query paraphrases."""

    docs: List[str]
    train_queries: List[str]
    train_doc_idx: List[int]
    eval_queries: List[str]
    eval_doc_idx: List[int]
    entities: List[Tuple[str, str]] = field(default_factory=list)  # (canonical, alias)
    relations: List[Tuple[str, str]] = field(default_factory=list)  # (doc phr, query phr)


def make_paraphrase_corpus(
    n_entities: int = 40,
    n_relations: int = 25,
    train_frac: float = 0.8,
    phrase_words: int = 3,
    name_words: int = 2,
    seed: int = 0,
) -> ParaphraseCorpus:
    rng = random.Random(seed)
    word = _word_maker(rng)

    entities = [
        (
            " ".join(word() for _ in range(name_words)),
            " ".join(word() for _ in range(name_words)),
        )
        for _ in range(n_entities)
    ]
    relations = [
        (
            " ".join(word() for _ in range(phrase_words)),
            " ".join(word() for _ in range(phrase_words)),
        )
        for _ in range(n_relations)
    ]

    facts = [(e, r) for e in range(n_entities) for r in range(n_relations)]
    docs = [f"{entities[e][0]} {relations[r][0]}" for e, r in facts]
    queries = [f"{entities[e][1]} {relations[r][1]}" for e, r in facts]

    order = list(range(len(facts)))
    rng.shuffle(order)
    n_train = int(len(facts) * train_frac)
    train, evals = order[:n_train], order[n_train:]
    return ParaphraseCorpus(
        docs=docs,
        train_queries=[queries[i] for i in train],
        train_doc_idx=list(train),
        eval_queries=[queries[i] for i in evals],
        eval_doc_idx=list(evals),
        entities=entities,
        relations=relations,
    )


def recall_at_k(encoder, corpus: ParaphraseCorpus, k: int = 10) -> float:
    """recall@k of the gold document for the held-out paraphrase queries.

    Encodes with the given encoder (any object with ``encode``) and
    scores by cosine via a plain matmul — small corpora only."""
    import numpy as np

    D = np.asarray(encoder.encode(corpus.docs), dtype=np.float32)
    Qm = np.asarray(encoder.encode(corpus.eval_queries), dtype=np.float32)
    D /= np.maximum(np.linalg.norm(D, axis=1, keepdims=True), 1e-9)
    Qm /= np.maximum(np.linalg.norm(Qm, axis=1, keepdims=True), 1e-9)
    scores = Qm @ D.T
    topk = np.argpartition(-scores, min(k, scores.shape[1] - 1), axis=1)[:, :k]
    hits = sum(
        1 for qi, gold in enumerate(corpus.eval_doc_idx) if gold in topk[qi]
    )
    return hits / len(corpus.eval_doc_idx)
