"""Semantic retrieval learning: close the loop the reference left to
pretrained models (``embedding_pipeline.py:424``) — fine-tuning must lift
held-out paraphrase recall from chance to near-perfect on a corpus where
lexical overlap is zero by construction."""

import random

import jax
import pytest

from modular_rag_system_tpu.models.encoder import MiniLMEncoder
from modular_rag_system_tpu.models.fake import FeatureHashEncoder
from modular_rag_system_tpu.models.synth import make_paraphrase_corpus, recall_at_k
from modular_rag_system_tpu.models.train import ContrastiveTrainer
from modular_rag_system_tpu.parallel.mesh import make_train_mesh
from tests.conftest import cpu_mesh_devices


def test_corpus_is_word_disjoint():
    c = make_paraphrase_corpus(n_entities=6, n_relations=4, seed=3)
    for q, di in zip(c.train_queries + c.eval_queries,
                     c.train_doc_idx + c.eval_doc_idx):
        assert not set(q.split()) & set(c.docs[di].split())
    # eval combinations never appear in training
    assert not set(c.eval_doc_idx) & set(c.train_doc_idx)


@pytest.mark.slow
def test_contrastive_training_lifts_semantic_recall():
    corpus = make_paraphrase_corpus(n_entities=10, n_relations=6, seed=0)

    hash_rec = recall_at_k(FeatureHashEncoder(dim=128), corpus, 5)
    enc = MiniLMEncoder(dim=128, max_seq_len=12, batch_size=64, num_layers=2,
                        num_heads=4, mlp_dim=256, vocab_size=4096,
                        dtype="float32")
    untrained_rec = recall_at_k(enc, corpus, 5)
    # no shared words -> lexical and random embeddings are ~chance
    assert hash_rec <= 0.35
    assert untrained_rec <= 0.35

    mesh = make_train_mesh(8, 1, devices=cpu_mesh_devices(8))
    tr = ContrastiveTrainer(enc, mesh, learning_rate=3e-3)
    rng = random.Random(1)
    pairs = list(zip(corpus.train_queries,
                     [corpus.docs[i] for i in corpus.train_doc_idx]))
    for _ in range(150):
        batch = [pairs[rng.randrange(len(pairs))] for _ in range(48)]
        tr.step([q for q, _ in batch], [p for _, p in batch])
    tr.sync_encoder()
    trained_rec = recall_at_k(enc, corpus, 5)
    assert trained_rec >= 0.6, (
        f"semantic recall@5 {trained_rec} (hash {hash_rec}, "
        f"untrained {untrained_rec})"
    )
    assert trained_rec >= untrained_rec + 0.3
