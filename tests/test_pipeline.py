"""EmbeddingPipeline: batching, cache semantics, document conversion."""

import numpy as np

from modular_rag_system_tpu.chunker import TextChunker
from modular_rag_system_tpu.models.fake import FeatureHashEncoder
from modular_rag_system_tpu.pipeline import EmbeddingPipeline


class CountingEncoder(FeatureHashEncoder):
    """Fake encoder that counts encode() calls and texts."""

    def __init__(self):
        super().__init__(dim=384)
        self.calls = 0
        self.texts_encoded = 0

    def encode(self, texts):
        self.calls += 1
        self.texts_encoded += len(texts)
        return super().encode(texts)


def make_pipeline(cache_size=100):
    enc = CountingEncoder()
    chunker = TextChunker(chunk_size_tokens=30, overlap_tokens=5,
                          token_counter=lambda s: len(s.split()))
    return EmbeddingPipeline(enc, chunker, cache_size=cache_size), enc


def test_process_content_single_batch():
    pipe, enc = make_pipeline()
    text = " ".join(f"Sentence number {i}." for i in range(100))
    results = pipe.process_content(text, "keystroke")
    assert len(results) > 1
    assert enc.calls == 1  # ALL chunks in one forward
    assert all(r.embedding.shape == (384,) for r in results)
    assert all(r.model_used == "feature-hash-fake" for r in results)


def test_cache_hits_real_counter():
    pipe, enc = make_pipeline()
    pipe.process_content("some repeated content here", "document")
    pipe.process_content("some repeated content here", "document")
    st = pipe.get_stats()
    assert st["cache_hits"] == 1
    assert st["cache_misses"] == 1
    assert st["cache_hit_ratio"] == 0.5
    assert enc.calls == 1  # second call fully cached


def test_cache_eviction_to_80_percent():
    pipe, _ = make_pipeline(cache_size=10)
    for i in range(12):
        pipe.process_content(f"unique doc {i}", "document")
    assert len(pipe._cache) <= 10
    # after overflow it evicts down to 80%
    assert len(pipe._cache) >= 8


def test_batch_process_one_round_trip():
    pipe, enc = make_pipeline()
    reqs = [{"content": f"content item {i}", "content_type": "document"} for i in range(5)]
    results = pipe.batch_process(reqs)
    assert len(results) == 5
    assert enc.calls == 1  # whole batch -> one device call
    assert all(len(r) == 1 for r in results)


def test_batch_process_empty():
    pipe, _ = make_pipeline()
    assert pipe.batch_process([]) == []


def test_create_rag_documents():
    pipe, _ = make_pipeline()
    results = pipe.process_content("hello world document", "document")
    docs = pipe.create_rag_documents(results, source="unit-test", importance=2.0)
    assert len(docs) == len(results)
    d = docs[0]
    assert d.source == "unit-test"
    assert d.importance == 2.0
    assert d.embedding is not None
    assert d.metadata["model_used"] == "feature-hash-fake"
    assert "chunk_index" in d.metadata


def test_metadata_flows_into_chunk_info():
    pipe, _ = make_pipeline()
    results = pipe.process_content("text", "ocr", metadata={"window": "editor"})
    assert results[0].chunk_info["window"] == "editor"
    assert results[0].chunk_info["content_type"] == "ocr"


def test_stats_shape():
    pipe, _ = make_pipeline()
    pipe.process_content("abc def", "document")
    st = pipe.get_stats()
    for key in ("total_requests", "total_chunks", "cache_hit_ratio",
                "avg_processing_time", "encoder", "cache_size"):
        assert key in st
