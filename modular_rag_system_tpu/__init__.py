"""modular_rag_system_tpu — a TPU-native RAG framework.

A ground-up reimplementation of the capabilities of
``justkidding-scripts/modular-rag-system`` designed for TPU hardware:

* the chunk-and-embed ingest path is a batched JAX/flax encoder forward
  (reference: one un-batched CPU forward or HTTP call per chunk,
  ``embedding_pipeline.py:363-370,424``),
* the vector store is an HBM-resident embedding matrix searched by a fused
  Pallas dot-product+top-k kernel (reference: Python-loop cosine over
  SQLite rows, ``ollama_rag_system.py:454-525``),
* scale-out shards index rows over a ``jax.sharding.Mesh`` and merges
  per-shard top-k over ICI (reference has no distributed path at all).

Host-side orchestration (chunking, document store, query processing, file
serving, LLM handoff) stays thin Python around the device engine.
"""

from modular_rag_system_tpu.version import __version__
from modular_rag_system_tpu.config import RAGConfig
from modular_rag_system_tpu.types import (
    Document,
    Query,
    RetrievalResult,
    Chunk,
    EmbeddingResult,
)

__all__ = [
    "__version__",
    "RAGConfig",
    "Document",
    "Query",
    "RetrievalResult",
    "Chunk",
    "EmbeddingResult",
    "create_engine",
]


def create_engine(config=None):
    """Convenience constructor for the core retrieval engine (lazy import

    so that host-only tooling can import the package without JAX).
    Named ``create_engine`` (not ``engine``) to avoid shadowing the
    ``modular_rag_system_tpu.engine`` submodule attribute.
    """
    from modular_rag_system_tpu.engine import RAGEngine

    return RAGEngine(config)
