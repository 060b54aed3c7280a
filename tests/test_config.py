"""Config system: overlay semantics, file roundtrip, error paths."""

import json

import numpy as np
import pytest

from modular_rag_system_tpu.config import RAGConfig
from modular_rag_system_tpu.types import Document, Query, as_matrix, content_id


def test_defaults():
    cfg = RAGConfig()
    assert cfg.embedding.chunk_size_tokens == 512
    assert cfg.embedding.chunk_overlap_tokens == 50
    assert cfg.retrieval.max_results == 5
    assert cfg.retrieval.similarity_threshold == 0.7
    assert cfg.index.tier == "exact"


def test_json_overlay(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"index": {"tier": "int8", "block_rows": 512},
                             "retrieval": {"max_results": 9}}))
    cfg = RAGConfig.load(str(p))
    assert cfg.index.tier == "int8"
    assert cfg.index.block_rows == 512
    assert cfg.retrieval.max_results == 9
    assert cfg.embedding.dim == 384  # untouched sections keep defaults


def test_write_default_generates_file(tmp_path):
    p = tmp_path / "generated.json"
    RAGConfig.load(str(p), write_default=True)
    data = json.loads(p.read_text())
    assert data["retrieval"]["max_results"] == 5
    # reloadable
    cfg = RAGConfig.load(str(p))
    assert cfg.retrieval.max_results == 5


def test_dotted_overrides():
    cfg = RAGConfig.load(overrides={"index.tier": "ivf", "mesh.index_shards": 4})
    assert cfg.index.tier == "ivf"
    assert cfg.mesh.index_shards == 4


def test_unknown_section_and_key_rejected(tmp_path):
    with pytest.raises(KeyError):
        RAGConfig().merged({"nonexistent": {"a": 1}})
    with pytest.raises(KeyError):
        RAGConfig().merged({"index": {"bogus": 1}})
    with pytest.raises(KeyError):
        RAGConfig.load(overrides={"flat_key": 1})


def test_to_json_roundtrip(tmp_path):
    cfg = RAGConfig.load(overrides={"index.tier": "bf16"})
    p = tmp_path / "out.json"
    cfg.to_json(str(p))
    again = RAGConfig.load(str(p))
    assert again.index.tier == "bf16"
    assert again.to_dict() == cfg.to_dict()


# ---------------------------------------------------------------- types
def test_content_id_stability():
    a = content_id("same text", "src")
    assert a == content_id("same text", "src")
    assert a != content_id("same text", "other-src")
    assert a != content_id("other text", "src")
    assert len(a) == 32


def test_document_auto_id_and_dict():
    d = Document(content="hello", source="s")
    assert d.id == content_id("hello", "s")
    payload = d.to_dict()
    assert payload["content"] == "hello"
    assert "embedding" not in payload
    d.embedding = np.ones(4, np.float32)
    assert d.to_dict(include_embedding=True)["embedding"] == [1.0] * 4


def test_query_defaults_match_reference():
    q = Query(text="x")
    assert q.max_results == 5
    assert q.similarity_threshold == 0.7
    assert q.time_weight == 0.1


def test_as_matrix_validation():
    assert as_matrix([], 8).shape == (0, 8)
    m = as_matrix([np.ones(8), np.zeros(8)], 8)
    assert m.shape == (2, 8) and m.dtype == np.float32
    with pytest.raises(ValueError):
        as_matrix([np.ones(4)], 8)
