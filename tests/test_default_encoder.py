"""Bundled default encoder (VERDICT r2 item 3): a fresh zero-egress
install must retrieve real English semantically with no user action."""

import numpy as np
import pytest

from modular_rag_system_tpu.config import RAGConfig
from modular_rag_system_tpu.models import build_encoder


def test_default_build_loads_bundled_checkpoint():
    """The shipped default is the HYBRID of the bundled dense
    checkpoint and the lexical hash encoder (round 5): index dim =
    dense 384 + lexical 384."""
    enc = build_encoder(RAGConfig())
    assert "bundled" in enc.name and "hybrid" in enc.name
    assert enc.tokenizer.name == "wordpiece"
    assert enc.dim == 768
    assert enc.dense.dim == 384 and enc.lexical.dim == 384


def test_default_build_dense_only_when_disabled():
    cfg = RAGConfig.load(overrides={"embedding.lexical_dim": 0})
    enc = build_encoder(cfg)
    assert "hybrid" not in enc.name
    assert enc.dim == 384


@pytest.mark.slow
def test_bundled_encoder_knows_english_synonyms():
    """Zero word overlap, synonym-level match: the thing the hash
    fallback can never do and random init does not do."""
    enc = build_encoder(RAGConfig())
    e = np.asarray(enc.encode([
        "a large automobile",        # ~ "a big car" by synonyms only
        "a big car",
        "banana smoothie recipe",
    ]))
    sims = e @ e.T
    assert sims[0, 1] > sims[0, 2] + 0.15, sims


@pytest.mark.slow
def test_bundled_encoder_with_shorter_max_seq_len():
    """config.max_seq_len < the checkpoint's max_len must crop the
    pos_embed table, not raise ScopeParamShapeError at encode time
    (regression: benchmarks config 2 sets max_seq_len=64)."""
    cfg = RAGConfig().merged({"embedding": {"max_seq_len": 64,
                                            "lexical_dim": 0}})
    enc = build_encoder(cfg)
    assert "bundled" in enc.name
    assert enc.max_seq_len == 64
    e = np.asarray(enc.encode(["a large automobile", "a big car",
                               "banana smoothie recipe"]))
    assert e.shape == (3, 384)
    sims = e @ e.T
    assert sims[0, 1] > sims[0, 2] + 0.15, sims


@pytest.mark.slow
def test_bundled_checkpoint_disable_and_dim_mismatch():
    cfg = RAGConfig().merged({"embedding": {"bundled_checkpoint": ""}})
    enc = build_encoder(cfg)
    assert "bundled" not in enc.name  # random init
    cfg64 = RAGConfig().merged({
        "embedding": {"dim": 64, "num_layers": 2, "num_heads": 4,
                      "mlp_dim": 128, "vocab_size": 1000}})
    enc64 = build_encoder(cfg64)
    assert "bundled" not in enc64.name  # 384-hidden asset can't serve 64


@pytest.mark.slow
def test_default_engine_retrieves_by_synonym(tmp_path):
    from modular_rag_system_tpu.engine import RAGEngine

    cfg = RAGConfig().merged({
        "store": {"storage_path": str(tmp_path / "s")},
        "retrieval": {"similarity_threshold": 0.2},
    })
    eng = RAGEngine(cfg)
    try:
        eng.add_document("the company decided to purchase a large automobile",
                         source="a")
        eng.add_document("a recipe for banana smoothie with yogurt",
                         source="b")
        eng.add_document("the weather forecast predicts heavy rainfall",
                         source="c")
        res = eng.query("buying a big car", max_results=1)
        assert res.documents and res.documents[0].source == "a", [
            (d.source, d.content) for d in res.documents]
    finally:
        eng.shutdown()


def test_default_ckpt_roundtrip(tmp_path):
    from modular_rag_system_tpu.models.default_ckpt import (
        load_default_assets,
        save_default_encoder,
    )

    params = {"block_0": {"Dense_0": {"kernel": np.ones((3, 4), np.float32)}},
              "tok_embed": {"embedding": np.arange(12, dtype=np.float32).reshape(6, 2)}}
    arch = {"num_layers": 1, "hidden": 2, "heads": 1, "mlp_dim": 4,
            "vocab_size": 6, "max_len": 8}
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "a": 4, "##b": 5}
    d = save_default_encoder(params, arch, vocab, str(tmp_path / "assets"))
    p2, a2, v2 = load_default_assets(d)
    assert a2 == arch and v2 == vocab
    np.testing.assert_allclose(
        p2["block_0"]["Dense_0"]["kernel"],
        params["block_0"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(p2["tok_embed"]["embedding"],
                               params["tok_embed"]["embedding"])
