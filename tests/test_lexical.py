"""Lexical hash encoder + hybrid embedding tests (round 5).

The lexical half of the hybrid embedding must be deterministic (it is
part of the on-disk index contract), canonicalize through the
hand-authored lexicon, and compose with the dense side so that cosine
decomposes exactly as documented (models/lexical.py).
"""

import math

import numpy as np
import pytest

from modular_rag_system_tpu.models.lexical import (
    HybridEncoder,
    IdfTable,
    LexicalHashEncoder,
    fnv1a,
    lexical_features,
    light_stem,
)


def test_fnv1a_is_stable():
    # pinned values: embeddings live on disk; the hash may never change
    assert fnv1a("moon") == fnv1a("moon")
    assert fnv1a("moon") != fnv1a("mars")
    assert fnv1a("") == 0xCBF29CE484222325


def test_light_stem_collapses_inflections():
    assert light_stem("dimming") == light_stem("dimmed") == light_stem("dims")
    assert light_stem("compression") == light_stem("compressions")
    # short words pass through
    assert light_stem("sun") == "sun"


def test_features_filter_stopwords_and_canonicalize_synonyms():
    # "rapid" and "quick" share a synset -> identical feature
    f1 = lexical_features("a rapid descent")
    f2 = lexical_features("the quick descent")
    assert f1 == f2
    assert all(w not in ("a", "the") for w in f1)


def test_features_detect_multiword_aliases():
    # "red planet" -> mars (lexicon ALIASES); the two-word surface form
    # must collapse to one canonical feature
    f = lexical_features("the red planet has dust storms")
    g = lexical_features("mars has dust storms")
    assert f[0] == g[0]


def test_encoder_is_deterministic_and_normalized():
    enc = LexicalHashEncoder(dim=128, idf=IdfTable({}, 1.0))
    a = enc.encode(["tidal forces lock rotation", "unrelated text entirely"])
    b = enc.encode(["tidal forces lock rotation", "unrelated text entirely"])
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)


def test_related_texts_score_higher_than_unrelated():
    enc = LexicalHashEncoder(dim=384, idf=IdfTable({}, 1.0))
    v = enc.encode([
        "the volcano erupted with molten lava",
        "an eruption of molten rock from the volcano",
        "parliament debated the insurance statute",
    ])
    related = float(v[0] @ v[1])
    unrelated = float(v[0] @ v[2])
    assert related > unrelated + 0.2


def test_idf_roundtrip(tmp_path):
    t = IdfTable.from_texts(["the moon orbits", "the sun shines",
                             "moon dust settles"])
    p = tmp_path / "idf.json"
    t.save(str(p))
    t2 = IdfTable.load(str(p))
    assert t2.idf == t.idf and t2.default == t.default
    # rarer term gets the larger weight
    assert t2("orbit") > t2("moon")


def test_hybrid_cosine_decomposition():
    class _Dense:
        dim = 8
        name = "d"

        def encode(self, texts):
            rng = np.random.RandomState(0)
            out = rng.randn(len(texts), 8).astype(np.float32)
            # deterministic per text via hash seed
            return np.stack([
                np.random.RandomState(fnv1a(t) % (2**31)).randn(8).astype(np.float32)
                for t in texts
            ])

    w = 0.3
    dense = _Dense()
    lex = LexicalHashEncoder(dim=64, idf=IdfTable({}, 1.0))
    hyb = HybridEncoder(dense, lex, weight=w)
    texts = ["molten lava flows", "lava flows molten"]
    H = hyb.encode(texts)
    assert H.shape == (2, 8 + 64)
    np.testing.assert_allclose(np.linalg.norm(H, axis=1), 1.0, atol=1e-5)
    D = dense.encode(texts)
    D = D / np.linalg.norm(D, axis=1, keepdims=True)
    L = lex.encode(texts)
    expect = (1 - w) * float(D[0] @ D[1]) + w * float(L[0] @ L[1])
    assert math.isclose(float(H[0] @ H[1]), expect, rel_tol=1e-5)


def test_hybrid_rejects_degenerate_weight():
    lex = LexicalHashEncoder(dim=16, idf=IdfTable({}, 1.0))

    class _D:
        dim = 4

        def encode(self, texts):
            return np.ones((len(texts), 4), np.float32)

    with pytest.raises(ValueError):
        HybridEncoder(_D(), lex, weight=0.0)
    with pytest.raises(ValueError):
        HybridEncoder(_D(), lex, weight=1.0)


def _hybrid_cfg(tmp_path):
    from modular_rag_system_tpu.config import RAGConfig

    return RAGConfig.load(overrides={
        "embedding.model": "minilm",
        "embedding.lexical_dim": 128,
        "embedding.num_layers": 1,
        "embedding.max_seq_len": 32,
        "embedding.bundled_checkpoint": "",
        "store.storage_path": str(tmp_path / "s"),
        "retrieval.similarity_threshold": 0.0,
        "index.initial_capacity": 64,
    })


def test_engine_sizes_index_from_hybrid_encoder(tmp_path):
    """One-encoder contract: with lexical_dim set, the engine's index
    width follows the hybrid encoder, not the raw embedding.dim."""
    from modular_rag_system_tpu.engine import RAGEngine

    eng = RAGEngine(_hybrid_cfg(tmp_path))
    try:
        assert eng.index.dim == eng.encoder.dim == 384 + 128
        assert eng.embed_dim == 384 + 128
    finally:
        eng.shutdown()


def test_engine_does_not_mutate_config_dim(tmp_path):
    """Regression (round-5 review): the engine must NOT write the
    hybrid width back into config.embedding.dim — a reused RAGConfig
    then failed the bundled/HF arch checks and silently rebuilt a
    random-init encoder with a drifting dim."""
    from modular_rag_system_tpu.engine import RAGEngine

    cfg = _hybrid_cfg(tmp_path)
    assert cfg.embedding.dim == 384
    eng = RAGEngine(cfg)
    try:
        assert eng.index.dim == eng.embed_dim == 384 + 128
        assert cfg.embedding.dim == 384  # untouched
    finally:
        eng.shutdown()
    # a second engine from the SAME config resolves identically
    eng2 = RAGEngine(cfg)
    try:
        assert eng2.index.dim == 384 + 128
        assert eng2.encoder.dim == eng2.index.dim
    finally:
        eng2.shutdown()


def test_build_encoder_rejects_bad_lexical_weight():
    """Regression (round-5 review): an out-of-range lexical_weight must
    raise, not silently downgrade 'auto' to the fake encoder."""
    from modular_rag_system_tpu.config import RAGConfig
    from modular_rag_system_tpu.models import build_encoder

    cfg = RAGConfig.load(overrides={"embedding.lexical_weight": 1.0})
    with pytest.raises(ValueError, match="lexical_weight"):
        build_encoder(cfg)


@pytest.mark.slow
def test_engine_hybrid_ingest_query_roundtrip(tmp_path):
    """Full hybrid path: device bulk ingest (dense on device + lexical
    concat) and host query both run and agree on the corpus."""
    from modular_rag_system_tpu.engine import RAGEngine

    eng = RAGEngine(_hybrid_cfg(tmp_path))
    try:
        eng.add_document("the volcano erupted with molten lava", source="t")
        res = eng.query("volcanic eruption", max_results=2)
        assert res.total_documents_searched == 1
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_sharded_hybrid_query_roundtrip(tmp_path):
    """Hybrid encoder over a ShardedIndex: ingest + fused one-dispatch
    query across the 8-device CPU mesh return the right documents."""
    from modular_rag_system_tpu.config import RAGConfig
    from modular_rag_system_tpu.engine import RAGEngine

    from tests.conftest import cpu_mesh_devices

    cpu_mesh_devices(8)
    cfg = RAGConfig.load(overrides={
        "embedding.model": "minilm",
        "embedding.lexical_dim": 128,
        "embedding.num_layers": 1,
        "embedding.max_seq_len": 32,
        "embedding.bundled_checkpoint": "",
        "store.storage_path": str(tmp_path / "s"),
        "retrieval.similarity_threshold": 0.0,
        "index.initial_capacity": 256,
        "mesh.index_shards": 8,
    })
    eng = RAGEngine(cfg)
    try:
        docs = [f"document about topic {i} with unique term t{i}zq"
                for i in range(16)]
        for i, d in enumerate(docs):
            eng.add_document(d, source=f"s{i}")
        import numpy as np

        fused = eng._device_query(["unique term t7zq"], 3)
        assert fused is not None
        q_emb = np.asarray(eng.encoder.encode_queries(["unique term t7zq"]))
        h_scores, h_rows = eng.index.search(q_emb, 3)
        np.testing.assert_array_equal(np.asarray(fused[1])[0],
                                      np.asarray(h_rows)[0])
        res = eng.query("unique term t7zq", max_results=3)
        assert res.documents and "t7zq" in res.documents[0].content
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_fused_hybrid_query_matches_two_step(tmp_path):
    """The one-dispatch fused program with the lexical half passed as a
    device argument must return the same rows/scores as host
    encode_queries + index.search (engine.py fused-hybrid path)."""
    import numpy as np

    from modular_rag_system_tpu.engine import RAGEngine

    eng = RAGEngine(_hybrid_cfg(tmp_path))
    try:
        docs = ["the volcano erupted with molten lava",
                "parliament debated the insurance statute",
                "a rapid descent through the storm clouds",
                "glaciers carve deep valleys over millennia"]
        for i, d in enumerate(docs):
            eng.add_document(d, source=f"s{i}")
        queries = ["volcanic eruption", "insurance law debate"]
        fused = eng._device_query(queries, 3)
        assert fused is not None, "hybrid must ride the fused path"
        f_scores, f_rows = fused
        q_emb = np.asarray(eng.encoder.encode_queries(queries))
        h_scores, h_rows = eng.index.search(q_emb, 3)
        np.testing.assert_array_equal(np.asarray(f_rows),
                                      np.asarray(h_rows))
        np.testing.assert_allclose(np.asarray(f_scores),
                                   np.asarray(h_scores), atol=2e-3)
    finally:
        eng.shutdown()
