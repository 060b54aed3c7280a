"""End-to-end engine tests with the deterministic fake encoder."""

import pytest

import time

import numpy as np

from modular_rag_system_tpu.engine import RAGEngine
from modular_rag_system_tpu.types import Document

CORPUS = [
    ("The quick brown fox jumps over the lazy dog", "animals"),
    ("Python is a programming language used for machine learning", "tech"),
    ("JAX compiles numerical programs for TPU accelerators", "tech"),
    ("Cats and dogs are common household pets", "animals"),
    ("The stock market closed higher on Friday", "finance"),
    ("Neural networks learn representations from data", "tech"),
]


def make_engine(fake_config):
    eng = RAGEngine(fake_config)
    for text, source in CORPUS:
        eng.add_document(text, source=source)
    return eng


def test_add_and_query_relevance(fake_config):
    eng = make_engine(fake_config)
    res = eng.query("programming language machine learning", max_results=3)
    assert res.documents
    assert "programming language" in res.documents[0].content
    assert res.total_documents_searched == len(CORPUS)
    assert res.retrieval_time > 0


def test_add_documents_batch_first_class(fake_config):
    eng = RAGEngine(fake_config)
    docs = [Document(content=f"batch doc {i}") for i in range(10)]
    ids = eng.add_documents(docs)
    assert len(ids) == 10
    assert eng.index.count == 10
    assert eng.store.count() == 10


def test_idempotent_reingest(fake_config):
    eng = make_engine(fake_config)
    n = eng.index.count
    for text, source in CORPUS:
        eng.add_document(text, source=source)
    assert eng.index.count == n  # no duplicate rows
    assert eng.store.count() == n


def test_source_filters(fake_config):
    eng = make_engine(fake_config)
    res = eng.query("dogs and pets", source_filters=["animals"], max_results=5)
    assert res.documents
    assert all(d.source == "animals" for d in res.documents)


def test_similarity_threshold(fake_config):
    eng = make_engine(fake_config)
    res = eng.query("quantum entanglement xylophone", similarity_threshold=0.999)
    assert res.documents == []


def test_add_text_chunks(fake_config):
    eng = RAGEngine(fake_config)
    long_text = "\n\n".join("Paragraph %d. " % i * 30 for i in range(20))
    ids = eng.add_text(long_text, source="bigfile")
    assert len(ids) > 1
    assert eng.index.count == len(set(ids))
    meta = eng.store.get_by_id(ids[0]).metadata
    assert "chunk_index" in meta and "chunk_total" in meta


def test_query_batch(fake_config):
    eng = make_engine(fake_config)
    results = eng.query_batch(["fox jumps dog", "stock market"], max_results=2)
    assert len(results) == 2
    assert "fox" in results[0].documents[0].content
    assert "stock market" in results[1].documents[0].content


def test_recent_context_attached(fake_config):
    eng = make_engine(fake_config)
    eng.query("first question")
    res = eng.query("second question")
    assert res is not None
    assert len(eng.recent_context) == 2
    assert eng.recent_context[0]["query"] == "first question"


def test_stats(fake_config):
    eng = make_engine(fake_config)
    eng.query("anything")
    st = eng.get_system_stats()
    assert st["query_stats"]["total_queries"] == 1
    assert st["index"]["count"] == len(CORPUS)
    assert st["store"]["total_documents"] == len(CORPUS)
    assert st["encoder"] == "feature-hash-fake"


def test_enhanced_context(fake_config):
    eng = make_engine(fake_config)
    ctx = eng.get_enhanced_context("technology programming")
    assert ctx["documents"]
    assert ctx["themes"]
    assert "summary" in ctx and "source_distribution" in ctx


def test_cleanup_old_documents_real(fake_config):
    eng = RAGEngine(fake_config)
    old = Document(content="very old doc", timestamp=time.time() - 90 * 86400)
    new = Document(content="new doc")
    eng.add_documents([old, new])
    n = eng.cleanup_old_documents(retention_days=30)
    assert n == 1
    res = eng.query("very old doc", similarity_threshold=0.0, max_results=5)
    assert all(d.id != old.id for d in res.documents)


def test_persistence_restart(fake_config):
    eng = make_engine(fake_config)
    eng.shutdown()
    eng2 = RAGEngine(fake_config)
    assert eng2.index.count == len(CORPUS)
    res = eng2.query("programming language", max_results=1)
    assert res.documents


def test_restore_reembeds_missing_rows(fake_config):
    """Snapshot missing -> rebuild embeddings from the doc store."""
    eng = make_engine(fake_config)
    eng.store.close()  # close WITHOUT saving snapshot
    eng2 = RAGEngine(fake_config)
    assert eng2.index.count == len(CORPUS)
    res = eng2.query("fox jumps", max_results=1)
    assert "fox" in res.documents[0].content


def test_export_data(fake_config, tmp_path):
    eng = make_engine(fake_config)
    out = eng.export_data(str(tmp_path / "exp.json.gz"))
    import gzip, json

    with gzip.open(out, "rt") as f:
        payload = json.load(f)
    assert payload["stats"]["total_documents"] == len(CORPUS)


def test_compact_reclaims_deleted_rows(fake_config):
    eng = make_engine(fake_config)
    ids = [d.id for d in eng.store.get_by_rows(range(len(CORPUS)), bump_access=False)]
    eng.store.delete_ids(ids[1:3])
    eng.index.delete_rows(np.array([1, 2]))
    reclaimed = eng.compact()
    assert reclaimed == 2
    assert eng.index.count == len(CORPUS) - 2
    assert eng.store.count(include_deleted=True) == len(CORPUS) - 2
    # retrieval still works and never returns the deleted docs
    res = eng.query("programming language machine learning", max_results=6)
    assert res.documents
    assert all(d.id not in ids[1:3] for d in res.documents)
    # row alignment preserved: self-query returns self
    doc0 = eng.store.get_by_rows([0], bump_access=False)[0]
    r0 = eng.query(doc0.content, max_results=1)
    assert r0.documents[0].id == doc0.id
    # appends continue cleanly after compaction
    eng.add_document("post compaction document")
    assert eng.index.count == len(CORPUS) - 1


def test_compact_noop_when_nothing_deleted(fake_config):
    eng = make_engine(fake_config)
    assert eng.compact() == 0
    assert eng.index.count == len(CORPUS)


@pytest.mark.slow
def test_fused_query_path_matches_two_step(tmp_storage):
    """MiniLM encoder + DeviceIndex -> single fused program; results must
    equal the two-step encode-then-search path."""
    from modular_rag_system_tpu.config import RAGConfig

    cfg = RAGConfig().merged({
        "embedding": {"model": "minilm", "dim": 64, "max_seq_len": 32,
                      "batch_size": 8, "num_layers": 2, "num_heads": 4,
                      "mlp_dim": 128, "vocab_size": 1000, "dtype": "float32"},
        "store": {"storage_path": tmp_storage},
        "retrieval": {"similarity_threshold": 0.0},
    })
    eng = RAGEngine(cfg)
    for text, source in CORPUS:
        eng.add_document(text, source=source)
    # fused path active for this configuration
    res = eng.query("machine learning language", max_results=3)
    assert eng._fused_query_cache, "fused path was not used"
    # compare against the explicit two-step path
    q_emb = np.asarray(eng.encoder.encode_queries(["machine learning language"]))
    scores, rows = eng.index.search(q_emb, 6)
    fused = eng._device_query(["machine learning language"], 6)
    np.testing.assert_array_equal(fused[1][0], rows[0])
    np.testing.assert_allclose(fused[0][0], scores[0], rtol=1e-4, atol=1e-5)
    # bf16 tier also goes through the fused program
    eng.index.tier = "bf16"
    eng._fused_query_cache.clear()
    res2 = eng.query("machine learning language", max_results=3)
    assert res2.documents
    assert any("bf16" in k for k in eng._fused_query_cache)
    # int8 tier too (round 2): one dispatch, results match the two-step path
    eng.index.tier = "int8"
    eng._fused_query_cache.clear()
    scores8, rows8 = eng.index.search(q_emb, 6)
    fused8 = eng._device_query(["machine learning language"], 6)
    assert any("int8" in k for k in eng._fused_query_cache)
    np.testing.assert_array_equal(fused8[1][0], rows8[0])
    np.testing.assert_allclose(fused8[0][0], scores8[0], rtol=1e-3, atol=2e-3)
    eng.shutdown()


def test_concurrent_writers_and_readers(fake_config):
    """Interleaved add_documents from multiple threads must never
    desynchronize store rows from index rows."""
    import threading

    eng = RAGEngine(fake_config)
    errors = []

    def writer(tid):
        try:
            for i in range(10):
                eng.add_documents(
                    [Document(content=f"writer {tid} doc {i} item {j}")
                     for j in range(5)]
                )
        except Exception as exc:  # row-drift RuntimeError would land here
            errors.append(exc)

    def reader():
        try:
            for _ in range(20):
                eng.query("writer doc item", max_results=3)
        except Exception as exc:
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
    threads += [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert eng.index.count == eng.store.count() == 4 * 10 * 5
    # spot-check alignment: every row's doc self-retrieves
    doc = eng.store.get_by_rows([77], bump_access=False)[0]
    res = eng.query(doc.content, max_results=1)
    assert res.documents[0].id == doc.id


def test_reingest_of_deleted_doc_is_searchable_again(fake_config):
    """Review finding: resurrection must restore the zeroed index row."""
    eng = RAGEngine(fake_config)
    doc = Document(content="the resurrected unique document text")
    eng.add_documents([doc, Document(content="other doc")])
    eng.store.delete_ids([doc.id])
    eng.index.delete_rows(np.array([0]))
    res = eng.query("resurrected unique document", max_results=2,
                    similarity_threshold=0.3)
    assert all(d.id != doc.id for d in res.documents)
    # re-ingest: must come back searchable
    eng.add_documents([Document(content="the resurrected unique document text")])
    res = eng.query("resurrected unique document", max_results=1,
                    similarity_threshold=0.3)
    assert res.documents and res.documents[0].id == doc.id


def test_restore_alignment_with_tombstones_beyond_snapshot(fake_config):
    """Review finding: crash recovery must keep rows positionally aligned
    when tombstoned rows exist beyond the snapshot."""
    eng = RAGEngine(fake_config)
    docs = [Document(content=f"align doc {i} unique u{i}") for i in range(8)]
    eng.add_documents(docs[:5])
    eng.save()  # snapshot at count=5
    eng.add_documents(docs[5:])  # rows 5,6,7 beyond snapshot
    eng.store.delete_ids([docs[6].id])
    eng.index.delete_rows(np.array([6]))
    eng.store.close()  # crash: no snapshot of rows 5-7
    eng2 = RAGEngine(fake_config)
    assert eng2.index.count == 8
    # doc 7 must still be searchable at ITS row (not shifted into row 6)
    res = eng2.query("align doc 7 unique u7", max_results=1,
                     similarity_threshold=0.2)
    assert res.documents and res.documents[0].id == docs[7].id
    # deleted doc 6 stays dead
    res6 = eng2.query("align doc 6 unique u6", max_results=3,
                      similarity_threshold=0.0)
    assert all(d.id != docs[6].id for d in res6.documents)
    # and ingest continues without row-drift errors
    eng2.add_document("post recovery doc")
    assert eng2.index.count == 9


def test_ivf_with_shards_end_to_end(fake_config):
    """VERDICT r1 item 3: tier=ivf now composes with a sharded index."""
    cfg = fake_config.merged({
        "index": {"tier": "ivf", "ivf_clusters": 8, "ivf_nprobe": 8},
        "mesh": {"index_shards": 8},
    })
    eng = RAGEngine(cfg)
    for text, source in CORPUS:
        eng.add_document(text, source=source)
    res = eng.query("programming language machine learning", max_results=3)
    assert res.documents
    assert "programming language" in res.documents[0].content
    eng.shutdown()


def test_query_batch_matches_query_under_filters(fake_config):
    """VERDICT r1 item 5: query() and query_batch() must return identical
    results for identical inputs — threshold, filters, and time_weight."""
    eng = make_engine(fake_config)
    texts = ["programming language", "fox jumps dog", "stock market"]
    kwargs = dict(
        max_results=3,
        source_filters=["tech", "finance"],
        similarity_threshold=0.01,
        time_weight=0.3,
    )
    singles = [eng.query(t, **kwargs) for t in texts]
    batch = eng.query_batch(texts, **kwargs)
    for s, b in zip(singles, batch):
        assert [d.id for d in s.documents] == [d.id for d in b.documents]
        np.testing.assert_allclose(s.similarities, b.similarities, atol=2e-4)


def test_filtered_query_refills_deep_matches(fake_config):
    """VERDICT r1 item 4: a selective source filter must not silently
    under-return when matching docs sit deeper than the first overfetch."""
    eng = RAGEngine(fake_config)
    # 40 near-identical decoys crowd the top of the ranking...
    for i in range(40):
        eng.add_document(f"banana banana banana smoothie recipe {i}", source="decoy")
    # ...and 5 rare-source docs share fewer query terms, ranking below them
    for i in range(5):
        eng.add_document(f"banana plantation logistics report volume {i}",
                         source="rare")
    res = eng.query("banana banana banana smoothie recipe", max_results=5,
                    source_filters=["rare"], similarity_threshold=0.0)
    assert len(res.documents) == 5, [d.content for d in res.documents]
    assert all(d.source == "rare" for d in res.documents)
    batch = eng.query_batch(["banana banana banana smoothie recipe"],
                            max_results=5, source_filters=["rare"],
                            similarity_threshold=0.0)
    assert [d.id for d in batch[0].documents] == [d.id for d in res.documents]


@pytest.mark.slow
def test_fused_path_concurrent_writer_stress(tmp_storage):
    """VERDICT r1 item 6: the fused device-query path snapshots (E, count)
    under the index lock — a concurrent add must never surface a row id
    beyond the store's row count at fetch time."""
    import threading

    from modular_rag_system_tpu.config import RAGConfig

    cfg = RAGConfig().merged({
        "embedding": {"model": "minilm", "dim": 64, "max_seq_len": 32,
                      "batch_size": 8, "num_layers": 2, "num_heads": 4,
                      "mlp_dim": 128, "vocab_size": 1000, "dtype": "float32"},
        "store": {"storage_path": tmp_storage},
        "retrieval": {"similarity_threshold": 0.0},
    })
    eng = RAGEngine(cfg)
    for text, source in CORPUS:
        eng.add_document(text, source=source)
    eng.query("warm the fused program", max_results=3)
    assert eng._fused_query_cache, "fused path was not used"
    errors = []
    stop = threading.Event()

    def writer():
        try:
            i = 0
            while not stop.is_set() and i < 200:
                eng.add_document(f"streamed doc number {i} with words", source="w")
                i += 1
        except Exception as exc:
            errors.append(exc)

    def reader():
        try:
            for _ in range(60):
                out = eng._device_query(["streamed doc with words"], 4)
                if out is None:
                    continue
                _, rows = out
                max_store_row = eng.store.count() + 64  # generous slack
                assert rows.max() < max_store_row
                res = eng.query("streamed doc with words", max_results=4)
                for d in res.documents:
                    assert d is not None
        except Exception as exc:
            errors.append(exc)

    threads = [threading.Thread(target=writer) for _ in range(2)]
    threads += [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    stop.set()
    assert not errors, errors
    eng.shutdown()


@pytest.mark.slow
def test_filtered_refill_reaches_deep_rows_without_huge_kernel_k(fake_config):
    """A selective source filter whose matches sit DEEP in the ranking
    must be found via the bounded escalation (kernel-k capped at 1024,
    then one exact-path deep pass) — not by driving the Pallas kernels
    to k ~ index.count (which blows their VMEM selection buffers)."""
    import numpy as np

    from modular_rag_system_tpu.types import Document

    cfg = fake_config.merged({
        "retrieval": {"similarity_threshold": 0.0, "time_weight": 0.0},
        "index": {"tier": "bf16", "store_dtype": "bfloat16",
                  "initial_capacity": 8192},
    })
    eng = RAGEngine(cfg)
    try:
        rng = np.random.default_rng(0)
        target = rng.standard_normal(eng.index.dim).astype(np.float32)
        target /= np.linalg.norm(target)
        # 6000 decoys all moderately similar to the probe direction...
        decoys = target[None, :] + 0.45 * rng.standard_normal(
            (6000, eng.index.dim)).astype(np.float32)
        decoys /= np.linalg.norm(decoys, axis=1, keepdims=True)
        # ...and 3 rare-source docs nearly orthogonal (rank past any
        # reasonable overfetch, but well within the exact deep pass)
        rare = rng.standard_normal((3, eng.index.dim)).astype(np.float32)
        rare -= (rare @ target)[:, None] * target[None, :]
        rare /= np.linalg.norm(rare, axis=1, keepdims=True)
        docs = [Document(content=f"decoy {i}", source="common",
                         embedding=decoys[i]) for i in range(len(decoys))]
        docs += [Document(content=f"rare {i}", source="rare",
                          embedding=rare[i]) for i in range(3)]
        eng.add_documents(docs)

        # monkeypatch the probe text's embedding via a pre-encoded query:
        # the fake encoder won't produce `target`, so query through the
        # index-level semantics using query_batch's text path with the
        # filter — correctness here is "the rare docs are FOUND at all".
        res = eng.query("probe text", max_results=3, source_filters=["rare"])
        assert len(res.documents) == 3
        assert all(d.source == "rare" for d in res.documents)
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_filtered_refill_reaches_deep_rows_sharded(fake_config):
    """ADVICE r2 (medium): on a ShardedIndex the refill escalation must
    not stop at the kernel cap — a deep exact pass (per-shard XLA top-k
    + merge, k allowed past cap_s) finds matches anywhere in the corpus."""
    import numpy as np

    from modular_rag_system_tpu.parallel.sharded import ShardedIndex
    from modular_rag_system_tpu.types import Document

    cfg = fake_config.merged({
        "retrieval": {"similarity_threshold": 0.0, "time_weight": 0.0},
        "index": {"tier": "bf16", "store_dtype": "bfloat16",
                  "initial_capacity": 8192},
        "mesh": {"index_shards": 8},
    })
    eng = RAGEngine(cfg)
    try:
        assert isinstance(eng.index, ShardedIndex)
        rng = np.random.default_rng(0)
        target = rng.standard_normal(eng.index.dim).astype(np.float32)
        target /= np.linalg.norm(target)
        decoys = target[None, :] + 0.45 * rng.standard_normal(
            (6000, eng.index.dim)).astype(np.float32)
        decoys /= np.linalg.norm(decoys, axis=1, keepdims=True)
        rare = rng.standard_normal((3, eng.index.dim)).astype(np.float32)
        rare -= (rare @ target)[:, None] * target[None, :]
        rare /= np.linalg.norm(rare, axis=1, keepdims=True)
        docs = [Document(content=f"decoy {i}", source="common",
                         embedding=decoys[i]) for i in range(len(decoys))]
        docs += [Document(content=f"rare {i}", source="rare",
                          embedding=rare[i]) for i in range(3)]
        eng.add_documents(docs)
        # the deep pass must need k > cap_s for this to regress-test the
        # any-k merge (weakness 8: silent cap_s clamp)
        assert eng.index.cap_s < eng.index.count
        res = eng.query("probe text", max_results=3, source_filters=["rare"])
        assert len(res.documents) == 3
        assert all(d.source == "rare" for d in res.documents)
    finally:
        eng.shutdown()


def test_tier_config_survives_compact_and_reembed(fake_config):
    """VERDICT r2 item 7: index tier config (ivf_*, fused_bin_width)
    must survive compact() and reembed_all() on BOTH index classes."""
    for shards in (1, 8):
        cfg = fake_config.merged({
            "index": {"tier": "ivf", "ivf_clusters": 8, "ivf_nprobe": 3,
                      "ivf_iters": 4, "ivf_refine_extra": 7},
            "mesh": {"index_shards": shards},
        })
        eng = RAGEngine(cfg)
        try:
            for text, source in CORPUS:
                eng.add_document(text, source=source)

            def chk(where):
                assert eng.index.ivf_clusters == 8, where
                assert eng.index.ivf_nprobe == 3, where
                assert eng.index.ivf_iters == 4, where
                assert eng.index.ivf_refine_extra == 7, where

            chk("init")
            eng.compact()
            chk(f"compact shards={shards}")
            eng.reembed_all()
            chk(f"reembed shards={shards}")
            res = eng.query("programming language", max_results=2)
            assert res.documents
        finally:
            eng.shutdown()


@pytest.mark.slow
def test_ivf_tier_rides_fused_program(tmp_storage):
    """VERDICT r2 item 8: the ivf tier joins the one-dispatch fused
    encode+search program instead of paying two device round-trips."""
    from modular_rag_system_tpu.config import RAGConfig

    cfg = RAGConfig().merged({
        "embedding": {"model": "minilm", "dim": 64, "max_seq_len": 32,
                      "batch_size": 8, "num_layers": 2, "num_heads": 4,
                      "mlp_dim": 128, "vocab_size": 1000, "dtype": "float32"},
        "store": {"storage_path": tmp_storage},
        "retrieval": {"similarity_threshold": 0.0},
        "index": {"tier": "ivf", "ivf_clusters": 4, "ivf_nprobe": 4,
                  "ivf_rebuild_min": 4, "ivf_fine_dtype": "bf16"},
    })
    eng = RAGEngine(cfg)
    try:
        for text, source in CORPUS:
            eng.add_document(text, source=source)
        assert eng.index._ivf2 is not None
        res = eng.query("machine learning language", max_results=3)
        assert res.documents
        assert any("ivf2" in k for k in eng._fused_query_cache), \
            list(eng._fused_query_cache)
        # fused result == two-step result
        q_emb = np.asarray(eng.encoder.encode_queries(["machine learning language"]))
        scores, rows = eng.index.search(q_emb, 4)
        fused = eng._device_query(["machine learning language"], 4)
        np.testing.assert_array_equal(fused[1][0], rows[0])
        np.testing.assert_allclose(fused[0][0], scores[0], rtol=1e-4,
                                   atol=1e-5)
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_fused_query_cache_is_bounded(fake_config):
    """Continuous ingest on an ivf-tier engine mints a new search token
    (build version / tail window) every rebuild; superseded compiled
    programs pin a full encoder-params copy each, so the cache must
    evict, not grow (round-3 review finding)."""
    cfg = fake_config.merged({
        "index": {"tier": "ivf", "ivf_clusters": 4, "ivf_nprobe": 4,
                  "ivf_rebuild_min": 8, "ivf_tail_frac": 0.01,
                  "ivf_fine_dtype": "bf16"},
    })
    eng = RAGEngine(cfg)
    for i in range(40):
        eng.add_document(f"document number {i} about topic {i % 5}")
        eng.query(f"topic {i % 5}", max_results=2)
    assert len(eng._fused_query_cache) <= eng._FUSED_CACHE_MAX
    # the engine still answers correctly after evictions
    res = eng.query("document number 39", max_results=2)
    assert res.documents


def test_filtered_refill_mid_range_k_sharded(fake_config):
    """Round-3 review finding 1: refill k in (cap_s, kernel max] on a
    sharded index must serve through the any-k deep route (previously
    the fused path silently clamped k to cap_s and the search_core API
    raised).  The rare docs rank just past cap_s but within the kernel
    escalation range, so the pre-fix clamp could never reach them."""
    import numpy as np

    from modular_rag_system_tpu.parallel.sharded import ShardedIndex
    from modular_rag_system_tpu.types import Document

    cfg = fake_config.merged({
        "retrieval": {"similarity_threshold": 0.0, "time_weight": 0.0},
        "index": {"tier": "exact", "initial_capacity": 2048,
                  "block_rows": 256},
        "mesh": {"index_shards": 8},
    })
    eng = RAGEngine(cfg)
    try:
        assert isinstance(eng.index, ShardedIndex)
        rng = np.random.default_rng(1)
        d = eng.index.dim
        # anchor on the ACTUAL query embedding so the rank layout holds
        target = np.asarray(eng.encoder.encode(["probe text"]))[0]
        target = (target / np.linalg.norm(target)).astype(np.float32)

        def at_sim(n, cos):
            g = rng.standard_normal((n, d)).astype(np.float32)
            g -= (g @ target)[:, None] * target[None, :]
            g /= np.linalg.norm(g, axis=1, keepdims=True)
            v = cos * target[None, :] + np.sqrt(1 - cos * cos) * g
            return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(
                np.float32)

        # 900 decoys at sim 0.8, 3 rare docs at sim 0.5: rare ranks are
        # exactly 901-903 — past cap_s (256), within the 4x escalation
        # ladder (k reaches min(1024, count))
        decoys = at_sim(900, 0.8)
        rare = at_sim(3, 0.5)
        docs = [Document(content=f"decoy {i}", source="common",
                         embedding=decoys[i]) for i in range(len(decoys))]
        docs += [Document(content=f"rare {i}", source="rare",
                          embedding=rare[i]) for i in range(3)]
        eng.add_documents(docs)
        assert eng.index.cap_s == 256
        assert eng.index.cap_s < eng.index.count <= 1024
        res = eng.query("probe text", max_results=3, source_filters=["rare"])
        assert len(res.documents) == 3
        assert all(d.source == "rare" for d in res.documents)
    finally:
        eng.shutdown()


def test_ivf_stats_surface(fake_config):
    """get_system_stats() exposes ANN-tier state (fine dtype, built vs
    tail, rebuilds) and the GUI analytics renders it (r3.9)."""
    from modular_rag_system_tpu.gui import format_stats

    fake_config.index.tier = "ivf"
    fake_config.index.ivf_clusters = 4
    fake_config.index.ivf_rebuild_min = 4
    eng = RAGEngine(fake_config)
    for text, source in CORPUS:
        eng.add_document(text, source=source)
    st = eng.get_system_stats()
    ivf = st["index"]["ivf"]
    assert ivf is not None and ivf["rebuilds"] >= 1
    assert ivf["built"] + ivf["tail_rows"] == st["index"]["count"]
    out = format_stats({"engine": st})
    assert "ann structure" in out and "rebuilds" in out
    eng.shutdown()
    # exact tier: no ann block, GUI omits the line
    fake_config.index.tier = "exact"
    import shutil

    shutil.rmtree(fake_config.store.storage_path, ignore_errors=True)
    eng2 = RAGEngine(fake_config)
    st2 = eng2.get_system_stats()
    assert st2["index"]["ivf"] is None
    assert "ann structure" not in format_stats({"engine": st2})
    eng2.shutdown()
