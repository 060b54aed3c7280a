"""Facade (both API families) + launcher CLI."""

import json

import numpy as np
import urllib.request

import pytest

from modular_rag_system_tpu.facade import EnhancedRAGSystem
from modular_rag_system_tpu.launcher import build_arg_parser, load_config, main


@pytest.fixture()
def system(fake_config):
    cfg = fake_config.merged({"serving": {"file_server_port": 0}})
    s = EnhancedRAGSystem(cfg, llm_client=False)  # falsy -> no LLM probing
    yield s
    s.shutdown()


def test_both_api_families_exist(system):
    """The reference lost query_with_files/get_system_stats to its
    duplicate class definition (SURVEY §2.6); we expose both families."""
    for name in ("start", "query_with_files", "add_file_from_path",
                 "get_system_stats", "enhanced_query", "add_context_switch",
                 "record_feedback", "process_uploaded_file"):
        assert callable(getattr(system, name)), name


def test_file_upload_and_query_with_files(system, tmp_path):
    f = tmp_path / "roadmap_notes.txt"
    f.write_text("The roadmap covers retrieval quality and TPU scaling.")
    rec = system.add_file_from_path(str(f))
    assert rec is not None
    out = system.query_with_files("roadmap retrieval")
    assert out["results"]
    assert out["results"][0]["access_link"] == rec.access_link
    assert out["file_references"][0]["original_name"] == "roadmap_notes.txt"


def test_enhanced_query_full_payload(system):
    system.engine.add_document("notes about index sharding on TPU meshes",
                               source="notes")
    system.add_context_switch("editor", "browser")
    system.record_feedback("index sharding", "positive")
    resp = system.enhanced_query("what about index sharding?",
                                 current_app="editor",
                                 current_content="editing sharding code index")
    for key in ("insight", "confidence", "query_type", "sources",
                "follow_up_queries", "bridged_contexts", "predicted_contexts",
                "learning_adjustments", "file_references"):
        assert key in resp, key
    assert resp["query_type"] == "question"
    assert resp["predicted_contexts"][0]["application"] == "browser"


def test_capture_to_index_flow(system):
    kc = system.enable_keystroke_capture()
    for ch in "typing about pallas kernels on tpu hardware":
        kc.feed_event(ch if ch != " " else "space", application="editor")
    kc.drain()
    res = system.engine.query("pallas kernels", max_results=3,
                              similarity_threshold=0.0)
    assert any("pallas" in d.content for d in res.documents)
    assert any(d.content_type == "keystroke" for d in res.documents)


def test_start_serves_and_ingests_inbox(fake_config, tmp_path):
    cfg = fake_config.merged({"serving": {"file_server_port": 0}})
    import pathlib
    inbox = pathlib.Path(cfg.store.storage_path) / "inbox"
    inbox.mkdir(parents=True)
    (inbox / "seed.txt").write_text("seed document about quarterly planning")
    s = EnhancedRAGSystem(cfg, llm_client=False)
    try:
        s.start()
        res = s.engine.query("quarterly planning", similarity_threshold=0.0)
        assert res.documents
        with urllib.request.urlopen(f"http://127.0.0.1:{s.files.port}/files") as r:
            assert json.loads(r.read())["files"]
    finally:
        s.shutdown()


def test_get_system_stats_shape(system):
    st = system.get_system_stats()
    for key in ("engine", "pipeline", "processor", "files", "started"):
        assert key in st


# ---------------------------------------------------------------- launcher
def test_arg_parser_flags():
    p = build_arg_parser()
    args = p.parse_args(["--tier", "int8", "--storage", "/tmp/x", "--shards", "4"])
    cfg = load_config(args)
    assert cfg.index.tier == "int8"
    assert cfg.store.storage_path == "/tmp/x"
    assert cfg.mesh.index_shards == 4


def test_launcher_self_test(tmp_storage, capsys):
    rc = main(["--test", "--storage", tmp_storage, "--encoder", "fake",
               "--port", "0"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "self-test: PASSED" in out


def test_launcher_single_query(tmp_storage, capsys):
    rc = main(["--init-only", "--storage", tmp_storage, "--encoder", "fake",
               "--port", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"engine"' in out


def test_http_query_api(fake_config):
    import json
    import urllib.request

    from modular_rag_system_tpu.facade import EnhancedRAGSystem
    from modular_rag_system_tpu.serving import RAGHTTPServer

    cfg = fake_config.merged({"serving": {"file_server_port": 0}})
    s = EnhancedRAGSystem(cfg, llm_client=False)
    s.engine.add_document("serving api test document about kernels", source="docs")
    srv = RAGHTTPServer(s, port=0)
    port = srv.start()
    base = f"http://127.0.0.1:{port}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        with urllib.request.urlopen(base + "/health", timeout=5) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["docs"] == 1
        # raw engine query
        code, out = post("/query", {"query": "kernels", "enhanced": False,
                                    "max_results": 3})
        assert code == 200 and out["results"][0]["source"] == "docs"
        # enhanced query
        code, out = post("/query", {"query": "what about kernels?"})
        assert code == 200 and "insight" in out
        # add through the API then find it
        code, out = post("/add", {"content": "added via http api", "source": "api"})
        assert code == 200 and out["chunks"] == 1
        code, out = post("/query", {"query": "added via http", "enhanced": False})
        assert any(r["source"] == "api" for r in out["results"])
        # feedback
        code, out = post("/feedback", {"query": "kernels", "type": "positive"})
        assert code == 200 and out["recorded"]
        # error paths
        code, out = post("/query", {})
        assert code == 400 and "missing" in out["error"]
        code, out = post("/feedback", {"query": "kernels"})  # no 'type'
        assert code == 400 and "type" in out["error"]
        code, _ = post("/nope", {})
        assert code == 404
        req = urllib.request.Request(base + "/query", data=b"not json{",
                                     headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=5)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()
        s.shutdown()


@pytest.mark.slow
def test_fine_tune_from_feedback_loop(tmp_storage):
    """Close the loop: feedback pairs -> fine-tune -> re-embed -> query."""
    from modular_rag_system_tpu.config import RAGConfig

    cfg = RAGConfig().merged({
        "embedding": {"model": "minilm", "dim": 64, "max_seq_len": 32,
                      "batch_size": 8, "num_layers": 2, "num_heads": 4,
                      "mlp_dim": 128, "vocab_size": 1000, "dtype": "float32"},
        "store": {"storage_path": tmp_storage},
        "serving": {"file_server_port": 0},
        "retrieval": {"similarity_threshold": 0.0},
    })
    s = EnhancedRAGSystem(cfg, enable_llm=False)
    try:
        contents = [f"knowledge item {i} about subject s{i}" for i in range(6)]
        for c in contents:
            s.engine.add_document(c)
        for i in range(4):
            s.record_feedback(f"question about subject s{i}",
                              "positive", matched_content=contents[i])
        metrics = s.fine_tune_from_feedback(steps=5, min_pairs=4)
        assert metrics is not None
        assert metrics["pairs"] == 4
        assert metrics["rows_reembedded"] == 6
        assert np.isfinite(metrics["final_loss"])
        # corpus still fully queryable in the NEW embedding space
        res = s.engine.query("knowledge item 3 about subject s3", max_results=1)
        assert res.documents and "item 3" in res.documents[0].content
        # pairs consumed
        assert s.fine_tune_from_feedback(min_pairs=4) is None
    finally:
        s.shutdown()


def test_fine_tune_requires_trainable_encoder(fake_config):
    s = EnhancedRAGSystem(fake_config.merged({"serving": {"file_server_port": 0}}),
                          enable_llm=False)
    try:
        for i in range(8):
            s.record_feedback(f"q{i}", "positive", matched_content=f"c{i}")
        assert s.fine_tune_from_feedback() is None  # fake encoder: no-op
    finally:
        s.shutdown()


def test_launcher_query_mode(tmp_storage, capsys):
    # seed a corpus, then run one query through the --query mode
    from modular_rag_system_tpu.config import RAGConfig
    from modular_rag_system_tpu.engine import RAGEngine

    cfg = RAGConfig.load(overrides={
        "embedding.model": "fake", "store.storage_path": tmp_storage,
        "retrieval.similarity_threshold": 0.0,
        "serving.file_server_port": 0})
    eng = RAGEngine(cfg)
    eng.add_document("query-mode target document about gizmos")
    eng.shutdown()
    rc = main(["--query", "what about gizmos?", "--storage", tmp_storage,
               "--encoder", "fake", "--port", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Insight" in out and "confidence=" in out


def test_keystrokes_module_cli():
    import subprocess, sys, os

    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "modular_rag_system_tpu.ingest.keystrokes", "--test"],
        capture_output=True, text=True, timeout=120, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stdout + out.stderr
    assert "self-test: PASSED" in out.stdout


def test_facade_ocr_wiring(fake_config):
    from modular_rag_system_tpu.ingest.ocr import stub_backend

    cfg = fake_config.merged({"serving": {"file_server_port": 0}})
    s = EnhancedRAGSystem(cfg, enable_llm=False)
    try:
        loop = s.enable_ocr(stub_backend("screen text about dashboards", 0.95),
                            start=False)
        assert loop.poll_once()
        res = s.engine.query("screen text dashboards", max_results=2,
                             similarity_threshold=0.0)
        assert res.documents
        assert any(d.content_type == "ocr" for d in res.documents)
        # context aggregator got the OCR entry too
        assert s.aggregator.recent("ocr")
    finally:
        s.shutdown()


def test_http_api_concurrent_clients(fake_config):
    """ThreadingHTTPServer + engine locks under concurrent query/add."""
    import json
    import threading
    import urllib.request

    from modular_rag_system_tpu.serving import RAGHTTPServer

    cfg = fake_config.merged({"serving": {"file_server_port": 0}})
    s = EnhancedRAGSystem(cfg, enable_llm=False)
    s.engine.add_document("concurrent serving seed document")
    srv = RAGHTTPServer(s, port=0)
    port = srv.start()
    base = f"http://127.0.0.1:{port}"
    errors = []

    def post(path, payload):
        req = urllib.request.Request(base + path, data=json.dumps(payload).encode(),
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            return json.loads(r.read())

    def querier(i):
        try:
            for j in range(5):
                out = post("/query", {"query": f"seed document {i} {j}",
                                      "enhanced": False,
                                      "similarity_threshold": 0.0})
                assert "results" in out
        except Exception as exc:
            errors.append(exc)

    def adder(i):
        try:
            for j in range(5):
                post("/add", {"content": f"concurrent doc {i}-{j} payload"})
        except Exception as exc:
            errors.append(exc)

    threads = [threading.Thread(target=querier, args=(i,)) for i in range(3)]
    threads += [threading.Thread(target=adder, args=(i,)) for i in range(3)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        assert s.engine.index.count == 1 + 15
        assert s.engine.store.count() == s.engine.index.count
    finally:
        srv.stop()
        s.shutdown()
