"""Aux subsystems: MicroBatcher, WindowTracker, profiling, GUI gating,
HF loader gating, examples smoke."""

import subprocess
import sys
import time

import numpy as np
import pytest

from modular_rag_system_tpu.chunker import TextChunker
from modular_rag_system_tpu.engine import RAGEngine
from modular_rag_system_tpu.models.fake import FeatureHashEncoder
from modular_rag_system_tpu.pipeline import EmbeddingPipeline, MicroBatcher
from modular_rag_system_tpu.utils.profiling import TimingRegistry


# ---------------------------------------------------------------- batcher
def make_batcher(fake_config, batch_size=3):
    eng = RAGEngine(fake_config)
    pipe = EmbeddingPipeline(eng.encoder, eng.chunker)
    return MicroBatcher(pipe, eng, batch_size=batch_size,
                        flush_timeout_s=0.2, poll_interval_s=0.05), eng


def test_microbatcher_flush_at_batch_size(fake_config):
    b, eng = make_batcher(fake_config, batch_size=3)
    for i in range(3):
        b.add(f"captured text number {i} with enough words",
              {"application": "editor", "content_type": "keystroke"})
    assert b.stats["flushes"] == 1
    assert eng.index.count == 3
    # items below threshold stay buffered
    b.add("pending item", {"content_type": "keystroke"})
    assert b.stats["flushes"] == 1


def test_microbatcher_timeout_flush(fake_config):
    b, eng = make_batcher(fake_config, batch_size=50)
    b.start_background()
    b.add("timed out item text", {"content_type": "keystroke"})
    time.sleep(0.6)
    b.stop()
    assert b.stats["flushes"] >= 1
    assert eng.index.count == 1


def test_microbatcher_facade_integration(fake_config):
    from modular_rag_system_tpu.facade import EnhancedRAGSystem

    cfg = fake_config.merged({"serving": {"file_server_port": 0}})
    s = EnhancedRAGSystem(cfg, llm_client=False, capture_batch_size=2)
    try:
        kc = s.enable_keystroke_capture()
        for text in ("first captured sentence here", "second captured sentence here"):
            for ch in text:
                kc.feed_event(ch if ch != " " else "space", application="editor")
            kc.feed_event("enter", application="other-app")  # force session split
        kc.drain()
        s.batcher.flush()
        res = s.engine.query("captured sentence", max_results=3,
                             similarity_threshold=0.0)
        assert res.documents
    finally:
        s.shutdown()


# ---------------------------------------------------------------- windows
def test_window_tracker_fallback_chain():
    from modular_rag_system_tpu.ingest.windows import WindowTracker

    wt = WindowTracker(min_interval_s=0.0)
    info = wt.get_active_window_info()
    assert set(info) == {"application", "window_title"}
    # headless container: tools missing -> Unknown terminal fallback
    if not wt.available:
        assert info == {"application": "Unknown", "window_title": "Unknown"}


def test_window_tracker_rate_limit():
    from modular_rag_system_tpu.ingest.windows import WindowTracker

    wt = WindowTracker(min_interval_s=60.0)
    a = wt.get_active_window_info()
    wt._last_info = {"application": "cached", "window_title": "cached"}
    b = wt.get_active_window_info()  # within interval -> cached value
    assert b["application"] == "cached"


# ---------------------------------------------------------------- profiling
def test_timing_registry():
    reg = TimingRegistry()
    with reg.track("op"):
        time.sleep(0.01)
    reg.record("op", 0.02)
    st = reg.stats()["op"]
    assert st["count"] == 2
    assert st["avg_s"] > 0.005
    assert "p50_s" in st and "p99_s" in st


# ---------------------------------------------------------------- gating
def test_gui_gated_headless(fake_config):
    from modular_rag_system_tpu import gui

    if gui.tkinter_available():
        pytest.skip("display present; gating not applicable")
    with pytest.raises(RuntimeError, match="CLI"):
        gui.launch_gui(object())


@pytest.mark.slow
def test_hf_loader_gated_offline(fake_config):
    from modular_rag_system_tpu.models.hf_loader import try_build_pretrained_encoder

    # zero-egress container without an HF cache -> None, never raises
    assert try_build_pretrained_encoder(fake_config) is None


# ---------------------------------------------------------------- examples
@pytest.mark.parametrize("script", ["basic_usage.py", "llm_integration.py"])
def test_examples_run(script, tmp_path):
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, f"examples/{script}"],
        capture_output=True, text=True, timeout=240, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "error" not in out.stdout.lower() or "LLM" in out.stdout


def test_ollama_encoder_unreachable_raises(fake_config):
    from modular_rag_system_tpu.models import build_encoder

    cfg = fake_config.merged({"embedding": {"model": "ollama"},
                              "serving": {"ollama_base_url": "http://127.0.0.1:1"}})
    with pytest.raises(RuntimeError, match="unreachable"):
        build_encoder(cfg)


def test_ollama_encoder_roundtrip_with_fake_server(fake_config, tmp_path):
    """Serve a minimal Ollama-compatible API and run the real HTTP path."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import numpy as _np

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = b'{"models": []}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            prompt = _json.loads(self.rfile.read(n))["prompt"]
            rng = _np.random.default_rng(abs(hash(prompt)) % 2**32)
            emb = rng.standard_normal(384).tolist()
            body = _json.dumps({"embedding": emb}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from modular_rag_system_tpu.models.ollama import OllamaEmbedder

        enc = OllamaEmbedder(base_url=f"http://127.0.0.1:{srv.server_address[1]}",
                             dim=384)
        assert enc.available
        emb = enc.encode(["hello", "world"])
        assert emb.shape == (2, 384)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
        # deterministic per prompt
        np.testing.assert_array_equal(enc.encode(["hello"])[0], emb[0])
    finally:
        srv.shutdown()


def test_retry_transient_semantics():
    from modular_rag_system_tpu.utils.resilience import is_transient, retry_transient

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("INTERNAL: http://x/remote_compile: HTTP 500")
        return "ok"

    assert retry_transient(flaky, retries=3, base_delay_s=0.0) == "ok"
    assert calls["n"] == 3

    def permanent():
        raise RuntimeError("Ran out of memory in memory space hbm")

    with pytest.raises(RuntimeError, match="Ran out of memory"):
        retry_transient(permanent, retries=5, base_delay_s=0.0)

    def exhausts():
        raise RuntimeError("UNAVAILABLE: Socket closed")

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        retry_transient(exhausts, retries=1, base_delay_s=0.0)

    assert is_transient(RuntimeError("remote_compile: HTTP 500"))
    assert not is_transient(RuntimeError("INVALID_ARGUMENT: bad shape"))
    assert not is_transient(ValueError("unrelated"))


def test_gui_format_stats_renders_real_tree(fake_config):
    """The analytics tab renders get_system_stats as structured text
    (reference rag_query_interface.py:822-859) — covered headlessly."""
    from modular_rag_system_tpu.facade import EnhancedRAGSystem
    from modular_rag_system_tpu.gui import format_stats

    cfg = fake_config.merged({"serving": {"file_server_port": 0}})
    s = EnhancedRAGSystem(cfg, llm_client=False)
    try:
        s.engine.add_document("stats render probe", source="test")
        s.engine.query("probe")
        text = format_stats(s.get_system_stats())
    finally:
        s.shutdown()
    assert "Retrieval engine:" in text
    assert "total documents:    1" in text
    assert "total queries:      1" in text
    assert "cache:" in text and "hit ratio" in text
    assert "Documents by source:" in text and "test: 1" in text
    assert "System running:" in text


def test_gui_format_stats_tolerates_missing_sections():
    from modular_rag_system_tpu.gui import format_stats

    text = format_stats({})
    assert "Retrieval engine:" in text  # degrades, never raises


def test_bootstrap_script_syntax():
    """setup_rag_system.sh parses (reference setup_rag_system.sh parity);
    full execution is covered manually (spawns several interpreters)."""
    import pathlib
    import subprocess

    script = pathlib.Path(__file__).resolve().parent.parent / "setup_rag_system.sh"
    assert script.exists()
    subprocess.run(["bash", "-n", str(script)], check=True)
