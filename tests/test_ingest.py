"""Privacy filter, file manager + HTTP server, keystroke + OCR adapters."""

import json
import time
import urllib.request

import pytest

from modular_rag_system_tpu.ingest.files import FileUploadManager
from modular_rag_system_tpu.ingest.keystrokes import KeystrokeCapture
from modular_rag_system_tpu.ingest.ocr import OCRIngestLoop, stub_backend
from modular_rag_system_tpu.ingest.privacy import PrivacyFilter


# ---------------------------------------------------------------- privacy
@pytest.fixture()
def pf():
    return PrivacyFilter(
        blocked_applications=["1password", "banking"],
        blocked_window_keywords=["password", "login"],
    )


def test_privacy_blocks_apps_and_windows(pf):
    assert pf.should_block_application("1Password 8", "")
    assert pf.should_block_application("chrome", "Enter your PASSWORD")
    assert not pf.should_block_application("emacs", "notes.org")


def test_privacy_sensitive_detection(pf):
    assert pf.is_sensitive_content("my ssn is 123-45-6789")
    assert pf.is_sensitive_content("card 4111 1111 1111 1111 thanks")
    assert pf.is_sensitive_content("email me at a.b@example.com")
    assert pf.is_sensitive_content("api_key=sk-abc123xyz")
    assert pf.is_sensitive_content("the password is hunter2")
    assert not pf.is_sensitive_content("we discussed the quarterly roadmap")


def test_privacy_anonymize(pf):
    out = pf.anonymize_text("contact a.b@example.com or 123-45-6789")
    assert "a.b@example.com" not in out
    assert "123-45-6789" not in out
    assert "[REDACTED_" in out


def test_privacy_disabled_passthrough():
    pf = PrivacyFilter(enabled=False)
    assert not pf.is_sensitive_content("password is hunter2")
    assert pf.anonymize_text("a@b.com") == "a@b.com"


def test_privacy_sequence_filter(pf):
    events = [{"key": c} for c in "my ssn is 123-45-6789"]
    _, flagged = pf.filter_keystroke_sequence(events)
    assert flagged
    assert all(e.get("filtered") for e in events[-10:])


# ---------------------------------------------------------------- files
def test_file_manager_roundtrip(tmp_path):
    up = tmp_path / "up"
    fm = FileUploadManager(upload_folder=str(up), port=0)
    src = tmp_path / "notes.txt"
    src.write_text("hello notes content")
    rec = fm.add_file(str(src))
    assert rec.access_link == f"/files/{rec.file_id}/notes.txt"
    assert rec.sha256
    assert fm.get_file_link(rec.file_id) == rec.access_link
    assert fm.read_text(rec) == "hello notes content"


def test_file_manager_folder_scan(tmp_path):
    fm = FileUploadManager(upload_folder=str(tmp_path / "up"), port=0)
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "a.txt").write_text("a")
    (tmp_path / "in" / "b.json").write_text('{"x": 1}')
    (tmp_path / "in" / "c.bin").write_bytes(b"\x00")
    out = fm.upload_folder_contents(str(tmp_path / "in"))
    assert sorted(r.original_name for r in out) == ["a.txt", "b.json"]


def test_file_http_server(tmp_path):
    fm = FileUploadManager(upload_folder=str(tmp_path / "up"), port=0)
    src = tmp_path / "served.txt"
    src.write_text("served body")
    rec = fm.add_file(str(src))
    port = fm.start_web_server()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/files") as r:
            listing = json.loads(r.read())
            assert r.headers["Access-Control-Allow-Origin"] == "*"
        assert listing["files"][0]["original_name"] == "served.txt"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{rec.access_link}") as r:
            assert r.read() == b"served body"
        # 404 for unknown
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/files/nope/x.txt")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        fm.stop_web_server()


def test_find_relevant_files(tmp_path):
    fm = FileUploadManager(upload_folder=str(tmp_path / "up"), port=0)
    for name in ("project_report.txt", "meeting_notes.txt", "recipe.txt"):
        p = tmp_path / name
        p.write_text("x")
        fm.add_file(str(p))
    found = fm.find_relevant_files("project report summary")
    assert found and found[0].original_name == "project_report.txt"


# ---------------------------------------------------------------- keystrokes
def test_keystroke_reconstruction_and_callback():
    captured = []
    kc = KeystrokeCapture(rag_callback=lambda c, m: captured.append((c, m)))
    for ch in "hello world extra":
        kc.feed_event(ch if ch != " " else "space", application="editor")
    kc.drain()
    assert captured
    content, meta = captured[0]
    assert content == "hello world extra"
    assert meta["application"] == "editor"
    assert meta["content_type"] == "keystroke"


def test_keystroke_backspace():
    kc = KeystrokeCapture()
    for ch in "helloo":
        kc.feed_event(ch)
    kc.feed_event("backspace")
    kc.feed_event("space")
    for ch in "world":
        kc.feed_event(ch)
    kc.drain()
    assert kc._sessions[0].content == "hello world"


def test_keystroke_sensitive_session_dropped():
    captured = []
    kc = KeystrokeCapture(rag_callback=lambda c, m: captured.append(c))
    for ch in "password: hunter2 now":
        kc.feed_event(ch if ch != " " else "space")
    kc.drain()
    assert not captured
    assert kc.stats["sessions_filtered"] == 1
    assert kc._sessions[0].content == ""


def test_keystroke_blocked_app_ignored():
    kc = KeystrokeCapture(
        privacy=PrivacyFilter(blocked_applications=["banking"])
    )
    assert not kc.feed_event("a", application="MyBanking App")
    kc.drain()
    assert kc.stats["events_total"] == 0


def test_keystroke_session_split_on_app_change():
    kc = KeystrokeCapture()
    for ch in "first app text":
        kc.feed_event(ch if ch != " " else "space", application="editor")
    for ch in "second app text":
        kc.feed_event(ch if ch != " " else "space", application="browser")
    kc.drain()
    assert len(kc._sessions) == 2
    assert kc._sessions[0].application == "editor"
    assert kc._sessions[1].application == "browser"


def test_keystroke_export_and_stats(tmp_path):
    kc = KeystrokeCapture()
    for ch in "some exported text":
        kc.feed_event(ch if ch != " " else "space")
    kc.drain()
    out = kc.export_sessions(str(tmp_path / "sessions.json"))
    payload = json.loads(open(out).read())
    assert payload["sessions"][0]["content"] == "some exported text"
    st = kc.get_statistics()
    assert st["events_total"] == len("some exported text")


# ---------------------------------------------------------------- ocr
def test_ocr_accepts_confident_text():
    got = []
    loop = OCRIngestLoop(stub_backend("screen shows meeting agenda", 0.9),
                         sink=lambda c, m: got.append((c, m)))
    assert loop.poll_once()
    assert got[0][0] == "screen shows meeting agenda"
    assert got[0][1]["content_type"] == "ocr"


def test_ocr_rejects_low_confidence():
    got = []
    loop = OCRIngestLoop(stub_backend("blurry text", 0.3),
                         sink=lambda c, m: got.append(c))
    assert not loop.poll_once()
    assert loop.stats["low_confidence"] == 1


def test_ocr_filters_sensitive():
    got = []
    loop = OCRIngestLoop(stub_backend("my ssn is 123-45-6789", 0.95),
                         sink=lambda c, m: got.append(c))
    assert not loop.poll_once()
    assert loop.stats["filtered"] == 1


def test_ocr_background_thread():
    got = []
    loop = OCRIngestLoop(stub_backend("tick", 0.9), sink=lambda c, m: got.append(c),
                         analysis_interval_s=0.05)
    loop.start()
    time.sleep(0.3)
    loop.stop()
    assert len(got) >= 2
