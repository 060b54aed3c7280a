"""Document store: idempotent upsert, row mapping, retention, export."""

import gzip
import json
import time

from modular_rag_system_tpu.store import DocumentStore
from modular_rag_system_tpu.types import Document


def mkdocs(n, source="test"):
    return [Document(content=f"doc number {i}", source=source) for i in range(n)]


def test_upsert_assigns_dense_rows(tmp_storage):
    s = DocumentStore(tmp_storage)
    placements = s.upsert_batch(mkdocs(5))
    assert [r for r, _ in placements] == [0, 1, 2, 3, 4]
    assert all(status == "new" for _, status in placements)
    assert s.count() == 5


def test_upsert_idempotent(tmp_storage):
    s = DocumentStore(tmp_storage)
    first = s.upsert_batch(mkdocs(3))
    again = s.upsert_batch(mkdocs(3))
    assert [r for r, _ in first] == [r for r, _ in again]
    assert all(status == "existing" for _, status in again)
    assert s.count() == 3


def test_get_by_rows_and_access_bump(tmp_storage):
    s = DocumentStore(tmp_storage)
    rows = [r for r, _ in s.upsert_batch(mkdocs(3))]
    docs = s.get_by_rows(rows)
    assert [d.content for d in docs] == ["doc number 0", "doc number 1", "doc number 2"]
    docs2 = s.get_by_rows(rows)
    assert all(d.access_count == 1 for d in docs2)


def test_get_by_rows_preserves_order(tmp_storage):
    s = DocumentStore(tmp_storage)
    rows = [r for r, _ in s.upsert_batch(mkdocs(4))]
    rev = s.get_by_rows(list(reversed(rows)), bump_access=False)
    assert [d.content for d in rev] == [f"doc number {i}" for i in (3, 2, 1, 0)]


def test_delete_and_tombstones(tmp_storage):
    s = DocumentStore(tmp_storage)
    docs = mkdocs(4)
    s.upsert_batch(docs)
    assert s.delete_ids([docs[1].id]) == 1
    assert s.get_by_id(docs[1].id) is None
    assert s.count() == 3
    assert len(s.deleted_rows()) == 1


def test_retention_actually_deletes(tmp_storage):
    s = DocumentStore(tmp_storage)
    old = Document(content="ancient", timestamp=time.time() - 100 * 86400)
    new = Document(content="fresh")
    s.upsert_batch([old, new])
    n = s.delete_older_than(time.time() - 30 * 86400)
    assert n == 1
    assert s.get_by_id(old.id) is None
    assert s.get_by_id(new.id) is not None


def test_persistence_roundtrip(tmp_storage):
    s = DocumentStore(tmp_storage)
    docs = mkdocs(3)
    s.upsert_batch(docs)
    s.close()
    s2 = DocumentStore(tmp_storage)
    assert s2.count() == 3
    assert s2.get_by_id(docs[0].id).content == "doc number 0"


def test_iter_all_rebuild_order(tmp_storage):
    s = DocumentStore(tmp_storage)
    s.upsert_batch(mkdocs(10))
    rows = [r for r, _ in s.iter_all(batch=3)]
    assert rows == sorted(rows)
    assert len(rows) == 10


def test_stats_and_export(tmp_storage, tmp_path):
    s = DocumentStore(tmp_storage)
    s.upsert_batch(mkdocs(2, source="a") + mkdocs(0))
    s.upsert_batch([Document(content="other source", source="b", content_type="ocr")])
    st = s.stats()
    assert st["total_documents"] == 3
    assert st["by_source"] == {"a": 2, "b": 1}
    assert st["by_content_type"]["ocr"] == 1
    out = s.export_gzip_json(str(tmp_path / "export.json.gz"))
    with gzip.open(out, "rt") as f:
        payload = json.load(f)
    assert len(payload["recent_documents"]) == 3


def test_upsert_reports_resurrection(tmp_storage):
    s = DocumentStore(tmp_storage)
    docs = mkdocs(2)
    s.upsert_batch(docs)
    s.delete_ids([docs[0].id])
    statuses = s.upsert_batch(docs)
    assert statuses[0][1] == "resurrected"
    assert statuses[1][1] == "existing"
    assert s.get_by_id(docs[0].id) is not None


def test_iter_all_include_deleted_positional(tmp_storage):
    s = DocumentStore(tmp_storage)
    docs = mkdocs(4)
    s.upsert_batch(docs)
    s.delete_ids([docs[1].id])
    rows = list(s.iter_all(include_deleted=True))
    assert [r for r, _ in rows] == [0, 1, 2, 3]
    assert rows[1][1] is None  # tombstone kept positionally
    assert rows[2][1].content == "doc number 2"


def test_upsert_duplicate_ids_within_one_batch(tmp_storage):
    s = DocumentStore(tmp_storage)
    d = Document(content="dup content")
    placements = s.upsert_batch([d, Document(content="dup content"), Document(content="other")])
    assert placements[0][1] == "new"
    assert placements[1] == (placements[0][0], "existing")
    assert placements[2][1] == "new"
    assert s.count() == 2


def test_duplicate_resurrection_in_one_batch(tmp_storage):
    s = DocumentStore(tmp_storage)
    d = Document(content="twice resurrected")
    s.upsert_batch([d])
    s.delete_ids([d.id])
    statuses = s.upsert_batch([Document(content="twice resurrected"),
                               Document(content="twice resurrected")])
    assert statuses[0][1] == "resurrected"
    assert statuses[1][1] == "existing"
