"""Chunker semantics (reference ``TextChunker``, embedding_pipeline.py:72-329)."""

import pytest

from modular_rag_system_tpu.chunker import TextChunker, split_paragraphs, split_sentences


@pytest.fixture()
def chunker():
    return TextChunker(chunk_size_tokens=50, overlap_tokens=10)


def test_query_never_chunked(chunker):
    text = "word " * 500
    chunks = chunker.chunk_text(text, "query")
    assert len(chunks) == 1
    assert chunks[0].content_type == "query"


def test_empty_text(chunker):
    assert chunker.chunk_text("", "document") == []
    assert chunker.chunk_text("   \n  ", "document") == []


def test_short_document_single_chunk(chunker):
    chunks = chunker.chunk_text("Hello world. This is short.", "document")
    assert len(chunks) == 1
    assert chunks[0].index == 0 and chunks[0].total == 1


def test_document_paragraph_grouping(chunker):
    paras = ["para %d sentence. " % i * 3 for i in range(10)]
    text = "\n\n".join(paras)
    chunks = chunker.chunk_text(text, "document")
    assert len(chunks) > 1
    # every chunk respects the token budget
    for c in chunks:
        assert c.token_count <= 50 + 10  # budget + slack for joiner effects
    # all content is covered
    joined = " ".join(c.text for c in chunks)
    for i in range(10):
        assert f"para {i}" in joined


def test_ocr_line_grouping_preserves_layout(chunker):
    text = "\n".join(f"line {i} with a few words" for i in range(30))
    chunks = chunker.chunk_text(text, "ocr")
    assert len(chunks) > 1
    assert "\n" in chunks[0].text  # layout preserved within a chunk
    # no overlap for OCR: total lines across chunks == 30
    total_lines = sum(len(c.text.splitlines()) for c in chunks)
    assert total_lines == 30


def test_keystroke_sentence_overlap(chunker):
    sents = [f"Sentence number {i} is here." for i in range(40)]
    text = " ".join(sents)
    chunks = chunker.chunk_text(text, "keystroke")
    assert len(chunks) > 1
    # overlap: some sentence from the end of chunk 0 reappears in chunk 1
    tail_sent = chunks[0].text.split(".")[-2].strip()
    assert tail_sent and tail_sent in chunks[1].text


def test_oversized_unit_hard_split(chunker):
    text = "word " * 400  # one giant "paragraph" with no sentence breaks
    chunks = chunker.chunk_text(text, "document")
    assert len(chunks) > 1
    for c in chunks:
        assert c.token_count <= 60


def test_long_paragraph_split_by_sentence(chunker):
    long_para = " ".join(f"This is sentence {i}." for i in range(60))
    text = "short intro.\n\n" + long_para
    chunks = chunker.chunk_text(text, "document")
    assert len(chunks) > 1


def test_custom_token_counter():
    c = TextChunker(chunk_size_tokens=10, overlap_tokens=2, token_counter=lambda s: len(s.split()))
    chunks = c.chunk_text(" ".join(f"w{i}." for i in range(50)), "keystroke")
    for ch in chunks:
        assert len(ch.text.split()) <= 12


def test_split_helpers():
    assert split_sentences("A one. B two! C three? D") == ["A one.", "B two!", "C three?", "D"]
    assert split_paragraphs("a\n\nb\n \nc") == ["a", "b", "c"]


def test_overlap_must_be_smaller():
    with pytest.raises(ValueError):
        TextChunker(chunk_size_tokens=10, overlap_tokens=10)
