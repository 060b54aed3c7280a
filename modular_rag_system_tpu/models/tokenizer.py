"""Tokenizer for the encoder.

Two backends behind one interface:

* ``WordPieceTokenizer`` — real BERT-style WordPiece, used when a vocab
  file is available (e.g. the HF ``all-MiniLM-L6-v2`` cache via
  ``hf_loader``).
* ``HashingTokenizer`` — dependency-free fallback: lowercase word split,
  long words broken into fixed-size pieces, pieces hashed into the vocab
  id space.  Deterministic and collision-stable, so random-weight encoder
  outputs are reproducible.  This is the zero-egress default.

Both produce static-shape ``(batch, max_len)`` int32 ids + masks —
XLA-friendly: no dynamic shapes reach the jitted encoder.

The reference counted tokens with tiktoken or a ``words * 1.3`` estimate
(``embedding_pipeline.py:301-310``); here the chunker uses the actual
encoder tokenizer's counts.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]", re.IGNORECASE)

# Special ids (BERT-compatible layout)
PAD_ID = 0
UNK_ID = 100
CLS_ID = 101
SEP_ID = 102
_FIRST_REGULAR_ID = 999  # hash ids start after special/unused range


def _fnv1a(data: bytes) -> int:
    """FNV-1a 32-bit — chosen over md5 because the native C++ text engine

    (``native/text_engine.cpp``) reproduces it bit-exactly with no crypto
    dependency; Python and C++ tokenization must agree id-for-id."""
    h = 0x811C9DC5
    for b in data:
        h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
    return h


def _first_regular(vocab_size: int) -> int:
    """First non-special id: BERT-style 999 for real-size vocabs, packed

    right after the specials for tiny test vocabs (guards the modulo
    span from going non-positive, which produced out-of-range ids)."""
    if vocab_size > 2 * _FIRST_REGULAR_ID:
        return _FIRST_REGULAR_ID
    if vocab_size <= SEP_ID + 2:
        raise ValueError(f"vocab_size {vocab_size} too small (min {SEP_ID + 2})")
    return SEP_ID + 1


def _hash_id(piece: str, vocab_size: int) -> int:
    first = _first_regular(vocab_size)
    span = vocab_size - first
    return first + _fnv1a(piece.encode("utf-8")) % span


class HashingTokenizer:
    name = "hashing"

    def __init__(
        self,
        vocab_size: int = 30522,
        max_len: int = 256,
        piece_len: int = 6,
        use_native: bool = True,
    ) -> None:
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.piece_len = piece_len
        self._native = None
        if use_native:
            try:
                from modular_rag_system_tpu.native import get_engine

                self._native = get_engine()
            except Exception:
                self._native = None

    def tokenize(self, text: str) -> List[str]:
        pieces: List[str] = []
        for w in _WORD_RE.findall(text.lower()):
            if len(w) <= self.piece_len:
                pieces.append(w)
            else:
                pieces.append(w[: self.piece_len])
                for i in range(self.piece_len, len(w), self.piece_len):
                    pieces.append("##" + w[i : i + self.piece_len])
        return pieces

    def token_count(self, text: str) -> int:
        if self._native is not None and text.isascii():
            return self._native.token_count(text, self.piece_len)
        return len(self.tokenize(text)) + 2  # [CLS] + [SEP]

    def encode_batch(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (ids (B, max_len) int32, mask (B, max_len) int32).

        Uses the native C++ engine when available (bit-exact for ASCII
        input; non-ASCII batches take the pure-Python path)."""
        if (
            self._native is not None
            and texts
            and all(t.isascii() for t in texts)
        ):
            return self._native.tokenize_batch(
                texts, self.max_len, self.vocab_size, self.piece_len
            )
        B = len(texts)
        ids = np.full((B, self.max_len), PAD_ID, dtype=np.int32)
        mask = np.zeros((B, self.max_len), dtype=np.int32)
        for b, text in enumerate(texts):
            pieces = self.tokenize(text)[: self.max_len - 2]
            row = [CLS_ID] + [_hash_id(p, self.vocab_size) for p in pieces] + [SEP_ID]
            ids[b, : len(row)] = row
            mask[b, : len(row)] = 1
        return ids, mask


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece over an explicit vocab.

    ASCII batches run through the native C++ engine (bit-exact,
    ~40x the Python loop — the ingest hot path once a real-vocab
    default checkpoint ships); non-ASCII input and non-ASCII vocab
    entries take the pure-Python path."""

    name = "wordpiece"

    def __init__(self, vocab: Dict[str, int], max_len: int = 256,
                 use_native: bool = True) -> None:
        self.vocab = vocab
        self.max_len = max_len
        self.vocab_size = max(vocab.values()) + 1
        self.unk = vocab.get("[UNK]", UNK_ID)
        self.cls = vocab.get("[CLS]", CLS_ID)
        self.sep = vocab.get("[SEP]", SEP_ID)
        self.pad = vocab.get("[PAD]", PAD_ID)
        self._max_chars = 100
        self._wp_native = None
        if use_native:
            try:
                from modular_rag_system_tpu.native import get_engine

                eng = get_engine()
                if eng is not None:
                    # non-ascii pieces can never match ascii input, so
                    # dropping them from the native table keeps ascii
                    # batches bit-exact vs the Python path
                    items = [(p, i) for p, i in vocab.items()
                             if p.isascii() and p
                             and not (p.startswith("[") and p.endswith("]"))]
                    pieces = [p.encode("ascii") for p, _ in items]
                    ids = np.array([i for _, i in items], dtype=np.int32)
                    self._wp_native = eng.wp_create(
                        pieces, ids, self.unk, self.cls, self.sep, self.pad)
            except Exception:
                self._wp_native = None

    @classmethod
    def from_vocab_file(cls, path: str, max_len: int = 256) -> "WordPieceTokenizer":
        vocab: Dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab, max_len)

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > self._max_chars:
            return [self.unk]
        out: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur: Optional[int] = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    cur = self.vocab[piece]
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            out.append(cur)
            start = end
        return out

    def tokenize_ids(self, text: str) -> List[int]:
        ids: List[int] = []
        for w in _WORD_RE.findall(text.lower()):
            ids.extend(self._wordpiece(w))
        return ids

    def token_count(self, text: str) -> int:
        if self._wp_native is not None and text.isascii():
            return self._wp_native.token_count(text)
        return len(self.tokenize_ids(text)) + 2

    def encode_batch(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        if (
            self._wp_native is not None
            and texts
            and all(t.isascii() for t in texts)
        ):
            return self._wp_native.tokenize_batch(texts, self.max_len)
        B = len(texts)
        ids = np.full((B, self.max_len), self.pad, dtype=np.int32)
        mask = np.zeros((B, self.max_len), dtype=np.int32)
        for b, text in enumerate(texts):
            row = [self.cls] + self.tokenize_ids(text)[: self.max_len - 2] + [self.sep]
            ids[b, : len(row)] = row
            mask[b, : len(row)] = 1
        return ids, mask
