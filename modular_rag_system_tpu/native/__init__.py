"""Native text engine loader (ctypes; builds with g++ on first use).

``get_engine()`` returns a loaded ``TextEngine`` or None when the shared
library can't be built/loaded — callers (the tokenizer) fall back to the
pure-Python path, preserving the framework's graceful-degradation
pattern (SURVEY §5).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libtextengine.so"
_SRC = _DIR / "text_engine.cpp"
_ABI = 2

_lock = threading.Lock()
_engine: Optional["TextEngine"] = None
_tried = False


def _build() -> bool:
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


class TextEngine:
    def __init__(self, lib: ctypes.CDLL) -> None:
        self._lib = lib
        lib.te_tokenize_batch.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.te_tokenize_batch.restype = None
        lib.te_token_count.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int
        ]
        lib.te_token_count.restype = ctypes.c_int64
        lib.te_wp_create.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.te_wp_create.restype = ctypes.c_void_p
        lib.te_wp_set_ids.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        lib.te_wp_set_ids.restype = None
        lib.te_wp_destroy.argtypes = [ctypes.c_void_p]
        lib.te_wp_destroy.restype = None
        lib.te_wp_tokenize_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.te_wp_tokenize_batch.restype = None
        lib.te_wp_token_count.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64
        ]
        lib.te_wp_token_count.restype = ctypes.c_int64

    def tokenize_batch(
        self,
        texts: Sequence[str],
        max_len: int,
        vocab_size: int,
        piece_len: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        lowered: List[bytes] = [t.lower().encode("ascii") for t in texts]
        blob = b"".join(lowered)
        lengths = np.array([len(b) for b in lowered], dtype=np.int64)
        offsets = np.zeros(len(lowered), dtype=np.int64)
        if len(lowered) > 1:
            offsets[1:] = np.cumsum(lengths)[:-1]
        ids = np.zeros((len(texts), max_len), dtype=np.int32)
        mask = np.zeros((len(texts), max_len), dtype=np.int32)
        self._lib.te_tokenize_batch(
            blob, offsets, lengths, len(texts), max_len, vocab_size,
            piece_len, ids, mask,
        )
        return ids, mask

    def token_count(self, text: str, piece_len: int) -> int:
        b = text.lower().encode("ascii")
        return int(self._lib.te_token_count(b, len(b), piece_len))

    # --- WordPiece (real vocab) ---------------------------------------
    def wp_create(self, pieces: Sequence[bytes], ids: np.ndarray,
                  unk: int, cls: int, sep: int, pad: int) -> "WpHandle":
        blob = b"".join(pieces)
        lens = np.array([len(p) for p in pieces], dtype=np.int64)
        offs = np.zeros(len(pieces), dtype=np.int64)
        if len(pieces) > 1:
            offs[1:] = np.cumsum(lens)[:-1]
        h = self._lib.te_wp_create(blob, offs, lens, len(pieces),
                                   unk, cls, sep, pad)
        self._lib.te_wp_set_ids(h, np.ascontiguousarray(ids, np.int32),
                                len(pieces))
        return WpHandle(self, h)


class WpHandle:
    """Owned native WordPiece vocab; freed on GC."""

    def __init__(self, engine: TextEngine, handle: int) -> None:
        self._engine = engine
        self._h = handle

    def __del__(self):  # pragma: no cover - GC timing
        try:
            if self._h:
                self._engine._lib.te_wp_destroy(self._h)
                self._h = None
        except Exception:
            pass

    def tokenize_batch(self, texts: Sequence[str], max_len: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
        lowered: List[bytes] = [t.lower().encode("ascii") for t in texts]
        blob = b"".join(lowered)
        lengths = np.array([len(b) for b in lowered], dtype=np.int64)
        offsets = np.zeros(len(lowered), dtype=np.int64)
        if len(lowered) > 1:
            offsets[1:] = np.cumsum(lengths)[:-1]
        ids = np.zeros((len(texts), max_len), dtype=np.int32)
        mask = np.zeros((len(texts), max_len), dtype=np.int32)
        self._engine._lib.te_wp_tokenize_batch(
            self._h, blob, offsets, lengths, len(texts), max_len, ids, mask)
        return ids, mask

    def token_count(self, text: str) -> int:
        b = text.lower().encode("ascii")
        return int(self._engine._lib.te_wp_token_count(self._h, b, len(b)))


def get_engine() -> Optional[TextEngine]:
    global _engine, _tried
    with _lock:
        if _engine is not None or _tried:
            return _engine
        _tried = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
            if lib.te_abi_version() != _ABI:
                return None
            _engine = TextEngine(lib)
        except Exception:
            _engine = None
        return _engine
