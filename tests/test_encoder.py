"""Flax encoder + tokenizer tests (small config; CPU mesh)."""

import numpy as np
import pytest

from modular_rag_system_tpu.models.encoder import MiniLMEncoder
from modular_rag_system_tpu.models.tokenizer import (
    HashingTokenizer,
    WordPieceTokenizer,
)


@pytest.fixture(scope="module")
def enc():
    # tiny config to keep CPU jit fast; same code path as MiniLM-L6
    return MiniLMEncoder(
        dim=64, max_seq_len=32, batch_size=8,
        num_layers=2, num_heads=4, mlp_dim=128, vocab_size=1000,
        dtype="float32",
    )


def test_shapes_and_norm(enc):
    emb = enc.encode(["hello world", "foo bar baz", "third text"])
    assert emb.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_deterministic(enc):
    a = enc.encode(["same text"])
    b = enc.encode(["same text"])
    np.testing.assert_array_equal(a, b)


def test_batch_invariance(enc):
    """Bucket padding must not change individual embeddings."""
    solo = enc.encode(["the quick brown fox"])
    batched = enc.encode(["the quick brown fox", "totally different", "yet another one"])
    np.testing.assert_allclose(solo[0], batched[0], atol=1e-5)


def test_padding_mask_correctness(enc):
    """A text shorter than max_len must ignore pad positions entirely."""
    short = enc.encode(["tiny"])
    # same text but batch contains a long neighbor forcing same shapes
    mixed = enc.encode(["tiny", "a " * 30])
    np.testing.assert_allclose(short[0], mixed[0], atol=1e-5)


def test_distinct_texts_distinct_embeddings(enc):
    emb = enc.encode(["alpha beta gamma", "completely unrelated words here"])
    assert np.abs(emb[0] - emb[1]).max() > 1e-3


def test_empty_batch(enc):
    assert enc.encode([]).shape == (0, 64)


def test_batches_larger_than_batch_size(enc):
    texts = [f"text number {i}" for i in range(20)]  # > batch_size=8
    emb = enc.encode(texts)
    assert emb.shape == (20, 64)
    np.testing.assert_allclose(emb[3], enc.encode([texts[3]])[0], atol=1e-5)


def test_truncation_long_text(enc):
    long = "word " * 500
    emb = enc.encode([long])
    assert emb.shape == (1, 64)
    assert np.isfinite(emb).all()


def test_seq_bucket_crop_matches_full_pad():
    """Cropping all-PAD columns to the seq bucket must not change embeddings.

    Short chunks in a long-max_seq_len encoder run at a pow-2 sequence
    bucket (ingest FLOP saving); the cropped forward must agree with the
    full-length padded forward to f32 tolerance.
    """
    import jax.numpy as jnp

    e = MiniLMEncoder(
        dim=64, max_seq_len=128, batch_size=8,
        num_layers=2, num_heads=4, mlp_dim=128, vocab_size=1000,
        dtype="float32",
    )
    texts = ["tiny", "a few more words here", "one"]
    ids, mask = e.tokenizer.encode_batch(texts)
    assert ids.shape[1] == 128
    cids, cmask = e._crop_seq(ids, mask)
    assert cids.shape[1] == 32  # bucketed, not full length
    full = np.asarray(e._apply(e.params, jnp.asarray(ids), jnp.asarray(mask)))
    got = e.encode(texts)
    np.testing.assert_allclose(got, full, atol=1e-5)


def test_seq_bucket_long_text_uses_full_length():
    e = MiniLMEncoder(
        dim=64, max_seq_len=64, batch_size=4,
        num_layers=2, num_heads=4, mlp_dim=128, vocab_size=1000,
        dtype="float32",
    )
    ids, mask = e.tokenizer.encode_batch(["word " * 200])
    cids, _ = e._crop_seq(ids, mask)
    assert cids.shape[1] == 64  # never crops below the real length


# ---------------------------------------------------------------- tokenizer
def test_hashing_tokenizer_static_shapes():
    tok = HashingTokenizer(vocab_size=1000, max_len=16)
    ids, mask = tok.encode_batch(["short", "a much longer sentence with many words in it overflowing the window"])
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    assert mask[0].sum() < mask[1].sum()
    assert mask[1].sum() == 16  # truncated to window
    assert (ids[:, 0] == 101).all()  # CLS


def test_hashing_tokenizer_deterministic():
    tok = HashingTokenizer(vocab_size=1000, max_len=16)
    a, _ = tok.encode_batch(["hello world"])
    b, _ = tok.encode_batch(["hello world"])
    np.testing.assert_array_equal(a, b)


def test_hashing_tokenizer_subword_split():
    tok = HashingTokenizer(vocab_size=1000, max_len=32, piece_len=4)
    pieces = tok.tokenize("internationalization")
    assert len(pieces) > 1
    assert pieces[1].startswith("##")


def test_wordpiece_tokenizer_greedy():
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
             "un": 4, "##able": 5, "##b": 6, "hello": 7}
    tok = WordPieceTokenizer(vocab, max_len=8)
    assert tok.tokenize_ids("unable") == [4, 5]
    assert tok.tokenize_ids("hello") == [7]
    assert tok.tokenize_ids("xyz") == [1]  # UNK
    ids, mask = tok.encode_batch(["hello unable"])
    assert list(ids[0][: mask[0].sum()]) == [2, 7, 4, 5, 3]


def test_token_count_used_by_chunker():
    tok = HashingTokenizer(vocab_size=1000, max_len=64)
    assert tok.token_count("one two three") == 5  # 3 words + CLS + SEP


@pytest.mark.slow
def test_encode_device_multibatch_matches_per_batch():
    """Bulk encode_device groups batches by sequence bucket and
    dispatches them G=16 at a time through the lax.map multi-batch
    program (repeat-padding ragged groups to the one stable shape);
    groups of <= _MULTI_SINGLE_MAX batches fall back to per-batch
    dispatch (repeat-padding a lone batch to 16 would burn 15 redundant
    forwards).  Results must match the per-batch path in VALUE and
    ORDER across buckets, both dispatch modes, and a ragged tail."""
    e = MiniLMEncoder(
        dim=32, max_seq_len=128, batch_size=8,
        num_layers=2, num_heads=2, mlp_dim=64, vocab_size=1000,
        dtype="float32",
    )
    # 75 texts = 9 batches of 8 + ragged tail of 3.  Batches 0-1 are
    # all-short so their bucket (32) differs from batches 2-9's (64):
    # the short bucket's group of 2 takes the single-dispatch fallback,
    # the long bucket's group of 8 takes the multi path with repeat-pad
    texts = []
    for i in range(75):
        texts.append(f"w{i} " * 3 if i < 16 else "word " * 40 + f"t{i}")
    got = np.asarray(e.encode_device(texts))
    ref = e.encode(texts)
    assert got.shape == ref.shape == (75, 32)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
