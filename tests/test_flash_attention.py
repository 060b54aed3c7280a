"""Pallas memory-efficient attention vs the dense flax reference.

CPU runs the kernel in interpret mode (Python-loop slow — shapes kept
tiny, conftest sizing note for kernel-heavy paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modular_rag_system_tpu.models.encoder import MiniLMEncoder
from modular_rag_system_tpu.ops.flash_attention import mea_attention


def _dense_reference(q, k, v, pad_mask):
    """flax semantics: masked scores at a large finite negative."""
    B, L, H, dh = q.shape
    s = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(jnp.float32)
    s = s / np.sqrt(dh)
    s = jnp.where(pad_mask[:, None, None, :] > 0, s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", p.astype(v.dtype), v)


@pytest.mark.parametrize("dh", [32, 64])
def test_mea_matches_dense(rng, dh):
    B, L, H = 2, 40, 3
    q = jnp.asarray(rng.standard_normal((B, L, H, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, dh)), jnp.float32)
    pad = np.ones((B, L), np.int32)
    pad[0, 25:] = 0  # ragged padding
    pad[1, 10:] = 0
    got = np.asarray(mea_attention(q, k, v, jnp.asarray(pad),
                                   interpret=True))
    ref = np.asarray(_dense_reference(q, k, v, jnp.asarray(pad)))
    # compare only live query rows (pad rows are dropped by pooling)
    for b, live in ((0, 25), (1, 10)):
        np.testing.assert_allclose(got[b, :live], ref[b, :live],
                                   rtol=2e-4, atol=2e-5)


def test_mea_all_pad_row_is_finite(rng):
    """An all-pad batch row must produce FINITE attention output (flax
    masks with -1e9, not -inf — NaNs would poison the mean pool)."""
    B, L, H, dh = 2, 16, 2, 32
    q = jnp.asarray(rng.standard_normal((B, L, H, dh)), jnp.float32)
    pad = np.zeros((B, L), np.int32)
    pad[0, :5] = 1  # row 1 is ALL pad
    got = np.asarray(mea_attention(q, q, q, jnp.asarray(pad),
                                   interpret=True))
    assert np.isfinite(got).all()


def test_flash_encoder_matches_dense_encoder(rng):
    """Same params, attention_impl="flash" vs "dense": identical
    embeddings to f32 tolerance — the kernel is a drop-in for loaded
    checkpoints (the attention_fn owns no params)."""
    kw = dict(dim=64, max_seq_len=64, batch_size=4, num_layers=2,
              num_heads=2, mlp_dim=128, vocab_size=1000, dtype="float32")
    dense = MiniLMEncoder(**kw)
    flash = MiniLMEncoder(**kw, attention_impl="flash",
                          params=dense.params)
    texts = ["a short one", "a slightly longer sentence with more words",
             "third"]
    e_d = dense.encode(texts)
    e_f = flash.encode(texts)
    np.testing.assert_allclose(e_f, e_d, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_flash_config_plumbing(tmp_path):
    from modular_rag_system_tpu.config import RAGConfig
    from modular_rag_system_tpu.models import build_encoder

    cfg = RAGConfig().merged({
        # lexical_dim 0: this asserts on the DENSE module's attention
        # impl, so the hybrid wrap (round-5 default) is disabled
        "embedding": {"model": "minilm", "attention_impl": "flash",
                      "bundled_checkpoint": "", "max_seq_len": 32,
                      "num_layers": 2, "num_heads": 2, "mlp_dim": 64,
                      "dim": 32, "vocab_size": 500, "batch_size": 4,
                      "lexical_dim": 0},
    })
    enc = build_encoder(cfg)
    assert enc.module.attention_impl == "flash"
    e = enc.encode(["flash attention end to end"])
    assert e.shape == (1, 32) and np.isfinite(e).all()


def test_mea_tail_query_block_covered(rng):
    """A padded length that is NOT a multiple of blk_q must still cover
    every query row: the grid rounds Lp up to a blk_q multiple (the
    floor-divide dropped the tail block — rows past the last full block
    came back uninitialized/NaN and poisoned the mean pool)."""
    B, L, H, dh = 1, 100, 2, 32
    q = jnp.asarray(rng.standard_normal((B, L, H, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, dh)), jnp.float32)
    pad = jnp.ones((B, L), jnp.int32)
    # blk_q=96 does not divide the lane-rounded Lp=128 -> tail block
    got = np.asarray(mea_attention(q, k, v, pad, interpret=True,
                                   blk_q=96))
    ref = np.asarray(_dense_reference(q, k, v, pad))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_attention_impl_validated():
    """Unknown attention_impl values raise instead of silently running
    the dense path (a typo like "Flash" must not lose the kernel)."""
    kw = dict(dim=32, max_seq_len=32, batch_size=2, num_layers=1,
              num_heads=2, mlp_dim=64, vocab_size=500, dtype="float32")
    with pytest.raises(ValueError, match="attention_impl"):
        MiniLMEncoder(**kw, attention_impl="Flash")
