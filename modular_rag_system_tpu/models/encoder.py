"""Flax MiniLM/BGE-class sentence encoder — the device ingest+query model.

TPU-first design points (vs the reference, which ran one
sentence-transformers forward per chunk on CPU with no batching,
``embedding_pipeline.py:393-438``):

* one ``jit``-compiled batched forward for BOTH ingest and query (the
  reference's split embedders could emit mismatched dims,
  ``ollama_rag_system.py:96-222``),
* static shapes everywhere: fixed ``max_seq_len``, batch padded to
  power-of-two buckets so the trace cache stays small,
* bf16 activations feed the MXU; the pooled embedding is L2-normalized
  in f32,
* masked mean-pool (the all-MiniLM-L6-v2 recipe).

Weights are random-init by default (zero-egress container); when an HF
checkpoint cache exists, ``models.hf_loader`` maps it onto this module.
The architecture (6 layers / hidden 384 / 12 heads / FFN 1536 / post-LN)
matches all-MiniLM-L6-v2 so loaded weights reproduce it exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from modular_rag_system_tpu.models.tokenizer import HashingTokenizer


def _dtype_of(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class TransformerBlock(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    dtype: Any
    attention_impl: str = "dense"

    @nn.compact
    def __call__(self, x, pad_mask):
        # post-LN BERT block (residual -> add -> LayerNorm)
        if self.attention_impl == "flash":
            # Pallas memory-efficient attention: scores stay in VMEM,
            # the (B, 1, L, L) mask tensor is never built — the
            # long-context path (ops/flash_attention.py).  Same param
            # tree as the dense branch (attention_fn does not own
            # params), so HF/bundled checkpoints load on either.
            from modular_rag_system_tpu.ops.flash_attention import (
                flash_attention_fn,
            )
            from modular_rag_system_tpu.ops.fused_topk import _use_interpret

            a = nn.MultiHeadDotProductAttention(
                num_heads=self.heads,
                dtype=self.dtype,
                deterministic=True,
                attention_fn=flash_attention_fn(
                    pad_mask, interpret=_use_interpret()),
            )(x, x)
        else:
            attn_mask = nn.make_attention_mask(
                pad_mask, pad_mask, dtype=self.dtype)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.heads,
                dtype=self.dtype,
                deterministic=True,
            )(x, x, mask=attn_mask)
        # BERT-exact numerics so HF-loaded weights reproduce upstream
        # embeddings: erf gelu (not the tanh approximation) and LN eps
        # 1e-12 (flax default is 1e-6).
        x = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-12)(x + a).astype(self.dtype)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, dtype=self.dtype)(h)
        x = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-12)(x + h).astype(self.dtype)
        return x


class SentenceEncoderModule(nn.Module):
    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 6
    heads: int = 12
    mlp_dim: int = 1536
    max_len: int = 256
    dtype: Any = jnp.bfloat16
    attention_impl: str = "dense"  # "flash" = Pallas long-context path

    @nn.compact
    def __call__(self, ids, mask):
        B, L = ids.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        x = (
            nn.Embed(self.vocab_size, self.hidden, dtype=self.dtype, name="tok_embed")(ids)
            + nn.Embed(self.max_len, self.hidden, dtype=self.dtype, name="pos_embed")(pos)
        )
        x = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-12, name="embed_ln")(x).astype(
            self.dtype
        )
        for i in range(self.layers):
            x = TransformerBlock(
                self.hidden, self.heads, self.mlp_dim, self.dtype,
                attention_impl=self.attention_impl, name=f"block_{i}"
            )(x, mask)
        # masked mean pool in f32, then L2 norm
        m = mask.astype(jnp.float32)[..., None]
        summed = jnp.sum(x.astype(jnp.float32) * m, axis=1)
        denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        pooled = summed / denom
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


# shortest sequence bucket: keeps the trace cache small (seq buckets are
# {32, 64, 128, ..., max_seq_len}) while still capturing most of the win
# — a 10-token chunk in a 256-token pad wastes 25x FFN / 64x attention
# FLOPs; at bucket 32 that drops to ~3x / ~10x
_MIN_SEQ_BUCKET = 32


class MiniLMEncoder:
    """Host-facing wrapper: tokenize -> bucket-pad -> jitted forward."""

    is_fake = False

    def __init__(
        self,
        dim: int = 384,
        max_seq_len: int = 256,
        batch_size: int = 256,
        dtype: str = "bfloat16",
        num_layers: int = 6,
        num_heads: int = 12,
        mlp_dim: int = 1536,
        vocab_size: int = 30522,
        tokenizer=None,
        params=None,
        seed: int = 0,
        attention_impl: str = "dense",
    ) -> None:
        if attention_impl not in ("dense", "flash"):
            raise ValueError(
                f"attention_impl must be 'dense' or 'flash', got "
                f"{attention_impl!r}"
            )
        self.dim = dim
        self.max_seq_len = max_seq_len
        self.batch_size = batch_size
        self.tokenizer = tokenizer or HashingTokenizer(vocab_size, max_seq_len)
        self.module = SentenceEncoderModule(
            vocab_size=vocab_size,
            hidden=dim,
            layers=num_layers,
            heads=num_heads,
            mlp_dim=mlp_dim,
            max_len=max_seq_len,
            dtype=_dtype_of(dtype),
            attention_impl=attention_impl,
        )
        self.name = f"minilm-l{num_layers}-h{dim}"
        if params is None:
            ids = jnp.zeros((1, max_seq_len), jnp.int32)
            params = self.module.init(jax.random.PRNGKey(seed), ids, ids)["params"]
        else:
            # loaded checkpoints (bundled npz / HF mapping) arrive as
            # numpy trees: passing numpy leaves to the jitted forward
            # re-uploads ALL weights per call (measured ~1 s/batch over
            # the device relay — 20x the forward itself); put them on
            # device ONCE here
            params = jax.tree.map(jnp.asarray, params)
        self.params = params
        self._apply = jax.jit(
            lambda p, ids, mask: self.module.apply({"params": p}, ids, mask)
        )
        # multi-batch forward: ONE dispatch runs G stacked batches via an
        # on-device loop.  In this environment every dispatch pays a
        # ~26 ms relay round trip, and JAX's async dispatch does not
        # pipeline across the relay — bulk ingest at one-dispatch-per-
        # batch was measured RTT-bound (391 batches for 100k chunks ~=
        # the entire 12 s ingest).  lax.map compiles the forward once
        # and loops on device, so G batches cost one RTT.
        self._apply_many = jax.jit(
            lambda p, ids3, mask3: jax.lax.map(
                lambda im: self.module.apply({"params": p}, im[0], im[1]),
                (ids3, mask3),
            )
        )

    # ------------------------------------------------------------------
    def _crop_seq(self, ids: np.ndarray, mask: np.ndarray):
        """Crop a (B, max_seq_len) token batch to its pow-2 seq bucket.

        Tokens are left-packed (tokenizer fills from position 0), so
        cropping to the longest row's bucket drops only all-PAD columns;
        those columns are masked out of attention AND pooling, so the
        embedding is unchanged (verified to f32 tolerance in
        tests/test_encoder.py).  Chunks are often far shorter than
        ``max_seq_len`` (keystroke/sentence chunks ~10-60 tokens), and a
        transformer forward pays O(S) FFN + O(S^2) attention FLOPs per
        padded position — the reference burned this cost too, one FULL
        unbatched CPU forward per chunk (embedding_pipeline.py:393-438).
        """
        n_tok = int(mask.sum(axis=1).max()) if mask.size else 1
        bucket = _MIN_SEQ_BUCKET
        while bucket < n_tok:
            bucket <<= 1
        bucket = min(bucket, self.max_seq_len)
        if bucket < ids.shape[1]:
            ids = ids[:, :bucket]
            mask = mask[:, :bucket]
        return ids, mask

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        bs = self.batch_size
        # Pipeline dispatches ahead of fetches: a device->host fetch per
        # batch serializes on the round trip (measured ~30x slowdown on a
        # relay-attached chip).  The window is BOUNDED so peak device
        # memory stays O(window * batch), not O(corpus) — reembed_all on
        # a 10M corpus would otherwise hold 15 GB of activations.
        WINDOW = 8
        out = np.zeros((len(texts), self.dim), np.float32)
        pending = []

        def drain_one():
            i, n, emb = pending.pop(0)
            out[i : i + n] = np.asarray(emb[:n], dtype=np.float32)

        for i in range(0, len(texts), bs):
            chunk = list(texts[i : i + bs])
            ids, mask = self.tokenizer.encode_batch(chunk)
            ids, mask = self._crop_seq(ids, mask)
            n = len(chunk)
            padded = min(_next_pow2(n), bs)
            if padded > n:
                ids = np.pad(ids, ((0, padded - n), (0, 0)))
                mask = np.pad(mask, ((0, padded - n), (0, 0)))
            emb = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
            pending.append((i, n, emb))
            if len(pending) >= WINDOW:
                drain_one()
        while pending:
            drain_one()
        return out

    # batches per multi-batch dispatch: 16 amortizes the relay RTT 16x.
    # Every multi-batch group pads (by repeating its last batch) to
    # EXACTLY this G, so one (16, bs, bucket) program per bucket is the
    # ONLY multi-batch shape — pow2 decomposition was tried first and
    # each tail shape paid a fresh ~10-30 s remote XLA compile, which
    # dominated a 100k-chunk ingest.  Pad waste is < G batches per
    # bucket GROUP, and groups of <= _MULTI_SINGLE_MAX items skip the
    # multi path entirely (see below), bounding waste at ~3x per tail.
    _MULTI_G = 16
    # below this many batches the repeat-padding waste (up to G-n of G)
    # outweighs the saved round trips — dispatch singly instead
    _MULTI_MIN_BATCHES = 6
    # a bucket group this small dispatches per-batch: repeat-padding
    # 1-4 batches to G=16 costs up to 15 redundant full forwards (~16x
    # device compute for a mixed-length corpus whose batches land in
    # distinct buckets) to save at most 3 ~26 ms round trips
    _MULTI_SINGLE_MAX = _MULTI_G // 4

    def encode_device(self, texts: Sequence[str]):
        """Encode and RETURN A DEVICE ARRAY (N, dim) f32.

        The bulk-ingest path feeds this straight into the device index —
        materializing embeddings on the host and re-uploading them costs
        two full corpus transfers through the device link.  The result is
        O(N * dim) device memory by design (it becomes index rows);
        callers ingesting beyond free HBM should batch their add_documents
        calls.

        Batches are grouped by sequence bucket and dispatched up to
        ``_MULTI_G`` at a time through ``_apply_many`` (one on-device
        loop = one relay round trip; the per-batch path was measured
        RTT-bound at ~10k chunks/s bulk)."""
        if not texts:
            return jnp.zeros((0, self.dim), jnp.float32)
        bs = self.batch_size
        n_batches = (len(texts) + bs - 1) // bs
        # tokenize + bucket every batch first (host-side, cheap next to
        # the forward: native WordPiece runs ~552k texts/s)
        staged = []  # (batch_idx, bucket, ids, mask, n)
        for bi, i in enumerate(range(0, len(texts), bs)):
            chunk = list(texts[i : i + bs])
            ids, mask = self.tokenizer.encode_batch(chunk)
            ids, mask = self._crop_seq(ids, mask)
            n = len(chunk)
            if n_batches >= self._MULTI_MIN_BATCHES:
                padded = bs  # uniform rows so bucket-mates stack
            else:
                padded = min(_next_pow2(n), bs)
            if padded > n:
                ids = np.pad(ids, ((0, padded - n), (0, 0)))
                mask = np.pad(mask, ((0, padded - n), (0, 0)))
            staged.append((bi, ids.shape[1], ids, mask, n))
        parts: list = [None] * n_batches
        if n_batches < self._MULTI_MIN_BATCHES:
            for bi, _, ids, mask, n in staged:
                emb = self._apply(
                    self.params, jnp.asarray(ids), jnp.asarray(mask))
                parts[bi] = emb[:n]
        else:
            by_bucket: dict = {}
            for item in staged:
                by_bucket.setdefault(item[1], []).append(item)
            G = self._MULTI_G
            for bucket, items in by_bucket.items():
                for pos in range(0, len(items), G):
                    group = items[pos : pos + G]
                    if len(group) <= self._MULTI_SINGLE_MAX:
                        # tiny group (lone bucket or short tail):
                        # repeat-padding to G would cost up to G-1
                        # redundant forwards per saved round trip
                        for bi, _, ids, mask, n in group:
                            emb = self._apply(self.params,
                                              jnp.asarray(ids),
                                              jnp.asarray(mask))
                            parts[bi] = emb[:n]
                        continue
                    pad = G - len(group)
                    stack_i = [it[2] for it in group]
                    stack_m = [it[3] for it in group]
                    if pad:  # repeat the last batch: ONE stable shape
                        stack_i += [stack_i[-1]] * pad
                        stack_m += [stack_m[-1]] * pad
                    ids3 = jnp.asarray(np.stack(stack_i))
                    mask3 = jnp.asarray(np.stack(stack_m))
                    emb3 = self._apply_many(self.params, ids3, mask3)
                    for gi, (bi, _, _, _, n) in enumerate(group):
                        parts[bi] = emb3[gi, :n]
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return out.astype(jnp.float32)

    def encode_queries(self, texts: Sequence[str]) -> np.ndarray:
        return self.encode(texts)

    def token_count(self, text: str) -> int:
        return self.tokenizer.token_count(text)

    # device-side forward for composition into larger jitted programs
    def apply_fn(self):
        return self.module.apply
