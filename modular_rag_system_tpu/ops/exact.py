"""Exact f32 top-k search — the pure-XLA reference tier.

``scores = q @ E.T`` hits the MXU; rows past ``count`` (the live prefix of
the growable index) are masked to -inf before ``lax.top_k``.  XLA fuses the
mask into the matmul epilogue, so this is already HBM-bandwidth-bound on
reading E — the speed-of-light for exact search.  The Pallas tier
(``fused_topk``) improves on it by never materializing the (Q, N) score
matrix and by reading an int8 index (4x less HBM traffic).

Replaces ``RAGVectorStore.search``'s O(N·d) Python cosine loop
(``ollama_rag_system.py:454-525``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def exact_topk_raw(E: jax.Array, count: jax.Array, q: jax.Array, k: int):
    """Traceable top-k inner-product search over the live prefix of E

    (compose inside larger jitted programs, e.g. the fused query path).

    Args:
      E: (capacity, d) float32 embedding matrix (rows L2-normalized).
      count: scalar int32, number of live rows (<= capacity).
      q: (Q, d) float32 query embeddings (L2-normalized).
      k: static number of neighbors.

    Returns:
      (scores (Q, k) f32, rows (Q, k) i32); masked slots have score -inf.
    """
    # HIGHEST: the TPU default lowers f32 matmuls to 1-pass bf16
    # products (~4e-4 relative error at d=384) — unacceptable for
    # THE reference tier, whose scores define ground truth for every
    # other tier's recall.  For bf16 E the products are exact either
    # way (bf16-valued inputs), so this only costs on f32 stores.
    scores = jnp.dot(q, E.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    n = E.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    scores = jnp.where(col < count, scores, -jnp.inf)
    top, idx = jax.lax.top_k(scores, k)
    return top, idx.astype(jnp.int32)


exact_topk = partial(jax.jit, static_argnames=("k",))(exact_topk_raw)


@partial(jax.jit, donate_argnums=(0,))
def append_rows(E: jax.Array, batch: jax.Array, count: jax.Array) -> jax.Array:
    """Write ``batch`` into E starting at row ``count`` (donated, in-place)."""
    return jax.lax.dynamic_update_slice(E, batch, (count, jnp.int32(0)))


@partial(jax.jit, donate_argnums=(0,))
def set_rows(E: jax.Array, rows: jax.Array, mat: jax.Array) -> jax.Array:
    """Overwrite specific rows (resurrecting tombstoned docs)."""
    return E.at[rows].set(mat)


@partial(jax.jit, donate_argnums=(0,))
def zero_rows(E: jax.Array, rows: jax.Array) -> jax.Array:
    """Zero out deleted rows (they then score 0.0 and are also filtered

    host-side via the document store's tombstones)."""
    return E.at[rows].set(0.0)
