"""On-device k-means (Lloyd's) for the IVF index build (SURVEY §7 step 7).

Everything is jitted batched linear algebra:

* assignment: ``argmax(batch @ centroids.T)`` — MXU matmul over row
  batches (spherical k-means; index rows are L2-normalized so inner
  product == cosine),
* update: one-hot^T @ batch — also an MXU matmul (the segment-sum),
  accumulated across batches with ``lax.scan``; centroids are
  re-normalized each iteration.

No data-dependent Python control flow: iteration count and batch size
are static, dead rows (>= count) are masked via weights, and empty
clusters keep their previous centroid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("iters", "batch"))
def kmeans_fit(E, count, init_centroids, iters: int = 10, batch: int = 65536):
    """Fit spherical k-means on the live prefix of E.

    Args:
      E: (cap, d) f32, rows L2-normalized (dead rows may be zero).
      count: scalar int32 live-row count.
      init_centroids: (C, d) f32 initial centroids.
      iters / batch: static loop bounds.

    Returns (centroids (C, d) f32 L2-normalized, labels (cap,) i32).
    """
    cap, d = E.shape
    C = init_centroids.shape[0]
    nb = (cap + batch - 1) // batch
    pad = nb * batch - cap
    E_p = jnp.pad(E, ((0, pad), (0, 0)))
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nb * batch, 1), 0)[:, 0]
    valid = (row_ids < count).astype(jnp.float32)
    E_b = E_p.reshape(nb, batch, d)
    valid_b = valid.reshape(nb, batch)

    def lloyd_iter(centroids, _):
        def acc(carry, xs):
            sums, counts = carry
            rows, v = xs
            scores = jnp.dot(rows, centroids.T, preferred_element_type=jnp.float32)
            assign = jnp.argmax(scores, axis=1)
            onehot = jax.nn.one_hot(assign, C, dtype=jnp.float32) * v[:, None]
            sums = sums + jnp.dot(onehot.T, rows, preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            acc,
            (jnp.zeros((C, d), jnp.float32), jnp.zeros((C,), jnp.float32)),
            (E_b, valid_b),
        )
        new = sums / jnp.maximum(counts[:, None], 1.0)
        norm = jnp.linalg.norm(new, axis=1, keepdims=True)
        new = new / jnp.maximum(norm, 1e-12)
        # empty clusters keep their previous centroid
        new = jnp.where(counts[:, None] > 0, new, centroids)
        return new, None

    centroids, _ = jax.lax.scan(lloyd_iter, init_centroids, None, length=iters)

    def label_batch(_, xs):
        rows, v = xs
        scores = jnp.dot(rows, centroids.T, preferred_element_type=jnp.float32)
        lab = jnp.argmax(scores, axis=1).astype(jnp.int32)
        return None, jnp.where(v > 0, lab, -1)

    _, labels_b = jax.lax.scan(label_batch, None, (E_b, valid_b))
    labels = labels_b.reshape(-1)[:cap]
    return centroids, labels


def init_centroids_from_rows(E: np.ndarray, count: int, n_clusters: int) -> np.ndarray:
    """Evenly-spaced live rows as initial centroids (host-side, cheap)."""
    idx = np.linspace(0, max(count - 1, 0), n_clusters).astype(np.int64)
    init = np.array(E[idx], dtype=np.float32)
    # tiny jitter so duplicate rows don't collapse clusters
    rng = np.random.default_rng(0)
    init = init + rng.standard_normal(init.shape).astype(np.float32) * 1e-4
    norms = np.linalg.norm(init, axis=1, keepdims=True)
    return init / np.maximum(norms, 1e-12)


def kmeans_fit_sharded(E_phys, count, init_centroids, mesh, axis,
                       iters: int = 10, batch: int = 65536):
    """SPMD Lloyd's over a mesh-sharded (S, cap_s, d) matrix.

    The scaling-book recipe: each shard computes partial cluster sums and
    counts over its local rows, ``psum`` over the index axis (or both
    axes of a hierarchical (dcn, ici) mesh) reduces them, and the
    centroid update replicates — no corpus row ever crosses a device
    boundary, only (C, d) partials ride the interconnect per iteration.

    ``axis`` is a mesh-axis name or a (dcn, ici) tuple, matching
    ``ShardedIndex`` conventions (shard s owns global rows j*S + s).

    Returns (centroids (C, d) f32 replicated, labels (S, cap_s) i32
    sharded, -1 for dead rows).
    """
    from jax.sharding import PartitionSpec as P

    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    S = 1
    for a in axes:
        S *= mesh.shape[a]
    C, d = init_centroids.shape
    cap_s = E_phys.shape[1]
    b = min(batch, cap_s)
    nb = (cap_s + b - 1) // b

    def body(E_blk, count_g, cents0):
        E_s = E_blk[0]  # (cap_s, d)
        sid = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            sid = sid * mesh.shape[a] + jax.lax.axis_index(a)
        count_s = jnp.maximum(0, (count_g - sid + S - 1) // S)
        pad = nb * b - cap_s
        E_p = jnp.pad(E_s.astype(jnp.float32), ((0, pad), (0, 0)))
        rid = jax.lax.broadcasted_iota(jnp.int32, (nb * b, 1), 0)[:, 0]
        valid = (rid < count_s).astype(jnp.float32)
        E_b = E_p.reshape(nb, b, d)
        v_b = valid.reshape(nb, b)

        def lloyd_iter(cents, _):
            def acc(carry, xs):
                sums, counts = carry
                rows, v = xs
                scores = jnp.dot(rows, cents.T, preferred_element_type=jnp.float32)
                onehot = jax.nn.one_hot(
                    jnp.argmax(scores, axis=1), C, dtype=jnp.float32
                ) * v[:, None]
                sums = sums + jnp.dot(onehot.T, rows,
                                      preferred_element_type=jnp.float32)
                return (sums, counts + jnp.sum(onehot, axis=0)), None

            (sums, counts), _ = jax.lax.scan(
                acc,
                (jnp.zeros((C, d), jnp.float32), jnp.zeros((C,), jnp.float32)),
                (E_b, v_b),
            )
            for a in axes:  # the only cross-device traffic: (C, d) partials
                sums = jax.lax.psum(sums, a)
                counts = jax.lax.psum(counts, a)
            new = sums / jnp.maximum(counts[:, None], 1.0)
            new = new / jnp.maximum(
                jnp.linalg.norm(new, axis=1, keepdims=True), 1e-12
            )
            return jnp.where(counts[:, None] > 0, new, cents), None

        cents, _ = jax.lax.scan(lloyd_iter, cents0, None, length=iters)

        def label_batch(_, xs):
            rows, v = xs
            scores = jnp.dot(rows, cents.T, preferred_element_type=jnp.float32)
            lab = jnp.argmax(scores, axis=1).astype(jnp.int32)
            return None, jnp.where(v > 0, lab, -1)

        _, lb = jax.lax.scan(label_batch, None, (E_b, v_b))
        return cents, lb.reshape(-1)[:cap_s][None]

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(), P()),
        out_specs=(P(), P(axis, None)),
        check_vma=False,
    )
    return jax.jit(fn)(
        E_phys, jnp.int32(count), jnp.asarray(init_centroids, jnp.float32)
    )
