"""IVF (inverted-file) ANN tier: k-means clusters + nprobe search.

Build: on-device k-means (``ops.kmeans``) assigns every index row to a
centroid; rows are bucketed host-side into a padded (C, bucket_cap)
row-id table (static shapes — XLA-friendly).

Search (one jitted program):

    coarse:  q @ centroids.T  ->  top-nprobe clusters per query
    gather:  bucket row-ids   ->  rows from E        (HBM gather)
    fine:    masked einsum    ->  top-k over ~nprobe * bucket_cap rows

Search touches ``nprobe/C`` of the corpus instead of all of it — the
QPS-vs-recall trade the reference never had (its only search was a
full Python cosine scan, ``ollama_rag_system.py:454-525``).

Memory note: only row IDS are duplicated into buckets (4 bytes/row), not
embeddings; the fine stage gathers rows from the same E used by the
exact tier.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modular_rag_system_tpu.ops.kmeans import init_centroids_from_rows, kmeans_fit


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


_QUERY_BLOCK = 8  # bounds the gather to (block * nprobe * bucket_cap, d)


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search_jit(E, centroids, bucket_ids, q, k: int, nprobe: int):
    """q (Q, d) -> (vals (Q, k), rows (Q, k)).

    Queries are processed in blocks of ``_QUERY_BLOCK`` via ``lax.map``:
    the fine-stage gather materializes (block * nprobe * bucket_cap, d)
    rows, and with skewed cluster sizes an unblocked gather at large Q
    exceeds HBM (observed: 12 GB at Q=64, nprobe=16, cap=8192, 4M rows).
    """
    Qn, d = q.shape
    nb = (Qn + _QUERY_BLOCK - 1) // _QUERY_BLOCK
    pad = nb * _QUERY_BLOCK - Qn
    q_p = jnp.pad(q, ((0, pad), (0, 0))).reshape(nb, _QUERY_BLOCK, d)

    def block(qb):
        cscores = jnp.dot(qb, centroids.T, preferred_element_type=jnp.float32)
        _, probes = jax.lax.top_k(cscores, nprobe)  # (B, P)
        rids = bucket_ids[probes]  # (B, P, cap)
        B = qb.shape[0]
        rids = rids.reshape(B, -1)
        rows = E[jnp.maximum(rids, 0)]  # padded ids read row 0
        scores = jnp.einsum(
            "qd,qnd->qn", qb, rows, preferred_element_type=jnp.float32
        )
        scores = jnp.where(rids >= 0, scores, -jnp.inf)
        vals, pos = jax.lax.top_k(scores, k)
        sel = jnp.take_along_axis(rids, pos, axis=1)
        return vals, jnp.where(jnp.isfinite(vals), sel, -1).astype(jnp.int32)

    vals, sel = jax.lax.map(block, q_p)
    return vals.reshape(-1, k)[:Qn], sel.reshape(-1, k)[:Qn]


class IVFIndex:
    """Built snapshot of an IVF structure over a DeviceIndex's E matrix."""

    FILL_FACTOR = 4  # bucket_cap = pow2(ceil(FILL_FACTOR * N / C))

    def __init__(self, E, centroids, bucket_ids, count: int, nprobe: int = 8):
        self.E = E
        self.centroids = centroids
        self.bucket_ids = bucket_ids  # (C, bucket_cap) i32, -1 padded
        self.count = count
        self.nprobe = nprobe

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        E,
        count: int,
        n_clusters: Optional[int] = None,
        iters: int = 10,
        nprobe: int = 8,
        seed_batch: int = 65536,
    ) -> "IVFIndex":
        count = int(count)
        if n_clusters is None:
            # ~sqrt(N) clusters, at least 8, at most count
            n_clusters = int(max(8, min(count, round(count ** 0.5))))
        n_clusters = min(n_clusters, max(count, 1))
        # gather ONLY the seed rows on device (pulling E[:count] to host
        # copies the whole multi-GB corpus for a few thousand seeds)
        if count:
            seed_idx = np.linspace(0, count - 1, n_clusters).astype(np.int64)
            seed_rows = np.asarray(E[jnp.asarray(seed_idx)])
        else:
            seed_rows = np.zeros((1, E.shape[1]), np.float32)
        init = init_centroids_from_rows(seed_rows, len(seed_rows), n_clusters)
        centroids, labels = kmeans_fit(
            E, jnp.int32(count), jnp.asarray(init), iters=iters, batch=seed_batch
        )
        labels = np.asarray(labels)[:count]
        # Cap bucket size at ~fill_factor x the mean: k-means skew otherwise
        # inflates the padded table (and every probe's gather) to the
        # largest cluster.  Overflow rows are greedily reassigned to their
        # next-best centroid with space (scores computed on device for the
        # overflow rows only).
        fill_factor = cls.FILL_FACTOR
        bucket_cap = max(
            8, _next_pow2(int(np.ceil(fill_factor * max(count, 1) / n_clusters)))
        )
        order = np.argsort(labels, kind="stable")
        sorted_labels = labels[order]
        counts = np.bincount(sorted_labels[sorted_labels >= 0], minlength=n_clusters)
        bucket_ids = np.full((n_clusters, bucket_cap), -1, dtype=np.int32)
        fill = np.zeros(n_clusters, dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        overflow: list = []
        for c in range(n_clusters):
            members = order[starts[c] : starts[c] + counts[c]]
            keep = members[:bucket_cap]
            bucket_ids[c, : len(keep)] = keep
            fill[c] = len(keep)
            overflow.extend(members[bucket_cap:])
        if overflow:
            # Chunked device top-P preference lists: a full (n_overflow, C)
            # score matrix + host argsort would OOM at 10M-row scale.
            # P=32 choices suffice — total slots are fill_factor*N, so a
            # greedy pass almost never exhausts a row's list; the rare
            # leftovers take any cluster with space (still searchable,
            # just probed less precisely).
            ov = np.asarray(overflow, dtype=np.int64)
            P = min(32, n_clusters)
            prefs = np.empty((len(ov), P), dtype=np.int64)
            CHUNK = 65536
            for i in range(0, len(ov), CHUNK):
                sc = jnp.dot(
                    E[jnp.asarray(ov[i : i + CHUNK])].astype(jnp.float32),
                    centroids.T,
                    preferred_element_type=jnp.float32,
                )
                _, top = jax.lax.top_k(sc, P)
                prefs[i : i + CHUNK] = np.asarray(top)
            leftovers = []
            for row, choices in zip(ov, prefs):
                for c in choices:
                    if fill[c] < bucket_cap:
                        bucket_ids[c, fill[c]] = row
                        fill[c] += 1
                        break
                else:
                    leftovers.append(row)
            if leftovers:
                open_slots = np.flatnonzero(fill < bucket_cap)
                si = 0
                for row in leftovers:
                    while fill[open_slots[si]] >= bucket_cap:
                        si += 1
                    c = open_slots[si]
                    bucket_ids[c, fill[c]] = row
                    fill[c] += 1
        return cls(E, centroids, jnp.asarray(bucket_ids), count, nprobe)

    # ------------------------------------------------------------------
    def search(self, q, k: int, nprobe: Optional[int] = None) -> Tuple:
        nprobe = int(nprobe if nprobe is not None else self.nprobe)
        nprobe = min(nprobe, self.bucket_ids.shape[0])
        k = min(k, self.count) if self.count else k
        return _ivf_search_jit(self.E, self.centroids, self.bucket_ids, q, k, nprobe)

    @property
    def n_clusters(self) -> int:
        return self.bucket_ids.shape[0]

    @property
    def bucket_cap(self) -> int:
        return self.bucket_ids.shape[1]
