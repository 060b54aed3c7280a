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


def bucket_fill_core(labels, count, C: int, bucket_cap: int):
    """Device-side bucket fill: labels -> padded (C, bucket_cap) id table.

    One argsort + one scatter — no per-cluster host loop, no corpus-sized
    host<->device transfer (the label fetch + table upload dominated the
    old host build at 10M rows on a relay-attached chip).  Rows beyond a
    cluster's cap are left out here; the (rare) overflow is fixed up by a
    small host-side scatter afterwards.

    Returns (table (C, bucket_cap) i32 -1-padded,
             counts (C+1,) i32 true per-cluster sizes (last = dead rows),
             order (cap,) i32 row ids sorted by cluster).
    """
    cap = labels.shape[0]
    i = jnp.arange(cap, dtype=jnp.int32)
    valid = (i < count) & (labels >= 0)
    lab = jnp.where(valid, labels, C).astype(jnp.int32)  # dead -> trash C
    order = jnp.argsort(lab, stable=True).astype(jnp.int32)
    sl = lab[order]
    counts = jnp.bincount(sl, length=C + 1).astype(jnp.int32)
    starts = jnp.cumsum(counts) - counts
    pos = i - starts[sl]  # position within the cluster segment
    keep = (pos < bucket_cap) & (sl < C)
    tbl = jnp.full((C + 1, bucket_cap), -1, jnp.int32)  # row C = trash
    sc_c = jnp.where(keep, sl, C)
    sc_p = jnp.where(keep, pos, bucket_cap - 1)
    tbl = tbl.at[sc_c, sc_p].set(jnp.where(keep, order, -1))
    return tbl[:C], counts, order


_bucket_fill_jit = functools.partial(
    jax.jit, static_argnames=("C", "bucket_cap")
)(bucket_fill_core)


@jax.jit
def _scatter_tbl(tbl, cs, slots, rows):
    return tbl.at[cs, slots].set(rows)


def _greedy_overflow_assign(prefs: np.ndarray, fill: np.ndarray, bucket_cap: int):
    """Vectorized greedy overflow placement (no per-row Python loop).

    Pass p assigns every still-unplaced row to its p-th choice cluster if
    space remains, breaking ties by ranking rows within each cluster
    group.  Rows exhausting their preference list take any open slot.

    Mutates ``fill`` in place; returns (assign_c, assign_slot) int64."""
    n, P = prefs.shape
    assign_c = np.full(n, -1, np.int64)
    assign_slot = np.full(n, -1, np.int64)
    remaining = np.arange(n)
    for p in range(P):
        if not len(remaining):
            break
        choice = prefs[remaining, p]
        order = np.argsort(choice, kind="stable")
        sc = choice[order]
        # rank of each element within its equal-cluster run
        grp_start = np.where(
            np.concatenate([[True], sc[1:] != sc[:-1]]), np.arange(len(sc)), 0
        )
        np.maximum.accumulate(grp_start, out=grp_start)
        rank = np.arange(len(sc)) - grp_start
        ok = rank < (bucket_cap - fill)[sc]
        acc = order[ok]
        c_acc = choice[acc]
        assign_c[remaining[acc]] = c_acc
        assign_slot[remaining[acc]] = fill[c_acc] + rank[ok]
        np.add.at(fill, c_acc, 1)
        taken = np.zeros(len(remaining), bool)
        taken[acc] = True
        remaining = remaining[~taken]
    if len(remaining):
        # total slots >= FILL_FACTOR * N, so space always exists somewhere
        space = bucket_cap - fill
        slots_c = np.repeat(np.arange(len(fill)), space)
        within = np.arange(len(slots_c)) - np.repeat(np.cumsum(space) - space, space)
        take_c = slots_c[: len(remaining)]
        assign_c[remaining] = take_c
        assign_slot[remaining] = fill[take_c] + within[: len(remaining)]
        np.add.at(fill, take_c, 1)
    return assign_c, assign_slot


def ivf_topk(E, centroids, bucket_ids, q, k: int, nprobe: int):
    """Traceable IVF search core: q (Q, d) -> (vals (Q, k), rows (Q, k)).

    Used by the single-device jit wrapper below AND inside the sharded
    index's shard_map program (``parallel/sharded.py``), where E and
    bucket_ids are one shard's locals and the returned rows are local
    positions.

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


_ivf_search_jit = functools.partial(jax.jit, static_argnames=("k", "nprobe"))(
    ivf_topk
)


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
        # Cap bucket size at ~fill_factor x the mean: k-means skew otherwise
        # inflates the padded table (and every probe's gather) to the
        # largest cluster.  The fill runs ON DEVICE (one argsort + one
        # scatter): labels and the (C, cap) table never cross the
        # host<->device link — at 10M rows the old host build moved
        # ~200 MB through a ~6 MB/s relay.  Only the tiny per-cluster
        # counts and the (rare) overflow rows touch the host.
        fill_factor = cls.FILL_FACTOR
        bucket_cap = max(
            8, _next_pow2(int(np.ceil(fill_factor * max(count, 1) / n_clusters)))
        )
        tbl, counts_dev, order = _bucket_fill_jit(
            labels, jnp.int32(count), n_clusters, bucket_cap
        )
        counts_h = np.asarray(counts_dev)[:n_clusters].astype(np.int64)
        over_c = np.flatnonzero(counts_h > bucket_cap)
        if len(over_c):
            starts_h = np.cumsum(counts_h) - counts_h
            idx = np.concatenate(
                [np.arange(starts_h[c] + bucket_cap, starts_h[c] + counts_h[c])
                 for c in over_c]
            )
            ov = np.asarray(order[jnp.asarray(idx)]).astype(np.int64)
            # Chunked device top-P preference lists: a full (n_overflow, C)
            # score matrix + host argsort would OOM at 10M-row scale.
            # P=32 choices suffice — total slots are fill_factor*N, so the
            # greedy pass almost never exhausts a row's list.
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
            fill = np.minimum(counts_h, bucket_cap)
            assign_c, assign_slot = _greedy_overflow_assign(prefs, fill, bucket_cap)
            tbl = _scatter_tbl(
                tbl,
                jnp.asarray(assign_c, jnp.int32),
                jnp.asarray(assign_slot, jnp.int32),
                jnp.asarray(ov, jnp.int32),
            )
        return cls(E, centroids, tbl, count, nprobe)

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
