"""IVF v2 — cluster-contiguous ANN tier with an exact streamed tail.

Round-3 redesign of ``ops.ivf`` (VERDICT r2 items 1-2-10).  What changed
and why:

* **Cluster-contiguous fine storage.**  At build, rows are reordered so
  cluster ``c`` owns blocks ``[blk_start[c], blk_start[c]+nblk[c])`` of
  ``SLAB`` rows each in a (nblocks, SLAB, d) array.  The fine stage DMAs
  whole blocks at streaming bandwidth via a scalar-prefetch Pallas
  kernel instead of row-gathering scattered ids at ~20 GB/s — the r2
  bottleneck that made the IVF tier LOSE to exact brute force at 10M
  rows (8.8k QPS vs 10.5k exact).
* **No overflow reassignment.**  Clusters are stored at their TRUE size
  (variable block count), so every row lives in its nearest cluster.
  The r2 recall ceiling (greedily displaced rows unreachable at any
  nprobe, recall plateau 0.994) is gone by construction.
* **Exact tail.**  Rows written after a build ([built, count)) are not
  clustered; the search scores them EXACTLY from the master matrix and
  merges.  Writes therefore cost O(batch) ivf work (no build
  invalidation), recall on fresh rows is exact, and rebuilds are
  triggered from the WRITE path when the tail passes a configured
  fraction — never inside a query.
* **int8 fine copy** (``fine_dtype="int8"``): per-row-scaled int8 slabs
  halve the fine-stage traffic of bf16 — the tier composition a
  10M-corpus operator wants.
* **int4 fine copy** (``fine_dtype="int4"``): two logical rows packed
  per byte along the SUBLANE axis (blocks are (SLAB//2, d) int8,
  ``ops.quantize.quantize_int4_blocks``), halving the fine copy's HBM
  footprint and build time.  Rows are RESIDUAL-encoded (row minus its
  centroid; the exact q.centroid term is re-added from the coarse score
  table at query time) — absolute 4-bit encoding measured recall 0.36
  at 10M because within-cluster score spread (~sigma) is smaller than
  an absolute absmax/7 grid.  The in-kernel unpack is two arithmetic
  shifts + one sublane concat, so the MXU dot shape is unchanged.
  4-bit scores only rank CANDIDATES — the master rescore keeps returned
  scores exact.  Measured at 10M x 384 (tools/exp_int4_fine.py): a
  MEMORY/CAPACITY option, not a throughput one — QPS-neutral vs int8
  (the fine DMA is ~30% of the query after the r3.5 score-dump change)
  at 2.32 vs 4.63 GB and 1.5-3pt lower recall at a given nprobe.

The reference's only search was a full Python cosine scan
(``ollama_rag_system.py:454-525``); this tier is the QPS-vs-recall trade
it never had, now strictly better than the exact kernel at scale.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modular_rag_system_tpu.ops.fused_topk import (
    _ITER_SELECT_MAX,
    _iter_topk,
    _select_topk,
    _use_interpret,
)
from modular_rag_system_tpu.ops.kmeans import init_centroids_from_rows, kmeans_fit

logger = logging.getLogger(__name__)

SLAB = 256  # fine-stage block rows: 192 KB bf16 / 96 KB int8 per DMA
_NEG_INF = float("-inf")
_BIG_I32 = np.int32(2**31 - 1)


def _cdiv(a: int, b: int) -> int:
    return (a + b - 1) // b


# ---------------------------------------------------------------------------
# build: cluster-sorted order + contiguous slab fill (all device-side;
# only (C,)-sized tables cross the host<->device link)

def order_counts_core(labels, count, C: int):
    """Stable cluster-sort of row ids (traceable — also used per shard
    inside the ShardedIndex's shard_map build).

    Returns (order (cap,), counts (C,))."""
    cap = labels.shape[0]
    i = jnp.arange(cap, dtype=jnp.int32)
    valid = (i < count) & (labels >= 0)
    lab = jnp.where(valid, labels, C).astype(jnp.int32)
    order = jnp.argsort(lab, stable=True).astype(jnp.int32)
    counts = jnp.bincount(lab[order], length=C + 1).astype(jnp.int32)
    return order, counts[:C]


_order_counts = functools.partial(jax.jit, static_argnames=("C",))(
    order_counts_core
)


def _fill_chunk_core(E_c3, scales3, perm, inv_perm, E, order, counts,
                     blk_start, row_start, block_cluster, centroids, lo,
                     nb: int, fine_dtype: str):
    """One donated fill step for destination blocks [lo, lo + nb).

    ``lo`` is a TRACED scalar so every chunk reuses one compiled program
    (a static offset would recompile per chunk through the remote-compile
    tunnel).  ``E_c3``/``perm`` are pre-padded to a multiple of the chunk
    block count, so the last chunk never clamps its update offset."""
    d = E.shape[1]
    b = lo + jnp.arange(nb, dtype=jnp.int32)
    c = block_cluster[jnp.minimum(b, block_cluster.shape[0] - 1)]
    pos = (b - blk_start[c])[:, None] * SLAB + jnp.arange(SLAB, dtype=jnp.int32)
    valid = pos < counts[c][:, None]
    src_sorted = row_start[c][:, None] + jnp.clip(pos, 0, None)
    src = order[jnp.clip(src_sorted, 0, order.shape[0] - 1)]
    pm = jnp.where(valid, src, -1).reshape(-1)
    rows = E[src.reshape(-1)].astype(jnp.float32)
    rows = jnp.where(valid.reshape(-1)[:, None], rows, 0.0)
    if fine_dtype == "int8":
        from modular_rag_system_tpu.ops.quantize import quantize_rows_jit

        qv, sc = quantize_rows_jit(rows)
        E_c3 = jax.lax.dynamic_update_slice(
            E_c3, qv.reshape(nb, SLAB, d), (lo, 0, 0))
        scales3 = jax.lax.dynamic_update_slice(
            scales3, sc.reshape(nb, SLAB), (lo, 0))
    elif fine_dtype == "int4":
        from modular_rag_system_tpu.ops.quantize import quantize_int4_blocks

        # RESIDUAL encoding: quantize (row - centroid).  Within a probed
        # cluster the absolute score spread is ~sigma while a per-row
        # absmax/7 grid of the ABSOLUTE vector is ~|row|/7 — 4-bit
        # absolute ranking is noise exactly in IVF's operating regime
        # (measured: recall 0.36 at 10M vs 0.99 int8).  Residual scales
        # track sigma, and the exact q.centroid term is added back from
        # the coarse stage's score table at query time (fine_call_xla
        # bias), so candidate ranking approximates q.row to ~sigma/14.
        cen = centroids[c].astype(jnp.float32)  # (nb, d)
        res = rows.reshape(nb, SLAB, d) - cen[:, None, :]
        res = jnp.where(valid[..., None], res, 0.0)
        qv, sc = quantize_int4_blocks(res.reshape(nb * SLAB, d), nb, SLAB)
        E_c3 = jax.lax.dynamic_update_slice(E_c3, qv, (lo, 0, 0))
        scales3 = jax.lax.dynamic_update_slice(scales3, sc, (lo, 0))
    else:
        E_c3 = jax.lax.dynamic_update_slice(
            E_c3, rows.astype(E_c3.dtype).reshape(nb, SLAB, d), (lo, 0, 0))
    perm = jax.lax.dynamic_update_slice(perm, pm, (lo * SLAB,))
    slot_ids = lo * SLAB + jnp.arange(nb * SLAB, dtype=jnp.int32)
    # dead slots scatter into the trash row (inv_perm is cap+1 long):
    # aiming them at row 0 with a pre-gathered old value races the real
    # row-0 write (duplicate scatter indices, last-wins nondeterminism)
    tgt = jnp.where(pm >= 0, pm, inv_perm.shape[0] - 1)
    inv_perm = inv_perm.at[tgt].set(jnp.where(pm >= 0, slot_ids, -1))
    return E_c3, scales3, perm, inv_perm


_fill_chunk = functools.partial(
    jax.jit, donate_argnums=(0, 1, 2, 3),
    static_argnames=("nb", "fine_dtype")
)(_fill_chunk_core)


def lbg_split_seeds(centroids_h: np.ndarray, cnts: np.ndarray,
                    cap_rows: int, rng: np.random.Generator):
    """Jittered centroid copies for clusters past ``cap_rows`` rows, or
    ``None`` when already balanced — the pure LBG split move, shared by
    the single-device (``_split_oversized``) and sharded
    (``ShardedIndex.build_ann``) builders so the split criterion, jitter
    scale, and seed semantics cannot drift between the two (their
    cluster structures must agree for the 1-shard == N-shard result
    invariant to hold on the ivf tier)."""
    extra = np.maximum(np.ceil(cnts / cap_rows).astype(np.int64) - 1, 0)
    if int(extra.sum()) == 0:
        return None
    src = np.repeat(np.arange(len(cnts)), extra)
    base = np.asarray(centroids_h, np.float32)[src]
    d = base.shape[1]
    # small displacement (~0.05 of a unit row) keeps the copies inside
    # their cluster; Lloyd's separates them along its internal
    # structure (the LBG split move)
    seeds = base + rng.standard_normal(base.shape).astype(np.float32) * (
        0.05 / np.sqrt(d))
    seeds /= np.maximum(np.linalg.norm(seeds, axis=1, keepdims=True), 1e-12)
    return seeds


def _split_oversized(E, count, centroids, labels, balance, seed_batch,
                     rounds: int = 2):
    """LBG-style cluster balancing: split clusters larger than
    ``balance * count/C0`` rows by seeding jittered copies of their
    centroid and re-running a short Lloyd's over the enlarged set.

    Why this shape: the fine stage's padded block-list length ``L`` is
    the static WORST CASE over probed clusters, so one oversized cluster
    taxes every query's DMA budget.  A frequency-sensitive assignment
    penalty was tried first and measured WORSE (it oscillates — a
    penalized giant cluster dumps all its rows onto one neighbor — and
    it desynchronizes row assignment from query probing, self-hit 0.25);
    splitting keeps plain nearest-centroid Voronoi on both sides, so
    query/row consistency is structural.  The final structure is just
    k-means with a data-adaptive C.  0 = off (classic build)."""
    if not balance or int(count) == 0:
        return centroids, labels
    C0 = centroids.shape[0]
    cap_rows = max(int(np.ceil(balance * int(count) / C0)), SLAB)
    rng = np.random.default_rng(0)
    for _ in range(rounds):
        Ccur = centroids.shape[0]
        cnts = np.asarray(jax.jit(
            lambda l: jnp.bincount(
                jnp.where(l >= 0, l, Ccur), length=Ccur + 1)[:Ccur]
        )(labels))
        seeds = lbg_split_seeds(np.asarray(centroids), cnts, cap_rows, rng)
        if seeds is None:
            break
        cents = jnp.concatenate([centroids, jnp.asarray(seeds)], axis=0)
        centroids, labels = kmeans_fit(E, jnp.int32(count), cents, iters=3,
                                       batch=seed_batch)
    return centroids, labels


class IVF2:
    """Built snapshot of the cluster-contiguous structure + exact tail.

    ``E_c3`` (nblocks, SLAB, d) fine copy (bf16 or int8); ``scales3``
    (nblocks, SLAB) f32 per-row scales (int8 only, else None); ``perm``
    (nblocks * SLAB,) i32 slot -> global row (-1 padding); ``inv_perm``
    (capacity,) i32 global row -> slot (-1 if unbuilt); cluster tables
    ``blk_start``/``nblk``/``counts`` (C,) i32 device + host copies;
    ``built`` rows [0, built) are clustered, the rest is the exact tail.
    """

    def __init__(self, centroids, E_c3, scales3, perm, inv_perm,
                 blk_start, nblk, counts, built: int, nprobe: int,
                 fine_dtype: str, balance: float = 0.0,
                 block_cluster=None) -> None:
        self.centroids = centroids
        self.block_cluster = block_cluster  # (nblocks_pad,) i32
        self.E_c3 = E_c3
        self.scales3 = scales3
        self.perm = perm
        self.inv_perm = inv_perm
        self.blk_start = blk_start
        self.nblk = nblk
        self.counts = counts
        self.nblk_h = np.asarray(nblk)
        self.built = int(built)
        self.nprobe = int(nprobe)
        self.fine_dtype = fine_dtype
        self.balance = balance
        self.version = 0
        # O(batch) writes since the build (drift): rebuild folds them in
        self.stale_rows = 0

    @property
    def n_clusters(self) -> int:
        return int(self.nblk_h.shape[0])

    @property
    def nblocks(self) -> int:
        return int(self.E_c3.shape[0])

    def slots_for_nprobe(self, nprobe: int) -> int:
        """Static per-query slot budget: sum of the nprobe LARGEST
        clusters' block counts (worst case over any probe set)."""
        nprobe = min(nprobe, self.n_clusters)
        top = np.sort(self.nblk_h)[::-1][:nprobe]
        return max(int(top.sum()), 1)

    def labels_host(self) -> np.ndarray:
        """Reconstruct per-row cluster labels for rows [0, built) from
        the slot permutation.  Snapshot persistence saves these next to
        the centroids so a restore can ``warm_start`` the rebuild (skip
        k-means, go straight to the fill)."""
        perm_h = np.asarray(self.perm)
        bc = np.repeat(np.arange(self.n_clusters, dtype=np.int32),
                       self.nblk_h.astype(np.int64))
        labels = np.full(self.built, -1, np.int32)
        slots = np.nonzero(perm_h >= 0)[0]
        rows = perm_h[slots]
        keep = rows < self.built
        labels[rows[keep]] = bc[slots[keep] // SLAB]
        return labels

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        E,
        count: int,
        n_clusters: Optional[int] = None,
        iters: int = 10,
        nprobe: int = 8,
        fine_dtype: str = "bf16",
        seed_batch: int = 65536,
        balance: float = 0.0,
        warm_start: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ) -> "IVF2":
        """Cluster rows [0, count) of the master matrix ``E`` and lay the
        fine copy out cluster-contiguously.  Only (C,)-sized tables move
        between host and device (the corpus never crosses the link).

        ``warm_start`` = (centroids (C, d) f32, labels (count,) i32)
        skips the k-means AND balance splits entirely (the labels
        already encode the post-split assignment) and goes straight to
        the contiguous fill — snapshot restore uses it to rebuild a 10M
        structure in fill time (measured 3.0 s on chip) instead of
        re-clustering (45.5 s).
        Caller guarantees len(labels) == count."""
        count = int(count)
        if fine_dtype not in ("bf16", "int8", "int4"):
            raise ValueError(
                f"fine_dtype must be bf16|int8|int4, got {fine_dtype}")
        cap, d = E.shape
        if warm_start is not None:
            cents_h, labels_h = warm_start
            if len(labels_h) != count:
                raise ValueError(
                    f"warm_start labels cover {len(labels_h)} rows, "
                    f"build count is {count}")
            # label VALUES must address the centroid table: a corrupt or
            # mismatched snapshot would otherwise produce clamped gathers
            # and a silently wrong clustering (ADVICE r3) — fall back to
            # a cold k-means instead
            labels_arr = np.asarray(labels_h, np.int32)
            if count and (labels_arr.min() < 0
                          or labels_arr.max() >= cents_h.shape[0]):
                logger.warning(
                    "warm_start labels out of range [0, %d); ignoring "
                    "snapshot clustering and re-running k-means",
                    cents_h.shape[0])
                warm_start = None
        if warm_start is not None:
            centroids = jnp.asarray(cents_h, jnp.float32)
            lab = np.full(cap, -1, np.int32)
            lab[:count] = labels_arr
            labels = jnp.asarray(lab)
        else:
            if n_clusters is None:
                n_clusters = int(max(8, min(count, round(count ** 0.5))))
            C = min(max(n_clusters, 1), max(count, 1))
            if count:
                seed_idx = np.linspace(0, count - 1, C).astype(np.int64)
                seed_rows = np.asarray(E[jnp.asarray(seed_idx)],
                                       dtype=np.float32)
            else:
                seed_rows = np.zeros((1, d), np.float32)
            init = init_centroids_from_rows(seed_rows, len(seed_rows), C)
            centroids, labels = kmeans_fit(
                E, jnp.int32(count), jnp.asarray(init), iters=iters,
                batch=seed_batch,
            )
            centroids, labels = _split_oversized(
                E, count, centroids, labels, balance, seed_batch)
        C = int(centroids.shape[0])  # splits may have grown the set
        order, counts = _order_counts(labels, jnp.int32(count), C)
        counts_h = np.asarray(counts).astype(np.int64)
        nblk_h = np.maximum((counts_h + SLAB - 1) // SLAB, 0)
        blk_start_h = np.cumsum(nblk_h) - nblk_h
        row_start_h = np.cumsum(counts_h) - counts_h
        nblocks = max(int(nblk_h.sum()), 1)
        # chunked fill bounds the transient f32 gather (VERDICT r2: 10M
        # corpora must never materialize a full-size f32 intermediate);
        # the layout is padded to a chunk multiple so ONE compiled chunk
        # program (traced offset) covers every step including the last
        # 1024 blocks = 256k rows -> ~400 MB f32 transient at d=384;
        # clamped to the corpus size so a small build does not allocate
        # a 1024-block (200 MB at d=384) minimum fine copy — padding
        # waste stays < 2x at every scale
        CHUNK_BLOCKS = min(1024, 1 << max(nblocks - 1, 1).bit_length())
        nblocks_pad = _cdiv(nblocks, CHUNK_BLOCKS) * CHUNK_BLOCKS
        block_cluster_h = np.full(nblocks_pad, C - 1, np.int32)
        block_cluster_h[:nblocks] = np.repeat(
            np.arange(C, dtype=np.int32), nblk_h.astype(np.int64))
        blk_start = jnp.asarray(blk_start_h, jnp.int32)
        nblk = jnp.asarray(nblk_h, jnp.int32)
        counts_d = jnp.asarray(counts_h, jnp.int32)
        row_start = jnp.asarray(row_start_h, jnp.int32)
        block_cluster = jnp.asarray(block_cluster_h, jnp.int32)

        fdt = jnp.bfloat16 if fine_dtype == "bf16" else jnp.int8
        slab_p = SLAB // 2 if fine_dtype == "int4" else SLAB
        E_c3 = jnp.zeros((nblocks_pad, slab_p, d), fdt)
        scales3 = jnp.zeros(
            (nblocks_pad, SLAB) if fine_dtype in ("int8", "int4")
            else (1, 1), jnp.float32)
        perm = jnp.full((nblocks_pad * SLAB,), -1, jnp.int32)
        inv_perm = jnp.full((cap + 1,), -1, jnp.int32)  # last row = trash
        for lo in range(0, nblocks_pad, CHUNK_BLOCKS):
            E_c3, scales3, perm, inv_perm = _fill_chunk(
                E_c3, scales3, perm, inv_perm, E, order, counts_d,
                blk_start, row_start, block_cluster, centroids,
                jnp.int32(lo), nb=CHUNK_BLOCKS, fine_dtype=fine_dtype,
            )
        if fine_dtype == "bf16":
            scales3 = None
        return cls(centroids, E_c3, scales3, perm, inv_perm, blk_start,
                   nblk, counts_d, count, nprobe, fine_dtype,
                   balance=balance, block_cluster=block_cluster)

    # ------------------------------------------------------------------
    # O(batch) write maintenance (VERDICT r2 item 2)
    def update_rows(self, rows: np.ndarray, mat: Optional[np.ndarray]) -> None:
        """Scatter-sync built rows after set_rows/delete_rows.  ``mat``
        None means delete (zero).  Rows >= built (tail) are untouched —
        the tail reads the master matrix directly."""
        r0 = np.asarray(rows, dtype=np.int64)
        mask = r0 < self.built
        r = r0[mask]
        if r.size == 0:
            return
        if self.fine_dtype == "int4" and self.block_cluster is None:
            # the residual re-quantization needs each slot's centroid;
            # a bare-constructed instance (no build()) cannot supply it
            raise ValueError(
                "IVF2.update_rows with fine_dtype='int4' requires "
                "block_cluster (per-block cluster ids); this instance "
                "was constructed without it — use IVF2.build()")
        vals = (np.zeros((len(r), self.E_c3.shape[2]), np.float32)
                if mat is None else np.asarray(mat, np.float32)[mask])
        slots = self.inv_perm[jnp.asarray(r)]
        self.E_c3, self.scales3 = _scatter_slots(
            self.E_c3, self.scales3, slots, jnp.asarray(vals),
            self.fine_dtype, self.centroids, self.block_cluster)
        self.stale_rows += len(r)


def _int4_nibble_rmw(packed_rows, qvals, sel, hi: bool):
    """Read-modify-write ONE nibble of gathered packed bytes.

    ``packed_rows`` (B, d) int8 gathered bytes, ``qvals`` (B, d) int32
    in [-7, 7], ``sel`` (B,) bool — rows where the write applies (others
    keep the old byte).  Returns the new (B, d) int8 bytes."""
    old = packed_rows.astype(jnp.int32) & 0xFF  # unsigned byte view
    qn = qvals & 0xF
    new = jnp.where(hi, (qn << 4) | (old & 0xF), (old & 0xF0) | qn)
    new = jnp.where(sel[:, None], new, old)
    return jnp.where(new >= 128, new - 256, new).astype(jnp.int8)


@functools.partial(
    jax.jit, donate_argnums=(0, 1), static_argnames=("fine_dtype",))
def _scatter_slots(E_c3, scales3, slots, vals, fine_dtype: str,
                   centroids=None, block_cluster=None):
    """Scatter re-embedded/deleted rows into the fine copy.

    Masked entries (slot < 0: row not built) are redirected OUT OF
    BOUNDS and dropped — writing a pre-gathered old value back at a
    dummy index races any real update to that index (duplicate scatter
    indices, last-wins nondeterminism; same failure class as the
    inv_perm trash-row note in ``_fill_chunk_core``)."""
    nb, S, d = E_c3.shape
    ok = slots >= 0
    b = jnp.where(ok, slots // SLAB, nb)  # nb = out of bounds -> dropped
    rr = jnp.where(ok, slots % SLAB, 0)
    if fine_dtype == "int8":
        from modular_rag_system_tpu.ops.quantize import quantize_rows_jit

        qv, sc = quantize_rows_jit(vals)
        E_c3 = E_c3.at[b, rr].set(qv, mode="drop")
        scales3 = scales3.at[b, rr].set(sc[:, 0], mode="drop")
    elif fine_dtype == "int4":
        # one nibble per row: RESIDUAL-quantize to [-7, 7] (same
        # encoding as the fill), then two RMW phases (hi rows, then lo
        # rows) so a batch updating both rows of the same packed byte
        # never loses a nibble to last-wins scatter
        bsafe = jnp.minimum(b, nb - 1)
        cen = centroids[block_cluster[bsafe]].astype(jnp.float32)
        x = vals.astype(jnp.float32) - jnp.where(ok[:, None], cen, 0.0)
        absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        sc = absmax / 7.0
        safe = jnp.where(sc > 0, sc, 1.0)
        qv = jnp.clip(jnp.round(x / safe), -7, 7).astype(jnp.int32)
        pr = rr % S
        is_hi = rr < S
        for hi in (True, False):
            sel = ok & (is_hi == hi)
            bytes_new = _int4_nibble_rmw(E_c3[bsafe, pr], qv, sel, hi)
            E_c3 = E_c3.at[jnp.where(sel, b, nb), pr].set(
                bytes_new, mode="drop")
        scales3 = scales3.at[b, rr].set(sc[:, 0], mode="drop")
    else:
        E_c3 = E_c3.at[b, rr].set(vals.astype(E_c3.dtype), mode="drop")
    return E_c3, scales3


# ---------------------------------------------------------------------------
# fine-stage kernel: grid (Q, L/U); each step DMAs U candidate blocks for
# query i and folds them into a per-query running top-k kept in VMEM
# scratch (written to the output once, at the last step of each query).

def _fine_mode(E_c3) -> str:
    """Storage mode of a fine copy, determined by dtype + shape: int4
    packs two logical rows per byte along the sublane axis, so its
    blocks are (SLAB//2, d) int8 (``ops.quantize.quantize_int4_blocks``)."""
    if E_c3.dtype == jnp.int8:
        return "int4" if E_c3.shape[1] == SLAB // 2 else "int8"
    return "bf16"


def _slab_scores(qi, tile, sc, mode: str):
    """(1, d) f32 query row x one fine tile -> (1, SLAB) f32 scores.

    int8: values <= 127 are exact in bf16, so the MXU dot runs bf16.
    int4: tile is (SLAB//2, d) packed bytes — two arithmetic shifts in
    i32 recover the nibbles (hi = rows [0, SLAB/2), lo = the rest) and a
    SUBLANE concat restores (SLAB, d), so the lane width stays d and the
    dot shape is identical to int8's while the slab DMA moved half the
    bytes.  ``sc`` is the (1, SLAB) per-logical-row scale row."""
    if mode == "int4":
        t = tile.astype(jnp.int32)
        hi = (t >> 4).astype(jnp.bfloat16)
        lo = ((t << 28) >> 28).astype(jnp.bfloat16)
        full = jnp.concatenate([hi, lo], axis=0)  # (SLAB, d)
    elif mode == "int8":
        full = tile.astype(jnp.bfloat16)
    else:
        full = tile
    s = jax.lax.dot_general(
        qi.astype(full.dtype), full,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, SLAB)
    if mode != "bf16":
        s = s * sc
    return s


def _fine_kernel(blk_ref, vcnt_ref, q_ref, *rest, U: int, k: int,
                 mode: str):
    tiles = rest[:U]
    scs = rest[U:2 * U] if mode != "bf16" else ()
    base = 2 * U if mode != "bf16" else U
    vals_ref, ids_ref = rest[base], rest[base + 1]
    run_v, run_i = rest[base + 2], rest[base + 3]  # scratch (1, k)
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    Q, d = q_ref.shape

    @pl.when(j == 0)
    def _():
        run_v[:] = jnp.full_like(run_v, _NEG_INF)
        run_i[:] = jnp.full_like(run_i, -1)

    # extract query row i (dynamic sublane slicing unsupported; a
    # (1, Q) x (Q, d) one-hot dot is MXU-cheap — same trick as the
    # binmax rescan kernel)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)
    onehot = (rows == i).astype(q_ref.dtype)
    qi = jax.lax.dot_general(
        onehot, q_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, d) f32
    cand_v = [run_v[:]]
    cand_i = [run_i[:]]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, SLAB), 1)
    for u in range(U):
        tile = tiles[u][0]  # (SLAB or SLAB//2, d)
        s = _slab_scores(qi, tile, scs[u][0] if scs else None, mode)
        slot = j * U + u
        vc = vcnt_ref[i, slot]
        blk = blk_ref[i, slot]
        s = jnp.where(iota < vc, s, _NEG_INF)
        cand_v.append(s)
        cand_i.append(blk * SLAB + iota)
    v, sid = _select_topk(
        jnp.concatenate(cand_v, axis=1), jnp.concatenate(cand_i, axis=1), k
    )
    run_v[:] = v
    run_i[:] = sid

    @pl.when(j == nj - 1)
    def _():
        @pl.when(i == 0)
        def _():
            vals_ref[:] = jnp.full_like(vals_ref, _NEG_INF)
            ids_ref[:] = jnp.full_like(ids_ref, -1)

        rowsel = jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0) == i
        vals_ref[:] = jnp.where(rowsel, jnp.broadcast_to(v, (Q, k)),
                                vals_ref[:])
        ids_ref[:] = jnp.where(rowsel, jnp.broadcast_to(sid, (Q, k)),
                               ids_ref[:])


def fine_call(E_c3, scales3, q, blk, vcnt, k: int, U: int, interpret: bool):
    """(nblocks, SLAB, d) x per-query block lists (Q, L) -> top-k by slot.

    Returns (vals (Q, k) f32, slots (Q, k) i32, -1 where -inf)."""
    nblocks, S, d = E_c3.shape
    Q, L = blk.shape
    assert L % U == 0
    mode = _fine_mode(E_c3)
    kern = functools.partial(_fine_kernel, U=U, k=k, mode=mode)
    tile_specs = [
        pl.BlockSpec((1, S, d),
                     functools.partial(lambda u, i, j, b, v: (b[i, j * U + u], 0, 0), uu),
                     memory_space=pltpu.VMEM)
        for uu in range(U)
    ]
    # Mosaic wants rank-2 blocks with >=8 sublanes; a (nblocks, 1, SLAB)
    # view makes the per-block scale row a legal (1, 1, SLAB) block
    scale_specs = [
        pl.BlockSpec((1, 1, SLAB),
                     functools.partial(
                         lambda u, i, j, b, v: (b[i, j * U + u], 0, 0), uu),
                     memory_space=pltpu.VMEM)
        for uu in range(U)
    ] if mode != "bf16" else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Q, L // U),
        in_specs=[pl.BlockSpec((Q, d), lambda i, j, b, v: (0, 0),
                               memory_space=pltpu.VMEM)]
        + tile_specs + scale_specs,
        out_specs=(
            pl.BlockSpec((Q, k), lambda i, j, b, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, k), lambda i, j, b, v: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, k), jnp.float32),
            pltpu.VMEM((1, k), jnp.int32),
        ],
    )
    scales_v = (scales3.reshape(nblocks, 1, SLAB)
                if mode != "bf16" else None)
    operands = [q] + [E_c3] * U + ([scales_v] * U if mode != "bf16" else [])
    vals, slots = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * L * SLAB * d,
            bytes_accessed=Q * L * S * d * E_c3.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(blk, vcnt, *operands)
    slots = jnp.where(jnp.isfinite(vals), slots, -1)
    return vals, slots


# ---------------------------------------------------------------------------
# two-pass fine stage (r3.5): the single-pass kernel above pays a
# kf-iteration ``_select_topk`` at EVERY grid step — including the dead
# padding slots that dominate ``L`` (the max over queries) at low nprobe
# on skewed clusters.  Binmax restructuring, same argument as
# ops/binmax_topk: pass A computes only per-candidate-block MAXIMA
# (dot + max, no selection), an XLA ``top_k`` picks the kb = kf + 1 + 1
# best blocks per query (every true top-kf row lives in a block whose
# max is >= the kf-th row score, and <= kf blocks can hold them, so
# kf + 1 covers boundary ties; +1 margin mirrors the binmax kernel),
# and pass B runs the selecting kernel over ONLY those kb real blocks.
# Pass A and pass B score slabs with the same in-kernel dot, so the
# candidate set is identical to the single-pass kernel's.

def _fine_binmax_kernel(blk_ref, vcnt_ref, q_ref, *rest, U: int, Lp: int,
                        mode: str):
    tiles = rest[:U]
    scs = rest[U:2 * U] if mode != "bf16" else ()
    base = 2 * U if mode != "bf16" else U
    bm_ref = rest[base]          # out (Q, Lp)
    run_ref = rest[base + 1]     # scratch (1, Lp)
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    Q, d = q_ref.shape

    @pl.when(j == 0)
    def _():
        run_ref[:] = jnp.full_like(run_ref, _NEG_INF)

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)
    onehot = (rows == i).astype(q_ref.dtype)
    qi = jax.lax.dot_general(
        onehot, q_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, d) f32
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, SLAB), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
    acc = run_ref[:]
    for u in range(U):
        tile = tiles[u][0]
        s = _slab_scores(qi, tile, scs[u][0] if scs else None, mode)
        vc = vcnt_ref[i, j * U + u]
        s = jnp.where(iota_s < vc, s, _NEG_INF)
        m = jnp.max(s)  # scalar block max (dead slot -> -inf)
        acc = jnp.where(lane == j * U + u, m, acc)
    run_ref[:] = acc

    @pl.when(j == nj - 1)
    def _():
        rowsel = jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0) == i
        bm_ref[:] = jnp.where(rowsel, jnp.broadcast_to(acc, (Q, Lp)),
                              bm_ref[:])


def _fine_binmax_call(E_c3, scales3, q, blk, vcnt, U: int, interpret: bool):
    """Per-query per-candidate-block maxima: (Q, L) f32 (-inf = dead).

    NOT on the serving path: this is the measured streaming floor of the
    fine stage (same DMAs and dots as the other fine kernels, zero
    selection work) — ``tools/exp_ivf2_breakdown.py`` times it next to
    the real paths so selection-cost regressions are visible.  A
    maxima->cover->rescan two-pass built on it was measured SLOWER than
    one score-dump pass over the full list (it re-reads the covered
    slabs); see ``fine_call_auto`` and docs/kernels.md r3.5."""
    nblocks, S, d = E_c3.shape
    Q, L = blk.shape
    assert L % U == 0
    Lp = max(_cdiv(L, 128) * 128, 128)
    mode = _fine_mode(E_c3)
    kern = functools.partial(_fine_binmax_kernel, U=U, Lp=Lp, mode=mode)
    tile_specs = [
        pl.BlockSpec((1, S, d),
                     functools.partial(
                         lambda u, i, j, b, v: (b[i, j * U + u], 0, 0), uu),
                     memory_space=pltpu.VMEM)
        for uu in range(U)
    ]
    scale_specs = [
        pl.BlockSpec((1, 1, SLAB),
                     functools.partial(
                         lambda u, i, j, b, v: (b[i, j * U + u], 0, 0), uu),
                     memory_space=pltpu.VMEM)
        for uu in range(U)
    ] if mode != "bf16" else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Q, L // U),
        in_specs=[pl.BlockSpec((Q, d), lambda i, j, b, v: (0, 0),
                               memory_space=pltpu.VMEM)]
        + tile_specs + scale_specs,
        out_specs=pl.BlockSpec((Q, Lp), lambda i, j, b, v: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, Lp), jnp.float32)],
    )
    scales_v = (scales3.reshape(nblocks, 1, SLAB)
                if mode != "bf16" else None)
    operands = [q] + [E_c3] * U + ([scales_v] * U if mode != "bf16" else [])
    bm = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, Lp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * L * SLAB * d,
            bytes_accessed=Q * L * S * d * E_c3.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(blk, vcnt, *operands)
    return bm[:, :L]


def _fine_scores_kernel(blk_ref, vcnt_ref, q_ref, *rest, U: int,
                        mode: str):
    """Score-dump variant of ``_fine_kernel``: same streaming loop, but
    raw U x SLAB scores land in the output instead of folding into an
    in-VMEM running top-k — selection happens outside with one
    positional ``lax.top_k``.  The output block is the query's full
    (1, L/U, U*SLAB) row (Mosaic needs full trailing dims here: a
    (1, U*SLAB) per-step block has a 1-sublane shape it rejects),
    revisited across j with a masked write — each j-lane is written
    exactly once, so no init pass is needed."""
    tiles = rest[:U]
    scs = rest[U:2 * U] if mode != "bf16" else ()
    base = 2 * U if mode != "bf16" else U
    out_ref = rest[base]  # (1, L/U, U*SLAB) block at (i, 0, 0)
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    Q, d = q_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)
    onehot = (rows == i).astype(q_ref.dtype)
    qi = jax.lax.dot_general(
        onehot, q_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, d) f32
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, SLAB), 1)
    parts = []
    for u in range(U):
        tile = tiles[u][0]
        s = _slab_scores(qi, tile, scs[u][0] if scs else None, mode)
        vc = vcnt_ref[i, j * U + u]
        parts.append(jnp.where(iota_s < vc, s, _NEG_INF))
    step = jnp.concatenate(parts, axis=1).reshape(1, 1, U * SLAB)
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, nj, 1), 1) == j
    out_ref[:] = jnp.where(sel, jnp.broadcast_to(step, out_ref.shape),
                           out_ref[:])


def fine_scores_call(E_c3, scales3, q, blk, vcnt, U: int, interpret: bool):
    """All candidate-row scores, streamed: (Q, L * SLAB) f32, -inf on
    dead/padded rows.  Same DMA pattern and in-kernel dot as the
    selecting kernel — only the selection moved out."""
    nblocks, S, d = E_c3.shape
    Q, L = blk.shape
    assert L % U == 0
    mode = _fine_mode(E_c3)
    kern = functools.partial(_fine_scores_kernel, U=U, mode=mode)
    tile_specs = [
        pl.BlockSpec((1, S, d),
                     functools.partial(
                         lambda u, i, j, b, v: (b[i, j * U + u], 0, 0), uu),
                     memory_space=pltpu.VMEM)
        for uu in range(U)
    ]
    scale_specs = [
        pl.BlockSpec((1, 1, SLAB),
                     functools.partial(
                         lambda u, i, j, b, v: (b[i, j * U + u], 0, 0), uu),
                     memory_space=pltpu.VMEM)
        for uu in range(U)
    ] if mode != "bf16" else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Q, L // U),
        in_specs=[pl.BlockSpec((Q, d), lambda i, j, b, v: (0, 0),
                               memory_space=pltpu.VMEM)]
        + tile_specs + scale_specs,
        out_specs=pl.BlockSpec((1, L // U, U * SLAB),
                               lambda i, j, b, v: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    scales_v = (scales3.reshape(nblocks, 1, SLAB)
                if mode != "bf16" else None)
    operands = [q] + [E_c3] * U + ([scales_v] * U if mode != "bf16" else [])
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, L // U, U * SLAB), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * L * SLAB * d,
            bytes_accessed=Q * L * (S * d * E_c3.dtype.itemsize + SLAB * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(blk, vcnt, *operands)
    return out.reshape(Q, L * SLAB)


def auto_u(L: int) -> int:
    """Slab tiles DMAed per grid step of the fine kernels.  The grid
    runs Q * ceil(L/U) steps with a measured ~0.65 us fixed cost each
    (tools/exp_ivf2_tail_opt.py at 10M nprobe=1: U=4 -> 8 cut the dump
    kernel 0.518 -> 0.351 ms for identical DMA bytes), so prefer U=8
    whenever it adds no padding DMAs over U=4 (dead list slots still
    fetch a block-0 tile each, so rounding L further up costs real
    bandwidth).  VMEM stays small either way: 8 int8 tiles at
    SLAB=256 x d=384 is 786 KB."""
    if -(-L // 8) * 8 == -(-L // 4) * 4:
        return 8
    return 4


def fine_call_xla(E_c3, scales3, q, blk, vcnt, k: int, U: int = 4,
                  interpret: bool = False, bias=None):
    """Fine stage with OUT-OF-KERNEL selection: the score-dump kernel
    streams every candidate row's score to HBM ((Q, L*SLAB) f32, ~2% of
    the slab traffic at d=384), then one positional ``lax.top_k`` picks
    the top-k candidates.  Blocks are pre-sorted ascending (dead slots
    last), so lowest-position tie-break == lowest global slot id — the
    selecting kernel's tie order.  Replaces the in-kernel k-pass running
    selection, measured at ~6x the streaming cost
    (tools/exp_ivf2_breakdown.py: pass A 0.75-0.96 ms vs selecting
    kernel 6.7-7.0 ms at kf=20, 10.5M x 384 nprobe=1).

    ``bias`` (Q, L) f32 adds a per-candidate-block term to every row
    score of that block AFTER the kernel — the int4 residual path's
    exact q.centroid component (dead slots stay -inf: -inf + finite is
    -inf)."""
    Q, L = blk.shape
    # sort blocks ascending with dead slots (vcnt == 0) pushed last, so
    # flattened slot ids ASCEND with candidate position among live rows
    key = jnp.where(vcnt > 0, blk, jnp.int32(2**30))
    order = jnp.argsort(key, axis=1)
    blk2 = jnp.take_along_axis(blk, order, axis=1)
    vc2 = jnp.take_along_axis(vcnt, order, axis=1)
    flat = fine_scores_call(E_c3, scales3, q, blk2, vc2, U, interpret)
    if bias is not None:
        bias2 = jnp.take_along_axis(bias, order, axis=1)  # (Q, L)
        flat = (flat.reshape(Q, L, SLAB) + bias2[:, :, None]).reshape(
            Q, L * SLAB)
    kk = min(k, L * SLAB)
    # selection: iterative argmax for serving-size k (6.3x lax.top_k),
    # top_k past the linear-cost crossover; both yield top_k's exact
    # value order and tie-breaking (measured id-parity in the sel sweep,
    # crafted-tie coverage in tests/test_ivf.py)
    if kk <= _ITER_SELECT_MAX:
        vals, pos = _iter_topk(flat, kk)
    else:
        vals, pos = jax.lax.top_k(flat, kk)
    # arithmetic slot map — materializing a (Q, L*SLAB) i32 sid buffer
    # and gathering through it measured 18% slower than this at 10M
    bi = pos // SLAB
    off = pos % SLAB
    slots = jnp.take_along_axis(blk2, bi, axis=1) * SLAB + off
    slots = jnp.where(jnp.isfinite(vals), slots, -1)
    if kk < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - kk)),
                       constant_values=_NEG_INF)
        slots = jnp.pad(slots, ((0, 0), (0, k - kk)), constant_values=-1)
    return vals, slots


# dump-path score buffer cap: (Q, L*SLAB) f32 past this falls back to
# the constant-memory selecting kernel (only reachable by probe-all
# configs on big corpora — serving nprobes keep L*SLAB*Q tiny)
_DUMP_MAX_BYTES = 1 << 31
# master-rescore gather cap: the int4 default over-selection is pool-
# proportional, so the (Q, kf, d) f32 gather must be budgeted (ADVICE
# r3); 1 GiB keeps it small next to a multi-GB corpus
_RESCORE_MAX_BYTES = 1 << 30
# per-QUERY VMEM bound for the dump kernel: its out block per grid step
# is the full (1, L//U, U*SLAB) f32 row = L*SLAB*4 bytes resident in
# VMEM (fine_scores_call out_specs), independent of Q — a deep-nprobe
# config at small Q passes the total-bytes cap above yet fails Mosaic
# lowering.  4 MiB (L <= 4096 blocks at SLAB=256) leaves headroom for
# the query block and the U slab tiles in a 16 MiB VMEM.
_DUMP_VMEM_BYTES = 4 << 20


def fine_call_auto(E_c3, scales3, q, blk, vcnt, k: int, U: int,
                   interpret: bool, bias=None):
    """Fine-stage dispatch (r3.5): the score-dump path always wins when
    its (Q, L*SLAB) f32 score buffer is affordable — its extra HBM
    traffic is the score write (4 bytes per scanned d-dim row, ~1% of
    slab bytes at d=384) while the selecting kernel pays a k-pass
    running selection per grid step, measured at ~6x the streaming cost
    (tools/exp_ivf2_breakdown.py).  A maxima-pass pre-cover was built
    and measured too, but it RE-READS the covered slabs, so it always
    loses to one dump over the full list — see docs/kernels.md r3.5.
    Candidate ids are identical in both branches (ties break by lowest
    slot id everywhere); values may differ by accumulation-order ulps
    (harmless: the search core rescores candidates on the master).

    A ``bias`` (int4 residual q.centroid term) REQUIRES the dump path —
    the selecting kernel's in-VMEM running top-k would rank biasless
    scores across blocks of different clusters.  The dump budget only
    binds at near-probe-all configs on multi-M corpora (L*SLAB > 1M
    candidate rows per query), where IVF is pointless anyway — the
    error message says to lower nprobe or use int8."""
    Q, L = blk.shape
    if bias is not None and not _use_dump(Q, L):
        raise ValueError(
            f"int4 fine stage needs the score-dump path, but Q={Q} L={L} "
            f"exceeds its buffer budget ({Q}x{L}x{SLAB} f32 scores; caps "
            f"{_DUMP_MAX_BYTES >> 20} MiB total / {_DUMP_VMEM_BYTES >> 20}"
            f" MiB per query). Lower nprobe or use ivf_fine_dtype='int8'.")
    if _use_dump(Q, L):
        return fine_call_xla(E_c3, scales3, q, blk, vcnt, k, U, interpret,
                             bias=bias)
    return fine_call(E_c3, scales3, q, blk, vcnt, k, U, interpret)


def _use_dump(Q: int, L: int) -> bool:
    """True when the score-dump path is affordable: total HBM buffer
    under _DUMP_MAX_BYTES AND the per-query VMEM-resident score row
    under _DUMP_VMEM_BYTES (both bounds are per-Q-independent failure
    modes — a deep-nprobe config at Q=1 passes the first and fails the
    second)."""
    return (Q * L * SLAB * 4 <= _DUMP_MAX_BYTES
            and L * SLAB * 4 <= _DUMP_VMEM_BYTES)


# ---------------------------------------------------------------------------
# traceable search core (composes under jit and inside shard_map)

def block_lists(probes, blk_start, nblk, counts, L: int,
                return_clusters: bool = False):
    """Per-query candidate block lists.  probes (Q, P) cluster ids ->
    (blk (Q, L) block indices, vcnt (Q, L) valid rows per block); dead
    slots point at block 0 with vcnt 0.  With ``return_clusters`` also
    returns the per-slot cluster ids (Q, L) — the int4 residual path
    gathers its per-block q.centroid bias through them."""
    Q, P = probes.shape
    nb_p = nblk[probes]  # (Q, P)
    cum = jnp.cumsum(nb_p, axis=1)
    starts = cum - nb_p
    total = cum[:, -1:]
    j = jnp.arange(L, dtype=jnp.int32)[None, :]  # (1, L)
    seg = jnp.sum(j[:, :, None] >= cum[:, None, :], axis=2)  # (Q, L)
    segc = jnp.minimum(seg, P - 1).astype(jnp.int32)
    probe_c = jnp.take_along_axis(probes, segc, axis=1)  # (Q, L)
    off = j - jnp.take_along_axis(starts, segc, axis=1)
    blk = blk_start[probe_c] + off
    vcnt = jnp.clip(counts[probe_c] - off * SLAB, 0, SLAB)
    live = j < total
    out = (jnp.where(live, blk, 0).astype(jnp.int32),
           jnp.where(live, vcnt, 0).astype(jnp.int32))
    if return_clusters:
        return out + (probe_c.astype(jnp.int32),)
    return out


def ivf2_search_core(
    E_master, E_c3, scales3, perm, centroids, blk_start, nblk, counts,
    built, count, q, *, k: int, nprobe: int, L: int, tail_max: int,
    U: int = 4, interpret: bool = False, refine_extra: Optional[int] = None,
):
    """q (Q, d) f32 -> (vals (Q, k) f32, rows (Q, k) i32 global ids).

    ``built``/``count`` are traced i32 scalars: rows [0, built) are
    served by the clustered fine stage, rows [built, count) by an exact
    scan of a ``tail_max``-wide window of the master matrix.

    The fine stage over-selects ``k + refine_extra`` candidates (default
    2k) which are then RESCORED against the master matrix (a tiny (Q,
    ~2k) row gather), so final scores are master-exact for every tier
    composition — recall is then bounded only by candidate COVERAGE
    (nprobe), not by bf16/int8 fine-stage rounding.  Ties break by
    smallest global id (same convention as every other tier)."""
    Q, d = q.shape
    if refine_extra is None:
        # int4's 4-bit residual ranking needs wider over-selection to
        # recover the true top-k at the master rescore, and the need
        # scales with the CANDIDATE POOL (L*SLAB), not with k: ranking
        # noise drops a roughly constant fraction of true top-k below a
        # fixed pool percentile.  Measured recall-parity points
        # (tools/exp_int4_fine.py at 10M, exp_capacity_14m.py at 14.7M):
        # 2048-row pool -> extra 100 (0.9883 = int8's own coverage
        # ceiling), 4096-row pool -> 300 (0.9934).  pool/12 COVERS both
        # (170 and 341 — slightly over at 10M, which only costs a wider
        # positional top_k + a (Q, kf) master gather on the dump path;
        # a divisor that UNDERSHOOTS a parity point would silently give
        # recall below the documented default).  Floor at 10k.
        refine_extra = (max(10 * k, (L * SLAB) // 12)
                        if _fine_mode(E_c3) == "int4" else k)
        # the master rescore gathers a (Q, kf, d) f32 tensor; the pool-
        # proportional int4 default has no intrinsic cap, so a deep-
        # nprobe config at a big Q (10M rows, nprobe~64, Q=256 -> kf
        # ~18k, ~7 GB) would OOM next to the corpus.  Refuse loudly
        # rather than silently lowering recall below the documented
        # parity divisor; an EXPLICIT refine_extra still overrides.
        gather = Q * min(k + refine_extra, L * SLAB) * d * 4
        if gather > _RESCORE_MAX_BYTES:
            raise ValueError(
                f"int4 master rescore would gather {gather >> 20} MiB "
                f"(Q={Q}, pool={L * SLAB}, refine_extra={refine_extra}); "
                f"cap is {_RESCORE_MAX_BYTES >> 20} MiB. Lower nprobe, "
                f"split the query batch, use ivf_fine_dtype='int8', or "
                f"pass refine_extra explicitly.")
    cand_i = []
    if L > 0:
        cs = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
        _, probes = jax.lax.top_k(cs, nprobe)
        if _fine_mode(E_c3) == "int4":
            # residual encoding: fine scores are q.(row - centroid);
            # add the exact per-block q.centroid term from the coarse
            # score table so candidate ranking approximates q.row
            blk, vcnt, pc = block_lists(probes, blk_start, nblk, counts,
                                        L, return_clusters=True)
            bias = jnp.take_along_axis(cs, pc, axis=1)  # (Q, L)
        else:
            blk, vcnt = block_lists(probes, blk_start, nblk, counts, L)
            bias = None
        kf = min(k + refine_extra, L * SLAB)
        fv, fslots = fine_call_auto(E_c3, scales3, q, blk, vcnt, kf, U,
                                    interpret, bias=bias)
        fgids = perm[jnp.maximum(fslots, 0)]
        fgids = jnp.where(fslots >= 0, fgids, -1)
        # a built row may have been deleted (zeroed): keep it — the
        # engine's host-side tombstone filter drops it, same as the
        # exact tiers' zeroed rows
        cand_i.append(jnp.where(fgids >= 0, fgids, _BIG_I32))
    tail_v = tail_i = None
    if tail_max > 0:
        base = jnp.clip(built, 0, jnp.maximum(E_master.shape[0] - tail_max, 0))
        win = jax.lax.dynamic_slice(
            E_master, (base, jnp.int32(0)), (tail_max, d))
        # cast q DOWN to the store dtype (not the window up to f32: a
        # deep tail window as f32 would be a multi-GB transient)
        # HIGHEST: match the exact tier's true-f32 products on f32
        # masters (exact either way for bf16 — see ops/exact.py)
        ts = jnp.dot(q.astype(win.dtype), win.T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        gid = base + jnp.arange(tail_max, dtype=jnp.int32)[None, :]
        live = (gid >= built) & (gid < count)
        ts = jnp.where(live, ts, _NEG_INF)
        kt = min(k, tail_max)
        tv, tloc = jax.lax.top_k(ts, kt)
        tgid = jnp.take_along_axis(
            jnp.broadcast_to(gid, ts.shape), tloc, axis=1)
        tail_v = tv
        tail_i = jnp.where(jnp.isfinite(tv), tgid, _BIG_I32)
        cand_i.append(tail_i)
    if not cand_i:
        return (jnp.full((Q, k), _NEG_INF, jnp.float32),
                jnp.full((Q, k), -1, jnp.int32))
    if L == 0:
        # tail-only: scores are already master-exact
        vals, ids = _select_topk(tail_v, tail_i, min(k, tail_v.shape[1]))
    else:
        from modular_rag_system_tpu.ops.binmax_topk import _round_to_dtype_f32

        ids_all = jnp.concatenate(cand_i, axis=1)  # (Q, kf [+ kt])
        safe = jnp.clip(ids_all, 0, E_master.shape[0] - 1)
        rows = E_master[safe].astype(jnp.float32)  # (Q, c, d) — tiny
        # round q to the master dtype so scores match the exact tiers'
        # convention BIT-FOR-BIT (the exact kernel's pass 2 scores
        # bf16-rounded q x bf16 rows in f32); raw-f32 q here flipped
        # ~0.5% of near-tie top-10 memberships vs the exact kernel on
        # clustered data — a constant recall deficit at every nprobe
        q_r = _round_to_dtype_f32(q, E_master.dtype)
        scores = jnp.einsum("qd,qcd->qc", q_r, rows,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        scores = jnp.where(ids_all < count, scores, _NEG_INF)
        vals, ids = _select_topk(scores, ids_all, k)
    if vals.shape[1] < k:
        pad = k - vals.shape[1]
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=_NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=_BIG_I32)
    return vals, jnp.where(jnp.isfinite(vals), ids, -1).astype(jnp.int32)
