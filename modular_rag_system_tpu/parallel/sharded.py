"""Mesh-sharded device index with ICI top-k merge (SURVEY §7 step 6).

Layout: a physical array ``E_phys (S, cap_s, d)`` sharded
``P("index", None, None)`` — shard ``s`` owns global rows ``j*S + s``
(strided assignment, so appends stay balanced across shards without
rebalancing).  A query runs as ONE jitted ``shard_map`` program:

    replicated q  ->  per-shard fused/exact top-k over local rows
                  ->  ``all_gather`` of (score, global-id) pairs  [ICI]
                  ->  replicated k-merge (k * S candidates — tiny)

The merge reuses the kernel's exact selection with
smallest-global-id tie-breaking, so a 1-shard mesh and an 8-shard mesh
return bit-identical results (SURVEY §7 hard part (e)).

The reference had no distributed execution at all (SURVEY §2.7); this
module is the TPU-native equivalent called for by BASELINE.json.
"""

from __future__ import annotations

import logging
import threading
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from modular_rag_system_tpu.ops.fused_topk import (
    _use_interpret,
    fused_topk_int8_raw,
    fused_topk_raw,
    select_topk,
)
from modular_rag_system_tpu.ops.quantize import quantize_rows_jit
from modular_rag_system_tpu.parallel.mesh import make_index_mesh

logger = logging.getLogger(__name__)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_merge(v, g, ax, km: int, deep: bool = False):
    """all_gather per-shard (score, gid) candidates over mesh axis ``ax``
    and keep the global top-``km`` — THE merge primitive for every
    sharded search path (one definition so the tie-break semantics of
    the 1-shard == N-shard invariant cannot drift between copies).

    ``deep=False`` selects via ``select_topk`` (iterative, exact
    lowest-gid ties, cheap at serving k); ``deep=True`` uses a two-key
    sort on (-score, gid) — same tie order, O(n log n) at ANY k, the
    only usable form at deep-refill k where select_topk's unrolled
    k-step selection would blow the program."""
    av = jax.lax.all_gather(v, ax)  # (n_ax, Qp, kk)
    ag = jax.lax.all_gather(g, ax)
    n_ax, Qp_, kk = av.shape
    cv = jnp.transpose(av, (1, 0, 2)).reshape(Qp_, n_ax * kk)
    cg = jnp.transpose(ag, (1, 0, 2)).reshape(Qp_, n_ax * kk)
    if deep:
        neg, gs = jax.lax.sort((-cv, cg), dimension=1, num_keys=2)
        return -neg[:, :km], gs[:, :km]
    return select_topk(cv, cg, km)


class ShardedIndex:
    """Drop-in DeviceIndex replacement running on an N-device mesh."""

    def __init__(
        self,
        dim: int,
        mesh: Optional[Mesh] = None,
        capacity: int = 4096,
        tier: str = "exact",
        block_rows: int = 1024,
        axis="index",
        fused_bin_width=None,
        store_dtype: str = "float32",
        ivf_clusters: Optional[int] = None,
        ivf_nprobe: int = 8,
        ivf_iters: int = 10,
        ivf_fine_dtype: str = "auto",
        ivf_tail_frac: float = 0.25,
        ivf_rebuild_min: int = 32768,
        ivf_refine_extra: Optional[int] = None,
        ivf_balance: float = 0.0,
    ) -> None:
        """``axis`` may be a single mesh-axis name (flat ICI merge) or a
        (dcn_axis, ici_axis) tuple for the hierarchical two-stage merge
        on a 2-D multi-slice mesh (``make_hierarchical_index_mesh``)."""
        if tier not in ("exact", "fused", "bf16", "int8", "ivf", "auto"):
            raise ValueError(
                f"ShardedIndex does not support tier {tier!r} "
                f"(choose exact/fused/bf16/int8/ivf/auto)"
            )
        self.dim = dim
        self.tier = tier
        if store_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"store_dtype must be float32|bfloat16, got {store_dtype}")
        self.store_dtype = store_dtype
        self._jdtype = jnp.float32 if store_dtype == "float32" else jnp.bfloat16
        if mesh is not None and len(mesh.axis_names) == 2 and not isinstance(axis, tuple):
            axis = tuple(mesh.axis_names)
        self.axis = axis
        self.mesh = mesh if mesh is not None else make_index_mesh(axis=axis)
        self.S = self.mesh.devices.size
        if block_rows < 1:
            raise ValueError(f"block_rows must be >= 1, got {block_rows}")
        # Round block_rows down to a power of two: cap_s is always pow2,
        # and a non-dividing block_rows would make the kernel grid drop
        # the tail cap_s % block_rows rows of every shard SILENTLY (the
        # single-device wrapper raises; a perf knob must not change
        # results).
        self.block_rows = 1 << (block_rows.bit_length() - 1)
        self.fused_bin_width = fused_bin_width
        # use the ROUNDED block_rows here: a non-pow2 parameter would make
        # cap_s non-pow2 and self.block_rows would not divide it (the
        # kernel grid silently drops the tail of every shard)
        self.cap_s = max(
            _next_pow2((capacity + self.S - 1) // self.S), self.block_rows
        )
        self.count = 0
        self._lock = threading.RLock()
        # Write gate (mirrors DeviceIndex): held by every writer and
        # across build_ann's heavy k-means+fill, which runs WITHOUT the
        # state lock so readers keep serving the old structure + exact
        # tail.  Writers must be excluded during the build (the scatter
        # writes donate E).  Lock order: _build_gate -> _lock.
        self._build_gate = threading.RLock()
        self._row_sharding = NamedSharding(self.mesh, P(axis, None, None))
        self._scale_sharding = NamedSharding(self.mesh, P(axis, None))
        # Multi-process meshes (jax.distributed): writes device_put full
        # host arrays onto a GLOBAL sharding, which is only correct
        # under the SPMD ingest contract — every process calls add()/
        # delete() with IDENTICAL data in the same order (docs/
        # scaling.md; validated end-to-end by parallel/mh_check.py on a
        # 2-process CPU cluster).  Surface the contract once at build.
        try:
            if any(getattr(d, "process_index", 0) != jax.process_index()
                   for d in self.mesh.devices.flat):
                logger.info(
                    "ShardedIndex spans %d processes: SPMD ingest contract "
                    "applies — every process must issue identical writes "
                    "(docs/scaling.md#multi-host)", jax.process_count())
        except Exception:
            pass
        self.E = jax.device_put(
            jnp.zeros((self.S, self.cap_s, dim), self._jdtype), self._row_sharding
        )
        # Derived tier copies.  Invariant mirrors DeviceIndex: non-None
        # means in sync with E (writes scatter-update them, O(batch));
        # capacity growth drops them for a lazy full rebuild.
        self._E_q = None  # (S, cap_s, d) int8
        self._scales = None  # (S, cap_s) f32
        self._E_bf16 = None  # (S, cap_s, d) bf16
        self.derived_incremental_rows = 0
        self.derived_rebuilds = 0
        self._search_cache: Dict[Tuple, callable] = {}
        # build-path programs (ivf fill / order-counts / bincount): one
        # jitted callable per static config, reused across rebuilds so a
        # write-path re-cluster does not re-pay XLA compilation of the
        # fill pipeline under the index lock (jit caches per-shape on
        # the SAME callable; a fresh closure per rebuild never hits)
        self._build_prog_cache: Dict[Tuple, callable] = {}
        self._dummy_scales = None
        self._count_dev = None
        # ivf tier state: (centroids (C, d) replicated, table (S, C, capb)
        # sharded of LOCAL row positions); rebuilt lazily after any write
        self.ivf_clusters = ivf_clusters
        self.ivf_nprobe = ivf_nprobe
        self.ivf_iters = ivf_iters
        self.ivf_fine_dtype = ivf_fine_dtype
        # pending snapshot warm start (centroids, global labels) —
        # consumed by the next build_ann (set by load()/engine restore)
        self.ivf_warmstart = None
        self.ivf_tail_frac = ivf_tail_frac
        self.ivf_rebuild_min = ivf_rebuild_min
        self.ivf_refine_extra = ivf_refine_extra
        self.ivf_balance = ivf_balance
        self.ivf_rebuilds = 0
        self._ivf2 = None

    # ------------------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.S * self.cap_s

    def _phys_pos(self, rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        return rows % self.S, rows // self.S

    # ------------------------------------------------------------------
    def add(self, mat: np.ndarray) -> Tuple[int, int]:
        n = int(mat.shape[0])
        if n == 0:
            return self.count, 0
        if mat.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: {mat.shape[1]} != {self.dim}")
        with self._build_gate:
            with self._lock:
                first = self.count
                self._ensure_capacity(self.count + n)
                rows = np.arange(first, first + n)
                s_idx, j_idx = self._phys_pos(rows)
                self.E = _scatter_rows(
                    self.E,
                    jnp.asarray(s_idx, jnp.int32),
                    jnp.asarray(j_idx, jnp.int32),
                    jnp.asarray(mat).astype(self._jdtype),
                )
                self._update_derived_scatter(s_idx, j_idx, mat)
                self.count += n
                self._count_dev = None
            # threshold rebuild OUTSIDE _lock (gate held): queries keep
            # serving the old structure + exact tail during the build
            self._maybe_build_ivf2()
            return first, n

    def _ensure_capacity(self, needed: int) -> None:
        if needed <= self.capacity:
            return
        new_cap_s = _next_pow2((needed + self.S - 1) // self.S)
        old = self.E
        grown = jnp.zeros((self.S, new_cap_s, self.dim), self._jdtype)
        grown = jax.jit(
            lambda g, o: jax.lax.dynamic_update_slice(g, o, (0, 0, 0)),
            out_shardings=self._row_sharding,
        )(grown, old)
        self.E = grown
        self.cap_s = new_cap_s
        # shapes changed: derived copies rebuild lazily at next use.
        # The ivf2 structure SURVIVES growth: the strided global<->local
        # mapping is cap_s-independent and inv_perm covers the built
        # prefix, which predates the growth.
        self._E_q = self._scales = self._E_bf16 = None
        self._search_cache.clear()

    def delete_rows(self, rows: np.ndarray) -> None:
        if rows.size == 0:
            return
        with self._build_gate:
            with self._lock:
                s_idx, j_idx = self._phys_pos(np.asarray(rows))
                zeros = jnp.zeros((len(rows), self.dim), self._jdtype)
                self.E = _scatter_rows(
                    self.E,
                    jnp.asarray(s_idx, jnp.int32),
                    jnp.asarray(j_idx, jnp.int32),
                    zeros,
                )
                self._update_derived_scatter(
                    s_idx, j_idx, np.zeros((len(rows), self.dim), np.float32)
                )
                self._ivf2_update_rows(
                    s_idx, j_idx, np.zeros((len(rows), self.dim), np.float32)
                )
            # deletes count as drift; without this an update-only
            # workload never re-fires the rebuild threshold
            self._maybe_build_ivf2()

    def set_rows(self, rows: np.ndarray, mat: np.ndarray) -> None:
        """Overwrite existing rows (e.g. re-ingest of a deleted doc)."""
        if len(rows) == 0:
            return
        with self._build_gate:
            with self._lock:
                s_idx, j_idx = self._phys_pos(np.asarray(rows))
                self.E = _scatter_rows(
                    self.E,
                    jnp.asarray(s_idx, jnp.int32),
                    jnp.asarray(j_idx, jnp.int32),
                    jnp.asarray(mat).astype(self._jdtype),
                )
                self._update_derived_scatter(s_idx, j_idx, mat)
                self._ivf2_update_rows(s_idx, j_idx, mat)
            self._maybe_build_ivf2()

    # ------------------------------------------------------------------
    def _update_derived_scatter(self, s_idx, j_idx, mat) -> None:
        """Sync derived tier copies for written rows — O(batch) scatter
        instead of a full-capacity requantization (VERDICT r1 item 7)."""
        if self._E_q is None and self._E_bf16 is None:
            return
        si = jnp.asarray(s_idx, jnp.int32)
        ji = jnp.asarray(j_idx, jnp.int32)
        # round-trip through the store dtype so values match E's rows
        vals = jnp.asarray(mat, jnp.float32).astype(self._jdtype).astype(jnp.float32)
        if self._E_q is not None:
            qv, sc = quantize_rows_jit(vals)
            self._E_q = _scatter_rows(self._E_q, si, ji, qv)
            self._scales = _scatter_scales(self._scales, si, ji, sc[:, 0])
            self.derived_incremental_rows += int(len(s_idx))
        if self._E_bf16 is not None and self.store_dtype != "bfloat16":
            self._E_bf16 = _scatter_rows(
                self._E_bf16, si, ji, vals.astype(jnp.bfloat16)
            )
            self.derived_incremental_rows += int(len(s_idx))

    # ------------------------------------------------------------------
    def _refresh_quant(self) -> None:
        if self._E_q is not None:
            return

        @jax.jit
        def _q(E):
            flat = E.reshape(-1, self.dim)
            qv, sc = quantize_rows_jit(flat)
            return (
                qv.reshape(self.S, self.cap_s, self.dim),
                sc.reshape(self.S, self.cap_s),
            )

        self._E_q, self._scales = jax.jit(
            _q, out_shardings=(self._row_sharding, self._scale_sharding)
        )(self.E)
        self.derived_rebuilds += 1

    # ------------------------------------------------------------------
    # sharded IVF v2 (ops/ivf2): global SPMD k-means + PER-SHARD
    # cluster-contiguous slab layout over local rows; queries run the
    # same fine-kernel + exact-tail core per shard and merge over ICI.
    def _maybe_build_ivf2(self) -> None:
        """Write-path rebuild trigger (mirrors DeviceIndex): re-cluster
        when the exact tail + stale rows pass the threshold.  Queries
        never rebuild."""
        if self._resolved_tier() != "ivf" or self.count == 0:
            return
        built = self._ivf2.built if self._ivf2 else 0
        stale = self._ivf2.stale_rows if self._ivf2 else 0
        pending = self.count - built + stale
        if pending >= max(self.ivf_rebuild_min,
                          int(self.ivf_tail_frac * self.count)):
            self.build_ann()

    # --- build-path programs, cached across rebuilds ------------------
    # A write-path re-cluster holds the index lock; re-tracing these
    # shard_maps as fresh closures every rebuild would re-pay full XLA
    # compilation each time (seconds to minutes through a remote-compile
    # tunnel).  One callable per static config -> jit's own per-shape
    # cache does the rest.
    def _axes(self):
        return ((self.axis,) if isinstance(self.axis, str)
                else tuple(self.axis))

    def _sid_in_mesh(self):
        axes = self._axes()
        sid = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            sid = sid * self.mesh.shape[a] + jax.lax.axis_index(a)
        return sid

    def _build_prog(self, key, make):
        fn = self._build_prog_cache.get(key)
        if fn is None:
            if len(self._build_prog_cache) > 32:
                self._build_prog_cache.clear()
            fn = make()
            self._build_prog_cache[key] = fn
        return fn

    def _bincount_program(self, Ccur: int):
        """Global per-cluster row counts: per-shard bincount + psum."""
        mesh, axis, axes = self.mesh, self.axis, self._axes()

        def make():
            def cnt_body(lab_blk):
                c = jnp.bincount(
                    jnp.where(lab_blk[0] >= 0, lab_blk[0], Ccur),
                    length=Ccur + 1)[:Ccur]
                for a in axes:
                    c = jax.lax.psum(c, a)
                return c

            return jax.jit(jax.shard_map(
                cnt_body, mesh=mesh, in_specs=(P(axis, None),),
                out_specs=P(), check_vma=False))

        return self._build_prog(("cnt", Ccur), make)

    def _order_counts_program(self, C: int):
        """Per-shard cluster-sorted row order + per-cluster counts."""
        from modular_rag_system_tpu.ops.ivf2 import order_counts_core

        mesh, axis, S = self.mesh, self.axis, self.S

        def make():
            def oc_body(lab_blk, count_g):
                s = self._sid_in_mesh()
                count_s = jnp.maximum(0, (count_g - s + S - 1) // S)
                order, counts = order_counts_core(lab_blk[0], count_s, C)
                return order[None], counts[None]

            return jax.jit(jax.shard_map(
                oc_body, mesh=mesh, in_specs=(P(axis, None), P()),
                out_specs=(P(axis, None), P(axis, None)), check_vma=False,
            ))

        return self._build_prog(("oc", C), make)

    def _fill_program(self, CHUNK: int, fdt: str):
        """Chunked cluster-contiguous fine-copy fill (donates the
        accumulators; HBM->HBM inside each shard)."""
        from modular_rag_system_tpu.ops.ivf2 import _fill_chunk_core

        mesh, axis = self.mesh, self.axis

        def make():
            def fill_body(Ec, sc, pm, iv, E_blk, od, cn, bs, rs, bc, cents,
                          lo):
                out = _fill_chunk_core(
                    Ec[0], sc[0], pm[0], iv[0], E_blk[0], od[0], cn[0],
                    bs[0], rs[0], bc[0], cents, lo, nb=CHUNK,
                    fine_dtype=fdt)
                return tuple(x[None] for x in out)

            sp3 = P(axis, None, None)
            return jax.jit(jax.shard_map(
                fill_body, mesh=mesh,
                in_specs=(P(axis, None, None, None), sp3, P(axis, None),
                          P(axis, None), sp3, P(axis, None), P(axis, None),
                          P(axis, None), P(axis, None), P(axis, None),
                          P(), P()),
                out_specs=(P(axis, None, None, None), sp3, P(axis, None),
                           P(axis, None)),
                check_vma=False,
            ), donate_argnums=(0, 1, 2, 3))

        return self._build_prog(("fill", CHUNK, fdt), make)

    def build_ann(self) -> None:
        """(Re)build the sharded cluster-contiguous structure.  Only
        (S, C)-sized tables cross the host<->device link; the corpus
        moves HBM->HBM inside each shard."""
        from modular_rag_system_tpu.ops.ivf2 import SLAB
        from modular_rag_system_tpu.ops.kmeans import kmeans_fit_sharded

        # gate excludes writers for the whole build (the scatter writes
        # donate E); the state lock is only held for the snapshot below
        # and the final swap in _finish_ann_build — readers keep serving
        # the old structure + exact tail throughout (see DeviceIndex)
        with self._build_gate:
            # snapshot count AND consume the warm start atomically under
            # the state lock (mirrors DeviceIndex): the warm labels are
            # validated against this exact count, and engine restore
            # assigns ivf_warmstart from another thread
            with self._lock:
                count = self.count
                warm = self.ivf_warmstart
                self.ivf_warmstart = None  # single use
                fdt = self.ivf_fine_dtype
                if fdt == "auto":
                    from modular_rag_system_tpu.index import DeviceIndex

                    fdt = ("int8"
                           if count > DeviceIndex._IVF_AUTO_INT8_ROWS
                           else "bf16")
            S, axis, mesh = self.S, self.axis, self.mesh
            if count == 0:
                return
            C = self.ivf_clusters
            if C is None:
                C = int(max(8, min(count, round(count ** 0.5))))
            C = min(max(C, 1), count)
            scaled = fdt in ("int8", "int4")
            if warm is not None:
                cents_h, labels_g = warm
                if not (0 < len(labels_g) <= count
                        and cents_h.shape[1] == self.dim):
                    warm = None
                else:
                    # label VALUES must address the centroid table — a
                    # corrupt snapshot would silently produce clamped
                    # gathers and a wrong clustering (ADVICE r3)
                    lg = np.asarray(labels_g, np.int32)
                    if lg.min() < 0 or lg.max() >= cents_h.shape[0]:
                        logger.warning(
                            "warm_start labels out of range [0, %d); "
                            "re-running k-means", cents_h.shape[0])
                        warm = None
            if warm is not None:
                # snapshot warm start: skip k-means AND balance splits
                # (the labels already encode the post-split assignment)
                built_g = len(labels_g)
                centroids = jnp.asarray(cents_h, jnp.float32)
                C = int(centroids.shape[0])
                lab_h = np.full((S, self.cap_s), -1, np.int32)
                g = np.arange(built_g, dtype=np.int64)
                lab_h[g % S, g // S] = np.asarray(labels_g, np.int32)
                labels = jax.device_put(
                    jnp.asarray(lab_h), NamedSharding(mesh, P(axis, None)))
                return self._finish_ann_build(
                    centroids, labels, built_g, fdt, scaled)
            # seeds: evenly-spaced GLOBAL rows, gathered on device
            seed_g = np.linspace(0, count - 1, C).astype(np.int64)
            s_idx, j_idx = self._phys_pos(seed_g)
            seeds = np.asarray(
                self.E[jnp.asarray(s_idx), jnp.asarray(j_idx)],
                dtype=np.float32)
            rng = np.random.default_rng(0)
            init = seeds + rng.standard_normal(seeds.shape).astype(np.float32) * 1e-4
            init /= np.maximum(np.linalg.norm(init, axis=1, keepdims=True), 1e-12)
            centroids, labels = kmeans_fit_sharded(
                self.E, count, init, mesh, axis, iters=self.ivf_iters)

            # LBG balance splits: clusters past ivf_balance x avg seed
            # jittered centroid copies (ops/ivf2.lbg_split_seeds — the
            # SAME split move as the single-device builder) and a short
            # SPMD Lloyd re-run carves them up — per-shard bincounts
            # psum to global, so every shard splits identically
            if self.ivf_balance:
                from modular_rag_system_tpu.ops.ivf2 import lbg_split_seeds

                cap_rows = max(int(np.ceil(self.ivf_balance * count / C)),
                               SLAB)
                for _ in range(2):
                    Ccur = int(centroids.shape[0])
                    cnts = np.asarray(self._bincount_program(Ccur)(labels))
                    seeds2 = lbg_split_seeds(
                        np.asarray(centroids), cnts, cap_rows, rng)
                    if seeds2 is None:
                        break
                    grown = np.concatenate(
                        [np.asarray(centroids, np.float32), seeds2], axis=0)
                    centroids, labels = kmeans_fit_sharded(
                        self.E, count, grown, mesh, axis, iters=3)
                C = int(centroids.shape[0])

            return self._finish_ann_build(centroids, labels, count, fdt,
                                          scaled)

    def _finish_ann_build(self, centroids, labels, built_g: int, fdt: str,
                          scaled: bool) -> None:
        """Contiguous-layout fill from a (centroids, labels) clustering —
        shared by the fresh k-means build and the snapshot warm start.
        Caller holds the BUILD GATE (writers excluded) but not the state
        lock — the fill runs while readers serve the old structure; only
        the final swap below takes the lock.  Rows [built_g, count) stay
        in the exact tail."""
        from modular_rag_system_tpu.ops.ivf2 import SLAB

        mesh, axis, S = self.mesh, self.axis, self.S
        C = int(centroids.shape[0])
        order, counts = self._order_counts_program(C)(
            labels, jnp.int32(built_g))

        counts_h = np.asarray(counts).astype(np.int64)  # (S, C)
        nblk_h = (counts_h + SLAB - 1) // SLAB
        nbp = max(int(nblk_h.sum(axis=1).max()), 1)
        # clamp like IVF2.build: a small per-shard build must not
        # allocate a 1024-block minimum fine copy
        CHUNK = min(1024, 1 << max(nbp - 1, 1).bit_length())
        nbp = ((nbp + CHUNK - 1) // CHUNK) * CHUNK
        blk_start_h = np.cumsum(nblk_h, axis=1) - nblk_h
        row_start_h = np.cumsum(counts_h, axis=1) - counts_h
        bcluster_h = np.full((S, nbp), C - 1, np.int32)
        for s in range(S):
            bc = np.repeat(np.arange(C, dtype=np.int32), nblk_h[s])
            bcluster_h[s, : len(bc)] = bc

        def shd(*spec):
            return NamedSharding(mesh, P(*spec))

        def zeros(shape, dtype, spec):
            return jax.jit(lambda: jnp.zeros(shape, dtype),
                           out_shardings=shd(*spec))()

        d = self.dim
        fjdt = jnp.int8 if scaled else jnp.bfloat16
        slab_p = SLAB // 2 if fdt == "int4" else SLAB
        E_c = zeros((S, nbp, slab_p, d), fjdt, (axis, None, None, None))
        scales = zeros((S, nbp, SLAB) if scaled else (S, 1, 1),
                       jnp.float32, (axis, None, None))
        perm = jax.jit(lambda: jnp.full((S, nbp * SLAB), -1, jnp.int32),
                       out_shardings=shd(axis, None))()
        inv = jax.jit(
            lambda: jnp.full((S, self.cap_s + 1), -1, jnp.int32),
            out_shardings=shd(axis, None))()
        to_dev = lambda a, spec: jax.device_put(
            jnp.asarray(a, jnp.int32), shd(*spec))
        bstart_d = to_dev(blk_start_h, (axis, None))
        rstart_d = to_dev(row_start_h, (axis, None))
        counts_d = to_dev(counts_h, (axis, None))
        nblk_d = to_dev(nblk_h, (axis, None))
        bclus_d = to_dev(bcluster_h, (axis, None))

        fill = self._fill_program(CHUNK, fdt)
        for lo in range(0, nbp, CHUNK):
            E_c, scales, perm, inv = fill(
                E_c, scales, perm, inv, self.E, order, counts_d,
                bstart_d, rstart_d, bclus_d, centroids, jnp.int32(lo))
        with self._lock:
            self._ivf2 = _ShardedIVF2(
                centroids=centroids, E_c=E_c,
                scales=scales if scaled else None, perm=perm, inv_perm=inv,
                blk_start=bstart_d, nblk=nblk_d, counts=counts_d,
                nblk_h=nblk_h, built=built_g, fine_dtype=fdt,
                version=self.ivf_rebuilds, block_cluster=bclus_d)
            self.ivf_rebuilds += 1
            # evict search programs compiled against the superseded
            # build: search_core keys are (Qp, k) + search_token(k) with
            # the tier at position 2 and the old iv.version baked in at
            # position 6 — none can be hit again after the version bump
            stale = [kk for kk in self._search_cache
                     if isinstance(kk, tuple) and len(kk) > 2
                     and kk[2] == "ivf"]
            for kk in stale:
                del self._search_cache[kk]

    def _ivf2_update_rows(self, s_idx, j_idx, mat) -> None:
        """O(batch) fine-copy sync for set/delete of BUILT rows."""
        iv = self._ivf2
        if iv is None:
            return
        g = np.asarray(s_idx) + np.asarray(j_idx) * self.S
        mask = g < iv.built
        if not mask.any():
            return
        si = jnp.asarray(np.asarray(s_idx)[mask], jnp.int32)
        ji = jnp.asarray(np.asarray(j_idx)[mask], jnp.int32)
        vals = jnp.asarray(np.asarray(mat, np.float32)[mask])
        iv.E_c, iv.scales = _ivf2_scatter(
            iv.E_c, iv.scales if iv.scales is not None
            else jnp.zeros((1, 1, 1), jnp.float32),
            iv.inv_perm, si, ji, vals, iv.fine_dtype, iv.centroids,
            iv.block_cluster)
        if iv.fine_dtype == "bf16":
            iv.scales = None
        iv.stale_rows += int(mask.sum())

    def _build_ivf2_search(self, Qp: int, k: int):
        """One jitted shard_map program: per-shard ivf2 core (fine
        kernel + exact tail + master rescore) -> ICI merge."""
        from modular_rag_system_tpu.ops.ivf2 import ivf2_search_core

        iv = self._ivf2
        S, axis, mesh = self.S, self.axis, self.mesh
        nprobe = min(self.ivf_nprobe, iv.counts.shape[1])
        refine_extra = self.ivf_refine_extra
        L = max(int(np.sort(iv.nblk_h, axis=1)[:, ::-1][:, :nprobe].sum(axis=1).max()), 1)
        from modular_rag_system_tpu.ops.ivf2 import auto_u
        U = auto_u(L)
        L = ((L + U - 1) // U) * U
        tail_s = self._ivf_tail_s()
        interpret = _use_interpret()
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        hierarchical = isinstance(axis, tuple)

        def body(E_blk, Ec, sc, pm, bs, nb, cn, cents, built_g,
                 count_g, q):
            sid = jax.lax.axis_index(axes[0])
            for a in axes[1:]:
                sid = sid * mesh.shape[a] + jax.lax.axis_index(a)
            built_s = jnp.maximum(0, (built_g - sid + S - 1) // S)
            count_s = jnp.maximum(0, (count_g - sid + S - 1) // S)
            vals, lrow = ivf2_search_core(
                E_blk[0], Ec[0], sc[0], pm[0], cents, bs[0], nb[0],
                cn[0], built_s, count_s, q, k=k, nprobe=nprobe, L=L,
                tail_max=tail_s, U=U, interpret=interpret,
                refine_extra=refine_extra)
            gids = jnp.where(lrow >= 0, lrow * S + sid,
                             np.int32(2**31 - 1))
            vals = jnp.where(lrow >= 0, vals, -jnp.inf)

            if hierarchical:
                dcn_ax, ici_ax = axis
                vals, gids = _gather_merge(
                    vals, gids, ici_ax,
                    min(k, mesh.shape[ici_ax] * k), deep=True)
                return _gather_merge(vals, gids, dcn_ax, k, deep=True)
            return _gather_merge(vals, gids, axis, k, deep=True)

        sp3 = P(axis, None, None)
        fn = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(sp3, P(axis, None, None, None), sp3,
                      P(axis, None), P(axis, None), P(axis, None),
                      P(axis, None), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        return fn

    # ------------------------------------------------------------------
    def _build_search(self, Qp: int, k: int, tier: Optional[str] = None):
        """One jitted shard_map program: local top-k + all_gather merge.

        ``tier`` overrides ``self.tier`` (used by the ivf tier's exact
        fallback below the build threshold)."""
        S, axis = self.S, self.axis
        tier = tier or self._effective_tier(k)
        cap_s, block_rows = self.cap_s, min(self.block_rows, self.cap_s)
        bin_width = self.fused_bin_width
        interpret = _use_interpret()

        hierarchical = isinstance(axis, tuple)

        def _shard_id():
            if hierarchical:
                dcn_ax, ici_ax = axis
                ici_size = self.mesh.shape[ici_ax]
                return jax.lax.axis_index(dcn_ax) * ici_size + jax.lax.axis_index(ici_ax)
            return jax.lax.axis_index(axis)

        def local_and_merge(E_s, scales_s, master_s, count, q):
            E_s = E_s[0]  # (cap_s, d)
            s = _shard_id()
            count_s = jnp.maximum(0, (count - s + S - 1) // S)
            if tier == "exact":
                scores = jnp.dot(q, E_s.T,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                col = jax.lax.broadcasted_iota(jnp.int32, (1, cap_s), 1)
                scores = jnp.where(col < count_s, scores, -jnp.inf)
                vals, loc = jax.lax.top_k(scores, k)
                loc = loc.astype(jnp.int32)
            elif tier in ("fused", "bf16"):
                from modular_rag_system_tpu.ops.binmax_topk import (
                    _MIN_TWOPASS_CAP,
                    auto_bin_width,
                    twopass_topk_raw,
                )
                from modular_rag_system_tpu.ops.fused_topk import _max_block_rows

                bw = auto_bin_width(cap_s)
                if (bin_width is None and cap_s >= _MIN_TWOPASS_CAP
                        and cap_s // bw >= k + 1):
                    # exact two-pass kernel per shard (2.1x single-pass);
                    # ids/ties identical, so the ICI merge is unchanged
                    br = min(max(block_rows, 4096), cap_s,
                             _max_block_rows(E_s.shape[1], E_s.dtype))
                    vals, loc = twopass_topk_raw(
                        E_s, count_s, q, k, br, bw, interpret,
                    )
                else:
                    vals, loc = fused_topk_raw(
                        E_s, count_s, q, k, block_rows, interpret,
                        bin_width=bin_width,
                    )
            elif tier == "int8":
                from modular_rag_system_tpu.ops.binmax_topk import (
                    _MIN_TWOPASS_CAP,
                    auto_bin_width,
                    int8_refine_kf,
                    refine_against_master,
                    twopass_topk_int8_master_raw,
                )
                from modular_rag_system_tpu.ops.fused_topk import _max_block_rows

                # merged results must carry MASTER-exact similarities
                # (the ICI merge compares scores across shards): mixed
                # two-pass when it pays — int8 pass-1 selects bins,
                # pass-2 rescans this shard's master slabs — else int8
                # over-select + a (Q, kf) master rescore
                bw = auto_bin_width(cap_s)
                if (bin_width is None and cap_s >= _MIN_TWOPASS_CAP
                        and cap_s // bw >= k + 1):
                    # int8 pass-1 tiles stay 1 byte/elem in VMEM (the
                    # binmax kernel dots int8 x int8 -> int32, no bf16
                    # widening), so 2x the bf16 row budget fits and the
                    # bigger DMA measures faster (see index.py twin
                    # comment + tools/exp_int8_pass1_sweep.py)
                    br = min(max(block_rows, 8192), cap_s,
                             2 * _max_block_rows(E_s.shape[1],
                                                 jnp.bfloat16))
                    vals, loc = twopass_topk_int8_master_raw(
                        E_s, scales_s.reshape(-1), master_s[0], count_s,
                        q, k, br, bw, interpret,
                    )
                else:
                    kf = int8_refine_kf(k, cap_s)
                    vals, loc = fused_topk_int8_raw(
                        E_s, scales_s, count_s, q, kf, block_rows, interpret,
                        bin_width=bin_width,
                    )
                    if kf > k:
                        vals, loc = refine_against_master(
                            master_s[0], q, loc, k, cand_vals=vals)
            else:
                raise ValueError(f"unknown tier {tier!r}")
            gids = loc * S + s
            gids = jnp.where(jnp.isfinite(vals), gids, np.int32(2**31 - 1))

            if hierarchical:
                dcn_ax, ici_ax = axis
                # stage 1: merge chips within the slice over ICI
                vals, gids = _gather_merge(vals, gids, ici_ax, k)
                # stage 2: only k candidates per slice cross DCN
                return _gather_merge(vals, gids, dcn_ax, k)
            return _gather_merge(vals, gids, axis, k)

        # tuple axis shards dim 0 over both mesh axes -> per-shard block
        # is (1, cap_s, d) in both the flat and hierarchical cases.  The
        # third operand (master rows for the int8 refine) is a dummy
        # (S, 1, 1) for the other tiers.
        in_specs = (P(axis, None, None), P(axis, None),
                    P(axis, None, None), P(), P())
        fn = jax.shard_map(
            local_and_merge,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def count_device(self):
        """Cached device count scalar (a fresh one costs a host->device
        transfer per query over the relay)."""
        if self._count_dev is None:
            self._count_dev = jnp.int32(self.count)
        return self._count_dev

    def query_pad_multiple(self) -> int:
        """Sublane multiple queries must pad to for the current tier."""
        return 16 if self._resolved_tier() == "int8" else 8

    def _dummy3(self):
        if (getattr(self, "_dummy3_arr", None) is None):
            self._dummy3_arr = jax.device_put(
                jnp.zeros((self.S, 1, 1), jnp.float32),
                NamedSharding(self.mesh, P(self.axis, None, None)),
            )
        return self._dummy3_arr

    def _resolved_tier(self) -> str:
        """Resolve ``tier="auto"`` (mirrors ``DeviceIndex.effective_tier``):
        int8 mixed below the measured ANN crossover, ivf at/above
        (GLOBAL count — the trade is about total bytes scanned)."""
        from modular_rag_system_tpu.index import DeviceIndex

        if self.tier != "auto":
            return self.tier
        return ("ivf" if self.count >= DeviceIndex._AUTO_IVF_ROWS
                else "int8")

    def _effective_tier(self, k: int) -> str:
        """ivf serves the exact stream below the build threshold or at
        deep-refill k (the in-kernel running selection would not fit)."""
        if k > self.cap_s:
            # EVERY per-shard selection — the Pallas kernels and the
            # plain ``lax.top_k`` exact branch alike — can surface at
            # most cap_s candidates per shard, so the compiled program
            # would raise at trace time for k > cap_s.  Deeper k (the
            # engine's filtered-refill escalation) runs the any-k deep
            # program: per-shard top-cap_s + two-key-sort merge, global
            # k up to S * cap_s.
            return "deep"
        tier = self._resolved_tier()
        if tier == "ivf" and (self._ivf2 is None or k > 64):
            return "exact"
        return tier

    def search_ops(self, tier: Optional[str] = None) -> Tuple:
        """Tier-correct operand tuple for search_core; hold _lock."""
        tier = tier or self._effective_tier(1)
        if tier == "ivf":
            iv = self._ivf2
            sc = (iv.scales if iv.scales is not None else self._dummy3())
            if getattr(iv, "_built_dev", None) is None:
                # cached like count_device(): a fresh jnp.int32 per
                # search is a host->device transfer on every query
                iv._built_dev = jnp.int32(iv.built)
            return (self.E, iv.E_c, sc, iv.perm, iv.blk_start, iv.nblk,
                    iv.counts, iv.centroids, iv._built_dev)
        if tier == "int8":
            self._refresh_quant()
            return (self._E_q, self._scales, self.E)
        if self._dummy_scales is None or self._dummy_scales.shape[1] != self.cap_s:
            self._dummy_scales = jax.device_put(
                jnp.zeros((self.S, self.cap_s), jnp.float32),
                self._scale_sharding,
            )
        if tier == "bf16" and self.store_dtype != "bfloat16":
            if self._E_bf16 is None:
                self._E_bf16 = jax.jit(
                    lambda e: e.astype(jnp.bfloat16),
                    out_shardings=self._row_sharding,
                )(self.E)
                self.derived_rebuilds += 1
            return (self._E_bf16, self._dummy_scales, self._dummy3())
        return (self.E, self._dummy_scales, self._dummy3())

    def _ivf_tail_s(self) -> int:
        tail = self.count - self._ivf2.built
        return 0 if tail <= 0 else min(
            max(8192, _next_pow2((tail + self.S - 1) // self.S)), self.cap_s)

    def search_token(self, k: int = 1) -> Tuple:
        tier = self._effective_tier(k)
        t = (tier, self.cap_s, self.fused_bin_width, self.store_dtype)
        if tier == "ivf":
            iv = self._ivf2
            t += (iv.version, iv.fine_dtype, self._ivf_tail_s(),
                  self.ivf_nprobe, self.ivf_refine_extra,
                  self.ivf_balance)
        return t

    def search_core(self, Qp: int, k: int):
        """fn(ops, count, q) for the current tier/state, cached+jitted.

        Also the engine's fused encode+search entry (VERDICT r2 item 8:
        the ivf tier now rides the same one-dispatch program)."""
        tier = self._effective_tier(k)
        key = (Qp, k) + self.search_token(k)
        fn = self._search_cache.get(key)
        if fn is None:
            if len(self._search_cache) > 64:
                self._search_cache.clear()
            if tier == "ivf":
                fn = self._build_ivf2_search(Qp, k)
            elif tier == "deep":
                # any-k exact: ops carry (E, dummy_scales, dummy3); the
                # deep program wants E only.  Pad up to the caller's k
                # when even S * cap_s cannot supply it (count <= S*cap_s,
                # so padded slots are genuinely absent rows).
                k_eff = min(k, self.S * self.cap_s)
                deep = self._build_deep_exact(Qp, k_eff)
                if k_eff < k:
                    pad = k - k_eff

                    def fn(E, sc, d3, count, q, _deep=deep, _pad=pad):
                        v, g = _deep(E, count, q)
                        v = jnp.pad(v, ((0, 0), (0, _pad)),
                                    constant_values=-jnp.inf)
                        g = jnp.pad(g, ((0, 0), (0, _pad)),
                                    constant_values=-1)
                        return v, g
                else:
                    def fn(E, sc, d3, count, q, _deep=deep):
                        return _deep(E, count, q)
            else:
                fn = self._build_search(Qp, k, tier=tier)
            self._search_cache[key] = fn
        return lambda ops, count, q: fn(*ops, count, q)

    # ------------------------------------------------------------------
    def _build_deep_exact(self, Qp: int, k: int):
        """Exact any-k search: per-shard plain-XLA top-k (HBM-resident
        scores, no kernel VMEM bound) merged to a GLOBAL k that may
        exceed ``cap_s`` (up to S * cap_s) — the deep filtered-refill
        escape hatch the DeviceIndex path got in round 2 (ADVICE r2)."""
        S, axis, cap_s = self.S, self.axis, self.cap_s
        k_local = min(k, cap_s)
        hierarchical = isinstance(axis, tuple)

        def _shard_id():
            if hierarchical:
                dcn_ax, ici_ax = axis
                ici_size = self.mesh.shape[ici_ax]
                return (jax.lax.axis_index(dcn_ax) * ici_size
                        + jax.lax.axis_index(ici_ax))
            return jax.lax.axis_index(axis)

        def body(E_s, count, q):
            E_s = E_s[0]
            s = _shard_id()
            count_s = jnp.maximum(0, (count - s + S - 1) // S)
            scores = jnp.dot(q, E_s.T,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, cap_s), 1)
            scores = jnp.where(col < count_s, scores, -jnp.inf)
            vals, loc = jax.lax.top_k(scores, k_local)
            gids = loc.astype(jnp.int32) * S + s
            gids = jnp.where(jnp.isfinite(vals), gids, np.int32(2**31 - 1))

            if hierarchical:
                dcn_ax, ici_ax = axis
                n_ici = self.mesh.shape[ici_ax]
                vals, gids = _gather_merge(
                    vals, gids, ici_ax, min(k, n_ici * k_local), deep=True
                )
                return _gather_merge(vals, gids, dcn_ax, k, deep=True)
            return _gather_merge(vals, gids, axis, k, deep=True)

        fn = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(axis, None, None), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def search_deep(self, q: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k with no ``cap_s`` clamp (k up to S * cap_s)."""
        Q = q.shape[0]
        if self.count == 0:
            return (
                np.full((Q, k), -np.inf, np.float32),
                np.full((Q, k), -1, np.int32),
            )
        k_eff = min(k, self.count, self.S * self.cap_s)
        Qp = _round_up(Q, 8)
        qj = jnp.asarray(q, jnp.float32)
        if Qp != Q:
            qj = jnp.pad(qj, ((0, Qp - Q), (0, 0)))
        with self._lock:
            key = ("deep", Qp, k_eff, self.cap_s)
            fn = self._search_cache.get(key)
            if fn is None:
                fn = self._build_deep_exact(Qp, k_eff)
                self._search_cache[key] = fn
            vals, gids = fn(self.E, self.count_device(), qj)
        vals = np.asarray(vals)[:Q]
        gids = np.asarray(gids)[:Q]
        gids = np.where(np.isfinite(vals), gids, -1)
        if k_eff < k:
            vals = np.concatenate(
                [vals, np.full((Q, k - k_eff), -np.inf, np.float32)], axis=1
            )
            gids = np.concatenate(
                [gids, np.full((Q, k - k_eff), -1, np.int32)], axis=1
            )
        return vals, gids

    def search(self, q: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        Q = q.shape[0]
        if self.count == 0:
            return (
                np.full((Q, k), -np.inf, np.float32),
                np.full((Q, k), -1, np.int32),
            )
        # k may exceed cap_s: _effective_tier routes k > cap_s to the
        # any-k deep-exact program (global k up to S * cap_s), so a
        # large k on a small-capacity many-shard mesh is served, not
        # silently clamped (VERDICT r2 weakness 8)
        k_eff = min(k, self.count, self.S * self.cap_s)
        Qp = _round_up(Q, self.query_pad_multiple())
        qj = jnp.asarray(q, jnp.float32)
        if Qp != Q:
            qj = jnp.pad(qj, ((0, Qp - Q), (0, 0)))
        with self._lock:
            # snapshot + dispatch under the lock: a concurrent add()
            # donates the old E buffer and mutates the ivf2 structure
            tier = self._effective_tier(k_eff)
            fn = self.search_core(Qp, k_eff)
            ops = self.search_ops(tier)
            vals, gids = fn(ops, self.count_device(), qj)
        vals = np.asarray(vals)[:Q]
        gids = np.asarray(gids)[:Q]
        gids = np.where(np.isfinite(vals), gids, -1)
        if k_eff < k:
            vals = np.concatenate(
                [vals, np.full((Q, k - k_eff), -np.inf, np.float32)], axis=1
            )
            gids = np.concatenate(
                [gids, np.full((Q, k - k_eff), -1, np.int32)], axis=1
            )
        return vals, gids

    # ------------------------------------------------------------------
    def snapshot(self, path: str) -> None:
        """Persist live rows, mirroring ``DeviceIndex.snapshot``: saved in
        the stored dtype (bf16 halves the device->host fetch, the dominant
        cost) and uncompressed (zlib on GB-scale near-random mantissas
        costs minutes and saves almost nothing)."""
        with self._lock:
            phys = np.asarray(self.E)  # (S, cap_s, d) in store dtype
            count = self.count
            extra = {}
            iv = self._ivf2
            if iv is not None and iv.built > 0:
                # centroids + per-row labels are tiny next to the rows
                # and let a restore warm-start the rebuild (skip k-means)
                extra = {"ivf_centroids": np.asarray(iv.centroids,
                                                     np.float32),
                         "ivf_labels": iv.labels_host_global(self.S)}
        glob = phys.transpose(1, 0, 2).reshape(self.capacity, self.dim)
        live = np.ascontiguousarray(glob[:count])
        if self.store_dtype == "bfloat16":
            np.savez(path, embeddings_bf16=live.view(np.uint16),
                     count=count, dim=self.dim, **extra)
        else:
            np.savez(path, embeddings=live, count=count, dim=self.dim,
                     **extra)

    @classmethod
    def load(cls, path: str, mesh=None, tier: str = "exact", **tier_kwargs):
        """Rebuild a sharded index from a ``snapshot()`` file.

        ``tier_kwargs`` passes through EVERY constructor knob (see
        ``DeviceIndex.load``: block_rows, fused_bin_width, all ivf_*
        including fine_dtype/tail_frac/rebuild_min/balance); restoring an
        engine-built snapshot should pass the engine's config values.
        ``store_dtype`` is inferred from the snapshot itself."""
        from modular_rag_system_tpu.index import snapshot_embeddings

        data = np.load(path)
        store_dtype = "bfloat16" if "embeddings_bf16" in data else "float32"
        idx = cls(
            dim=int(data["dim"]),
            mesh=mesh,
            capacity=max(int(data["count"]), 4096),
            tier=tier,
            store_dtype=store_dtype,
            **tier_kwargs,
        )
        if "ivf_centroids" in data:
            # consumed by the threshold rebuild inside add()
            idx.ivf_warmstart = (data["ivf_centroids"], data["ivf_labels"])
        try:
            if int(data["count"]):
                idx.add(np.asarray(
                    snapshot_embeddings(data)[: int(data["count"])],
                    dtype=np.float32,
                ))
        finally:
            idx.ivf_warmstart = None  # never survive a failed restore
        return idx

    def memory_bytes(self) -> int:
        itemsize = 4 if self.store_dtype == "float32" else 2
        b = self.capacity * self.dim * itemsize
        if self._E_q is not None:
            b += self.capacity * self.dim + self.capacity * 4
        return b


class _ShardedIVF2:
    """Per-shard cluster-contiguous IVF structure (see ``ops/ivf2``).

    All arrays are mesh-sharded on their leading S dimension; tables are
    per shard over the SAME global C clusters.  ``built`` counts GLOBAL
    rows; each shard's local built prefix is derived at trace time."""

    def __init__(self, centroids, E_c, scales, perm, inv_perm, blk_start,
                 nblk, counts, nblk_h, built: int, fine_dtype: str,
                 version: int, block_cluster=None) -> None:
        self.centroids = centroids
        self.block_cluster = block_cluster  # (S, nbp) i32 block -> cluster
        self.E_c = E_c              # (S, nbp, SLAB, d)
        self.scales = scales        # (S, nbp, SLAB) f32 | None
        self.perm = perm            # (S, nbp * SLAB) i32 local rows
        self.inv_perm = inv_perm    # (S, cap_s + 1) i32 local row -> slot
        self.blk_start = blk_start  # (S, C) i32
        self.nblk = nblk            # (S, C) i32
        self.counts = counts        # (S, C) i32
        self.nblk_h = nblk_h        # host copy for L computation
        self.built = int(built)
        self.fine_dtype = fine_dtype
        self.version = int(version)
        self.stale_rows = 0

    def labels_host_global(self, S: int) -> np.ndarray:
        """Reconstruct GLOBAL per-row cluster labels for rows
        [0, built) from the per-shard slot permutations (global row g
        lives on shard g % S at position g // S) — saved by snapshot()
        next to the centroids for warm-start restore."""
        from modular_rag_system_tpu.ops.ivf2 import SLAB

        perm_h = np.asarray(self.perm)  # (S, nbp * SLAB)
        C = self.nblk_h.shape[1]
        labels = np.full(self.built, -1, np.int32)
        for s in range(S):
            bc = np.repeat(np.arange(C, dtype=np.int32),
                           self.nblk_h[s].astype(np.int64))
            slots = np.nonzero(perm_h[s] >= 0)[0]
            g = perm_h[s][slots].astype(np.int64) * S + s
            keep = g < self.built
            labels[g[keep]] = bc[slots[keep] // SLAB]
        return labels


from functools import partial  # noqa: E402


@partial(jax.jit, donate_argnums=(0, 1), static_argnames=("fine_dtype",))
def _ivf2_scatter(E_c, scales, inv_perm, s_idx, j_idx, vals,
                  fine_dtype: str, centroids=None, block_cluster=None):
    """O(batch) fine-copy scatter through the per-shard inverse perm.

    Masked entries (slot < 0) are redirected OUT OF BOUNDS and dropped
    instead of writing a pre-gathered old value back at a dummy index
    (duplicate scatter indices race real updates — see
    ``ops.ivf2._scatter_slots``)."""
    from modular_rag_system_tpu.ops.ivf2 import SLAB, _int4_nibble_rmw

    nb = E_c.shape[1]
    slots = inv_perm[s_idx, j_idx]
    ok = slots >= 0
    b = jnp.where(ok, slots // SLAB, nb)  # out of bounds -> dropped
    r = jnp.where(ok, slots % SLAB, 0)
    if fine_dtype == "int8":
        from modular_rag_system_tpu.ops.quantize import quantize_rows_jit

        qv, sc = quantize_rows_jit(vals)
        E_c = E_c.at[s_idx, b, r].set(qv, mode="drop")
        scales = scales.at[s_idx, b, r].set(sc[:, 0], mode="drop")
    elif fine_dtype == "int4":
        S2 = E_c.shape[2]  # SLAB // 2
        bsafe = jnp.minimum(b, nb - 1)
        cen = centroids[block_cluster[s_idx, bsafe]].astype(jnp.float32)
        x = vals.astype(jnp.float32) - jnp.where(ok[:, None], cen, 0.0)
        absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        sc = absmax / 7.0
        safe = jnp.where(sc > 0, sc, 1.0)
        qv = jnp.clip(jnp.round(x / safe), -7, 7).astype(jnp.int32)
        pr = r % S2
        is_hi = r < S2
        for hi in (True, False):
            sel = ok & (is_hi == hi)
            bytes_new = _int4_nibble_rmw(E_c[s_idx, bsafe, pr], qv, sel, hi)
            E_c = E_c.at[s_idx, jnp.where(sel, b, nb), pr].set(
                bytes_new, mode="drop")
        scales = scales.at[s_idx, b, r].set(sc[:, 0], mode="drop")
    else:
        E_c = E_c.at[s_idx, b, r].set(vals.astype(E_c.dtype), mode="drop")
    return E_c, scales


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(E_phys, s_idx, j_idx, batch):
    """In-place (donated) row scatter — readers snapshot AND dispatch
    under the index lock, so donation can't invalidate an in-flight use."""
    return E_phys.at[s_idx, j_idx].set(batch)


@partial(jax.jit, donate_argnums=(0,))
def _scatter_scales(scales, s_idx, j_idx, vals):
    return scales.at[s_idx, j_idx].set(vals)
