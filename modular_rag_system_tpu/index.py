"""DeviceIndex — a growable HBM-resident embedding matrix.

The TPU-native replacement for the reference's vector store backends
(ChromaDB / SQLite-with-pickled-blobs, ``ollama_rag_system.py:225-554``):
embeddings live in device memory as one (capacity, d) matrix; append is a
donated ``dynamic_update_slice`` (no host round-trip per doc, no full
re-allocation — capacity doubles amortized, SURVEY §7 hard-part (d));
search dispatches to the configured tier.

Row ids are dense append order and match ``DocumentStore.row_idx``.
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modular_rag_system_tpu.ops import exact as exact_ops


def snapshot_embeddings(data) -> np.ndarray:
    """Decode a snapshot's embedding matrix (f32 or bf16-as-uint16)."""
    if "embeddings_bf16" in data:
        import ml_dtypes

        return data["embeddings_bf16"].view(ml_dtypes.bfloat16)
    return data["embeddings"]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


class DeviceIndex:
    """Single-device index. The mesh-sharded variant lives in

    ``parallel/sharded.py`` and reuses the same tiers per shard."""

    def __init__(
        self,
        dim: int,
        capacity: int = 4096,
        tier: str = "exact",
        block_rows: int = 1024,
        ivf_clusters: Optional[int] = None,
        ivf_nprobe: int = 8,
        ivf_iters: int = 10,
        fused_bin_width: Optional[int] = None,
        store_dtype: str = "float32",
        ivf_fine_dtype: str = "auto",
        ivf_tail_frac: float = 0.25,
        ivf_rebuild_min: int = 32768,
        ivf_refine_extra: Optional[int] = None,
        ivf_balance: float = 0.0,
    ) -> None:
        """``store_dtype="bfloat16"`` halves the master matrix's HBM
        footprint (10M x 384 fits one v5e chip at 7.7 GB vs 15.4 GB f32);
        recall@10 vs f32 is ~1.0 and all tiers work unchanged (matmuls
        upcast per tier rules; the bf16 tier then needs no extra copy)."""
        self.dim = dim
        self.tier = tier
        self.block_rows = block_rows
        self.fused_bin_width = fused_bin_width
        self.ivf_clusters = ivf_clusters
        self.ivf_nprobe = ivf_nprobe
        self.ivf_iters = ivf_iters
        if store_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"store_dtype must be float32|bfloat16, got {store_dtype}")
        self.store_dtype = store_dtype
        self._jdtype = jnp.float32 if store_dtype == "float32" else jnp.bfloat16
        self.capacity = _next_pow2(max(capacity, 1024))
        self.count = 0
        self._lock = threading.RLock()
        # Write gate: held by every WRITER (add/set_rows/delete_rows)
        # and across build_ann's heavy k-means+fill phase.  Writers must
        # be excluded while the build reads E unlocked (append_rows
        # DONATES the buffer — a concurrent add would invalidate it
        # under the running k-means), but READERS never mutate and keep
        # serving the old structure + exact tail throughout.  Lock
        # order: _build_gate -> _lock, never the reverse.
        self._build_gate = threading.RLock()
        self.E = jnp.zeros((self.capacity, dim), dtype=self._jdtype)
        # Derived tier copies.  Invariant: when non-None they are IN SYNC
        # with E — writes update them incrementally (O(batch), not
        # O(capacity)); capacity growth drops them to None for a lazy
        # full rebuild at next use (VERDICT r1 item 7).
        self._E_q: Optional[jax.Array] = None  # (capacity, d) int8
        self._scales: Optional[jax.Array] = None  # (capacity, 1) f32
        self._E_bf16: Optional[jax.Array] = None  # (capacity, d) bf16
        self._count_dev: Optional[jax.Array] = None  # cached device scalar
        # observability: incremental rows maintained vs full rebuilds
        self.derived_incremental_rows = 0
        self.derived_rebuilds = 0
        # ivf tier state (ops/ivf2): INCREMENTAL — writes never
        # invalidate the build (VERDICT r2 item 2).  Appended rows live
        # in an exact-scanned tail; a rebuild folds them in, triggered
        # from the write path when the tail passes the threshold below.
        self.ivf_fine_dtype = ivf_fine_dtype
        # pending snapshot warm start (centroids, labels) — consumed by
        # the next build_ann (set by load()/engine restore)
        self.ivf_warmstart = None
        self.ivf_tail_frac = ivf_tail_frac
        self.ivf_rebuild_min = ivf_rebuild_min
        self.ivf_refine_extra = ivf_refine_extra
        self.ivf_balance = ivf_balance
        self.ivf_rebuilds = 0
        self._ivf2 = None
        # compiled search programs, keyed by (Q, k) + search_token()
        self._core_cache: dict = {}

    # ------------------------------------------------------------------
    def add(self, mat: np.ndarray) -> Tuple[int, int]:
        """Append (n, d) rows; returns (first_row, n)."""
        n = int(mat.shape[0])
        if n == 0:
            return self.count, 0
        if mat.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: {mat.shape[1]} != {self.dim}")
        with self._build_gate:
            return self._add_gated(mat, n)

    def _add_gated(self, mat, n: int) -> Tuple[int, int]:
        with self._lock:
            first = self.count
            self._ensure_capacity(self.count + n)
            # pad to pow2 row-chunks to bound jit recompiles across batch sizes
            padded = _next_pow2(n)
            if self.count + padded > self.capacity:
                self._ensure_capacity(self.count + padded)
            if isinstance(mat, jax.Array):
                # device-resident ingest path: pad on device, no host copy
                buf = jnp.zeros((padded, self.dim), self._jdtype)
                buf = jax.lax.dynamic_update_slice(
                    buf, mat.astype(self._jdtype), (0, 0)
                )
            else:
                host = np.zeros((padded, self.dim), dtype=np.float32)
                host[:n] = mat
                buf = jnp.asarray(host, dtype=self._jdtype)
            self.E = exact_ops.append_rows(self.E, buf, jnp.int32(self.count))
            self._update_derived_append(buf, self.count)
            self.count += n
            self._count_dev = None
        # threshold rebuild OUTSIDE _lock (gate still held): queries
        # keep serving the old structure + exact tail during the build
        self._maybe_build_ivf2()
        return first, n

    def _ensure_capacity(self, needed: int) -> None:
        if needed <= self.capacity:
            return
        new_cap = _next_pow2(needed)
        old = self.E
        self.E = jnp.zeros((new_cap, self.dim), dtype=self._jdtype)
        self.E = exact_ops.append_rows(self.E, old, jnp.int32(0))
        self.capacity = new_cap
        # shapes changed: derived copies rebuild lazily at next use.
        # The ivf2 structure SURVIVES growth (its fine copy and perm are
        # independent of E's capacity; inv_perm covers the built prefix,
        # which predates the growth) — only its program cache keys on
        # capacity via the tail window.
        self._E_q = self._scales = self._E_bf16 = None

    def delete_rows(self, rows: np.ndarray) -> None:
        if rows.size == 0:
            return
        with self._build_gate:
            with self._lock:
                self.E = exact_ops.zero_rows(
                    self.E, jnp.asarray(rows, dtype=jnp.int32))
                self._update_derived_rows(
                    rows, np.zeros((len(rows), self.dim), np.float32)
                )
                if self._ivf2 is not None:
                    self._ivf2.update_rows(rows, None)  # O(batch) scatter
            # update-only workloads accumulate drift too: without this,
            # stale_rows grows unbounded and the rebuild never fires
            self._maybe_build_ivf2()

    def count_device(self) -> jax.Array:
        """Device-resident count scalar, cached: creating it per search
        cost a host->device transfer (~0.5 ms over the relay) per query."""
        if self._count_dev is None:
            self._count_dev = jnp.int32(self.count)
        return self._count_dev

    def set_rows(self, rows: np.ndarray, mat: np.ndarray) -> None:
        """Overwrite existing rows (e.g. re-ingest of a deleted doc)."""
        if len(rows) == 0:
            return
        with self._build_gate:
            with self._lock:
                self.E = exact_ops.set_rows(
                    self.E,
                    jnp.asarray(rows, dtype=jnp.int32),
                    jnp.asarray(mat, dtype=jnp.float32),
                )
                self._update_derived_rows(rows, mat)
                if self._ivf2 is not None:
                    # O(batch) in-place sync; the row keeps its OLD
                    # cluster until the next rebuild (counted as drift)
                    self._ivf2.update_rows(rows, mat)
            self._maybe_build_ivf2()

    # ------------------------------------------------------------------
    # derived tier maintenance (int8 / bf16 copies of E)
    def _update_derived_append(self, buf: jax.Array, start: int) -> None:
        """Sync derived copies for appended rows [start, start+len(buf)).

        ``buf`` is the padded device batch already cast to the store
        dtype, so incremental quantization sees exactly the values a full
        rebuild from E would."""
        if self._E_q is not None:
            from modular_rag_system_tpu.ops.quantize import quantize_rows_jit

            qv, sc = quantize_rows_jit(buf.astype(jnp.float32))
            self._E_q = exact_ops.append_rows(self._E_q, qv, jnp.int32(start))
            self._scales = exact_ops.append_rows(self._scales, sc, jnp.int32(start))
            self.derived_incremental_rows += int(buf.shape[0])
        if self._E_bf16 is not None and self.store_dtype != "bfloat16":
            self._E_bf16 = exact_ops.append_rows(
                self._E_bf16, buf.astype(jnp.bfloat16), jnp.int32(start)
            )
            self.derived_incremental_rows += int(buf.shape[0])

    def _update_derived_rows(self, rows, mat) -> None:
        """Scatter-sync derived copies for arbitrary rows (set/delete)."""
        if self._E_q is None and self._E_bf16 is None:
            return
        r = np.asarray(rows, dtype=np.int32)
        m = np.asarray(mat, dtype=np.float32)
        # pad to pow2 to bound recompiles; duplicated scatter indices
        # write identical values, so the redundancy is harmless
        padded = _next_pow2(len(r))
        if padded != len(r):
            r = np.concatenate([r, np.repeat(r[:1], padded - len(r))])
            m = np.concatenate([m, np.repeat(m[:1], padded - len(m), axis=0)])
        rj = jnp.asarray(r)
        # round-trip through the store dtype so values match E's rows
        mj = jnp.asarray(m).astype(self._jdtype).astype(jnp.float32)
        if self._E_q is not None:
            from modular_rag_system_tpu.ops.quantize import quantize_rows_jit

            qv, sc = quantize_rows_jit(mj)
            self._E_q = _scatter_rows_2d(self._E_q, rj, qv)
            self._scales = _scatter_rows_2d(self._scales, rj, sc)
            self.derived_incremental_rows += len(rows)
        if self._E_bf16 is not None and self.store_dtype != "bfloat16":
            self._E_bf16 = _scatter_rows_2d(self._E_bf16, rj, mj.astype(jnp.bfloat16))
            self.derived_incremental_rows += len(rows)

    # ------------------------------------------------------------------
    # Search protocol (shared by DeviceIndex.search AND the engine's
    # fused encode+search program; VERDICT r2 item 8):
    #   search_ops()    tier-correct operand arrays (hold _lock),
    #   search_core(k)  traceable fn(ops, count, q) -> (vals, rows),
    #   search_token()  hashable part that must key any program cache.
    # measured crossover (tools/exp_ivf2_1m.py + the 10M table in
    # benchmarks/README.md): the int8 mixed exact tier wins at <=1M
    # (161k vs ivf's recall-1.0 111k), ivf dominates at 10M (10-14x);
    # promote at 4M rows, where the exact stream has fallen to ~40k QPS
    # ONE measured crossover governs both auto policies (tier=auto's
    # exact->ivf switch AND the auto fine-dtype's bf16->int8 switch);
    # ShardedIndex references it too so the index classes cannot drift
    _AUTO_IVF_ROWS = 4_194_304

    def effective_tier(self) -> str:
        """Resolve ``tier="auto"``: int8 mixed (exact scores, fastest
        <=1M) below ``_AUTO_IVF_ROWS``, ivf at/above.  The switch is a
        property of ``count`` only — promotion happens on the write
        path via ``_maybe_build_ivf2`` and new search programs are
        minted because ``search_token()`` leads with this value."""
        if self.tier != "auto":
            return self.tier
        return "ivf" if self.count >= self._AUTO_IVF_ROWS else "int8"

    def search_ops(self) -> Tuple:
        if self.effective_tier() == "int8":
            if self._E_q is None:
                from modular_rag_system_tpu.ops.quantize import quantize_rows

                self._E_q, self._scales = quantize_rows(self.E)
                self.derived_rebuilds += 1
            # master E rides along for the post-kernel refine rescore
            return (self._E_q, self._scales, self.E)
        if self.effective_tier() == "bf16" and self.store_dtype != "bfloat16":
            if self._E_bf16 is None:
                self._E_bf16 = jax.jit(lambda e: e.astype(jnp.bfloat16))(self.E)
                self.derived_rebuilds += 1
            return (self._E_bf16,)
        if self.effective_tier() == "ivf" and self._ivf2 is not None:
            iv = self._ivf2
            sc3 = (iv.scales3 if iv.scales3 is not None
                   else jnp.zeros((1, 1), jnp.float32))
            if getattr(iv, "_built_dev", None) is None:
                # cached like count_device(): a fresh jnp.int32 per
                # search is a host->device transfer on every query
                iv._built_dev = jnp.int32(iv.built)
            return (self.E, iv.E_c3, sc3, iv.perm, iv.centroids,
                    iv.blk_start, iv.nblk, iv.counts, iv._built_dev)
        return (self.E,)

    def _ivf_tail_max(self) -> int:
        tail = self.count - self._ivf2.built
        return 0 if tail <= 0 else min(
            max(8192, _next_pow2(tail)), self.capacity)

    def search_token(self) -> Tuple:
        t = (self.effective_tier(), self.capacity, self.fused_bin_width,
             self.store_dtype, self.block_rows)
        if self.effective_tier() == "ivf" and self._ivf2 is not None:
            iv = self._ivf2
            t += ("ivf2", iv.version, iv.fine_dtype, self._ivf_tail_max(),
                  self.ivf_nprobe, self.ivf_refine_extra,
                  self.ivf_balance)
        return t

    def search_core(self, k: int):
        """Traceable fn(ops, count, q) for the CURRENT tier/state."""
        tier = self.effective_tier()
        if tier == "ivf" and (self._ivf2 is None or k > 64):
            # below the build threshold — or at deep-refill k, where the
            # fine kernel's unrolled running selection would not fit —
            # the ivf tier serves the exact stream (recall 1.0)
            tier = "fused"
        if tier == "exact":
            def core(ops, count, q):
                from modular_rag_system_tpu.ops.exact import exact_topk_raw

                return exact_topk_raw(ops[0], count, q, k)

            return core
        if tier in ("fused", "bf16"):
            block_rows, bin_width = self.block_rows, self.fused_bin_width

            def core(ops, count, q):
                return stream_search_core(ops[0], count, q, k, block_rows,
                                          bin_width)

            return core
        if tier == "int8":
            block_rows, bin_width = self.block_rows, self.fused_bin_width

            def core(ops, count, q):
                E_q, scales, E_master = ops
                return stream_search_core(
                    E_q, count, q, k, block_rows, bin_width,
                    scales=scales, master=E_master)

            return core
        if tier == "ivf":
            import functools

            from modular_rag_system_tpu.ops import ivf2 as ivf2_ops
            from modular_rag_system_tpu.ops.fused_topk import _use_interpret

            iv = self._ivf2
            nprobe = min(self.ivf_nprobe, iv.n_clusters)
            L = iv.slots_for_nprobe(nprobe)
            U = ivf2_ops.auto_u(L)
            L = ((L + U - 1) // U) * U
            tail_max = self._ivf_tail_max()
            inner = functools.partial(
                ivf2_ops.ivf2_search_core, k=k, nprobe=nprobe, L=L,
                tail_max=tail_max, U=U, interpret=_use_interpret(),
                refine_extra=self.ivf_refine_extra)

            def core(ops, count, q):
                E, E_c3, sc3, perm, cents, bs, nb, cn, built = ops
                return inner(E, E_c3, sc3, perm, cents, bs, nb, cn,
                             built, count, q)

            return core
        raise ValueError(f"unknown index tier {self.tier!r}")

    # ------------------------------------------------------------------
    def search(self, q: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k rows for (Q, d) queries. Returns (scores, rows) as numpy."""
        if self.count == 0:
            Q = q.shape[0]
            return (
                np.full((Q, k), -np.inf, dtype=np.float32),
                np.full((Q, k), -1, dtype=np.int32),
            )
        k_eff = min(k, self.count)
        qj = jnp.asarray(q, dtype=jnp.float32)
        with self._lock:
            key = (qj.shape[0], k_eff) + self.search_token()
            fn = self._core_cache.get(key)
            if fn is None:
                if len(self._core_cache) > 64:
                    self._core_cache.clear()
                fn = jax.jit(self.search_core(k_eff))
                self._core_cache[key] = fn
            scores, rows = fn(self.search_ops(), self.count_device(), qj)
        scores = np.asarray(scores)
        rows = np.asarray(rows)
        if k_eff < k:  # pad to requested k
            pad_s = np.full((q.shape[0], k - k_eff), -np.inf, dtype=scores.dtype)
            pad_r = np.full((q.shape[0], k - k_eff), -1, dtype=rows.dtype)
            scores = np.concatenate([scores, pad_s], axis=1)
            rows = np.concatenate([rows, pad_r], axis=1)
        return scores, rows

    # ------------------------------------------------------------------
    # ivf tier (ops/ivf2): cluster-contiguous fine stage + exact tail
    _IVF_AUTO_INT8_ROWS = _AUTO_IVF_ROWS  # alias: one crossover constant
    # would not fit one v5e's HBM together

    def _maybe_build_ivf2(self) -> None:
        """Write-path rebuild trigger: (re)cluster when the exact tail +
        stale rows pass the threshold.  Queries never rebuild — they
        serve the tail exactly in the meantime (VERDICT r2 item 2)."""
        if self.effective_tier() != "ivf" or self.count == 0:
            return
        built = self._ivf2.built if self._ivf2 else 0
        stale = self._ivf2.stale_rows if self._ivf2 else 0
        pending = self.count - built + stale
        if pending >= max(self.ivf_rebuild_min,
                          int(self.ivf_tail_frac * self.count)):
            self.build_ann()

    def build_ann(self) -> None:
        """(Re)build the clustered structure over the current corpus.

        A pending ``ivf_warmstart`` (set by ``load``/engine restore from
        a snapshot's saved centroids + labels) is consumed ONCE: the
        first build after a restore skips k-means and re-fills the
        contiguous layout directly (measured at 10M on chip: 3.0 s vs
        45.5 s cold, labels fetch 6.0 s at snapshot time); labeled rows
        become the built prefix and any rows beyond them stay in the
        exact tail until the normal threshold rebuild."""
        from modular_rag_system_tpu.ops.ivf2 import IVF2

        with self._build_gate:
            # snapshot a consistent view under the state lock, then run
            # the heavy k-means+fill WITHOUT it: writers are excluded by
            # the gate (E cannot be donated away), readers keep serving
            # the old structure + exact tail for the whole build instead
            # of blocking ~60 s at 10M behind the index lock
            with self._lock:
                E, build_count = self.E, self.count
                fdt = self.ivf_fine_dtype
                if fdt == "auto":
                    fdt = ("int8" if build_count > self._IVF_AUTO_INT8_ROWS
                           else "bf16")
                warm = self.ivf_warmstart
                self.ivf_warmstart = None  # single use
                if warm is not None:
                    cents, labels = warm
                    if (0 < len(labels) <= build_count
                            and cents.shape[1] == self.dim):
                        build_count = len(labels)
                    else:
                        warm = None
            new = IVF2.build(
                E,
                build_count,
                n_clusters=self.ivf_clusters,
                iters=self.ivf_iters,
                nprobe=self.ivf_nprobe,
                fine_dtype=fdt,
                balance=self.ivf_balance,
                warm_start=warm,
            )
            with self._lock:
                new.version = self.ivf_rebuilds
                self._ivf2 = new
                self.ivf_rebuilds += 1
                # evict search programs compiled against the superseded
                # build: their keys carry the old iv.version (and stale
                # tail windows) and can never be hit again — without
                # this they pile up until the >64 clear() evicts the
                # HOT programs too (mirrors ShardedIndex)
                stale = [kk for kk in self._core_cache
                         if isinstance(kk, tuple) and "ivf2" in kk]
                for kk in stale:
                    del self._core_cache[kk]

    # ------------------------------------------------------------------
    def snapshot(self, path: str) -> None:
        """Persist live rows to .npz (SURVEY §5 checkpoint/resume).

        Saved in the stored dtype: the device->host fetch dominates
        snapshot time, and bf16 halves it.  bf16 rows are stored as a
        uint16 bit view (numpy has no native bfloat16).

        A built ivf structure also persists its centroids + per-row
        labels (tiny next to the embeddings), so ``load``/engine restore
        can warm-start the rebuild instead of re-running k-means."""
        with self._lock:
            live = np.asarray(self.E[: self.count])
            extra = {}
            if self._ivf2 is not None and self._ivf2.built > 0:
                extra = {
                    "ivf_centroids": np.asarray(self._ivf2.centroids,
                                                np.float32),
                    "ivf_labels": self._ivf2.labels_host(),
                }
        # uncompressed: zlib on ~GB of float embeddings costs minutes
        # and saves almost nothing (near-random mantissas)
        if self.store_dtype == "bfloat16":
            np.savez(path, embeddings_bf16=live.view(np.uint16),
                     count=self.count, dim=self.dim, **extra)
        else:
            np.savez(path, embeddings=live, count=self.count,
                     dim=self.dim, **extra)

    @classmethod
    def load(cls, path: str, tier: str = "exact",
             **tier_kwargs) -> "DeviceIndex":
        """Rebuild an index from a ``snapshot()`` file.

        ``tier_kwargs`` passes through EVERY constructor knob
        (``block_rows``, ``fused_bin_width``, all ``ivf_*`` including
        ``ivf_fine_dtype``/``ivf_tail_frac``/``ivf_rebuild_min``/
        ``ivf_balance``); unspecified knobs take the CLASS defaults,
        which for ``ivf_balance`` (0.0, classic Lloyd's) differ from the
        product config default (``IndexConfig.ivf_balance=1.5``) — when
        restoring an engine-built snapshot, pass the engine's config
        values to reproduce its build policy.  ``store_dtype`` is
        inferred from the snapshot itself."""
        data = np.load(path)
        dim = int(data["dim"])
        count = int(data["count"])
        store_dtype = "bfloat16" if "embeddings_bf16" in data else "float32"
        idx = cls(dim=dim, capacity=max(count, 4096), tier=tier,
                  store_dtype=store_dtype, **tier_kwargs)
        if "ivf_centroids" in data:
            # the threshold rebuild inside add() consumes this and skips
            # the k-means (see build_ann)
            idx.ivf_warmstart = (data["ivf_centroids"], data["ivf_labels"])
        try:
            if count:
                idx.add(snapshot_embeddings(data)[:count])
        finally:
            idx.ivf_warmstart = None  # never survive a failed restore
        return idx

    def memory_bytes(self) -> int:
        itemsize = 4 if self.store_dtype == "float32" else 2
        b = self.capacity * self.dim * itemsize
        if self._E_q is not None:
            b += self.capacity * self.dim + self.capacity * 4
        return b

    @staticmethod
    def exists_snapshot(path: str) -> bool:  # pragma: no cover - trivial
        return Path(path).exists()


def stream_search_core(E, count, q, k: int, block_rows: int, bin_width,
                       scales=None, master=None):
    """Traceable exact/int8 streaming top-k with automatic kernel choice
    (two-pass binmax when it pays, single-pass otherwise) — the shared
    core behind DeviceIndex.search, the sharded per-shard search, and
    the engine's fused encode+search program.

    ``scales`` non-None selects the int8 kernels (E is then the int8
    matrix with per-row scales).  ``master`` non-None (int8 only) makes
    the returned similarities MASTER-exact: in the two-pass regime via
    the mixed kernel (int8 pass-1 bin selection, pass-2 rescans the
    master slabs — measured 133.9k QPS @ recall 0.9984 / 127.8k @ 1.0
    with the default margin at 1M x 384 Q=256, vs 84.2k @ 0.9941 for
    the r3 over-select+refine chain it replaces); in the single-pass
    fallback via kf over-selection + a (Q, kf) master rescore."""
    from modular_rag_system_tpu.ops.binmax_topk import (
        _MIN_TWOPASS_CAP,
        auto_bin_width,
        int8_refine_kf,
        refine_against_master,
        twopass_topk_int8_master_raw,
        twopass_topk_int8_raw,
        twopass_topk_raw,
    )
    from modular_rag_system_tpu.ops.fused_topk import (
        _max_block_rows,
        _use_interpret,
        fused_topk_int8_raw,
        fused_topk_raw,
    )

    int8 = scales is not None
    cap = E.shape[0]
    bw = auto_bin_width(cap)
    interpret = _use_interpret()
    if bin_width is None and cap >= _MIN_TWOPASS_CAP and cap // bw >= k + 1:
        # int8 pass-1 tiles stay 1 byte/elem IN VMEM (the binmax kernel
        # dots int8 x int8 -> int32 directly, no bf16 widening), so a
        # 2x-bf16-budget tile (8192 rows at d=384 = 3 MB, 6 MB double-
        # buffered) fits the 10 MB budget and the bigger DMA measures
        # faster (tools/exp_int8_pass1_sweep.py: 677 vs 642 GB/s).
        # NOTE: this 2x is NOT safe for kernels that widen the tile
        # (e.g. the single-pass _fused_kernel_int8) — 8192x384 bf16
        # alone is 6 MB before double-buffering.
        br = (min(max(block_rows, 8192), cap,
                  2 * _max_block_rows(E.shape[1], jnp.bfloat16)) if int8
              else min(max(block_rows, 4096), cap,
                       _max_block_rows(E.shape[1], E.dtype)))
        if int8 and master is not None:
            return twopass_topk_int8_master_raw(
                E, scales.reshape(-1), master, count, q, k, br, bw,
                interpret)
        if int8:
            return twopass_topk_int8_raw(
                E, scales.reshape(-1), count, q, k, br, bw, interpret)
        return twopass_topk_raw(E, count, q, k, br, bw, interpret)
    qp = q
    pad_mult = 16 if int8 else 8
    if qp.shape[0] % pad_mult:
        qp = jnp.pad(qp, ((0, pad_mult - qp.shape[0] % pad_mult), (0, 0)))
    br = min(block_rows, cap)
    if int8:
        kf = int8_refine_kf(k, cap) if master is not None else k
        vals, rid = fused_topk_int8_raw(
            E, scales.reshape(1, cap), count, qp, k if master is None
            else kf, br, interpret, bin_width=bin_width)
        if master is not None and kf > k:
            vals, rid = refine_against_master(master, qp, rid, k,
                                              cand_vals=vals)
    else:
        vals, rid = fused_topk_raw(E, count, qp, k, br, interpret,
                                   bin_width=bin_width)
    return vals[: q.shape[0]], rid[: q.shape[0]]


from functools import partial  # noqa: E402


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows_2d(A: jax.Array, rows: jax.Array, vals: jax.Array) -> jax.Array:
    """In-place (donated) row scatter for derived tier copies."""
    return A.at[rows].set(vals)
