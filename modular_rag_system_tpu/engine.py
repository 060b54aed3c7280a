"""RAGEngine — the core retrieval engine.

The TPU-native replacement for the reference's ``RAGSystem``
(``ollama_rag_system.py:557-877``) with its API holes fixed by design:

* ``add_documents(batch)`` is first-class (three reference call sites
  invoked a method that didn't exist — ``enhanced_rag_system.py:1194``,
  ``embedding_pipeline.py:806``, ``run_integrated_rag.py:284``),
* ONE encoder serves both ingest and query (the reference's two embedders
  could emit mismatched dimensions and silently score 0.0,
  ``ollama_rag_system.py:199-222``),
* search covers the whole corpus (no newest-1000 cap,
  ``ollama_rag_system.py:474``),
* ``cleanup_old_documents`` actually deletes (``ollama_rag_system.py:843-850``
  was a logging stub).

Behavioral parity kept: recent-context deque appended to each query's
context (``ollama_rag_system.py:713-717``), rolling average retrieval-time
stats (``:705-710``), enhanced-context builder (``:723-823``), gzip JSON
export (``:852-869``), graceful shutdown (``:871-877``).
"""

from __future__ import annotations

import re
import threading
import time
from collections import Counter, deque
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from modular_rag_system_tpu.chunker import TextChunker
from modular_rag_system_tpu.config import RAGConfig
from modular_rag_system_tpu.index import DeviceIndex, snapshot_embeddings
from modular_rag_system_tpu.models import build_encoder
from modular_rag_system_tpu.store import DocumentStore
from modular_rag_system_tpu.types import Document, Query, RetrievalResult, as_matrix
from modular_rag_system_tpu.utils.resilience import retry_transient

# Tier/knob kwargs shared by DeviceIndex and ShardedIndex.  ONE list,
# readable off an IndexConfig or a live index alike (attribute names
# match 1:1), so adding a knob cannot silently reset it on the
# compact()/reembed_all() rebuild sites — the exact drift bug class
# VERDICT r2 item 7 flagged (compact() dropping ivf_clusters).
_INDEX_TIER_KEYS = (
    "tier", "block_rows", "fused_bin_width", "store_dtype",
    "ivf_clusters", "ivf_nprobe", "ivf_iters", "ivf_fine_dtype",
    "ivf_tail_frac", "ivf_rebuild_min", "ivf_refine_extra", "ivf_balance",
)


def _index_tier_kwargs(src) -> Dict[str, Any]:
    """Constructor kwargs for either index class, from a config or index."""
    return {key: getattr(src, key) for key in _INDEX_TIER_KEYS}


_STOPWORDS = frozenset(
    """a an and are as at be by for from has he in is it its of on that the to was
    were will with this these those i you your we our they them what which who how
    when where why not no yes do does did done can could should would may might
    must shall about into over under again further then once here there all any
    both each few more most other some such only own same so than too very s t
    just don now""".split()
)


class RAGEngine:
    def __init__(self, config: Optional[RAGConfig] = None) -> None:
        self.config = config or RAGConfig()
        if self.config.mesh.multihost:
            # multi-host bring-up FIRST: jax.distributed.initialize must
            # precede any JAX call that initialises the XLA backend (the
            # encoder build below is one), and the mesh defaults derive
            # from the GLOBAL device list it establishes
            # (SURVEY.md:446-451; parallel/multihost.py)
            from modular_rag_system_tpu.parallel.multihost import (
                ensure_multihost,
            )

            ensure_multihost(self.config)
        self.encoder = build_encoder(self.config)
        # one-encoder contract: the index is sized from the ENCODER's
        # output dim (a hybrid dense+lexical encoder is wider than
        # embedding.dim; see models/lexical.py).  Deliberately NOT
        # written back into the config: RAGConfig objects are reused
        # (engine restarts, saved files), and mutating embedding.dim
        # made the next build_encoder fail its arch checks and fall to
        # random init with a drifting dim (round-5 review finding).
        enc_dim = int(getattr(self.encoder, "dim", 0) or self.config.embedding.dim)
        self.embed_dim = enc_dim
        token_counter = getattr(self.encoder, "token_count", None)
        self.chunker = TextChunker(
            chunk_size_tokens=self.config.embedding.chunk_size_tokens,
            overlap_tokens=self.config.embedding.chunk_overlap_tokens,
            token_counter=token_counter,
        )
        self.store = DocumentStore(self.config.store.storage_path)
        if self.config.mesh.index_shards > 1:
            from modular_rag_system_tpu.parallel.mesh import (
                make_hierarchical_index_mesh,
                make_index_mesh,
            )
            from modular_rag_system_tpu.parallel.sharded import ShardedIndex

            if self.config.mesh.dcn_slices > 1:
                n_slices = self.config.mesh.dcn_slices
                if self.config.mesh.index_shards % n_slices:
                    raise ValueError(
                        f"index_shards ({self.config.mesh.index_shards}) must "
                        f"divide by dcn_slices ({n_slices})"
                    )
                mesh = make_hierarchical_index_mesh(
                    n_slices, self.config.mesh.index_shards // n_slices
                )
            else:
                mesh = make_index_mesh(
                    self.config.mesh.index_shards, axis=self.config.mesh.index_axis
                )
            self.index = ShardedIndex(
                dim=enc_dim,
                mesh=mesh,
                capacity=self.config.index.initial_capacity,
                **_index_tier_kwargs(self.config.index),
            )
        else:
            self.index = DeviceIndex(
                dim=enc_dim,
                capacity=self.config.index.initial_capacity,
                **_index_tier_kwargs(self.config.index),
            )
        self.recent_context: deque = deque(
            maxlen=self.config.retrieval.recent_context_size
        )
        self.query_stats: Dict[str, float] = {
            "total_queries": 0,
            "avg_retrieval_time": 0.0,
            "total_documents_added": 0,
        }
        self._snapshot_path = Path(self.config.store.storage_path) / "index.npz"
        # fused encode+search programs, keyed by (Qp, k) — one device
        # dispatch per query batch instead of two (the ~1 ms relay
        # round-trip dominates single-query latency otherwise)
        self._fused_query_cache: Dict = {}
        # cap on live fused encode+search programs (each closure pins a
        # full encoder-params copy); eviction is insertion-order FIFO
        self._FUSED_CACHE_MAX = 16
        # store.upsert + index.add must be atomic together: interleaved
        # writers would desynchronize store rows from index rows
        self._write_lock = threading.RLock()
        self._restore()

    # ------------------------------------------------------------------
    # persistence
    def _restore(self) -> None:
        """Reload the HBM index from snapshot; re-embed any store rows the

        snapshot is missing (checkpoint/resume, SURVEY §5)."""
        n_store = self.store.max_row() + 1
        if self._snapshot_path.exists():
            data = np.load(self._snapshot_path)
            if int(data["dim"]) == self.index.dim and int(data["count"]) <= max(n_store, 0):
                emb = snapshot_embeddings(data)[: int(data["count"])]
                if "ivf_centroids" in data:
                    # warm-start the ivf rebuild triggered inside add():
                    # skip the k-means, keep the snapshot's clustering
                    self.index.ivf_warmstart = (data["ivf_centroids"],
                                                data["ivf_labels"])
                try:
                    if emb.shape[0]:
                        self.index.add(np.asarray(emb, dtype=np.float32))
                finally:
                    # always cleared: a stale warm start surviving a
                    # failed add() could be consumed by a later rebuild
                    # over a DIFFERENT corpus (ADVICE r3)
                    self.index.ivf_warmstart = None
        if self.index.count < n_store:
            # Rebuild missing rows POSITIONALLY, including tombstones:
            # skipping deleted rows would shift every later embedding and
            # desynchronize store rows from index rows.  Deleted rows get
            # zero vectors (dead, exactly as delete_rows leaves them).
            missing: List[Optional[Document]] = []
            for row, doc in self.store.iter_all(include_deleted=True):
                if row >= self.index.count:
                    missing.append(doc)
            if missing:
                live_texts = [d.content for d in missing if d is not None]
                live_mat = self._encode(live_texts)
                mat = np.zeros((len(missing), self.index.dim), np.float32)
                li = 0
                for i, d in enumerate(missing):
                    if d is not None:
                        mat[i] = live_mat[li]
                        li += 1
                self.index.add(mat)
        deleted = self.store.deleted_rows()
        if deleted.size:
            self.index.delete_rows(deleted[deleted < self.index.count])

    def save(self) -> None:
        self.index.snapshot(str(self._snapshot_path))

    # ------------------------------------------------------------------
    # ingest
    def _encode(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.index.dim), np.float32)
        # one call: the encoder batches internally AND pipelines all
        # device dispatches before fetching (per-batch outer calls here
        # would re-serialize every batch on a host<->device round trip)
        return retry_transient(
            lambda: np.asarray(self.encoder.encode(list(texts))),
            what="encoder forward",
        )

    def add_documents(self, docs: Sequence[Document]) -> List[str]:
        """Batch add (pre-embedded or not). Returns ids. Idempotent."""
        docs = list(docs)
        if not docs:
            return []
        emb_dev = None
        if all(d.embedding is None for d in docs) and hasattr(
            self.encoder, "encode_device"
        ):
            # device-resident bulk path: embeddings never touch the host
            # (a 100k-chunk ingest otherwise moves the whole matrix
            # device->host->device through the link twice)
            import jax

            emb_dev = retry_transient(
                # block inside the retried lambda: dispatch is async, so
                # without the sync a transient device error would surface
                # later, outside the retry
                lambda: jax.block_until_ready(
                    self.encoder.encode_device([d.content for d in docs])
                ),
                what="encoder forward",
            )
        else:
            need = [d for d in docs if d.embedding is None]
            if need:
                mat = self._encode([d.content for d in need])
                for d, e in zip(need, mat):
                    d.embedding = e
        with self._write_lock:
            return self._place_documents(docs, emb_dev)

    def _place_documents(self, docs: Sequence[Document], emb_dev=None) -> List[str]:
        placements = self.store.upsert_batch(docs)
        new_pos = [i for i, (_r, status) in enumerate(placements) if status == "new"]
        if new_pos:
            first_new = min(placements[i][0] for i in new_pos)
            if first_new != self.index.count:
                raise RuntimeError(
                    f"store/index row drift: store row {first_new}, "
                    f"index count {self.index.count}"
                )
            if emb_dev is not None:
                import jax.numpy as jnp

                new_mat = (
                    emb_dev
                    if len(new_pos) == len(docs)
                    else emb_dev[jnp.asarray(new_pos)]
                )
            else:
                new_mat = as_matrix(
                    [np.asarray(docs[i].embedding, dtype=np.float32) for i in new_pos],
                    self.index.dim,
                )
            self.index.add(new_mat)
        # re-ingest of previously deleted docs: their index rows were
        # zeroed by delete_rows, so write the fresh embeddings back
        res_pos = [
            i for i, (_r, status) in enumerate(placements) if status == "resurrected"
        ]
        if res_pos:
            res_rows = np.asarray([placements[i][0] for i in res_pos], dtype=np.int64)
            if emb_dev is not None:
                import jax.numpy as jnp

                res_mat = np.asarray(emb_dev[jnp.asarray(res_pos)])
            else:
                res_mat = as_matrix(
                    [np.asarray(docs[i].embedding, dtype=np.float32) for i in res_pos],
                    self.index.dim,
                )
            self.index.set_rows(res_rows, res_mat)
        self.query_stats["total_documents_added"] += len(new_pos)
        return [d.id for d in docs]

    def add_document(
        self,
        content: str,
        metadata: Optional[Dict[str, Any]] = None,
        source: str = "unknown",
        content_type: str = "document",
        importance: float = 1.0,
    ) -> str:
        """Single-doc add (reference ``RAGSystem.add_document``,

        ``ollama_rag_system.py:625``) — thin wrapper over the batch path."""
        doc = Document(
            content=content,
            metadata=metadata or {},
            source=source,
            content_type=content_type,
            importance=importance,
        )
        return self.add_documents([doc])[0]

    def add_text(
        self,
        text: str,
        content_type: str = "document",
        source: str = "unknown",
        metadata: Optional[Dict[str, Any]] = None,
    ) -> List[str]:
        """Chunk + embed + add: the convenience ingest path."""
        chunks = self.chunker.chunk_text(text, content_type)
        docs = [
            Document(
                content=c.text,
                content_type=content_type,
                source=source,
                metadata={
                    **(metadata or {}),
                    "chunk_index": c.index,
                    "chunk_total": c.total,
                },
            )
            for c in chunks
        ]
        return self.add_documents(docs)

    # ------------------------------------------------------------------
    # query
    def query(
        self,
        query_text: str,
        context: Optional[Dict[str, Any]] = None,
        max_results: Optional[int] = None,
        source_filters: Optional[List[str]] = None,
        similarity_threshold: Optional[float] = None,
        time_weight: Optional[float] = None,
    ) -> RetrievalResult:
        r = self.config.retrieval
        q = Query(
            text=query_text,
            context=dict(context or {}),
            max_results=max_results if max_results is not None else r.max_results,
            similarity_threshold=(
                similarity_threshold
                if similarity_threshold is not None
                else r.similarity_threshold
            ),
            time_weight=time_weight if time_weight is not None else r.time_weight,
            source_filters=source_filters,
        )
        # recent-context attach (reference ``ollama_rag_system.py:698-699``)
        q.context["recent_context"] = list(self.recent_context)[-10:]
        t0 = time.perf_counter()
        result = self._retrieve(q)
        result.retrieval_time = time.perf_counter() - t0
        self._update_query_stats(result.retrieval_time)
        self.recent_context.append(
            {"query": query_text, "timestamp": time.time(), "n_results": len(result.documents)}
        )
        return result

    # ------------------------------------------------------------------
    # fused device query: tokenize on host, then ONE jitted program does
    # encoder forward + top-k search.  EVERY tier of both index kinds —
    # including ivf (VERDICT r2 item 8) — rides the shared search
    # protocol (index.search_ops / search_core / search_token).
    def _device_query(self, texts, k: int):
        from modular_rag_system_tpu.models.encoder import MiniLMEncoder
        from modular_rag_system_tpu.models.lexical import HybridEncoder
        from modular_rag_system_tpu.parallel.sharded import ShardedIndex

        sharded = isinstance(self.index, ShardedIndex)
        # hybrid rides the SAME one-dispatch program: the dense forward
        # runs on device and the (cheap, host-computed) lexical half is
        # passed in as an argument and concatenated on device — a
        # second dispatch for concat would double single-query latency
        hybrid = isinstance(self.encoder, HybridEncoder)
        dense = self.encoder.dense if hybrid else self.encoder
        if not isinstance(dense, MiniLMEncoder):
            return None
        import jax
        import jax.numpy as jnp

        ids, mask = dense.tokenizer.encode_batch(list(texts))
        # crop to the pow-2 sequence bucket: queries are short (~10-60
        # tokens) and the encoder forward at full max_seq_len costs
        # ~8x the search itself at Q=256.  jit retraces per shape, so
        # the cached program handles every bucket; results match the
        # ingest path, which buckets identically (models/encoder.py).
        ids, mask = dense._crop_seq(ids, mask)
        Q = len(texts)
        Qp = 1
        while Qp < Q:
            Qp <<= 1
        if sharded:
            Qp = max(Qp, self.index.query_pad_multiple())
            # k past cap_s rides the any-k deep-exact program inside the
            # same one-dispatch fused query (ShardedIndex._effective_tier
            # routes it); only the absolute S * cap_s bound clamps
            k = min(k, self.index.S * self.index.cap_s)
        if Qp != Q:
            ids = np.pad(ids, ((0, Qp - Q), (0, 0)))
            mask = np.pad(mask, ((0, Qp - Q), (0, 0)))
        lex_q = None
        if hybrid:
            lex_q = self.encoder.lexical.encode(list(texts))
            if Qp != Q:
                lex_q = np.pad(lex_q, ((0, Qp - Q), (0, 0)))
        # params are CLOSED OVER (device constants), not passed per call:
        # marshalling ~100 parameter buffers through the device relay per
        # query dominated single-query latency. sync_encoder()-style param
        # swaps must invalidate via the id() check below.
        params = dense.params
        # Snapshot ops AND dispatch under the index lock: a concurrent
        # add both mutates count and DONATES the old E buffer, so an
        # unlocked reader can pass an already-deleted array handle into
        # the program.  Dispatch is async — in-flight executions pin
        # their input buffers — so only the result fetch happens outside
        # the lock.  search_token() keys everything the compiled program
        # bakes in (tier, capacity, fused_bin_width, ivf build version /
        # tail window, ...) — ADVICE r2.
        with self.index._lock:
            token = (self.index.search_token(k) if sharded
                     else self.index.search_token())
            key = (Qp, k, sharded, id(params), hybrid) + token
            fn = self._fused_query_cache.get(key)
            if fn is not None:
                # LRU refresh: re-insert on hit so the FIFO eviction
                # below removes the LEAST-recently-USED program, not the
                # oldest — without this a steady-state program older
                # than 16 distinct (Qp, k) combinations is evicted and
                # recompiled (~10-30 s remote XLA) on every new key
                self._fused_query_cache.pop(key)
                self._fused_query_cache[key] = fn
            if fn is None:
                # evict programs compiled against superseded params:
                # their closures pin a full model copy each, and their
                # id-keyed entries can never be hit again after
                # sync_encoder()
                stale = [kk for kk in self._fused_query_cache
                         if kk[3] != id(params)]
                for kk in stale:
                    del self._fused_query_cache[kk]
                # bound the cache: search_token() bakes monotone index
                # state (ivf build version, tail window, capacity), so
                # under continuous ingest every rebuild / pow2 tail bump
                # mints a new key and the superseded entry — which pins a
                # full encoder-params copy in HBM — can never be hit
                # again.  Evict in insertion order past the cap.
                while len(self._fused_query_cache) >= self._FUSED_CACHE_MAX:
                    oldest = next(iter(self._fused_query_cache))
                    del self._fused_query_cache[oldest]
                module = dense.module
                inner = (self.index.search_core(Qp, k) if sharded
                         else self.index.search_core(k))
                if hybrid:
                    import math as _math

                    wd = _math.sqrt(1.0 - self.encoder.weight)
                    wl = _math.sqrt(self.encoder.weight)

                    def packed(ops, count, ids, mask, lex):
                        # module output is already unit-norm
                        # (encoder.py:112); concat matches
                        # HybridEncoder.encode exactly
                        q = module.apply({"params": params}, ids, mask)
                        q = jnp.concatenate([wd * q, wl * lex], axis=1)
                        vals, rid = inner(ops, count, q)
                        return jnp.concatenate(
                            [jax.lax.bitcast_convert_type(vals, jnp.int32),
                             rid],
                            axis=1,
                        )
                else:
                    def packed(ops, count, ids, mask):
                        q = module.apply({"params": params}, ids, mask)
                        vals, rid = inner(ops, count, q)
                        # pack (scores, rows) into ONE output: every
                        # device->host fetch is a full relay round trip,
                        # so two fetches double single-query latency.
                        # Pack in INT32 space — bitcasting row ids to f32
                        # makes denormals, which the TPU flushes to zero
                        # (ids silently became 0 at scale; CPU tests
                        # passed because CPU preserves denormals).
                        return jnp.concatenate(
                            [jax.lax.bitcast_convert_type(vals, jnp.int32),
                             rid],
                            axis=1,
                        )

                fn = jax.jit(packed)
                self._fused_query_cache[key] = fn
            if sharded:
                ops = self.index.search_ops(self.index._effective_tier(k))
            else:
                ops = self.index.search_ops()
            args = [ops, self.index.count_device(),
                    jnp.asarray(ids), jnp.asarray(mask)]
            if hybrid:
                args.append(jnp.asarray(lex_q, jnp.float32))
            out_dev = fn(*args)
        out = np.asarray(out_dev)
        scores = out[:Q, :k].view(np.float32)
        rows = out[:Q, k:]
        return scores, rows

    # Refill k escalation bounds: the Pallas kernels keep (Q, k) running
    # selections / candidate sets on-chip and cannot hold arbitrary k (a
    # selective filter escalating k toward index.count would blow the
    # VMEM budget and crash the query), so kernel-path refills stop at
    # _REFILL_KERNEL_MAX and ONE final deep pass runs through the plain
    # XLA exact path (HBM-resident scores, any k) up to _REFILL_EXACT_MAX.
    # Fixed escalation steps also bound recompiles (each distinct k is a
    # new program).
    _REFILL_KERNEL_MAX = 1024
    _REFILL_EXACT_MAX = 16384

    def _next_refill_k(self, k: int) -> Optional[int]:
        if k < min(self._REFILL_KERNEL_MAX, self.index.count):
            return min(k * 4, self._REFILL_KERNEL_MAX, self.index.count)
        if k < min(self._REFILL_EXACT_MAX, self.index.count):
            # deep pass exists for BOTH index kinds: plain XLA exact on a
            # DeviceIndex, per-shard exact top-k + merge on a ShardedIndex
            # (`ShardedIndex.search_deep`) — a selective filter on a mesh
            # must not silently under-return (ADVICE r2, medium).
            return min(self._REFILL_EXACT_MAX, self.index.count)
        return None

    # ------------------------------------------------------------------
    # shared search + post-processing (query and query_batch MUST return
    # identical results for identical inputs — VERDICT r1 item 5)
    def _search_batch(self, texts: List[str], k: int):
        """(scores (Q,k), rows (Q,k), q_emb (Q,d) or None) via the fused
        device program when available, else encode + index.search."""
        if k > self._REFILL_KERNEL_MAX:
            # deep filtered refill: exact XLA path, any k (see above)
            q_emb = np.asarray(self.encoder.encode_queries(texts))
            if isinstance(self.index, DeviceIndex):
                import jax.numpy as jnp

                from modular_rag_system_tpu.ops import exact as exact_ops

                with self.index._lock:
                    scores, rows = exact_ops.exact_topk(
                        self.index.E, self.index.count_device(),
                        jnp.asarray(q_emb, jnp.float32),
                        min(k, self.index.count),
                    )
            else:
                scores, rows = self.index.search_deep(
                    q_emb, min(k, self.index.count)
                )
            return np.asarray(scores), np.asarray(rows), q_emb
        fused = retry_transient(
            lambda: self._device_query(texts, k), what="fused query"
        )
        if fused is not None:
            scores, rows = fused
            return scores, rows, None
        q_emb = np.asarray(self.encoder.encode_queries(texts))
        scores, rows = self.index.search(q_emb, k)
        return scores, rows, q_emb

    def _postprocess_rows(self, q: Query, scores, rows, by_row, now: float):
        """Filter + rank one query's candidate rows exactly as query() does."""
        docs: List[Document] = []
        sims: List[float] = []
        for score, r in zip(scores, rows):
            doc = by_row.get(int(r)) if r >= 0 else None
            if doc is None or not np.isfinite(score):
                continue  # deleted / padded slot
            sim = float(np.clip(score, 0.0, 1.0))  # clamp parity:
            # reference ``calculate_similarity`` clamps to [0,1]
            # (``ollama_rag_system.py:199-222``)
            if sim < q.similarity_threshold:
                continue
            if q.source_filters and doc.source not in q.source_filters:
                continue
            if q.metadata_filters and any(
                doc.metadata.get(mk) != mv for mk, mv in q.metadata_filters.items()
            ):
                continue
            docs.append(doc)
            # recency-weighted ranking score (reference declares
            # ``time_weight`` on RAGQuery, ``ollama_rag_system.py:80``)
            age_days = max(now - doc.timestamp, 0.0) / 86400.0
            recency = float(np.exp(-age_days / 7.0))
            sims.append((1.0 - q.time_weight) * sim + q.time_weight * recency)
        order = np.argsort(sims)[::-1][: q.max_results]
        return [docs[i] for i in order], [sims[i] for i in order]

    def _fetch_by_row(self, rows) -> Dict[int, Document]:
        flat = sorted({int(r) for r in np.asarray(rows).ravel() if r >= 0})
        return {r: d for r, d in zip(flat, self.store.get_by_rows(flat))}

    def _initial_k(self, max_results: int, filters_active: bool) -> int:
        overfetch = self.config.index.overfetch if filters_active else 2
        return min(max(max_results * overfetch, max_results), self.index.count)

    def _retrieve(self, q: Query) -> RetrievalResult:
        if self.index.count == 0:
            return RetrievalResult([], [], None, 0.0, 0)
        filters_active = bool(q.source_filters or q.metadata_filters)
        k = self._initial_k(q.max_results, filters_active)
        while True:
            scores, rows, q_emb = self._search_batch([q.text], k)
            by_row = self._fetch_by_row(rows)
            docs, sims = self._postprocess_rows(
                q, scores[0], rows[0], by_row, time.time()
            )
            # Overfetch-with-refill: a selective source/metadata filter can
            # consume the whole candidate set; rescan deeper rather than
            # silently under-returning (the reference pushed ``where``
            # filters into Chroma, ``ollama_rag_system.py:416-421``).
            # Threshold misses never refill: scores only fall with depth.
            if len(docs) >= q.max_results or not filters_active:
                break
            nk = self._next_refill_k(k)
            if nk is None or nk <= k:
                break
            k = nk
        return RetrievalResult(
            documents=docs,
            similarities=sims,
            query_embedding=q_emb[0] if q_emb is not None else None,
            retrieval_time=0.0,
            total_documents_searched=self.index.count,
        )

    def _update_query_stats(self, dt: float) -> None:
        s = self.query_stats
        n = s["total_queries"]
        s["avg_retrieval_time"] = (s["avg_retrieval_time"] * n + dt) / (n + 1)
        s["total_queries"] = n + 1

    # ------------------------------------------------------------------
    # batch query (the TPU-native addition: many queries, one forward).
    # Same semantics as query(): threshold, source/metadata filters and
    # time_weight all honored, with overfetch-and-refill under filters.
    def query_batch(
        self,
        texts: Sequence[str],
        max_results: int = 5,
        source_filters: Optional[List[str]] = None,
        similarity_threshold: Optional[float] = None,
        time_weight: Optional[float] = None,
        metadata_filters: Optional[Dict[str, Any]] = None,
    ) -> List[RetrievalResult]:
        if self.index.count == 0 or not texts:
            return [RetrievalResult([], [], None, 0.0, 0) for _ in texts]
        r = self.config.retrieval
        queries = [
            Query(
                text=t,
                max_results=max_results,
                similarity_threshold=(
                    similarity_threshold
                    if similarity_threshold is not None
                    else r.similarity_threshold
                ),
                time_weight=time_weight if time_weight is not None else r.time_weight,
                source_filters=source_filters,
                metadata_filters=metadata_filters,
            )
            for t in texts
        ]
        filters_active = bool(source_filters or metadata_filters)
        k = self._initial_k(max_results, filters_active)
        t0 = time.perf_counter()
        while True:
            scores, rows, q_emb = self._search_batch(list(texts), k)
            # ONE store round-trip for all queries' rows (not one per query)
            by_row = self._fetch_by_row(rows)
            now = time.time()
            per_q = [
                self._postprocess_rows(q, scores[qi], rows[qi], by_row, now)
                for qi, q in enumerate(queries)
            ]
            if (
                all(len(docs) >= max_results for docs, _ in per_q)
                or not filters_active
            ):
                break
            nk = self._next_refill_k(k)
            if nk is None or nk <= k:
                break
            k = nk
        dt = time.perf_counter() - t0
        return [
            RetrievalResult(
                docs, sims,
                q_emb[qi] if q_emb is not None else None,
                dt, self.index.count,
            )
            for qi, (docs, sims) in enumerate(per_q)
        ]

    # ------------------------------------------------------------------
    # enhanced context (reference ``get_enhanced_context``,
    # ``ollama_rag_system.py:723-823``)
    def get_enhanced_context(self, query_text: str, max_results: int = 10) -> Dict[str, Any]:
        res = self.query(query_text, max_results=max_results, similarity_threshold=0.0)
        docs = res.documents
        if not docs:
            return {"summary": "No relevant context found.", "documents": [],
                    "temporal_span_days": 0.0, "source_distribution": {},
                    "peak_hours": [], "themes": []}
        ts = [d.timestamp for d in docs]
        span_days = (max(ts) - min(ts)) / 86400.0
        source_dist = dict(Counter(d.source for d in docs))
        hours = Counter(time.localtime(t).tm_hour for t in ts)
        peak_hours = [h for h, _ in hours.most_common(3)]
        words = re.findall(r"[a-zA-Z]{3,}", " ".join(d.content for d in docs).lower())
        themes = [w for w, _ in Counter(w for w in words if w not in _STOPWORDS).most_common(10)]
        summary = (
            f"Found {len(docs)} relevant documents spanning "
            f"{span_days:.1f} days from sources {sorted(source_dist)}. "
            f"Key themes: {', '.join(themes[:5])}."
        )
        return {
            "summary": summary,
            "documents": [d.to_dict() for d in docs],
            "similarities": res.similarities,
            "retrieval_time": res.retrieval_time,
            "total_documents_searched": res.total_documents_searched,
            "temporal_span_days": span_days,
            "source_distribution": source_dist,
            "peak_hours": peak_hours,
            "themes": themes,
        }

    # ------------------------------------------------------------------
    # ops / lifecycle
    def cleanup_old_documents(self, retention_days: Optional[float] = None) -> int:
        days = retention_days if retention_days is not None else self.config.store.retention_days
        if days is None:
            return 0
        n = self.store.delete_older_than(time.time() - days * 86400.0)
        deleted = self.store.deleted_rows()
        if deleted.size:
            self.index.delete_rows(deleted[deleted < self.index.count])
        return n

    def compact(self) -> int:
        """Physically drop deleted rows: renumber the store densely and

        rebuild the device index from the surviving embeddings.  Returns
        the number of rows reclaimed.  (The reference accumulated deleted
        data forever; its cleanup was a no-op stub.)"""
        with self._write_lock:
            return self._compact_locked()

    def _compact_locked(self) -> int:
        before = self.index.count
        # snapshot live embeddings in OLD row order
        self.index.snapshot(str(self._snapshot_path))
        emb = np.asarray(
            snapshot_embeddings(np.load(self._snapshot_path)), dtype=np.float32
        )
        live_old = self.store.compact()
        live_emb = emb[np.asarray(live_old, dtype=np.int64)]
        # rebuild a fresh index of the same class/config
        if hasattr(self.index, "mesh"):
            from modular_rag_system_tpu.parallel.sharded import ShardedIndex

            self.index = ShardedIndex(
                dim=self.index.dim,
                mesh=self.index.mesh,
                capacity=max(len(live_old), 4096),
                **_index_tier_kwargs(self.index),
            )
        else:
            self.index = DeviceIndex(
                dim=self.index.dim,
                capacity=max(len(live_old), 4096),
                **_index_tier_kwargs(self.index),
            )
        if len(live_old):
            self.index.add(live_emb)
        self._fused_query_cache.clear()  # capacity changed
        self.save()
        return before - self.index.count

    def reembed_all(self) -> int:
        """Re-encode every live document with the CURRENT encoder weights

        and rebuild the index.  Required after fine-tuning publishes new
        encoder params (``ContrastiveTrainer.sync_encoder``): old rows
        were embedded in the old space and would no longer be comparable
        to freshly encoded queries.  Returns the number of rows rebuilt.
        """
        with self._write_lock:
            rows: List[int] = []
            texts: List[str] = []
            tombstones: List[int] = []
            for row, doc in self.store.iter_all(include_deleted=True):
                if doc is None:
                    tombstones.append(row)
                else:
                    rows.append(row)
                    texts.append(doc.content)
            n_total = (max(rows + tombstones) + 1) if (rows or tombstones) else 0
            if n_total == 0:
                return 0
            live_mat = self._encode(texts)
            mat = np.zeros((n_total, self.index.dim), np.float32)
            mat[np.asarray(rows, dtype=np.int64)] = live_mat
            if hasattr(self.index, "mesh"):
                from modular_rag_system_tpu.parallel.sharded import ShardedIndex

                self.index = ShardedIndex(
                    dim=self.index.dim,
                    mesh=self.index.mesh,
                    capacity=max(n_total, 4096),
                    **_index_tier_kwargs(self.index),
                )
            else:
                self.index = DeviceIndex(
                    dim=self.index.dim,
                    capacity=max(n_total, 4096),
                    **_index_tier_kwargs(self.index),
                )
            self.index.add(mat)
            if tombstones:
                self.index.delete_rows(np.asarray(tombstones, dtype=np.int64))
            self._fused_query_cache.clear()
            self.save()
            return len(rows)

    def get_system_stats(self) -> Dict[str, Any]:
        return {
            "query_stats": dict(self.query_stats),
            "store": self.store.stats(),
            "index": {
                "tier": self.index.tier,
                "effective_tier": (
                    self.index.effective_tier()
                    if hasattr(self.index, "effective_tier")
                    else self.index._resolved_tier()
                ),
                "count": self.index.count,
                "capacity": self.index.capacity,
                "dim": self.index.dim,
                "memory_bytes": self.index.memory_bytes(),
                "ivf": self._ivf_stats(),
            },
            "encoder": getattr(self.encoder, "name", "unknown"),
            "recent_context_size": len(self.recent_context),
        }

    def _ivf_stats(self) -> Optional[Dict[str, Any]]:
        """Operator-facing ANN-tier state (None when no build exists):
        how much of the corpus is clustered vs exact-tail, drift since
        the build, and rebuild counters — the numbers that explain ivf
        latency/recall behavior in production."""
        # snapshot under the index state lock: count / _ivf2 / rebuild
        # counter move together during a write or a rebuild swap, and
        # built + tail_rows == count is an invariant operators (and
        # tests) rely on
        with self.index._lock:
            iv = getattr(self.index, "_ivf2", None)
            if iv is None:
                return None
            count = self.index.count
            rebuilds = self.index.ivf_rebuilds
            E_c = getattr(iv, "E_c3", None)
            if E_c is None:
                E_c = iv.E_c
            return {
                "fine_dtype": iv.fine_dtype,
                "clusters": int(iv.nblk_h.shape[-1]),
                "built": iv.built,
                "tail_rows": max(count - iv.built, 0),
                "stale_rows": iv.stale_rows,
                "rebuilds": rebuilds,
                "fine_bytes": int(E_c.size) * E_c.dtype.itemsize,
            }

    def export_data(self, path: str) -> str:
        return self.store.export_gzip_json(path)

    def shutdown(self) -> None:
        if self.config.store.snapshot_on_shutdown:
            self.save()
        self.store.close()
