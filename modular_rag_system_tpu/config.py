"""Unified typed configuration.

The reference carries THREE independent layered-JSON config systems
(``ollama_rag_system.py:585-609``, ``keystroke_logger.py:326-376``,
``run_integrated_rag.py:90-144``), each a "defaults dict + shallow merge
from an optional JSON file".  Here there is ONE typed config tree with the
same overlay semantics: dataclass defaults -> optional JSON file -> explicit
overrides (e.g. CLI flags).  ``RAGConfig.load`` also writes the default
config file when asked, preserving ``run_integrated_rag.py:90-144``'s
auto-generation behavior.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional


@dataclass
class EmbeddingConfig:
    """Encoder + chunking knobs (reference: ``embedding_pipeline.py:75-76,521-538``)."""

    # "minilm" = flax MiniLM-class transformer; "fake" = deterministic
    # feature encoder (the hermetic-test backend, reference
    # ``embedding_pipeline.py:441-506``); "auto" = minilm unless JAX is
    # unusable, then fake.
    model: str = "auto"
    dim: int = 384
    max_seq_len: int = 256
    chunk_size_tokens: int = 512
    chunk_overlap_tokens: int = 50
    batch_size: int = 256
    cache_size: int = 4096
    # Compute dtype for the encoder forward (bf16 feeds the MXU).
    dtype: str = "bfloat16"
    # Self-attention implementation: "dense" (XLA; right at <=512
    # tokens) or "flash" (Pallas memory-efficient attention,
    # ops/flash_attention.py — scores stay in VMEM, O(L) HBM; use for
    # long-context encoders, max_seq_len >= ~1024, where the dense
    # path's (B, H, L, L) score tensor no longer fits).
    attention_impl: str = "dense"
    # MiniLM-L6-class architecture (all-MiniLM-L6-v2 shape: 6 layers,
    # hidden 384, 12 heads, FFN 1536, WordPiece vocab 30522)
    num_layers: int = 6
    num_heads: int = 12
    mlp_dim: int = 1536
    vocab_size: int = 30522
    # Local directory of a saved HF BERT-family checkpoint (weights +
    # tokenizer).  When set, the minilm encoder loads these weights via
    # ``models.hf_loader`` instead of random init; when empty, the loader
    # still probes the offline HF cache for all-MiniLM-L6-v2.
    hf_checkpoint: str = ""
    # Bundled default checkpoint (models/default_ckpt.py): "auto" = use
    # the packaged asset when no HF cache exists; "" = disable (random
    # init); a path = load that asset directory instead.
    bundled_checkpoint: str = "auto"
    # Hybrid dense+lexical embedding (models/lexical.py).  When
    # lexical_dim > 0, the semantic encoder ("minilm"/"auto" path) is
    # wrapped in a HybridEncoder: the index dim becomes
    # dim + lexical_dim and cosine similarity decomposes as
    # (1-w)*cos(dense) + w*cos(lexical).  The lexical half is an
    # IDF-weighted, lexicon-canonicalized signed-hash bag of words with
    # subword n-grams and PMI co-occurrence expansion — the precision
    # and world-knowledge terms a from-scratch dense encoder lacks.
    # ON by default since round 5: out-of-the-box real-English
    # retrieval is dominated by the lexical half (weight tuned on the
    # held-out QA split, tools/build_default_encoder.py); the dense
    # half still carries paraphrase/near-duplicate matching.  Set
    # lexical_dim = 0 for a pure dense encoder (index dim = dim).
    lexical_dim: int = 384
    lexical_weight: float = 0.8


@dataclass
class IndexConfig:
    """Device index knobs.

    ``tier`` selects the engine: "exact" (f32 matmul + top_k), "int8"
    (quantized index + fused kernel), "ivf" (clustered ANN), or "auto"
    (int8 mixed below the measured ANN crossover (~4M rows), ivf
    at/above — promotion happens on the write path; see
    docs/operations.md sizing table).  The reference's only index was a
    brute-force Python cosine scan capped at 1000 rows
    (``ollama_rag_system.py:474-513``); none of these tiers cap.
    """

    tier: str = "exact"
    initial_capacity: int = 4096
    # fused-kernel tile along the corpus axis
    block_rows: int = 1024
    # master matrix dtype: "bfloat16" halves HBM (10M x 384 on one v5e)
    store_dtype: str = "float32"
    # optional per-tile bin-max reduction width for the fused kernels
    # (multiple of 128): ~bin_width x less selection work at recall@10
    # ~0.998; None = exact selection
    fused_bin_width: Optional[int] = None
    # IVF parameters (tier="ivf", ops/ivf2.py).  None clusters = auto
    # ~sqrt(N) at build time.
    ivf_clusters: Optional[int] = None
    ivf_nprobe: int = 8
    ivf_iters: int = 10
    # fine-stage over-selection beyond k before the master rescore.
    # None = k (default; recall ~0.99 at nprobe=1 on 10M).  Since r3.5
    # (score-dump fine stage) selection runs OUTSIDE the kernel and this
    # knob no longer trades throughput — it only bounds the rescore
    # width.  Kept for compatibility; leave at the default.
    ivf_refine_extra: Optional[int] = None
    # cluster-size balance cap: at build, clusters larger than
    # ivf_balance x the average are LBG-split (jittered centroid copies
    # + a short Lloyd re-run), bounding the fine stage's padded
    # block-list length L — the static WORST CASE over probed clusters,
    # so one oversized cluster taxes every query's DMA budget.  Measured
    # at 10.5M x 384: nprobe=1 156k -> 274k QPS (recall 0.991 both),
    # nprobe=2 103k -> 179k @ recall 1.0000; build 31 -> 61 s.
    # 0 = off (classic Lloyd's).
    ivf_balance: float = 1.5
    # fine-stage storage: "bf16" | "int8" | "int4" | "auto" (int8 past
    # 4M rows — HBM: a 10M bf16 fine copy next to the master does not
    # fit one v5e).  int4 packs two RESIDUAL-encoded rows per byte —
    # a MEMORY option, not a throughput one: measured at 10M x 384 it
    # is QPS-neutral vs int8 (the fine DMA is only ~30% of the query
    # after r3.5 moved selection out of the kernel) with a 2.32 vs
    # 4.63 GB fine copy, 22 vs 48 s build, and 1.5-3pt lower recall at
    # a given nprobe (4-bit candidate RANKING noise; returned scores
    # stay master-exact).  Prefer int8 unless HBM-capacity-bound.
    ivf_fine_dtype: str = "auto"
    # rebuild (re-cluster) from the WRITE path when unclustered tail +
    # stale rows exceed max(ivf_rebuild_min, ivf_tail_frac * count);
    # queries serve the tail exactly in the meantime and never rebuild
    ivf_tail_frac: float = 0.25
    ivf_rebuild_min: int = 32768
    # search this many extra results to allow host-side metadata filtering
    overfetch: int = 4


@dataclass
class RetrievalConfig:
    """Query defaults mirroring ``RAGQuery`` (``ollama_rag_system.py:74-83``)."""

    max_results: int = 5
    similarity_threshold: float = 0.7
    time_weight: float = 0.1
    recent_context_size: int = 100


@dataclass
class StoreConfig:
    storage_path: str = "rag_storage"
    max_documents: int = 10_000_000
    # retention horizon for cleanup_old_documents (the reference's was a
    # no-op stub, ``ollama_rag_system.py:843-850``; ours actually deletes)
    retention_days: Optional[float] = None
    # write the index snapshot at shutdown.  When False, restart rebuilds
    # embeddings from the document store — on hosts with a slow device
    # link (this environment: ~6 MB/s fetch) re-embedding 500k docs
    # (~24 s) beats fetching the matrix (~130 s)
    snapshot_on_shutdown: bool = True


@dataclass
class PrivacyConfig:
    """Mirrors ``PrivacyFilter`` semantics (``keystroke_logger.py:76-196``)."""

    enabled: bool = True
    anonymize: bool = True
    blocked_applications: List[str] = field(
        default_factory=lambda: [
            "1password", "keepass", "bitwarden", "lastpass",
            "banking", "wallet", "signal",
        ]
    )
    blocked_window_keywords: List[str] = field(
        default_factory=lambda: ["password", "login", "sign in", "credential"]
    )


@dataclass
class ServingConfig:
    """File server + LLM handoff (``enhanced_rag_system.py:662-745``)."""

    file_server_port: int = 8089
    upload_folder: str = "uploads"
    ollama_base_url: str = "http://localhost:11434"
    ollama_model: str = "llama3.2:3b"
    llm_timeout_s: float = 30.0
    response_cache_ttl_s: float = 300.0
    response_cache_max: int = 100
    # HTTP /query micro-batching: concurrent single queries coalesce into
    # one device dispatch (see batching.py).  OFF by default: measured on
    # a 200k-row corpus the per-dispatch relay round trip dominates and
    # thread-level pipelining wins (192 vs 142 QPS at 48 clients).
    # Enable (~25 ms) for 10M-row-class corpora, where each unbatched
    # request serializes a ~12 ms device scan and coalescing amortizes it.
    query_batch_window_ms: float = 0.0
    query_batch_max: int = 256


@dataclass
class MeshConfig:
    """Device-mesh layout for the sharded index + training step."""

    # number of index shards; 1 = single chip (degenerate mesh, same code
    # path as v5e-8 per SURVEY §7 step 6)
    index_shards: int = 1
    # >1 lays the shards out on a 2-D (slice, chip) mesh and uses the
    # hierarchical merge: ICI within a slice, only k candidates per
    # slice across DCN. index_shards must divide by dcn_slices.
    dcn_slices: int = 1
    # axis names used across the framework
    index_axis: str = "index"
    data_axis: str = "data"
    model_axis: str = "model"
    # multi-host bring-up (parallel/multihost.py): when True the engine
    # calls jax.distributed.initialize before building the mesh and
    # derives index_shards/dcn_slices from the GLOBAL device list.
    # coordinator/num_processes/process_id fall back to RAG_COORDINATOR/
    # RAG_NUM_PROCESSES/RAG_PROCESS_ID, then to JAX pod auto-detection.
    multihost: bool = False
    coordinator: str = ""
    num_processes: int = 0
    process_id: int = -1


@dataclass
class RAGConfig:
    embedding: EmbeddingConfig = field(default_factory=EmbeddingConfig)
    index: IndexConfig = field(default_factory=IndexConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    store: StoreConfig = field(default_factory=StoreConfig)
    privacy: PrivacyConfig = field(default_factory=PrivacyConfig)
    serving: ServingConfig = field(default_factory=ServingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # ------------------------------------------------------------------
    @classmethod
    def load(
        cls,
        path: Optional[str] = None,
        overrides: Optional[Dict[str, Any]] = None,
        write_default: bool = False,
    ) -> "RAGConfig":
        """defaults -> JSON overlay -> explicit overrides.

        ``overrides`` keys are dotted paths, e.g. ``{"index.tier": "int8"}``.
        """
        cfg = cls()
        if path is not None:
            p = Path(path)
            if p.exists():
                cfg = cfg.merged(json.loads(p.read_text()))
            elif write_default:
                p.parent.mkdir(parents=True, exist_ok=True)
                p.write_text(json.dumps(cfg.to_dict(), indent=2))
        if overrides:
            for dotted, value in overrides.items():
                cfg._set_dotted(dotted, value)
        return cfg

    def merged(self, overlay: Dict[str, Any]) -> "RAGConfig":
        """Deep-merge a nested dict of settings over this config."""
        new = RAGConfig(**{f.name: getattr(self, f.name) for f in dataclasses.fields(self)})
        for section, values in overlay.items():
            if not hasattr(new, section):
                raise KeyError(f"unknown config section: {section!r}")
            sub = getattr(new, section)
            if isinstance(values, dict):
                updated = dataclasses.replace(sub, **{
                    k: v for k, v in values.items() if hasattr(sub, k)
                })
                unknown = [k for k in values if not hasattr(sub, k)]
                if unknown:
                    raise KeyError(f"unknown keys in [{section}]: {unknown}")
                setattr(new, section, updated)
            else:
                setattr(new, section, values)
        return new

    def _set_dotted(self, dotted: str, value: Any) -> None:
        section, _, key = dotted.partition(".")
        if not key:
            raise KeyError(f"override must be 'section.key', got {dotted!r}")
        sub = getattr(self, section)
        if not hasattr(sub, key):
            raise KeyError(f"unknown config key: {dotted!r}")
        setattr(self, section, dataclasses.replace(sub, **{key: value}))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, path: str) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2))
