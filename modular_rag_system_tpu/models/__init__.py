"""Encoder model family.

* ``fake.FeatureHashEncoder`` — deterministic, dependency-free encoder for
  hermetic tests (the TPU framework's analog of the reference's
  ``FallbackEmbedder``, ``embedding_pipeline.py:441-506``).
* ``encoder.MiniLMEncoder`` — flax MiniLM/BGE-class transformer encoder,
  jit-compiled and batched (the reference embedded one text at a time,
  ``embedding_pipeline.py:424``).
"""

from modular_rag_system_tpu.models.fake import FeatureHashEncoder


def build_encoder(config):
    """Encoder factory honoring ``EmbeddingConfig.model``.

    The reference picked its embedder by availability probing
    (Ollama -> sentence-transformers -> fallback,
    ``embedding_pipeline.py:521-538``); here the chain is
    minilm (device) -> fake (host), controlled by config with the same
    graceful degradation.
    """
    model = config.embedding.model
    if model == "fake":
        return FeatureHashEncoder(dim=config.embedding.dim)
    if model == "ollama":
        from modular_rag_system_tpu.models.ollama import OllamaEmbedder

        enc = OllamaEmbedder(
            base_url=config.serving.ollama_base_url,
            dim=config.embedding.dim,
            timeout_s=config.serving.llm_timeout_s,
        )
        if not enc.available:
            raise RuntimeError(
                f"ollama server unreachable at {config.serving.ollama_base_url}"
            )
        return enc
    if model in ("minilm", "auto"):
        # validate hybrid config EAGERLY, outside the auto-path's
        # degradation try/except: a bad lexical_weight must raise, not
        # silently downgrade to the fake encoder (round-5 review)
        if config.embedding.lexical_dim > 0 and not (
            0.0 < config.embedding.lexical_weight < 1.0
        ):
            raise ValueError(
                f"embedding.lexical_weight must be in (0,1), got "
                f"{config.embedding.lexical_weight} (use lexical_dim=0 "
                f"for pure dense)"
            )

        def _maybe_hybrid(dense):
            # hybrid dense+lexical wrap (models/lexical.py): applied to
            # the semantic path only — "fake"/"ollama" stay raw so the
            # hermetic-test and HTTP-parity backends are unchanged
            if config.embedding.lexical_dim > 0:
                from modular_rag_system_tpu.models.lexical import (
                    HybridEncoder,
                    LexicalHashEncoder,
                )

                lex = LexicalHashEncoder(dim=config.embedding.lexical_dim)
                return HybridEncoder(
                    dense, lex, weight=config.embedding.lexical_weight
                )
            return dense

        try:
            # resolution order: exact HF weights when a cache exists ->
            # the BUNDLED checkpoint trained by the framework's own
            # trainer (models/default_ckpt.py; a fresh zero-egress
            # install still embeds real English semantically) -> random
            # init as the last resort
            from modular_rag_system_tpu.models.hf_loader import (
                try_build_pretrained_encoder,
            )

            pretrained = try_build_pretrained_encoder(config)
            if pretrained is not None:
                return _maybe_hybrid(pretrained)
            from modular_rag_system_tpu.models.default_ckpt import (
                try_build_default_encoder,
            )

            bundled = try_build_default_encoder(config)
            if bundled is not None:
                return _maybe_hybrid(bundled)
            from modular_rag_system_tpu.models.encoder import MiniLMEncoder

            return _maybe_hybrid(MiniLMEncoder(
                dim=config.embedding.dim,
                max_seq_len=config.embedding.max_seq_len,
                batch_size=config.embedding.batch_size,
                dtype=config.embedding.dtype,
                num_layers=config.embedding.num_layers,
                num_heads=config.embedding.num_heads,
                mlp_dim=config.embedding.mlp_dim,
                vocab_size=config.embedding.vocab_size,
                attention_impl=config.embedding.attention_impl,
            ))
        except Exception:
            if model == "minilm":
                raise
            return FeatureHashEncoder(dim=config.embedding.dim)
    raise ValueError(f"unknown encoder model {model!r}")
