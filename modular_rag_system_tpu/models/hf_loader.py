"""Load HuggingFace ``all-MiniLM-L6-v2``-family weights into the flax encoder.

The container is zero-egress, so this activates only when an HF cache (or
an explicit local checkpoint directory) is already present.  The module
architecture (``SentenceEncoderModule``: 6 post-LN blocks, hidden 384,
12 heads, FFN 1536) matches the BERT-mini family exactly, so loaded
weights reproduce the upstream model's embeddings.

Mapping (HF BERT names -> our flax params):
  embeddings.word_embeddings            -> tok_embed.embedding
  embeddings.position_embeddings        -> pos_embed.embedding
  embeddings.LayerNorm                  -> embed_ln
  encoder.layer.N.attention.self.{q,k,v}-> block_N.MultiHeadDotProductAttention_0.{query,key,value}
  encoder.layer.N.attention.output.dense-> ...out
  encoder.layer.N.attention.output.LayerNorm -> block_N.LayerNorm_0
  encoder.layer.N.intermediate.dense    -> block_N.Dense_0
  encoder.layer.N.output.dense          -> block_N.Dense_1
  encoder.layer.N.output.LayerNorm      -> block_N.LayerNorm_1

(token_type embeddings are folded into the word embeddings: the encoder
always runs with segment id 0, so ``word + type0`` is exact.)
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def load_minilm_params(
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
    local_dir: Optional[str] = None,
):
    """Returns (flax params dict, tokenizer, arch dict) or raises.

    The architecture (layers/hidden/heads/mlp/vocab/max_len) is read from
    the checkpoint's own config so the reshapes below can't silently
    scramble heads on a mismatched caller guess."""
    import os

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    import torch  # cpu-only in this image
    from transformers import AutoModel, AutoTokenizer

    src = local_dir or model_name
    hf_tok = AutoTokenizer.from_pretrained(src)
    hf = AutoModel.from_pretrained(src)
    # Trust the checkpoint's own architecture, not the caller's guess —
    # a mismatched reshape below would silently scramble heads.
    num_layers = hf.config.num_hidden_layers
    hidden = hf.config.hidden_size
    heads = hf.config.num_attention_heads
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    head_dim = hidden // heads

    def t(name):
        return np.ascontiguousarray(sd[name])

    params = {
        "tok_embed": {
            "embedding": t("embeddings.word_embeddings.weight")
            + t("embeddings.token_type_embeddings.weight")[0][None, :]
        },
        "pos_embed": {"embedding": t("embeddings.position_embeddings.weight")},
        "embed_ln": {
            "scale": t("embeddings.LayerNorm.weight"),
            "bias": t("embeddings.LayerNorm.bias"),
        },
    }
    for n in range(num_layers):
        p = f"encoder.layer.{n}."
        attn = {}
        for ours, theirs in (("query", "attention.self.query"),
                             ("key", "attention.self.key"),
                             ("value", "attention.self.value")):
            w = t(p + theirs + ".weight").T.reshape(hidden, heads, head_dim)
            b = t(p + theirs + ".bias").reshape(heads, head_dim)
            attn[ours] = {"kernel": w, "bias": b}
        attn["out"] = {
            "kernel": t(p + "attention.output.dense.weight").T.reshape(
                heads, head_dim, hidden
            ),
            "bias": t(p + "attention.output.dense.bias"),
        }
        params[f"block_{n}"] = {
            "MultiHeadDotProductAttention_0": attn,
            "LayerNorm_0": {
                "scale": t(p + "attention.output.LayerNorm.weight"),
                "bias": t(p + "attention.output.LayerNorm.bias"),
            },
            "Dense_0": {
                "kernel": t(p + "intermediate.dense.weight").T,
                "bias": t(p + "intermediate.dense.bias"),
            },
            "Dense_1": {
                "kernel": t(p + "output.dense.weight").T,
                "bias": t(p + "output.dense.bias"),
            },
            "LayerNorm_1": {
                "scale": t(p + "output.LayerNorm.weight"),
                "bias": t(p + "output.LayerNorm.bias"),
            },
        }
    arch = {
        "num_layers": num_layers,
        "hidden": hidden,
        "heads": heads,
        "mlp_dim": hf.config.intermediate_size,
        "vocab_size": hf.config.vocab_size,
        "max_len": hf.config.max_position_embeddings,
    }
    return params, hf_tok, arch


def _hf_cache_present(model_name: str) -> bool:
    """Cheap existence probe for an offline HF snapshot of the model.

    Importing torch/transformers costs ~15 s of cold start; do it only
    when a cache directory could actually satisfy the load (zero-egress
    containers without a cache skip straight to the bundled encoder)."""
    import os
    from pathlib import Path

    model_dir = "models--" + model_name.replace("/", "--")
    candidates = []
    # huggingface_hub's documented resolution order: HF_HUB_CACHE ->
    # HF_HOME/hub -> ~/.cache/huggingface/hub (+ legacy TRANSFORMERS_CACHE)
    for env in ("HF_HUB_CACHE", "TRANSFORMERS_CACHE"):
        v = os.environ.get(env)
        if v:
            candidates.append(Path(v))
    home = os.environ.get("HF_HOME")
    candidates.append(Path(home) / "hub" if home
                      else Path.home() / ".cache" / "huggingface" / "hub")
    return any((c / model_dir).is_dir() for c in candidates)


def try_build_pretrained_encoder(config):
    """MiniLMEncoder with HF weights if a cache exists, else None."""
    from modular_rag_system_tpu.models.encoder import MiniLMEncoder
    from modular_rag_system_tpu.models.tokenizer import WordPieceTokenizer

    explicit = getattr(config.embedding, "hf_checkpoint", "")
    if not explicit and not _hf_cache_present(
        "sentence-transformers/all-MiniLM-L6-v2"
    ):
        return None
    try:
        params, hf_tok, arch = load_minilm_params(
            local_dir=getattr(config.embedding, "hf_checkpoint", "") or None,
        )
    except Exception:
        return None
    if arch["hidden"] != config.embedding.dim:
        # embedding dim is the index dim — a checkpoint with a different
        # hidden size can't serve this engine
        return None
    max_len = min(config.embedding.max_seq_len, arch["max_len"])
    vocab = hf_tok.get_vocab()
    tok = WordPieceTokenizer(vocab, max_len=max_len)

    return MiniLMEncoder(
        dim=arch["hidden"],
        max_seq_len=max_len,
        batch_size=config.embedding.batch_size,
        dtype=config.embedding.dtype,
        num_layers=arch["num_layers"],
        num_heads=arch["heads"],
        mlp_dim=arch["mlp_dim"],
        vocab_size=arch["vocab_size"],
        tokenizer=tok,
        params=params,
        attention_impl=config.embedding.attention_impl,
    )
