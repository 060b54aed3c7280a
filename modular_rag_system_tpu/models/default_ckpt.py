"""Bundled default encoder checkpoint (VERDICT r2 item 3).

The reference's out-of-the-box path embedded with a real pretrained
model (``embedding_pipeline.py:424``); this zero-egress framework ships
the equivalent: a small checkpoint TRAINED BY THE FRAMEWORK'S OWN
TRAINER (``tools/build_default_encoder.py`` — harvested-English +
synonym-substitution + synthetic-paraphrase pairs, ``models.corpus``)
together with a WordPiece vocab trained by ``models.wordpiece_train``.

Assets live in ``modular_rag_system_tpu/assets/default_encoder/``:
  vocab.txt    WordPiece vocabulary (one piece per line)
  params.npz   flax param tree, keys joined with '/', stored f16
  arch.json    {num_layers, hidden, heads, mlp_dim, vocab_size, max_len}

``build_encoder`` resolution order for model "minilm"/"auto":
HF cache (exact all-MiniLM-L6-v2) -> bundled default -> random init.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

ASSET_DIR = Path(__file__).resolve().parent.parent / "assets" / "default_encoder"


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_default_encoder(params, arch: dict, vocab: dict,
                         out_dir: Optional[str] = None) -> str:
    """Write the asset triplet; returns the directory path."""
    from modular_rag_system_tpu.models.wordpiece_train import save_vocab

    d = Path(out_dir) if out_dir else ASSET_DIR
    d.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    np.savez(d / "params.npz",
             **{k: v.astype(np.float16) for k, v in flat.items()})
    (d / "arch.json").write_text(json.dumps(arch, indent=1))
    save_vocab(vocab, str(d / "vocab.txt"))
    return str(d)


def load_default_assets(asset_dir: Optional[str] = None):
    """Returns (params f32 tree, arch dict, vocab dict) or raises."""
    from modular_rag_system_tpu.models.wordpiece_train import load_vocab

    d = Path(asset_dir) if asset_dir else ASSET_DIR
    arch = json.loads((d / "arch.json").read_text())
    with np.load(d / "params.npz") as z:
        flat = {k: z[k].astype(np.float32) for k in z.files}
    return _unflatten(flat), arch, load_vocab(str(d / "vocab.txt"))


def try_build_default_encoder(config):
    """MiniLMEncoder with the bundled trained weights, or None.

    Skipped when the assets are absent, disabled by config
    (``embedding.bundled_checkpoint = ""``), or when the checkpoint's
    hidden size does not match ``embedding.dim`` (the index dim)."""
    src = getattr(config.embedding, "bundled_checkpoint", "auto")
    if not src:
        return None
    asset_dir = None if src == "auto" else src
    try:
        params, arch, vocab = load_default_assets(asset_dir)
    except Exception:
        return None
    if arch["hidden"] != config.embedding.dim:
        return None
    from modular_rag_system_tpu.models.encoder import MiniLMEncoder
    from modular_rag_system_tpu.models.tokenizer import WordPieceTokenizer

    max_len = min(config.embedding.max_seq_len, arch["max_len"])
    if max_len < arch["max_len"]:
        # the module's pos_embed table is sized max_len: crop the
        # checkpoint's table (rows past max_len are never indexed —
        # flax validates stored param shapes at apply time, so an
        # uncropped table raises ScopeParamShapeError)
        params = dict(params)
        pe = dict(params["pos_embed"])
        pe["embedding"] = np.asarray(pe["embedding"])[:max_len]
        params["pos_embed"] = pe
    tok = WordPieceTokenizer(vocab, max_len=max_len)
    enc = MiniLMEncoder(
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
    enc.name = f"minilm-l{arch['num_layers']}-h{arch['hidden']}-bundled"
    return enc
