"""HF weight-mapping proof (VERDICT r1 item 2a).

Builds a tiny random HF BERT checkpoint locally (zero-egress container —
no downloads), loads it through ``models.hf_loader``, and asserts the
flax forward reproduces the torch forward (masked mean-pool + L2 norm,
the all-MiniLM-L6-v2 recipe, reference ``embedding_pipeline.py:424``)
to float32 tolerance.  Also proves the WordPiece tokenizer matches the
HF tokenizer id-for-id and that the engine-facing factory picks the
checkpoint up via ``embedding.hf_checkpoint``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB = (
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    + ["the", "tpu", "compiler", "tiles", "matmul", "onto", "mxu", ".", ","]
    + ["kernel", "fused", "top", "k", "index", "shard", "mesh", "##s", "##ing"]
    + [f"unused{i}" for i in range(23, 64)]
)

TEXTS = [
    "the tpu compiler tiles matmuls onto the mxu .",
    "fused top k kernels , sharding the index",
    "the the the",
]


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp("tiny_bert")
    (d / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    cfg = BertConfig(
        vocab_size=len(VOCAB),
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=32,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12,
    )
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.eval()
    model.save_pretrained(d)
    BertTokenizer(str(d / "vocab.txt"), do_lower_case=True).save_pretrained(d)
    return str(d)


def _torch_sentence_embed(model, ids, mask):
    with torch.no_grad():
        h = model(
            input_ids=torch.tensor(np.asarray(ids, np.int64)),
            attention_mask=torch.tensor(np.asarray(mask, np.int64)),
        ).last_hidden_state.numpy()
    m = mask.astype(np.float32)[..., None]
    pooled = (h * m).sum(1) / np.maximum(m.sum(1), 1.0)
    return pooled / np.maximum(np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


def test_forward_matches_torch(tiny_bert_dir):
    from transformers import AutoModel, AutoTokenizer

    from modular_rag_system_tpu.models.encoder import MiniLMEncoder
    from modular_rag_system_tpu.models.hf_loader import load_minilm_params

    params, hf_tok, arch = load_minilm_params(local_dir=tiny_bert_dir)
    assert arch == {
        "num_layers": 2, "hidden": 64, "heads": 4,
        "mlp_dim": 128, "vocab_size": len(VOCAB), "max_len": 32,
    }

    # identical token ids into both stacks isolates the WEIGHT mapping
    batch = hf_tok(TEXTS, padding="max_length", truncation=True,
                   max_length=16, return_tensors="np")
    ids = batch["input_ids"].astype(np.int32)
    mask = batch["attention_mask"].astype(np.int32)
    assert (mask.sum(1) < 16).any() and (mask == 0).any(), "need real padding"

    ref = _torch_sentence_embed(AutoModel.from_pretrained(tiny_bert_dir), ids, mask)

    enc = MiniLMEncoder(
        dim=64, max_seq_len=32, num_layers=2, num_heads=4, mlp_dim=128,
        vocab_size=len(VOCAB), dtype="float32", params=params,
    )
    ours = np.asarray(enc.module.apply({"params": params}, ids, mask))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_wordpiece_matches_hf_tokenizer(tiny_bert_dir):
    from transformers import AutoTokenizer

    from modular_rag_system_tpu.models.tokenizer import WordPieceTokenizer

    hf_tok = AutoTokenizer.from_pretrained(tiny_bert_dir)
    ref = hf_tok(TEXTS + ["tilesing fusedes UNKNOWNWORD"], padding="max_length",
                 truncation=True, max_length=16, return_tensors="np")
    tok = WordPieceTokenizer(hf_tok.get_vocab(), max_len=16)
    ids, mask = tok.encode_batch(TEXTS + ["tilesing fusedes UNKNOWNWORD"])
    np.testing.assert_array_equal(ids, ref["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, ref["attention_mask"].astype(np.int32))


def test_factory_uses_local_checkpoint(tiny_bert_dir):
    from modular_rag_system_tpu.config import RAGConfig
    from modular_rag_system_tpu.models import build_encoder

    cfg = RAGConfig().merged({
        # lexical_dim 0: this test compares the DENSE embeddings
        # against the torch reference, so the hybrid wrap is disabled
        "embedding": {"model": "minilm", "dim": 64,
                      "hf_checkpoint": tiny_bert_dir, "lexical_dim": 0},
    })
    enc = build_encoder(cfg)
    assert enc.tokenizer.name == "wordpiece"
    # embeddings come from the checkpoint, not random init: compare one
    # sentence against the torch reference
    from transformers import AutoModel, AutoTokenizer

    hf_tok = AutoTokenizer.from_pretrained(tiny_bert_dir)
    batch = hf_tok([TEXTS[0]], padding="max_length", truncation=True,
                   max_length=enc.max_seq_len, return_tensors="np")
    ref = _torch_sentence_embed(
        AutoModel.from_pretrained(tiny_bert_dir),
        batch["input_ids"].astype(np.int32),
        batch["attention_mask"].astype(np.int32),
    )
    ours = enc.encode([TEXTS[0]])
    np.testing.assert_allclose(ours, ref, atol=2e-3)  # bf16 compute dtype

    # a checkpoint whose hidden size mismatches the index dim is refused
    cfg2 = RAGConfig().merged({
        "embedding": {"model": "minilm", "dim": 384,
                      "hf_checkpoint": tiny_bert_dir, "lexical_dim": 0},
    })
    enc2 = build_encoder(cfg2)
    # refused HF checkpoint now falls back to the BUNDLED default
    # (round 3) rather than random init
    assert enc2.dim == 384 and "bundled" in enc2.name
