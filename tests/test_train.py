"""Contrastive trainer on the virtual CPU mesh: loss decreases, TP+DP shards."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from modular_rag_system_tpu.models.encoder import MiniLMEncoder
from modular_rag_system_tpu.models.train import ContrastiveTrainer, param_spec
from modular_rag_system_tpu.parallel.mesh import make_train_mesh
from tests.conftest import cpu_mesh_devices


@pytest.fixture()  # function-scoped: a trainer takes ownership of the
# encoder's params (donated buffers), so trainers must not share encoders
def tiny_encoder():
    return MiniLMEncoder(
        dim=64, max_seq_len=32, batch_size=16,
        num_layers=2, num_heads=4, mlp_dim=128, vocab_size=1000,
        dtype="float32",
    )


PAIRS = [
    ("what is jax", "jax is a numerical computing library"),
    ("tpu hardware", "tensor processing units accelerate matmuls"),
    ("python dataclass", "dataclasses generate init and repr"),
    ("sqlite storage", "sqlite is an embedded relational database"),
    ("http server", "servers respond to get and post requests"),
    ("text chunking", "documents are split into token windows"),
    ("cosine similarity", "normalized dot product measures similarity"),
    ("gradient descent", "optimizers update parameters from gradients"),
]


def test_param_spec_rules(tiny_encoder):
    specs = jax.tree_util.tree_map_with_path(
        lambda p, l: param_spec(p, l), tiny_encoder.params
    )
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_name = {"/".join(str(getattr(k, 'key', k)) for k in path): spec
               for path, spec in flat}
    # embeddings replicated
    assert by_name["tok_embed/embedding"] == P()
    # attention qkv shard heads, out shards input heads
    qkv = [v for n, v in by_name.items() if "query/kernel" in n]
    assert all(s == P(None, "model", None) for s in qkv)
    outs = [v for n, v in by_name.items() if "out/kernel" in n]
    assert all(s == P("model", None, None) for s in outs)
    # FFN shards mlp dim
    d0 = [v for n, v in by_name.items() if "Dense_0/kernel" in n]
    assert all(s == P(None, "model") for s in d0)
    d1 = [v for n, v in by_name.items() if "Dense_1/kernel" in n]
    assert all(s == P("model", None) for s in d1)


@pytest.mark.slow
def test_training_reduces_loss_dp_tp(tiny_encoder):
    mesh = make_train_mesh(4, 2, devices=cpu_mesh_devices(8))
    trainer = ContrastiveTrainer(tiny_encoder, mesh, learning_rate=1e-3)
    qs = [q for q, _ in PAIRS]
    ps = [p for _, p in PAIRS]
    first_loss, _ = trainer.step(qs, ps)
    losses = [first_loss]
    for _ in range(15):
        loss, acc = trainer.step(qs, ps)
        losses.append(loss)
    assert losses[-1] < losses[0], losses
    assert trainer.step_count == 16
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_training_improves_retrieval_alignment(tiny_encoder):
    mesh = make_train_mesh(2, 1, devices=cpu_mesh_devices(2))
    trainer = ContrastiveTrainer(tiny_encoder, mesh, learning_rate=3e-3)
    qs = [q for q, _ in PAIRS]
    ps = [p for _, p in PAIRS]
    accs = []
    for _ in range(60):
        _, acc = trainer.step(qs, ps)
        accs.append(acc)
    # a tiny random encoder won't solve the batch, but in-batch accuracy
    # must rise well above the 1/8 chance level
    assert accs[-1] >= 0.25, accs[-5:]
    trainer.sync_encoder()
    # after sync, the serving encoder uses trained params
    q_emb = tiny_encoder.encode_queries(qs)
    p_emb = tiny_encoder.encode(ps)
    sims = q_emb @ p_emb.T
    diag_rank = (sims >= sims.diagonal()[:, None]).sum(axis=1)
    assert diag_rank.mean() <= 4.5  # positives pulled toward the top


@pytest.mark.slow
def test_batch_padding_to_data_axis(tiny_encoder):
    mesh = make_train_mesh(4, 1, devices=cpu_mesh_devices(4))
    trainer = ContrastiveTrainer(tiny_encoder, mesh)
    loss, _ = trainer.step([q for q, _ in PAIRS[:3]], [p for _, p in PAIRS[:3]])
    assert np.isfinite(loss)


@pytest.mark.slow
def test_padded_clone_rows_masked_from_loss(tiny_encoder):
    """A batch padded by cycling must produce the SAME loss as the unpadded
    batch: clone rows/columns are masked out of InfoNCE (ADVICE r1)."""
    mesh1 = make_train_mesh(1, 1, devices=cpu_mesh_devices(1))
    trainer1 = ContrastiveTrainer(tiny_encoder, mesh1, learning_rate=0.0)
    qs = [q for q, _ in PAIRS[:3]]
    ps = [p for _, p in PAIRS[:3]]
    loss_unpadded, acc_unpadded = trainer1.step(qs, ps)  # 3 rows, no pad

    enc2 = MiniLMEncoder(
        dim=64, max_seq_len=32, batch_size=16,
        num_layers=2, num_heads=4, mlp_dim=128, vocab_size=1000,
        dtype="float32",
    )
    mesh4 = make_train_mesh(4, 1, devices=cpu_mesh_devices(4))
    trainer4 = ContrastiveTrainer(enc2, mesh4, learning_rate=0.0)
    loss_padded, acc_padded = trainer4.step(qs, ps)  # pads 3 -> 4 rows
    assert abs(loss_padded - loss_unpadded) < 1e-4, (loss_padded, loss_unpadded)
    assert abs(acc_padded - acc_unpadded) < 1e-6


@pytest.mark.slow
def test_sync_encoder_survives_further_training(tiny_encoder):
    """sync_encoder publishes a copy — the next donated step must not
    delete the serving encoder's buffers (ADVICE r1: facade fine-tune)."""
    mesh = make_train_mesh(2, 1, devices=cpu_mesh_devices(2))
    trainer = ContrastiveTrainer(tiny_encoder, mesh, learning_rate=1e-3)
    qs = [q for q, _ in PAIRS]
    ps = [p for _, p in PAIRS]
    trainer.step(qs, ps)
    trainer.sync_encoder()
    emb_before = tiny_encoder.encode(["probe sentence"])
    trainer.step(qs, ps)  # donates trainer.params again
    emb_after = tiny_encoder.encode(["probe sentence"])  # must not crash
    np.testing.assert_allclose(emb_before, emb_after, atol=1e-6)
    # and a SECOND trainer over the same encoder is safe too
    trainer2 = ContrastiveTrainer(tiny_encoder, mesh, learning_rate=1e-3)
    trainer2.step(qs, ps)
    emb_after2 = tiny_encoder.encode(["probe sentence"])
    np.testing.assert_allclose(emb_before, emb_after2, atol=1e-6)


def test_mismatched_pairs_raise(tiny_encoder):
    mesh = make_train_mesh(1, 1, devices=cpu_mesh_devices(1))
    trainer = ContrastiveTrainer(tiny_encoder, mesh)
    with pytest.raises(ValueError):
        trainer.step(["a"], ["b", "c"])


@pytest.mark.slow
def test_checkpoint_roundtrip(tiny_encoder, tmp_path):
    from modular_rag_system_tpu.models.encoder import MiniLMEncoder

    mesh = make_train_mesh(2, 1, devices=cpu_mesh_devices(2))
    trainer = ContrastiveTrainer(tiny_encoder, mesh, learning_rate=1e-3)
    qs = [q for q, _ in PAIRS]
    ps = [p for _, p in PAIRS]
    for _ in range(3):
        loss_before, _ = trainer.step(qs, ps)
    ckpt = str(tmp_path / "ckpt")
    trainer.save_checkpoint(ckpt)
    # fresh trainer restores and continues deterministically
    enc2 = MiniLMEncoder(
        dim=64, max_seq_len=32, batch_size=16,
        num_layers=2, num_heads=4, mlp_dim=128, vocab_size=1000,
        dtype="float32",
    )
    trainer2 = ContrastiveTrainer(enc2, mesh, learning_rate=1e-3)
    trainer2.restore_checkpoint(ckpt)
    assert trainer2.step_count == trainer.step_count == 3
    la, _ = trainer.step(qs, ps)
    lb, _ = trainer2.step(qs, ps)
    assert abs(la - lb) < 1e-5, (la, lb)
