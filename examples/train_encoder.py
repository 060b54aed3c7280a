#!/usr/bin/env python3
"""Fine-tune the retrieval encoder on (query, positive) pairs.

A capability the reference never had: its embedders were frozen external
models.  Here the serving encoder is fine-tuned in-framework with
symmetric InfoNCE on a (data, model) mesh and published back to serving
with ``sync_encoder``.

Run:  python examples/train_encoder.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from modular_rag_system_tpu.models.encoder import MiniLMEncoder
from modular_rag_system_tpu.models.train import ContrastiveTrainer
from modular_rag_system_tpu.parallel.mesh import default_devices, make_train_mesh

PAIRS = [
    ("how do I search the index", "queries run through the fused top-k kernel"),
    ("persisting documents", "the document store is sqlite with content-hash ids"),
    ("scaling out", "index rows shard across the mesh and merge over ici"),
    ("embedding model", "a minilm-class flax encoder embeds chunks in batches"),
    ("file uploads", "the file manager serves uploads over a small http api"),
    ("privacy controls", "capture adapters anonymize sensitive content"),
    ("retention policy", "cleanup deletes documents older than the horizon"),
    ("query caching", "responses cache in ttl buckets keyed by query hash"),
]


def main() -> None:
    devices = default_devices()
    n = len(devices)
    model_par = 2 if n % 2 == 0 and n > 1 else 1
    mesh = make_train_mesh(n // model_par, model_par, devices=devices)
    print(f"training on a {n // model_par}x{model_par} (data, model) mesh")

    encoder = MiniLMEncoder(max_seq_len=64, batch_size=16)
    trainer = ContrastiveTrainer(encoder, mesh, learning_rate=1e-4)
    qs = [q for q, _ in PAIRS]
    ps = [p for _, p in PAIRS]
    for step in range(20):
        loss, acc = trainer.step(qs, ps)
        if step % 5 == 0:
            print(f"  step {step:3d}  loss={loss:.4f}  in-batch acc={acc:.2f}")
    trainer.sync_encoder()
    print("trained weights published back to the serving encoder")


if __name__ == "__main__":
    main()
