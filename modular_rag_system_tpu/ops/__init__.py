"""Device-side retrieval ops (JAX/XLA + Pallas).

Tiers (SURVEY §7 steps 4-7):

* ``exact``   — f32 matmul + ``lax.top_k`` (pure XLA, recall = 1.0)
* ``fused``   — Pallas fused dot-product + streaming top-k (no (Q, N)
                score matrix in HBM)
* ``int8``    — per-row-quantized index, int8 MXU matmul, f32 rescale
* ``ivf``     — clustered ANN with on-device k-means build

All of these replace the reference's single search path: a Python-loop
cosine over at most the newest 1000 SQLite rows
(``ollama_rag_system.py:454-525``).
"""
