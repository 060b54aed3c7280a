#!/usr/bin/env python3
"""10M-chunk IVF on ONE v5e chip (BASELINE.json config 4 at full scale).

Feasible because the index master is stored bf16
(``index.store_dtype="bfloat16"``): 10M x 384 = 7.7 GB vs 15.4 GB f32,
leaving room for the k-means build and search temporaries.  Corpus is
clustered synthetic data generated ON DEVICE in chunks (host RNG at this
scale takes minutes and 15 GB of RAM).

Prints one JSON line with build time and the QPS/recall@10 sweep.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from modular_rag_system_tpu.ops.exact import exact_topk_raw
    from modular_rag_system_tpu.ops.ivf import IVFIndex

    on_tpu = jax.default_backend() == "tpu"
    N = 10_485_760 if on_tpu else 262_144
    d, Q, k = 384, 64, 10
    C = 8192 if on_tpu else 512
    n_centers = max(N // 1024, 64)
    sigma = 0.35 / np.sqrt(d)
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_dev = jnp.asarray(centers)

    GEN = 1_048_576 if on_tpu else 65_536

    @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(2,))
    def gen_chunk(key, n, buf, offset):
        k1, k2 = jax.random.split(key)
        assign = jax.random.randint(k1, (n,), 0, n_centers)
        x = centers_dev[assign] + sigma * jax.random.normal(k2, (n, d))
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return jax.lax.dynamic_update_slice(
            buf, x.astype(jnp.bfloat16), (offset, 0)
        )

    t0 = time.perf_counter()
    E = jnp.zeros((N, d), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    for off in range(0, N, GEN):
        key, sub = jax.random.split(key)
        E = gen_chunk(sub, min(GEN, N - off), E, off)
    jax.block_until_ready(E)
    gen_s = time.perf_counter() - t0

    q_host = centers[rng.integers(0, n_centers, Q)] + sigma * rng.standard_normal(
        (Q, d)
    ).astype(np.float32)
    q_host /= np.linalg.norm(q_host, axis=1, keepdims=True)
    q = jnp.asarray(q_host.astype(np.float32))

    # exact ground truth (bf16 corpus, f32 accumulate)
    exact_jit = jax.jit(exact_topk_raw, static_argnames=("k",))
    _, eids = exact_jit(E, jnp.int32(N), q, k=k)
    eids = np.asarray(eids)

    IVFIndex.FILL_FACTOR = 2  # cap gathers at this scale
    t0 = time.perf_counter()
    ivf = IVFIndex.build(E, N, n_clusters=C, iters=6, seed_batch=16384)
    jax.block_until_ready(ivf.centroids)
    build_s = time.perf_counter() - t0

    curve = []
    for nprobe in (1, 2, 4, 8):
        vals, ids = ivf.search(q, k, nprobe=nprobe)
        np.asarray(vals)
        iters = 10 if on_tpu else 3
        t0 = time.perf_counter()
        for _ in range(iters):
            vals, ids = ivf.search(q, k, nprobe=nprobe)
        np.asarray(vals)
        dt = (time.perf_counter() - t0) / iters
        got = np.asarray(ids)
        recall = float(
            np.mean([len(set(eids[i]) & set(got[i])) / k for i in range(Q)])
        )
        curve.append(
            {"nprobe": nprobe, "qps": round(Q / dt, 1),
             "recall_at_10": round(recall, 4)}
        )

    print(json.dumps({
        "demo": "10M-chunk IVF on one chip (bf16 master)",
        "rows": N,
        "index_gb": round(N * d * 2 / 1e9, 2),
        "clusters": C,
        "bucket_cap": ivf.bucket_cap,
        "datagen_s": round(gen_s, 1),
        "kmeans_build_s": round(build_s, 1),
        "curve": curve,
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
