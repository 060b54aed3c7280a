#!/usr/bin/env python3
"""Sharded ivf tier at scale on real hardware (VERDICT r2 item 1's
"single-device AND sharded" leg, measured through ``ShardedIndex``).

``demo_10m.py`` measures the raw ``ops/ivf2`` core on a plain device
array; this harness drives the SHARDED index class end to end — chunked
device-resident ingest -> SPMD k-means build (``build_ann``) -> the
shard_map ivf2 search program with the ICI k-merge — on the largest
corpus whose pow2 capacity fits one chip's HBM (8,388,608 rows: bf16
master 6.4 GB + int8 fine ~3.4 GB; 10.5M would round capacity to 16M =
12.9 GB master and OOM).  On one real chip the mesh is S=1, so the
numbers demonstrate the sharded program's overhead over the raw core is
negligible; S=8 correctness is covered by tests/test_sharded.py on the
virtual CPU mesh.

Timing: chained-scan slope (M searches inside one jit, slope of wall
time between M_LO and M_HI) — the per-dispatch relay round trip
(~26-30 ms in this environment) cancels.

Ground truth and every search score the SAME bf16-rounded query
(docs/kernels.md scoring precision contract), so recall measures the
ANN trade, not query-rounding noise.  GT is the sharded exact fused
(two-pass binmax) program over the stored bf16 rows — streaming, so no
(Q, N) score matrix (10 GB at Q=256 x 8.4M would OOM next to the
index).

Prints one JSON line: build seconds, exact-tier QPS, and the ivf-tier
QPS/recall@10 curve over nprobe.
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

    from modular_rag_system_tpu.ops.binmax_topk import _round_to_dtype_f32
    from modular_rag_system_tpu.parallel.mesh import make_index_mesh
    from modular_rag_system_tpu.parallel.sharded import ShardedIndex

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        N, d, Q, k, C = 8_388_608, 384, 256, 10, 8192
        GEN, M_LO, M_HI = 1_048_576, 4, 20
        nprobes = (1, 2, 4)
    else:
        # interpret-mode Pallas is Python-loop slow: keep the fine
        # stage <= 16k rows (verify-skill sizing note)
        N, d, Q, k, C = 16_384, 64, 32, 10, 64
        GEN, M_LO, M_HI = 8_192, 2, 4
        nprobes = (1, 2)

    def note(m):
        print(f"[sharded-ann] {m}", file=sys.stderr, flush=True)

    mesh = make_index_mesh()
    S = mesh.devices.size
    note(f"mesh: {S} shard(s) on {jax.default_backend()}")

    idx = ShardedIndex(
        dim=d, mesh=mesh, capacity=N, tier="ivf",
        block_rows=4096 if on_tpu else 256, store_dtype="bfloat16",
        ivf_clusters=C, ivf_nprobe=1, ivf_iters=6,
        ivf_fine_dtype="int8", ivf_balance=1.5,
        # block the write-path auto-rebuild during chunked ingest; one
        # explicit (timed) build_ann() below
        ivf_rebuild_min=N + 1,
    )

    # clustered corpus, generated ON DEVICE in chunks (host RNG at this
    # scale takes minutes and the upload through the relay far longer)
    n_centers = max(N // 1024, 64)
    sigma = 0.35 / np.sqrt(d)
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_dev = jnp.asarray(centers)

    @functools.partial(jax.jit, static_argnums=(1,))
    def gen_chunk(key, n):
        k1, k2 = jax.random.split(key)
        assign = jax.random.randint(k1, (n,), 0, n_centers)
        x = centers_dev[assign] + sigma * jax.random.normal(k2, (n, d))
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(0)
    for off in range(0, N, GEN):
        key, sub = jax.random.split(key)
        idx.add(gen_chunk(sub, min(GEN, N - off)))
    note(f"ingested {idx.count} rows in {time.perf_counter() - t0:.0f}s")

    t0 = time.perf_counter()
    idx.build_ann()
    jax.block_until_ready(idx._ivf2.E_c)
    build_s = time.perf_counter() - t0
    note(f"build_ann {build_s:.0f}s (C={idx._ivf2.centroids.shape[0]} "
         f"after balance splits)")

    # queries drawn from the same mixture; bf16-rounded ONCE for every
    # scorer (precision contract)
    q_host = (centers[rng.integers(0, n_centers, Q)]
              + sigma * rng.standard_normal((Q, d)).astype(np.float32))
    q_host /= np.linalg.norm(q_host, axis=1, keepdims=True)
    q = _round_to_dtype_f32(jnp.asarray(q_host), jnp.bfloat16)
    QS = jnp.stack([q + i * 1e-7 for i in range(M_HI)])  # distinct steps
    np.asarray(jnp.sum(QS))
    cnt_dev = idx.count_device()

    def slope(chain_fn, label):
        f = lambda m: float(np.asarray(chain_fn(m)))
        f(M_LO)
        f(M_HI)
        ts = {M_LO: [], M_HI: []}
        for _ in range(3):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter()
                f(m)
                ts[m].append(time.perf_counter() - t0)
        dt = (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)
        note(f"{label}: {dt * 1e3:.2f} ms/batch ({Q / dt:.0f} QPS)")
        return dt

    def make_chain(core_fn, ops):
        @functools.partial(jax.jit, static_argnames=("m",))
        def chain(ops, cnt, qs, m):
            def step(carry, qq):
                v, _ = core_fn(ops, cnt, qq + carry * 1e-9)
                return jnp.mean(v), None

            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        return lambda m: chain(ops, cnt_dev, QS, m)

    # exact baseline + ground truth: the sharded fused (two-pass exact)
    # program over the stored bf16 rows
    with idx._lock:
        exact_fn = idx._build_search(Q, k, tier="fused")
        exact_ops = idx.search_ops("fused")
    exact_core = lambda ops, cnt, qq: exact_fn(*ops, cnt, qq)
    _, gt_ids = exact_core(exact_ops, cnt_dev, q)
    gt_ids = np.asarray(gt_ids)
    note("ground truth done (sharded exact two-pass)")
    dt_exact = slope(make_chain(exact_core, exact_ops), "exact fused")

    out = {
        "rows": N, "dim": d, "Q": Q, "k": k, "shards": S,
        "clusters_built": int(idx._ivf2.centroids.shape[0]),
        "build_s": round(build_s, 1),
        "exact_qps": round(Q / dt_exact, 1),
        "backend": jax.default_backend(),
        "curve": [],
    }
    for nprobe in nprobes:
        idx.ivf_nprobe = nprobe
        with idx._lock:
            core = idx.search_core(Q, k)
            ops = idx.search_ops("ivf")
        vals, ids = core(ops, cnt_dev, q)
        ids = np.asarray(ids)
        recall = float(np.mean(
            [len(set(gt_ids[i]) & set(ids[i])) / k for i in range(Q)]))
        dt = slope(make_chain(core, ops), f"ivf nprobe={nprobe}")
        out["curve"].append({
            "nprobe": nprobe,
            "qps": round(Q / dt, 1),
            "recall_at_10": round(recall, 4),
            "vs_exact": round(dt_exact / dt, 2),
        })
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
