#!/usr/bin/env python3
"""10M-chunk IVF2 vs exact on ONE v5e chip (BASELINE.json config 4 full).

Round-3 rewrite: the r2 IVF tier LOST to exact brute force at this scale
(8.8k QPS @ 0.978 vs 10.5k @ 1.0) because its fine stage row-gathered at
~20 GB/s.  IVF2 (``ops/ivf2``) stores a cluster-contiguous int8 fine
copy and DMAs whole slabs, so the QPS-vs-recall trade finally pays.

Feasible on one chip because the master is bf16 (7.7 GB) and the fine
copy int8 (+pad, ~4 GB).  Corpus is clustered synthetic data generated
ON DEVICE in chunks (host RNG at this scale takes minutes and 15 GB).

Timing: chained-scan slope (M searches inside one jit; slope of wall
time vs M) — the per-dispatch relay round trip (~26-30 ms here) cancels.

Prints one JSON line: build time, exact-kernel QPS, and the IVF2
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

    from modular_rag_system_tpu.ops.binmax_topk import twopass_topk_raw
    from modular_rag_system_tpu.ops.fused_topk import _use_interpret
    from modular_rag_system_tpu.ops.ivf2 import IVF2, ivf2_search_core

    on_tpu = jax.default_backend() == "tpu"
    N = 10_485_760 if on_tpu else 262_144
    d, Q, k = 384, 256, 10
    C = 8192 if on_tpu else 512
    n_centers = max(N // 1024, 64)
    sigma = 0.35 / np.sqrt(d)
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_dev = jnp.asarray(centers)
    interp = _use_interpret()
    M_LO, M_HI = (4, 20) if on_tpu else (2, 4)

    def note(m):
        print(f"[10m] {m}", file=sys.stderr, flush=True)

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
    note(f"corpus generated in {gen_s:.0f}s")

    q_host = centers[rng.integers(0, n_centers, Q)] + sigma * rng.standard_normal(
        (Q, d)
    ).astype(np.float32)
    q_host /= np.linalg.norm(q_host, axis=1, keepdims=True)
    q = jnp.asarray(q_host.astype(np.float32))

    # exact ground truth via the streaming two-pass kernel: a plain
    # (Q, N) score matrix at Q=256 x 10.5M would be 10 GB and OOM HBM
    gt = jax.jit(functools.partial(
        twopass_topk_raw, k=k, block_rows=4096,
        bin_width=64 if on_tpu else 8, interpret=interp))
    _, eids = gt(E, jnp.int32(N), q)
    eids = np.asarray(eids)
    note("ground truth done")

    # IVF2 build: int8 fine copy (auto policy past 4M rows), LBG balance
    # splits at the tier default (caps the worst-case block budget L)
    t0 = time.perf_counter()
    ivf = IVF2.build(E, N, n_clusters=C, iters=6, fine_dtype="int8",
                     seed_batch=16384, balance=1.5)
    jax.block_until_ready(ivf.E_c3)
    build_s = time.perf_counter() - t0
    note(f"ivf2 build {build_s:.0f}s; nblocks={ivf.nblocks} "
         f"max_nblk={int(ivf.nblk_h.max())}")

    QS = jnp.asarray(
        (centers[rng.integers(0, n_centers, (M_HI, Q))]
         + sigma * rng.standard_normal((M_HI, Q, d))).astype(np.float32))
    QS = QS / jnp.linalg.norm(QS, axis=2, keepdims=True)
    np.asarray(jnp.sum(QS))
    cnt = jnp.int32(N)

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
        note(f"{label}: {dt*1e3:.2f} ms/batch ({Q/dt:.0f} QPS)")
        return dt

    # exact two-pass kernel baseline (the number IVF2 must beat 2x)
    @functools.partial(jax.jit, static_argnames=("m",))
    def chain_exact(E, qs, m):
        def step(carry, qq):
            v, _ = twopass_topk_raw(E, cnt, qq + carry * 1e-9, k, 4096,
                                    64 if on_tpu else 8, interp)
            return jnp.mean(v), None

        carry, _ = jax.lax.scan(step, 0.0, qs[:m])
        return carry

    dt_exact = slope(lambda m: chain_exact(E, QS, m), "exact twopass")

    curve = []
    U = 4
    for nprobe in (1, 2, 4, 8, 16):
        if nprobe > C:
            break
        L = ivf.slots_for_nprobe(nprobe)
        L = ((L + U - 1) // U) * U
        core = functools.partial(ivf2_search_core, k=k, nprobe=nprobe,
                                 L=L, tail_max=0, U=U, interpret=interp)
        sc3 = ivf.scales3

        @functools.partial(jax.jit, static_argnames=("m",))
        def chain_ivf(E, Ec, sc, perm, cents, bs, nb, cn, qs, m,
                      core=core):
            def step(carry, qq):
                v, _ = core(E, Ec, sc, perm, cents, bs, nb, cn, cnt, cnt,
                            qq + carry * 1e-9)
                return jnp.mean(v), None

            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        dt = slope(
            lambda m: chain_ivf(E, ivf.E_c3, sc3, ivf.perm, ivf.centroids,
                                ivf.blk_start, ivf.nblk, ivf.counts, QS, m),
            f"ivf2 nprobe={nprobe} (L={L})")
        vals, ids = jax.jit(core)(E, ivf.E_c3, sc3, ivf.perm,
                                  ivf.centroids, ivf.blk_start, ivf.nblk,
                                  ivf.counts, cnt, cnt, q)
        got = np.asarray(ids)
        recall = float(
            np.mean([len(set(eids[i]) & set(got[i])) / k for i in range(Q)])
        )
        curve.append({"nprobe": nprobe, "qps": round(Q / dt, 1),
                      "recall_at_10": round(recall, 4),
                      "ms_per_batch": round(dt * 1e3, 2),
                      "ms_per_query_amortized": round(dt * 1e3 / Q, 4),
                      "vs_exact": round(dt_exact / dt, 2)})

    print(json.dumps({
        "demo": "10M-chunk IVF2 (int8 cluster-contiguous fine) vs exact",
        "rows": N,
        "master_gb": round(N * d * 2 / 1e9, 2),
        "fine_gb": round(ivf.nblocks * 256 * d / 1e9, 2),
        "clusters": C,
        "datagen_s": round(gen_s, 1),
        "build_s": round(build_s, 1),
        "exact_qps": round(Q / dt_exact, 1),
        "exact_ms_per_batch": round(dt_exact * 1e3, 2),
        "curve": curve,
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
