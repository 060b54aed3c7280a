#!/usr/bin/env python3
"""Decompose IVF2's recall ceiling: coverage (nprobe) vs fine-stage
ranking noise (refine_extra).

The 10M demo's recall curve plateaus at 0.9953 from nprobe=2 to 16 —
flat in nprobe, so NOT a coverage loss.  Hypothesis: the int8 fine
stage's top-(k + refine_extra) over-selection (default 2k = 20) ranks a
true top-10 row below slot 20 ~0.5% of the time (int8 per-row-scale dot
has ~0.3-0.5% relative score error at d=384), and the master rescore
can only fix candidates it receives.  Consistency check from the demo:
coverage(nprobe=1) x plateau = 0.991 x 0.9953 = 0.9867 = the measured
nprobe=1 recall.

This sweeps refine_extra at nprobe in {1, 2} on the same synthetic 10M
corpus (same seeds as benchmarks/demo_10m.py) and times the winning
points, to decide the production default in ``index.py``/``sharded.py``.

Prints one JSON line.
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
    N = 10_485_760 if on_tpu else 65_536
    d, Q, k = 384, (256 if on_tpu else 32), 10
    C = 8192 if on_tpu else 256
    n_centers = max(N // 1024, 64)
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_dev = jnp.asarray(centers)
    interp = _use_interpret()
    M_LO, M_HI = (4, 20) if on_tpu else (2, 4)
    sigma = 0.35 / np.sqrt(d)

    def note(m):
        print(f"[exp] {m}", file=sys.stderr, flush=True)

    GEN = 1_048_576 if on_tpu else 65_536

    # bf16 master, generated in chunks — same protocol (and seeds) as
    # demo_10m.py: 10M x 384 f32 would be 16 GB and OOM HBM
    @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(2,))
    def gen_chunk(key, n, buf, offset):
        k1, k2 = jax.random.split(key)
        which = jax.random.randint(k1, (n,), 0, n_centers)
        e = centers_dev[which] + sigma * jax.random.normal(
            k2, (n, d), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return jax.lax.dynamic_update_slice(
            buf, e.astype(jnp.bfloat16), (offset, jnp.int32(0)))

    t0 = time.perf_counter()
    E = jnp.zeros((N, d), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    for off in range(0, N, GEN):
        key, sub = jax.random.split(key)
        E = gen_chunk(sub, min(GEN, N - off), E, jnp.int32(off))
    E.block_until_ready()
    note(f"corpus generated in {time.perf_counter() - t0:.0f}s")

    # queries from the corpus distribution (same protocol as demo_10m)
    qh = (centers[rng.integers(0, n_centers, Q)]
          + sigma * rng.standard_normal((Q, d)).astype(np.float32))
    qh /= np.linalg.norm(qh, axis=1, keepdims=True)
    q = jnp.asarray(qh.astype(np.float32))

    # ground truth from the exact two-pass kernel
    cnt = jnp.int32(N)

    @jax.jit
    def exact(E, qq):
        return twopass_topk_raw(E, cnt, qq, k, 4096 if on_tpu else 2048,
                                64 if on_tpu else 32, interp)

    _, gt = exact(E, q)
    gt = np.asarray(gt)
    note("ground truth done")

    t0 = time.perf_counter()
    ivf = IVF2.build(E, N, n_clusters=C, iters=6, fine_dtype="int8",
                     seed_batch=16384)
    note(f"build {time.perf_counter() - t0:.0f}s")

    E16 = E  # master is already bf16
    U = 4

    def run(nprobe, extra):
        L = ivf.slots_for_nprobe(nprobe)
        L = ((L + U - 1) // U) * U
        core = functools.partial(
            ivf2_search_core, k=k, nprobe=nprobe, L=L, tail_max=0,
            U=U, interpret=interp, refine_extra=extra)

        def search_raw(E16, E_c3, scales3, qq):
            return core(E16, E_c3, scales3, ivf.perm, ivf.centroids,
                        ivf.blk_start, ivf.nblk, ivf.counts,
                        jnp.int32(ivf.built), cnt, qq)

        _, ids = jax.jit(search_raw)(E16, ivf.E_c3, ivf.scales3, q)
        ids = np.asarray(ids)
        rec = float(np.mean(
            [len(set(gt[i]) & set(ids[i])) / k for i in range(Q)]))
        return rec, search_raw

    def slope_time(search_raw, qs_dev):
        @functools.partial(jax.jit, static_argnames=("m",))
        def chain(E16, E_c3, scales3, qs, m):
            def step(carry, qq):
                v, _ = search_raw(E16, E_c3, scales3, qq + carry * 1e-9)
                return jnp.mean(v), None
            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        f = lambda m: float(np.asarray(
            chain(E16, ivf.E_c3, ivf.scales3, qs_dev, m)))
        f(M_LO)
        f(M_HI)
        ts = {M_LO: [], M_HI: []}
        for _ in range(3):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter()
                f(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)

    QS = jnp.asarray(rng.standard_normal((M_HI, Q, d)).astype(np.float32))
    np.asarray(jnp.sum(QS))

    # round 2 of the sweep: the kf dimension is FLAT (measured 0.9867 /
    # 0.9953 at every refine_extra in {k..15k} — fine-ranking noise is
    # NOT the recall limiter, and kf craters QPS at ~linear select
    # cost), so probe the q-rounding fix + whether a SMALLER kf pays
    out = []
    for nprobe in (1, 2, 4):
        for extra in (0, k):
            rec, search = run(nprobe, extra)
            row = {"nprobe": nprobe, "refine_extra": extra,
                   "recall_at_10": round(rec, 4)}
            if on_tpu and nprobe == 1:
                dt = slope_time(search, QS)
                row["qps"] = round(Q / dt, 1)
                row["ms_per_batch"] = round(dt * 1e3, 2)
            out.append(row)
            note(str(row))

    print(json.dumps({"exp": "ivf2 refine_extra sweep", "rows": N,
                      "clusters": C, "sweep": out, "backend":
                      jax.default_backend()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
