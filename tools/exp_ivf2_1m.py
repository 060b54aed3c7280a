#!/usr/bin/env python3
"""IVF2 at 1M x 384: can the ANN tier beat the int8-mixed headline?

The round-3 headline (bench.py) is the int8 mixed two-pass at 1M x 384,
Q=256: ~161k QPS @ recall 1.0.  IVF2 at 10.5M does 251k QPS @ 0.991
(nprobe=1) — this harness measures the same build at 1M, on BOTH corpus
styles, because cluster structure decides IVF recall:

* ``clustered``: centers + noise (the demo_10m corpus — realistic for
  sentence embeddings, which live on a low-dimensional semantic
  manifold; docs/kernels.md)
* ``uniform``: iid normal rows (bench.py's corpus — the WORST case for
  IVF: true neighbors of a query spread across many Voronoi cells, so
  recall demands a deep nprobe)

For each: build stats + an nprobe sweep (QPS via chained-scan slope
timing, recall@10 vs exact search over the stored bf16 index).
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
    N = 1_048_576 if on_tpu else 16_384
    d, Q, k = (384, 256, 10) if on_tpu else (64, 16, 5)
    C = 2048 if on_tpu else 64
    interp = _use_interpret()
    M_LO, M_HI = (4, 36) if on_tpu else (2, 4)
    U = 4
    rng = np.random.default_rng(0)

    def note(m):
        print(f"[ivf1m] {m}", file=sys.stderr, flush=True)

    n_centers = max(N // 1024, 64)
    sigma = 0.35 / np.sqrt(d)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_dev = jnp.asarray(centers)

    @functools.partial(jax.jit, static_argnames=("style",))
    def gen_corpus(key, style):
        if style == "uniform":
            x = jax.random.normal(key, (N, d), jnp.float32)
        else:
            k1, k2 = jax.random.split(key)
            assign = jax.random.randint(k1, (N,), 0, n_centers)
            x = centers_dev[assign] + sigma * jax.random.normal(
                k2, (N, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(jnp.bfloat16)

    gt = jax.jit(functools.partial(
        twopass_topk_raw, k=k, block_rows=4096 if on_tpu else 2048,
        bin_width=32 if on_tpu else 8, interpret=interp))
    cnt = jnp.int32(N)
    out = {"rows": N, "dim": d, "clusters_base": C, "q_batch": Q,
           "backend": jax.default_backend(), "styles": []}

    for style in ("clustered", "uniform"):
        note(f"=== corpus style: {style} ===")
        E = gen_corpus(jax.random.PRNGKey(0), style)
        jax.block_until_ready(E)
        if style == "uniform":
            q_host = rng.standard_normal((Q, d)).astype(np.float32)
        else:
            q_host = (centers[rng.integers(0, n_centers, Q)]
                      + sigma * rng.standard_normal((Q, d)).astype(np.float32))
        q_host /= np.linalg.norm(q_host, axis=1, keepdims=True)
        q = jnp.asarray(q_host)
        _, eids = gt(E, cnt, q)
        eids = np.asarray(eids)
        note("gt done")

        if style == "uniform":
            QS_h = rng.standard_normal((M_HI, Q, d)).astype(np.float32)
        else:
            QS_h = (centers[rng.integers(0, n_centers, (M_HI, Q))]
                    + sigma * rng.standard_normal((M_HI, Q, d))
                    .astype(np.float32))
        QS = jnp.asarray(QS_h)
        QS = QS / jnp.linalg.norm(QS, axis=2, keepdims=True)
        np.asarray(jnp.sum(QS))

        t0 = time.perf_counter()
        ivf = IVF2.build(E, N, n_clusters=C, iters=6,
                         fine_dtype="int8" if on_tpu else "bf16",
                         seed_batch=16384, balance=1.5)
        jax.block_until_ready(ivf.E_c3)
        build_s = time.perf_counter() - t0
        entry = {"style": style, "build_s": round(build_s, 1),
                 "clusters": ivf.n_clusters,
                 "max_nblk": int(ivf.nblk_h.max()), "points": []}
        note(f"build {build_s:.0f}s C={ivf.n_clusters} "
             f"max_nblk={entry['max_nblk']}")

        for nprobe in ((1, 2, 4, 8, 16, 32) if on_tpu else (1, 4)):
            L = ivf.slots_for_nprobe(nprobe)
            L = ((L + U - 1) // U) * U
            core = functools.partial(ivf2_search_core, k=k, nprobe=nprobe,
                                     L=L, tail_max=0, U=U, interpret=interp)

            @functools.partial(jax.jit, static_argnames=("m",))
            def chain(E, Ec, sc, pm, qs, m, core=core, ivf=ivf):
                def step(carry, qq):
                    v, _ = core(E, Ec, sc, pm, ivf.centroids,
                                ivf.blk_start, ivf.nblk, ivf.counts,
                                cnt, cnt, qq + carry * 1e-9)
                    return jnp.mean(v), None

                carry, _ = jax.lax.scan(step, 0.0, qs[:m])
                return carry

            f = lambda m: float(np.asarray(
                chain(E, ivf.E_c3, ivf.scales3, ivf.perm, QS, m)))
            f(M_LO)
            f(M_HI)
            ts = {M_LO: [], M_HI: []}
            for _ in range(3):
                for m in (M_LO, M_HI):
                    t0 = time.perf_counter()
                    f(m)
                    ts[m].append(time.perf_counter() - t0)
            dt = (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)
            _, ids = jax.jit(core)(E, ivf.E_c3, ivf.scales3, ivf.perm,
                                   ivf.centroids, ivf.blk_start, ivf.nblk,
                                   ivf.counts, cnt, cnt, q)
            got = np.asarray(ids)
            rec = float(np.mean(
                [len(set(eids[i]) & set(got[i])) / k for i in range(Q)]))
            note(f"nprobe={nprobe} (L={L}): {dt*1e3:.3f} ms/batch "
                 f"({Q/dt:.0f} QPS) recall={rec:.4f}")
            entry["points"].append({"nprobe": nprobe, "L": L,
                                    "qps": round(Q / dt, 1),
                                    "recall_at_10": round(rec, 4)})
        out["styles"].append(entry)
        del ivf, E, QS
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
