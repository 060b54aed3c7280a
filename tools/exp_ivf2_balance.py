#!/usr/bin/env python3
"""LBG balance-split sweep at 10M (r3.5).

Measures what ``ivf_balance`` buys: the fine stage's padded block-list
length ``L`` is the static worst case over probed clusters, so skewed
cluster sizes tax every query's DMA budget.  For each balance value:
build stats (C after splits, max_nblk, build time) and the
nprobe={1,2} QPS/recall points.

Found with this harness (recorded in benchmarks/README.md):
balance=1.5 at 10.5M/8192 -> C=10664, max_nblk 17->8, nprobe=1
251k QPS @ 0.991 (was 156k), nprobe=2 178k @ 1.0000 (was 103k).

Corpus/GT identical to benchmarks/demo_10m.py (bf16 store; the GT is
the streaming two-pass kernel — same scoring contract).
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
    N = 10_485_760 if on_tpu else 16_384
    d, Q, k = (384, 256, 10) if on_tpu else (64, 16, 5)
    C = 8192 if on_tpu else 64
    n_centers = max(N // 1024, 64)
    sigma = 0.35 / np.sqrt(d)
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_dev = jnp.asarray(centers)
    interp = _use_interpret()
    M_LO, M_HI = (4, 20) if on_tpu else (2, 4)
    GEN = 1_048_576 if on_tpu else 16_384

    def note(m):
        print(f"[bal] {m}", file=sys.stderr, flush=True)

    @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(2,))
    def gen_chunk(key, n, buf, offset):
        k1, k2 = jax.random.split(key)
        assign = jax.random.randint(k1, (n,), 0, n_centers)
        x = centers_dev[assign] + sigma * jax.random.normal(k2, (n, d))
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return jax.lax.dynamic_update_slice(
            buf, x.astype(jnp.bfloat16), (offset, 0))

    E = jnp.zeros((N, d), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    for off in range(0, N, GEN):
        key, sub = jax.random.split(key)
        E = gen_chunk(sub, min(GEN, N - off), E, off)
    jax.block_until_ready(E)
    note("corpus ready")

    q_host = (centers[rng.integers(0, n_centers, Q)]
              + sigma * rng.standard_normal((Q, d)).astype(np.float32))
    q_host /= np.linalg.norm(q_host, axis=1, keepdims=True)
    q = jnp.asarray(q_host.astype(np.float32))
    gt = jax.jit(functools.partial(
        twopass_topk_raw, k=k, block_rows=4096 if on_tpu else 2048,
        bin_width=64 if on_tpu else 8, interpret=interp))
    _, eids = gt(E, jnp.int32(N), q)
    eids = np.asarray(eids)
    cnt = jnp.int32(N)
    note("gt done")

    QS = jnp.asarray(
        (centers[rng.integers(0, n_centers, (M_HI, Q))]
         + sigma * rng.standard_normal((M_HI, Q, d))).astype(np.float32))
    QS = QS / jnp.linalg.norm(QS, axis=2, keepdims=True)
    np.asarray(jnp.sum(QS))

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
        note(f"{label}: {dt*1e3:.3f} ms/batch ({Q/dt:.0f} QPS)")
        return dt

    out = {"rows": N, "clusters_base": C, "backend": jax.default_backend(),
           "sweep": []}
    U = 4
    ivf = None
    for bal in ((0.0, 1.5, 2.0) if on_tpu else (0.0, 1.5)):
        del ivf  # free the previous build BEFORE the next (HBM: two
        ivf = None  # 10M fine copies + master do not fit together)
        t0 = time.perf_counter()
        ivf = IVF2.build(E, N, n_clusters=C, iters=6,
                         fine_dtype="int8" if on_tpu else "bf16",
                         seed_batch=16384, balance=bal)
        jax.block_until_ready(ivf.E_c3)
        build_s = time.perf_counter() - t0
        entry = {"balance": bal, "build_s": round(build_s, 1),
                 "clusters": ivf.n_clusters,
                 "max_nblk": int(ivf.nblk_h.max()), "points": []}
        note(f"bal={bal}: build {build_s:.0f}s C={ivf.n_clusters} "
             f"max_nblk={entry['max_nblk']}")
        for nprobe in (1, 2):
            L = ivf.slots_for_nprobe(nprobe)
            L = ((L + U - 1) // U) * U
            core = functools.partial(ivf2_search_core, k=k, nprobe=nprobe,
                                     L=L, tail_max=0, U=U, interpret=interp)

            @functools.partial(jax.jit, static_argnames=("m",))
            def chain(E, Ec, sc, pm, qs, m, core=core, ivf=ivf):
                def step(carry, qq):
                    v, _ = core(E, Ec, sc, pm, ivf.centroids, ivf.blk_start,
                                ivf.nblk, ivf.counts, cnt, cnt,
                                qq + carry * 1e-9)
                    return jnp.mean(v), None

                carry, _ = jax.lax.scan(step, 0.0, qs[:m])
                return carry

            dt = slope(
                lambda m: chain(E, ivf.E_c3, ivf.scales3, ivf.perm, QS, m),
                f"bal={bal} nprobe={nprobe} (L={L})")
            _, ids = jax.jit(core)(E, ivf.E_c3, ivf.scales3, ivf.perm,
                                   ivf.centroids, ivf.blk_start, ivf.nblk,
                                   ivf.counts, cnt, cnt, q)
            got = np.asarray(ids)
            rec = float(np.mean(
                [len(set(eids[i]) & set(got[i])) / k for i in range(Q)]))
            entry["points"].append({"nprobe": nprobe, "L": L,
                                    "qps": round(Q / dt, 1),
                                    "recall_at_10": round(rec, 4)})
        out["sweep"].append(entry)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
