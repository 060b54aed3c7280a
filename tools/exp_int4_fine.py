#!/usr/bin/env python3
"""int4 vs int8 IVF2 fine copy at 10M x 384 on one chip.

The fine stage is DMA-bound on its slab reads (benchmarks/README.md
"IVF2"), so the packed int4 copy (ops/ivf2.py, two rows per byte along
the sublane axis) should approach 2x the int8 curve at low nprobe.
4-bit scores only RANK candidates — the master rescore keeps returned
scores exact — so the cost is coverage: measured here as recall@10 vs
the streaming exact kernel at refine_extra = k (default) and 3k.

Same harness as benchmarks/demo_10m.py: on-device chunked clustered
corpus, chained-scan slope timing (relay RTT cancels).  Builds int8
first, measures, FREES it, then builds int4 (both copies at once next
to the 8 GB master would crowd 16 GB HBM).

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
    N = 10_485_760 if on_tpu else 131_072
    d, Q, k = 384, 256, 10
    C = 8192 if on_tpu else 256
    n_centers = max(N // 1024, 64)
    sigma = 0.35 / np.sqrt(d)
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_dev = jnp.asarray(centers)
    interp = _use_interpret()
    M_LO, M_HI = (4, 20) if on_tpu else (2, 4)

    def note(m):
        print(f"[int4] {m}", file=sys.stderr, flush=True)

    GEN = 1_048_576 if on_tpu else 65_536

    @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(2,))
    def gen_chunk(key, n, buf, offset):
        k1, k2 = jax.random.split(key)
        assign = jax.random.randint(k1, (n,), 0, n_centers)
        x = centers_dev[assign] + sigma * jax.random.normal(k2, (n, d))
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return jax.lax.dynamic_update_slice(
            buf, x.astype(jnp.bfloat16), (offset, 0))

    t0 = time.perf_counter()
    E = jnp.zeros((N, d), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    for off in range(0, N, GEN):
        key, sub = jax.random.split(key)
        E = gen_chunk(sub, min(GEN, N - off), E, off)
    jax.block_until_ready(E)
    note(f"corpus generated in {time.perf_counter() - t0:.0f}s")

    q_host = (centers[rng.integers(0, n_centers, Q)]
              + sigma * rng.standard_normal((Q, d))).astype(np.float32)
    q_host /= np.linalg.norm(q_host, axis=1, keepdims=True)
    q = jnp.asarray(q_host)

    gt = jax.jit(functools.partial(
        twopass_topk_raw, k=k, block_rows=4096,
        bin_width=64 if on_tpu else 8, interpret=interp))
    _, eids = gt(E, jnp.int32(N), q)
    eids = np.asarray(eids)
    note("ground truth done")

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

    out = {"rows": N, "clusters": C, "backend": jax.default_backend(),
           "tiers": {}}
    U = 4
    for fdt in ("int8", "int4"):
        t0 = time.perf_counter()
        ivf = IVF2.build(E, N, n_clusters=C, iters=6, fine_dtype=fdt,
                         seed_batch=16384, balance=1.5)
        jax.block_until_ready(ivf.E_c3)
        build_s = time.perf_counter() - t0
        fine_gb = ivf.E_c3.size * ivf.E_c3.dtype.itemsize / 1e9
        note(f"{fdt} build {build_s:.0f}s; nblocks={ivf.nblocks} "
             f"max_nblk={int(ivf.nblk_h.max())} fine={fine_gb:.2f} GB")
        curve = []
        for nprobe in (1, 2, 4):
            for extra in (k, 3 * k, 5 * k):
                if fdt == "int8" and extra != k:
                    continue  # int8 default curve is already recorded
                L = ivf.slots_for_nprobe(nprobe)
                L = ((L + U - 1) // U) * U
                core = functools.partial(
                    ivf2_search_core, k=k, nprobe=nprobe, L=L, tail_max=0,
                    U=U, interpret=interp, refine_extra=extra)
                sc3 = ivf.scales3

                @functools.partial(jax.jit, static_argnames=("m",))
                def chain(E, Ec, sc, perm, cents, bs, nb, cn, qs, m,
                          core=core):
                    def step(carry, qq):
                        v, _ = core(E, Ec, sc, perm, cents, bs, nb, cn,
                                    cnt, cnt, qq + carry * 1e-9)
                        return jnp.mean(v), None

                    carry, _ = jax.lax.scan(step, 0.0, qs[:m])
                    return carry

                dt = slope(
                    lambda m: chain(E, ivf.E_c3, sc3, ivf.perm,
                                    ivf.centroids, ivf.blk_start, ivf.nblk,
                                    ivf.counts, QS, m),
                    f"{fdt} nprobe={nprobe} extra={extra} (L={L})")
                _, ids = jax.jit(core)(E, ivf.E_c3, sc3, ivf.perm,
                                       ivf.centroids, ivf.blk_start,
                                       ivf.nblk, ivf.counts, cnt, cnt, q)
                got = np.asarray(ids)
                recall = float(np.mean(
                    [len(set(eids[i]) & set(got[i])) / k for i in range(Q)]))
                curve.append({"nprobe": nprobe, "refine_extra": extra,
                              "qps": round(Q / dt, 1),
                              "recall_at_10": round(recall, 4),
                              "ms_per_batch": round(dt * 1e3, 2)})
        out["tiers"][fdt] = {"build_s": round(build_s, 1),
                             "fine_gb": round(fine_gb, 2), "curve": curve}
        del ivf, sc3
        note(f"{fdt} done; freeing fine copy")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
