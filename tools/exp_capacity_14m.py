#!/usr/bin/env python3
"""Capacity demo: 14.7M x 384 searched on ONE v5e chip via the int4 tier.

The int8 fine copy caps a single chip at ~10.5M rows (8.05 GB bf16
master + 4.63 GB fine = 12.7 GB).  The int4 residual copy halves the
fine bytes, so 14 x 2^20 = 14,680,064 rows fit: 11.27 GB master +
3.07 GB fine (measured; 9,552 post-split clusters) ~= 14.3 GB —
beyond what any other tier can serve on one chip at ANN speed.  This
measures build time, the exact-kernel baseline, and the int4 curve
over a refine_extra sweep (None = the adaptive pool/12 default, plus
300/600): recorded run — 142.1k QPS @ recall 0.930 at extra=100,
69.6k @ 0.9934 at 300, 45.4k @ 0.9984 at 600, vs exact 13.1k @ 1.0.

Same harness as demo_10m.py: on-device chunked clustered corpus,
chained-scan slope timing (relay RTT cancels).  Prints one JSON line.
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
    # CPU smoke stays tiny: interpret-mode Pallas is Python-loop slow
    # (verify-skill note: <=16k rows for kernel-heavy paths)
    N = 14 * (1 << 20) if on_tpu else 16_384
    d, Q, k = 384, (256 if on_tpu else 32), 10
    C = 8192 if on_tpu else 64
    n_centers = max(N // 1024, 64)
    sigma = 0.35 / np.sqrt(d)
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_dev = jnp.asarray(centers)
    interp = _use_interpret()
    M_LO, M_HI = (4, 20) if on_tpu else (2, 4)

    def note(m):
        print(f"[14m] {m}", file=sys.stderr, flush=True)

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
    gen_s = time.perf_counter() - t0
    note(f"corpus generated in {gen_s:.0f}s "
         f"({N * d * 2 / 1e9:.2f} GB master)")

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

    @functools.partial(jax.jit, static_argnames=("m",))
    def chain_exact(E, qs, m):
        def step(carry, qq):
            v, _ = twopass_topk_raw(E, cnt, qq + carry * 1e-9, k, 4096,
                                    64 if on_tpu else 8, interp)
            return jnp.mean(v), None

        carry, _ = jax.lax.scan(step, 0.0, qs[:m])
        return carry

    dt_exact = slope(lambda m: chain_exact(E, QS, m), "exact twopass")

    t0 = time.perf_counter()
    ivf = IVF2.build(E, N, n_clusters=C, iters=6, fine_dtype="int4",
                     seed_batch=16384, balance=1.5)
    jax.block_until_ready(ivf.E_c3)
    build_s = time.perf_counter() - t0
    fine_gb = ivf.E_c3.size * ivf.E_c3.dtype.itemsize / 1e9
    note(f"int4 build {build_s:.0f}s; fine {fine_gb:.2f} GB; "
         f"nblocks={ivf.nblocks} max_nblk={int(ivf.nblk_h.max())}")

    curve = []
    U = 4
    # refine_extra sweep: at 14M the avg cluster holds ~1.5k rows, so
    # 4-bit ranking needs wider over-selection than the 10M default
    # (recall saturates vs nprobe when kf-bound, not coverage-bound)
    sweep = [(1, None), (1, 300), (1, 600), (2, 300), (2, 600)]
    if not on_tpu:
        sweep = [(1, None), (2, None)]
    for nprobe, extra in sweep:
        L = ivf.slots_for_nprobe(nprobe)
        L = ((L + U - 1) // U) * U
        core = functools.partial(ivf2_search_core, k=k, nprobe=nprobe,
                                 L=L, tail_max=0, U=U, interpret=interp,
                                 refine_extra=extra)
        sc3 = ivf.scales3

        @functools.partial(jax.jit, static_argnames=("m",))
        def chain(E, Ec, sc, perm, cents, bs, nb, cn, qs, m, core=core):
            def step(carry, qq):
                v, _ = core(E, Ec, sc, perm, cents, bs, nb, cn, cnt, cnt,
                            qq + carry * 1e-9)
                return jnp.mean(v), None

            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        dt = slope(
            lambda m: chain(E, ivf.E_c3, sc3, ivf.perm, ivf.centroids,
                            ivf.blk_start, ivf.nblk, ivf.counts, QS, m),
            f"int4 nprobe={nprobe} extra={extra} (L={L})")
        _, ids = jax.jit(core)(E, ivf.E_c3, sc3, ivf.perm, ivf.centroids,
                               ivf.blk_start, ivf.nblk, ivf.counts,
                               cnt, cnt, q)
        got = np.asarray(ids)
        recall = float(np.mean(
            [len(set(eids[i]) & set(got[i])) / k for i in range(Q)]))
        curve.append({"nprobe": nprobe, "refine_extra": extra,
                      "qps": round(Q / dt, 1),
                      "recall_at_10": round(recall, 4),
                      "ms_per_batch": round(dt * 1e3, 2),
                      "vs_exact": round(dt_exact / dt, 2)})

    print(json.dumps({
        "demo": "14.7M rows on one chip (int4 residual fine copy)",
        "rows": N,
        "master_gb": round(N * d * 2 / 1e9, 2),
        "fine_gb": round(fine_gb, 2),
        "clusters": int(ivf.n_clusters),
        "datagen_s": round(gen_s, 1),
        "build_s": round(build_s, 1),
        "exact_qps": round(Q / dt_exact, 1),
        "curve": curve,
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
