#!/usr/bin/env python3
"""Stage breakdown of the IVF2 search core at 10M (r3.5).

demo_10m measures the END-TO-END core; this tool resolves where the
time sits at the throughput point (nprobe=1: 7.26 ms/batch = 28 us/q
while the fine stage's own traffic — Q x L x SLAB x d int8 = 503 MB —
is only ~0.7 ms at the 700 GB/s the binmax kernels sustain):

  a. centroid scoring + block_lists alone
  b. _fine_binmax_call alone (pass A: dot + max, no selection)
  c. fine_call alone (the selecting kernel), kf = {10, 20}
  d. fine_call at U = 8 (DMA amortization A/B)
  e. full ivf2_search_core (reference)
  f. master rescore alone (the (Q, kf [+tail]) row gather + einsum)

All timings chained-scan slope (relay RTT cancels).  Corpus identical
to benchmarks/demo_10m.py (same seed / cluster generator).
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

    from modular_rag_system_tpu.ops.fused_topk import _use_interpret
    from modular_rag_system_tpu.ops.ivf2 import (
        IVF2,
        _fine_binmax_call,
        block_lists,
        fine_call,
        ivf2_search_core,
    )

    on_tpu = jax.default_backend() == "tpu"
    # CPU smoke must stay tiny: interpret-mode Pallas is Python-loop slow
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
        print(f"[brk] {m}", file=sys.stderr, flush=True)

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

    ivf = IVF2.build(E, N, n_clusters=C, iters=6, fine_dtype="int8",
                     seed_batch=16384)
    jax.block_until_ready(ivf.E_c3)
    note(f"build done; max_nblk={int(ivf.nblk_h.max())}")

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
        note(f"{label}: {dt*1e3:.3f} ms/batch")
        return dt * 1e3

    out = {"rows": N, "Q": Q, "k": k, "clusters": C,
           "backend": jax.default_backend(), "stages_ms": {}}
    U = 4

    # NOTE: every large array rides as an explicit jit ARGUMENT — a
    # closure would bake the 4.4 GB fine copy into the HLO as a constant
    # and the remote compile service rejects the body (HTTP 413)
    def chain(fn, *big):
        @functools.partial(jax.jit, static_argnames=("m",))
        def c(qs, m, *big):
            def step(carry, qq):
                r = fn(qq + carry * 1e-9, *big)
                return jnp.mean(r[0] if isinstance(r, tuple) else r), None
            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry
        return lambda m: c(QS, m, *big)

    for nprobe in ((1, 2) if on_tpu else (1,)):
        L = ivf.slots_for_nprobe(nprobe)
        L = ((L + U - 1) // U) * U
        tag = f"np{nprobe}"

        # a. coarse stage only (tables are KB-sized; closure is fine)
        def coarse(qq, L=L, nprobe=nprobe):
            cs = jnp.dot(qq, ivf.centroids.T,
                         preferred_element_type=jnp.float32)
            _, probes = jax.lax.top_k(cs, nprobe)
            blk, vcnt = block_lists(probes, ivf.blk_start, ivf.nblk,
                                    ivf.counts, L)
            return blk.astype(jnp.float32), vcnt
        out["stages_ms"][f"{tag}_coarse"] = slope(chain(coarse),
                                                  f"{tag} coarse")

        # b/c/d: fine kernels on fixed block lists (coarse cost excluded
        # by reusing one query's lists; per-step work is shape-bound)
        q0 = QS[0]
        cs = jnp.dot(q0, ivf.centroids.T, preferred_element_type=jnp.float32)
        _, probes0 = jax.lax.top_k(cs, nprobe)
        blk0, vcnt0 = block_lists(probes0, ivf.blk_start, ivf.nblk,
                                  ivf.counts, L)
        blk0 = jax.device_put(blk0)
        vcnt0 = jax.device_put(vcnt0)

        def fine_only(qq, Ec, sc, kf):
            v, s = fine_call(Ec, sc, qq, blk0, vcnt0, kf, U, interp)
            return v

        for kf in (k, 2 * k):
            out["stages_ms"][f"{tag}_fine_kf{kf}"] = slope(
                chain(functools.partial(fine_only, kf=kf),
                      ivf.E_c3, ivf.scales3),
                f"{tag} fine_call kf={kf}")

        def binmax_only(qq, Ec, sc):
            return _fine_binmax_call(Ec, sc, qq, blk0, vcnt0, U, interp)
        out["stages_ms"][f"{tag}_binmax"] = slope(
            chain(binmax_only, ivf.E_c3, ivf.scales3),
            f"{tag} binmax passA")

        if L % 8 == 0:
            def fine_u8(qq, Ec, sc):
                v, s = fine_call(Ec, sc, qq, blk0, vcnt0, 2 * k, 8, interp)
                return v
            out["stages_ms"][f"{tag}_fine_U8"] = slope(
                chain(fine_u8, ivf.E_c3, ivf.scales3), f"{tag} fine U=8")

        # XLA selection stage over the full block list (r3.5)
        from modular_rag_system_tpu.ops.ivf2 import fine_call_xla

        def fine_x(qq, Ec, sc, kf):
            v, s = fine_call_xla(Ec, sc, qq, blk0, vcnt0, kf, U, interp)
            return v

        for kf in (k, 2 * k):
            out["stages_ms"][f"{tag}_finexla_kf{kf}"] = slope(
                chain(functools.partial(fine_x, kf=kf),
                      ivf.E_c3, ivf.scales3),
                f"{tag} fine_xla kf={kf}")

        # f. master rescore of kf candidates (row gather + einsum)
        def rescore(qq, Em, kf=2 * k):
            ids = jnp.clip(
                (jnp.arange(Q * kf, dtype=jnp.int32) * 40961) % N,
                0, N - 1).reshape(Q, kf)
            rows = Em[ids].astype(jnp.float32)
            return jnp.einsum("qd,qcd->qc", qq, rows,
                              preferred_element_type=jnp.float32)
        out["stages_ms"][f"{tag}_rescore"] = slope(chain(rescore, E),
                                                   f"{tag} master rescore")

        # e. full core
        core = functools.partial(ivf2_search_core, k=k, nprobe=nprobe,
                                 L=L, tail_max=0, U=U, interpret=interp)

        def full(qq, Em, Ec, sc, pm):
            v, r = core(Em, Ec, sc, pm, ivf.centroids,
                        ivf.blk_start, ivf.nblk, ivf.counts, cnt, cnt, qq)
            return v
        out["stages_ms"][f"{tag}_full"] = slope(
            chain(full, E, ivf.E_c3, ivf.scales3, ivf.perm),
            f"{tag} FULL")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
