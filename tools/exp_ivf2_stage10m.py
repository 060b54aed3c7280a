#!/usr/bin/env python3
"""Stage-resolved decomposition of the IVF2 nprobe=1 path at 10.5M x 384.

The r3.5 score-dump + balance-split work moved the fine stage near its
DMA roofline, but the headline (251k QPS = ~1.02 ms per 256-query
batch) was never re-decomposed afterwards: the only published breakdown
(tools/exp_ivf2_breakdown.py) predates the dump path and measured the
SELECTING kernel.  This measures the CURRENT production route stage by
stage so the next optimization targets the real bottleneck:

  a  coarse only: q x centroids matmul + top_k(nprobe) + block_lists
  b  + score-dump fine kernel (raw scores streamed, no selection)
  c  + selection (block sort, positional lax.top_k, slot map = fine_call_xla)
  d  full ivf2_search_core (adds perm gather + master rescore + final select)

All device arrays are passed as jit ARGUMENTS (a closed-over 10M-row
matrix is lowered as a captured constant -- the 4.7 GB constant hashing
makes every chain compile take minutes).

Timing: chained-scan slope, same convention as benchmarks/demo_10m.py.
Prints one JSON line with per-stage ms and derived deltas.
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
        IVF2, SLAB, block_lists, fine_scores_call, fine_call_xla,
        ivf2_search_core)

    N, d, Q, k, C = 10_485_760, 384, 256, 10, 8192
    n_centers = N // 1024
    sigma = 0.35 / np.sqrt(d)
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_dev = jnp.asarray(centers)
    interp = _use_interpret()
    M_LO, M_HI = 4, 20

    @functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(3,))
    def gen_chunk(key, cdev, n, buf, offset):
        k1, k2 = jax.random.split(key)
        assign = jax.random.randint(k1, (n,), 0, n_centers)
        x = cdev[assign] + sigma * jax.random.normal(k2, (n, d))
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return jax.lax.dynamic_update_slice(
            buf, x.astype(jnp.bfloat16), (offset, 0))

    E = jnp.zeros((N, d), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    for off in range(0, N, 1_048_576):
        key, sub = jax.random.split(key)
        E = gen_chunk(sub, centers_dev, 1_048_576, E, off)
    jax.block_until_ready(E)
    print("corpus done", file=sys.stderr, flush=True)

    ivf = IVF2.build(E, N, n_clusters=C, iters=6, fine_dtype="int8",
                     seed_batch=16384, balance=1.5)
    jax.block_until_ready(ivf.E_c3)
    print("build done", file=sys.stderr, flush=True)

    QS = jnp.asarray((centers[rng.integers(0, n_centers, (M_HI, Q))]
                      + sigma * rng.standard_normal((M_HI, Q, d))
                      ).astype(np.float32))
    QS = QS / jnp.linalg.norm(QS, axis=2, keepdims=True)
    np.asarray(jnp.sum(QS))
    cnt = jnp.int32(N)
    nprobe, U = 1, 4
    L = ivf.slots_for_nprobe(nprobe)
    L = ((L + U - 1) // U) * U
    kf = 2 * k  # int8 default over-selection

    def slope(fn, args):
        g = lambda m: float(np.asarray(fn(*args, m=m)))
        g(M_LO)
        g(M_HI)
        ts = {M_LO: [], M_HI: []}
        for _ in range(4):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter()
                g(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO) * 1e3  # ms

    def coarse(qq, cents, bs, nb, cn):
        cs = jnp.dot(qq, cents.T, preferred_element_type=jnp.float32)
        _, probes = jax.lax.top_k(cs, nprobe)
        blk, vcnt = block_lists(probes, bs, nb, cn, L)
        return cs, blk, vcnt

    def chain(body, nargs):
        # body(qq, *arrays) -> scalar; arrays passed positionally so jit
        # sees them as arguments, never as captured constants
        @functools.partial(jax.jit, static_argnames=("m",))
        def f(qs, *arrays, m):
            def step(carry, qq):
                return jnp.mean(body(qq + carry * 1e-9, *arrays)), None
            carry, _ = jax.lax.scan(step, jnp.float32(0.0), qs[:m])
            return carry
        return f

    cents, bs, nb, cn = ivf.centroids, ivf.blk_start, ivf.nblk, ivf.counts
    Ec, sc3, perm = ivf.E_c3, ivf.scales3, ivf.perm

    # a: coarse only
    body_a = lambda qq, cents, bs, nb, cn: jnp.mean(
        coarse(qq, cents, bs, nb, cn)[1].astype(jnp.float32))
    t_a = slope(chain(body_a, 4), (QS, cents, bs, nb, cn))
    print("a done", file=sys.stderr, flush=True)

    # b: coarse + dump kernel (scores streamed, no selection)
    def body_b(qq, cents, bs, nb, cn, Ec, sc3):
        cs, blk, vcnt = coarse(qq, cents, bs, nb, cn)
        key2 = jnp.where(vcnt > 0, blk, jnp.int32(2 ** 30))
        order = jnp.argsort(key2, axis=1)
        blk2 = jnp.take_along_axis(blk, order, axis=1)
        vc2 = jnp.take_along_axis(vcnt, order, axis=1)
        flat = fine_scores_call(Ec, sc3, qq, blk2, vc2, U, interp)
        return jnp.max(flat)

    t_b = slope(chain(body_b, 6), (QS, cents, bs, nb, cn, Ec, sc3))
    print("b done", file=sys.stderr, flush=True)

    # c: coarse + full fine_call_xla (adds the positional top_k + slot map)
    def body_c(qq, cents, bs, nb, cn, Ec, sc3):
        cs, blk, vcnt = coarse(qq, cents, bs, nb, cn)
        v, s = fine_call_xla(Ec, sc3, qq, blk, vcnt, kf, U, interp)
        return jnp.mean(v)

    t_c = slope(chain(body_c, 6), (QS, cents, bs, nb, cn, Ec, sc3))
    print("c done", file=sys.stderr, flush=True)

    # d: full core (adds perm gather + master rescore + final select)
    def body_d(qq, cents, bs, nb, cn, Ec, sc3, perm, E):
        v, _ = ivf2_search_core(
            E, Ec, sc3, perm, cents, bs, nb, cn, cnt, cnt, qq,
            k=k, nprobe=nprobe, L=L, tail_max=0, U=U, interpret=interp)
        return jnp.mean(v)

    t_d = slope(chain(body_d, 8), (QS, cents, bs, nb, cn, Ec, sc3, perm, E))
    print("d done", file=sys.stderr, flush=True)

    out = {
        "N": N, "Q": Q, "L": L, "nprobe": nprobe,
        "coarse_ms": round(t_a, 3),
        "plus_dump_ms": round(t_b, 3),
        "plus_select_ms": round(t_c, 3),
        "full_core_ms": round(t_d, 3),
        "deltas_ms": {
            "dump_kernel": round(t_b - t_a, 3),
            "selection": round(t_c - t_b, 3),
            "rescore": round(t_d - t_c, 3),
        },
        "qps_full": round(Q / (t_d / 1e3)),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
