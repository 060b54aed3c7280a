#!/usr/bin/env python3
"""Sweep the two non-roofline stages of the IVF2 nprobe=1 path at 10M.

tools/exp_ivf2_stage10m.py decomposed the 1.0 ms production batch into
dump kernel 0.59 ms (341 GB/s -- 2.2x off the 750 GB/s the exact
kernel's pass 1 sustains), selection 0.25 ms (one lax.top_k over a
2 MB buffer -- ~100x its read time), rescore 0.19 ms (row-gather
bound, expected).  This sweeps candidate fixes for the first two:

  dump:   U=4 (production) vs U=8 (halves the grid-step count -- if
          time halves too, the kernel is per-step-overhead bound, not
          DMA bound)
  select: current lax.top_k over (Q, L*SLAB) with materialized sid
          vs top_k + arithmetic slot map (no 2 MB sid buffer)
          vs iterative argmax (kf passes of max+mask, exact, ties by
             lowest index -- same contract)
          vs two-stage (per-SLAB-block top_kf, then top_kf over L*kf)
          vs approx_max_k (recall_target=0.95; NOT id-exact, measured
             only to bound what a relaxed contract could buy)

Prints one JSON line.  Selection timings are measured on a resident
(Q, L*SLAB) f32 buffer so the kernel cost cancels exactly.
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
        IVF2, SLAB, block_lists, fine_scores_call)

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
    del E
    print("build done", file=sys.stderr, flush=True)

    QS = jnp.asarray((centers[rng.integers(0, n_centers, (M_HI, Q))]
                      + sigma * rng.standard_normal((M_HI, Q, d))
                      ).astype(np.float32))
    QS = QS / jnp.linalg.norm(QS, axis=2, keepdims=True)
    np.asarray(jnp.sum(QS))
    nprobe = 1
    L8 = ivf.slots_for_nprobe(nprobe)
    kf = 2 * k
    NEG = jnp.float32(np.finfo(np.float32).min)

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

    def chain(body):
        @functools.partial(jax.jit, static_argnames=("m",))
        def f(qs, *arrays, m):
            def step(carry, qq):
                return jnp.mean(body(qq + carry * 1e-9, *arrays)), None
            carry, _ = jax.lax.scan(step, jnp.float32(0.0), qs[:m])
            return carry
        return f

    cents, bs, nb, cn = ivf.centroids, ivf.blk_start, ivf.nblk, ivf.counts
    Ec, sc3 = ivf.E_c3, ivf.scales3

    out = {"N": N, "Q": Q, "L": L8, "kf": kf}

    # ---- dump kernel U sweep (includes coarse, which measured ~0) ----
    def dump_body(U):
        L = ((L8 + U - 1) // U) * U

        def body(qq, cents, bs, nb, cn, Ec, sc3):
            cs = jnp.dot(qq, cents.T, preferred_element_type=jnp.float32)
            _, probes = jax.lax.top_k(cs, nprobe)
            blk, vcnt = block_lists(probes, bs, nb, cn, L)
            key2 = jnp.where(vcnt > 0, blk, jnp.int32(2 ** 30))
            order = jnp.argsort(key2, axis=1)
            blk2 = jnp.take_along_axis(blk, order, axis=1)
            vc2 = jnp.take_along_axis(vcnt, order, axis=1)
            flat = fine_scores_call(Ec, sc3, qq, blk2, vc2, U, interp)
            return jnp.max(flat)

        return body

    for U in (4, 8):
        t = slope(chain(dump_body(U)), (QS, cents, bs, nb, cn, Ec, sc3))
        out[f"dump_U{U}_ms"] = round(t, 3)
        print(f"dump U={U} done: {t:.3f}", file=sys.stderr, flush=True)

    # ---- selection variants on a resident score buffer ----
    # one real score buffer (values + realistic -inf pattern).  NOTE:
    # every array is a jit ARGUMENT — closing over the 4.4 GB fine copy
    # captures it as an HLO constant and stalls the remote compile (see
    # the verify skill; this stalled the first run of this tool).
    U = 4

    def mk_flat(qq, cents, bs, nb, cn, Ec, sc3):
        L = L8
        cs = jnp.dot(qq, cents.T, preferred_element_type=jnp.float32)
        _, probes = jax.lax.top_k(cs, nprobe)
        blk, vcnt = block_lists(probes, bs, nb, cn, L)
        key2 = jnp.where(vcnt > 0, blk, jnp.int32(2 ** 30))
        order = jnp.argsort(key2, axis=1)
        blk2 = jnp.take_along_axis(blk, order, axis=1)
        vc2 = jnp.take_along_axis(vcnt, order, axis=1)
        flat = fine_scores_call(Ec, sc3, qq, blk2, vc2, U, interp)
        return flat, blk2

    FLAT, BLK2 = jax.jit(mk_flat)(QS[0], cents, bs, nb, cn, Ec, sc3)
    jax.block_until_ready(FLAT)
    LS = L8 * SLAB

    def sel_topk_sid(qq, flat, blk2):
        f = flat + qq[0, 0] * 1e-12
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, SLAB), 2)
        sid = (blk2[:, :, None] * SLAB + iota).reshape(Q, LS)
        vals, pos = jax.lax.top_k(f, kf)
        slots = jnp.take_along_axis(sid, pos, axis=1)
        return jnp.mean(vals) + jnp.mean(slots.astype(jnp.float32))

    def sel_topk_arith(qq, flat, blk2):
        f = flat + qq[0, 0] * 1e-12
        vals, pos = jax.lax.top_k(f, kf)
        bi = pos // SLAB
        off = pos % SLAB
        slots = jnp.take_along_axis(blk2, bi, axis=1) * SLAB + off
        return jnp.mean(vals) + jnp.mean(slots.astype(jnp.float32))

    def sel_iter(qq, flat, blk2):
        f = flat + qq[0, 0] * 1e-12
        iota = jax.lax.broadcasted_iota(jnp.int32, (Q, LS), 1)

        def step(carry, _):
            fc = carry
            p = jnp.argmax(fc, axis=1)
            v = jnp.max(fc, axis=1)
            fc = jnp.where(iota == p[:, None], NEG, fc)
            return fc, (v, p)

        _, (vs, ps) = jax.lax.scan(step, f, None, length=kf)
        vals, pos = vs.T, ps.T
        bi = pos // SLAB
        off = pos % SLAB
        slots = jnp.take_along_axis(blk2, bi, axis=1) * SLAB + off
        return jnp.mean(vals) + jnp.mean(slots.astype(jnp.float32))

    def sel_2stage(qq, flat, blk2):
        f = (flat + qq[0, 0] * 1e-12).reshape(Q, L8, SLAB)
        v1, p1 = jax.lax.top_k(f, kf)  # (Q, L, kf)
        v1f = v1.reshape(Q, L8 * kf)
        vals, p2 = jax.lax.top_k(v1f, kf)
        bi = p2 // kf
        off = jnp.take_along_axis(
            p1.reshape(Q, L8 * kf), p2, axis=1)
        slots = jnp.take_along_axis(blk2, bi, axis=1) * SLAB + off
        return jnp.mean(vals) + jnp.mean(slots.astype(jnp.float32))

    def sel_approx(qq, flat, blk2):
        f = flat + qq[0, 0] * 1e-12
        vals, pos = jax.lax.approx_max_k(f, kf, recall_target=0.95)
        bi = pos // SLAB
        off = pos % SLAB
        slots = jnp.take_along_axis(blk2, bi, axis=1) * SLAB + off
        return jnp.mean(vals) + jnp.mean(slots.astype(jnp.float32))

    for name, fn in (("sel_topk_sid", sel_topk_sid),
                     ("sel_topk_arith", sel_topk_arith),
                     ("sel_iter", sel_iter),
                     ("sel_2stage", sel_2stage),
                     ("sel_approx", sel_approx)):
        t = slope(chain(fn), (QS, FLAT, BLK2))
        out[f"{name}_ms"] = round(t, 3)
        print(f"{name} done: {t:.3f}", file=sys.stderr, flush=True)

    # id-parity check: variants must reproduce lax.top_k's candidate ids
    ref_v, ref_p = jax.lax.top_k(FLAT, kf)
    iota = jax.lax.broadcasted_iota(jnp.int32, (Q, LS), 1)

    def iter_sel(f):
        def step(carry, _):
            fc = carry
            p = jnp.argmax(fc, axis=1)
            v = jnp.max(fc, axis=1)
            fc = jnp.where(iota == p[:, None], NEG, fc)
            return fc, (v, p)

        _, (vs, ps) = jax.lax.scan(step, f, None, length=kf)
        return vs.T, ps.T

    it_v, it_p = jax.jit(iter_sel)(FLAT)
    out["iter_ids_match"] = bool(np.array_equal(np.asarray(ref_p),
                                                np.asarray(it_p)))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
