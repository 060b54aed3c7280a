#!/usr/bin/env python3
"""A/B select_bins + pass-2 einsum variants at the production shape.

Stage deltas from ``exp_stage_decomp.py`` drift ~0.1 ms run to run
(TPU-grant contention), so this times all variants back to back in ONE
process with the chained-scan slope, at the int8-mixed production shape
(Qp=256, nb=32768, kb=14; pass-2 slabs (256, 14, 32, 384) bf16).

Variants:
  sel_two    old two-level select_bins (_select_topk over kg*_GROUP)
  sel_three  new three-level (subgroup max -> _select_topk over ks*_SUB)
  sel_gather group top_k + cand_v gather only (isolate the gather term)
  ein_f32    einsum with f32-materialized slabs (old pass-2 scoring)
  ein_bf16   einsum in store dtype, f32 accumulation (new pass-2 scoring)

Prints one JSON line {variant: ms}.
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

    from modular_rag_system_tpu.ops import binmax_topk as bt
    from modular_rag_system_tpu.ops.fused_topk import _select_topk

    on_tpu = jax.default_backend() == "tpu"
    Qp, nb, kb, bw, d = 256, 32768, 14, 32, 384
    if not on_tpu:
        Qp, nb = 8, 2048
    M_LO, M_HI = (4, 68) if on_tpu else (2, 4)
    G_, S_ = bt._GROUP, bt._GROUP // bt._SUB

    # all operands are generated ON DEVICE: uploading the (M_HI, Qp, nb)
    # f32 chain input (2.3 GB) through the host relay can take longer
    # than the whole benchmark when the tunnel is congested
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    BM = jax.jit(lambda k: jax.random.normal(k, (M_HI, Qp, nb)))(k1)
    E16 = jax.jit(
        lambda k: jax.random.normal(k, (nb * bw, d)).astype(jnp.bfloat16)
    )(k2)
    qh = rng.standard_normal((Qp, d)).astype(np.float32)
    q_r = bt._round_to_dtype_f32(jnp.asarray(qh), jnp.bfloat16)

    def sel_two(bm):
        G = nb // bt._GROUP
        g3 = bm.reshape(Qp, G, bt._GROUP)
        gmax = jnp.max(g3, axis=2)
        kg = min(kb + 2, G)
        _, gsel = jax.lax.top_k(gmax, kg)
        cand_v = jnp.take_along_axis(g3, gsel[:, :, None], axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bt._GROUP), 2)
        cand_b = gsel[:, :, None] * bt._GROUP + iota
        _, bins = _select_topk(cand_v.reshape(Qp, kg * bt._GROUP),
                               cand_b.reshape(Qp, kg * bt._GROUP), kb)
        return bins

    def sel_gather(bm):
        G = nb // bt._GROUP
        g3 = bm.reshape(Qp, G, bt._GROUP)
        gmax = jnp.max(g3, axis=2)
        kg = min(kb + 2, G)
        _, gsel = jax.lax.top_k(gmax, kg)
        cand_v = jnp.take_along_axis(g3, gsel[:, :, None], axis=1)
        return (cand_v.sum(axis=(1, 2), keepdims=False).reshape(-1, 1)
                .astype(jnp.int32))

    def sel_direct(bm):
        _, bins = jax.lax.top_k(bm, kb)
        return bins

    def sel_topk2(bm):
        # two-level, but the final selection is a plain lax.top_k over
        # the gathered candidates: group ids sorted ascending make
        # candidate POSITIONS ascend in global bin id, so top_k's
        # lowest-position tie-break IS the lowest-bin-id tie order
        G = nb // G_
        g3 = bm.reshape(Qp, G, G_)
        gmax = jnp.max(g3, axis=2)
        kg = min(kb + 2, G)
        _, gsel = jax.lax.top_k(gmax, kg)
        gsel = jnp.sort(gsel, axis=1)
        cand_v = jnp.take_along_axis(g3, gsel[:, :, None], axis=1)
        _, pos = jax.lax.top_k(cand_v.reshape(Qp, kg * G_), kb)
        return (jnp.take_along_axis(gsel, pos // G_, axis=1) * G_
                + pos % G_)

    def sel_sub(bm):
        # one-level pruning at SUBGROUP granularity: subgroup maxima are
        # a cheap full-stream reduce (32 MB once), top_k widths are 1024
        # then ks*_SUB = 512, and the candidate gather is 512 KB instead
        # of 8 MB.  Position order ascends in id at both levels (natural
        # order, then sorted ssel), so top_k tie-break = lowest bin id.
        SUB = bt._SUB
        ns = nb // SUB
        s3 = bm.reshape(Qp, ns, SUB)
        smax = jnp.max(s3, axis=2)
        ks = min(kb + 2, ns)
        _, ssel = jax.lax.top_k(smax, ks)
        ssel = jnp.sort(ssel, axis=1)
        cand = jnp.take_along_axis(s3, ssel[:, :, None], axis=1)
        _, pos = jax.lax.top_k(cand.reshape(Qp, ks * SUB), kb)
        return (jnp.take_along_axis(ssel, pos // SUB, axis=1) * SUB
                + pos % SUB)

    def sel_sub_iter(bm):
        # like sel_sub but BOTH selections are the iterative id-stable
        # _select_topk (k passes of max+where) instead of lax.top_k's
        # sort lowering — at widths of 1024/512 the loop is far cheaper
        # than a sort
        SUB = bt._SUB
        ns = nb // SUB
        s3 = bm.reshape(Qp, ns, SUB)
        smax = jnp.max(s3, axis=2)
        ks = min(kb + 2, ns)
        sub_ids = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1), (Qp, ns))
        _, ssel = _select_topk(smax, sub_ids, ks)
        ssel = jnp.sort(ssel, axis=1)
        cand = jnp.take_along_axis(s3, ssel[:, :, None], axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, SUB), 2)
        cand_b = ssel[:, :, None] * SUB + iota
        _, bins = _select_topk(cand.reshape(Qp, ks * SUB),
                               cand_b.reshape(Qp, ks * SUB), kb)
        return bins

    variants = {
        "sel_two": sel_two,
        "sel_three": functools.partial(bt.select_bins, kb=kb),
        "sel_gather": sel_gather,
        "sel_direct": sel_direct,
        "sel_topk2": sel_topk2,
        "sel_sub": sel_sub,
        "sel_sub_iter": sel_sub_iter,
    }

    bins0 = jax.jit(lambda b: bt.select_bins(b, kb))(BM[0])

    def ein_f32(slabs_src, qr):
        slabs = slabs_src.reshape(nb, bw, d)[bins0]
        s = jnp.einsum("qd,qkbd->qkb", qr, slabs.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        return jnp.mean(s, keepdims=True)[:1, :1].astype(jnp.int32)

    def ein_bf16(slabs_src, qr):
        slabs = slabs_src.reshape(nb, bw, d)[bins0]
        s = jnp.einsum("qd,qkbd->qkb", qr.astype(slabs_src.dtype), slabs,
                       preferred_element_type=jnp.float32)
        return jnp.mean(s, keepdims=True)[:1, :1].astype(jnp.int32)

    def note(m):
        print(f"[selbins] {m}", file=sys.stderr, flush=True)

    only = sys.argv[1] if len(sys.argv) > 1 else ""
    out = {"Qp": Qp, "nb": nb, "kb": kb}

    def slope(chain_fn):
        f = lambda m: np.asarray(chain_fn(m)).sum()
        f(M_LO); f(M_HI)
        ts = {M_LO: [], M_HI: []}
        for _ in range(4):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter(); f(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)

    for name, fn in variants.items():
        if only and only not in name:
            continue
        @functools.partial(jax.jit, static_argnames=("m",))
        def chain(bms, m, fn=fn):
            def step(carry, bm):
                bins = fn(bm + carry.astype(bm.dtype) * 1e-9)
                return jnp.max(bins).astype(jnp.float32), None
            c, _ = jax.lax.scan(step, 0.0, bms[:m])
            return c
        dt = slope(lambda m: chain(BM, m))
        out[name] = round(dt * 1e3, 3)
        note(f"{name}: {out[name]} ms")

    # pass-2 variants: bins VARY per step (scanned input) so the slab
    # gather cannot be hoisted out of the chain
    BINS = jax.jit(lambda k: jax.random.randint(
        k, (M_HI, Qp, kb), 0, nb, dtype=jnp.int32))(k3)

    def p2_f32(E, bins, qr):
        slabs = E.reshape(nb, bw, d)[bins]
        s = jnp.einsum("qd,qkbd->qkb", qr, slabs.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        return jnp.mean(s)

    def p2_bf16(E, bins, qr):
        slabs = E.reshape(nb, bw, d)[bins]
        s = jnp.einsum("qd,qkbd->qkb", qr.astype(E.dtype), slabs,
                       preferred_element_type=jnp.float32)
        return jnp.mean(s)

    def _p2_full(E, bins, qr, select):
        offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bw), 2)
        rid_flat = ((bins * bw)[:, :, None] + offs).reshape(Qp, kb * bw)
        slabs = E.reshape(nb, bw, d)[bins]
        s = jnp.einsum("qd,qkbd->qkb", qr.astype(E.dtype), slabs,
                       preferred_element_type=jnp.float32
                       ).reshape(Qp, kb * bw)
        return select(s, rid_flat)

    def p2_full_old(E, bins, qr):
        # id-stable _select_topk over kb*bw (the current production tail)
        def sel(s, rid):
            v, i = _select_topk(s, rid, 10)
            return jnp.mean(v) + jnp.min(i).astype(jnp.float32) * 1e-12
        return _p2_full(E, bins, qr, sel)

    def p2_full_topk(E, bins, qr):
        # bins pre-sorted ascending -> rid ascends with position ->
        # lax.top_k tie-break = lowest global id
        def sel(s, rid):
            v, pos = jax.lax.top_k(s, 10)
            i = jnp.take_along_axis(rid, pos, axis=1)
            return jnp.mean(v) + jnp.min(i).astype(jnp.float32) * 1e-12
        return _p2_full(E, jnp.sort(bins, axis=1), qr, sel)

    QS = jnp.asarray(rng.standard_normal((M_HI, Qp, d)).astype(np.float32))
    for name, fn in (("ein_f32", ein_f32), ("ein_bf16", ein_bf16),
                     ("p2_f32", p2_f32), ("p2_bf16", p2_bf16),
                     ("p2_full_old", p2_full_old),
                     ("p2_full_topk", p2_full_topk)):
        if only and only not in name:
            continue
        if name.startswith("p2"):
            @functools.partial(jax.jit, static_argnames=("m",))
            def chain(E, bns, qs, m, fn=fn):
                def step(carry, xs):
                    bns_i, qq = xs
                    r = fn(E, bns_i, qq + carry * 1e-9)
                    return r.astype(jnp.float32).reshape(()) * 1e-9, None
                c, _ = jax.lax.scan(step, 0.0, (bns[:m], qs[:m]))
                return c
            dt = slope(lambda m: chain(E16, BINS, QS, m))
        else:
            @functools.partial(jax.jit, static_argnames=("m",))
            def chain(E, qs, m, fn=fn):
                def step(carry, qq):
                    r = fn(E, qq + carry * 1e-9)
                    return r.astype(jnp.float32).reshape(()) * 1e-9, None
                c, _ = jax.lax.scan(step, 0.0, qs[:m])
                return c
            dt = slope(lambda m: chain(E16, QS, m))
        out[name] = round(dt * 1e3, 3)
        note(f"{name}: {out[name]} ms")

    out["backend"] = jax.default_backend()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
