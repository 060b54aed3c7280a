#!/usr/bin/env python3
"""Stage-resolved decomposition of the int8 mixed two-pass at 1M x 384.

docs/kernels.md attributes the residual gap to the 0.69 ms pass-1
ceiling to "bin top-k (~0.45 ms) + master pass-2 (~0.85 ms)" — both
estimates inherited from the round-2 bf16 table.  This measures the
r3.2 path stage by stage so the next optimization targets the REAL
bottleneck:

  s1  int8 pass-1 binmax kernel only
  s2  + mask + group-max + group top-k (selection up to candidate gather)
  s3  + full select_bins (adds the id-stable _select_topk over kg*512)
  s4  + XLA slab-gather master pass-2          (current production path)
  s5  same but pass-2 via the Pallas rescan kernel (kernel_rescan=True)

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

    from modular_rag_system_tpu.ops import binmax_topk as bt
    from modular_rag_system_tpu.ops.exact import exact_topk
    from modular_rag_system_tpu.ops.fused_topk import _use_interpret
    from modular_rag_system_tpu.ops.quantize import quantize_rows

    on_tpu = jax.default_backend() == "tpu"
    N = 1_048_576 if on_tpu else 16_384  # interpret-mode Pallas: <=16k
    d, Q, k = 384, (256 if on_tpu else 64), 10
    M_LO, M_HI = (4, 68) if on_tpu else (2, 4)
    bw, br = 32, 4096 if on_tpu else 2048
    nb = N // bw

    def note(m):
        print(f"[decomp] {m}", file=sys.stderr, flush=True)

    @jax.jit
    def gen_corpus(key):
        e = jax.random.normal(key, (N, d), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    Ej = gen_corpus(jax.random.PRNGKey(0))
    E16 = Ej.astype(jnp.bfloat16)
    E_q, scales = quantize_rows(Ej)
    scales_flat = scales.reshape(-1)
    rng = np.random.default_rng(0)
    qh = rng.standard_normal((Q, d)).astype(np.float32)
    qh /= np.linalg.norm(qh, axis=1, keepdims=True)
    qj = jnp.asarray(qh)
    cnt = jnp.int32(N)
    interp = _use_interpret()
    kb = min(k + 1 + bt._MARGIN_BINS + bt._INT8_MIXED_EXTRA_BINS, nb)
    note(f"corpus ready; kb={kb}")

    def prep(qq):
        Qp = bt._round_up(qq.shape[0], bt._LANE)
        if Qp != qq.shape[0]:
            qq = jnp.pad(qq, ((0, Qp - qq.shape[0]), (0, 0)))
        qmax = jnp.maximum(jnp.max(jnp.abs(qq), axis=1, keepdims=True), 1e-12)
        q_i8 = jnp.clip(jnp.round(qq / qmax * 127.0), -127, 127).astype(jnp.int8)
        q_scale = (qmax / 127.0).reshape(1, Qp)
        return qq, q_i8, q_scale

    def masked_bm(Eq, sc, qq):
        # NOTE: operands must arrive as jit arguments — closing over the
        # global device arrays bakes them into the HLO as constants and
        # the remote compile service rejects the body (HTTP 413)
        qq, q_i8, q_scale = prep(qq)
        binmax = bt.binmax_int8_call(
            Eq, sc.reshape(nb, bw), q_i8, q_scale, br, bw, interp
        ).T
        bin_base = jnp.arange(nb, dtype=jnp.int32) * bw
        dead = bin_base >= cnt
        straddle = (bin_base < cnt) & (bin_base + bw > cnt)
        bm = jnp.where(dead[None, :], bt._NEG_INF, binmax)
        return jnp.where(straddle[None, :], jnp.inf, bm), qq

    def s1(Eq, sc, E16_, qq):
        _, q_i8, q_scale = prep(qq)
        out = bt.binmax_int8_call(
            Eq, sc.reshape(nb, bw), q_i8, q_scale, br, bw, interp)
        return (jnp.max(out, axis=0, keepdims=True),
                jnp.zeros((1, 1), jnp.int32))

    def s2(Eq, sc, E16_, qq):
        bm, _ = masked_bm(Eq, sc, qq)
        Qp = bm.shape[0]
        G = nb // bt._GROUP
        g3 = bm.reshape(Qp, G, bt._GROUP)
        gmax = jnp.max(g3, axis=2)
        kg = min(kb + 2, G)
        gv, gsel = jax.lax.top_k(gmax, kg)
        return jnp.mean(gv, keepdims=True)[:1, :1], gsel[:1, :1]

    def s3(Eq, sc, E16_, qq):
        bm, _ = masked_bm(Eq, sc, qq)
        bins = bt.select_bins(bm, kb)
        # the chained-scan carry consumes only the VALUE output — derive
        # it from bins or XLA dead-code-eliminates the whole stage
        return jnp.mean(bins.astype(jnp.float32), keepdims=True)[:1, :1], \
            bins[:1, :1]

    def _bins_rid(Eq, sc, qq):
        bm, qp = masked_bm(Eq, sc, qq)
        bins = bt.select_bins(bm, kb)
        offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bw), 2)
        rid_flat = ((bins * bw)[:, :, None] + offs).reshape(
            bm.shape[0], kb * bw)
        return bins, rid_flat, qp

    def s4a(Eq, sc, E16_, qq):
        # + slab gather only (no scoring): isolates the gather DMA cost
        bins, _, _ = _bins_rid(Eq, sc, qq)
        slabs = E16_.reshape(nb, bw, d)[bins]
        return (jnp.sum(slabs.astype(jnp.float32), axis=(1, 2, 3),
                        keepdims=False).reshape(-1, 1)[:1, :1],
                bins[:1, :1])

    def s4b(Eq, sc, E16_, qq):
        # + einsum scores (no top-k selection)
        bins, rid_flat, qp = _bins_rid(Eq, sc, qq)
        slabs = E16_.reshape(nb, bw, d)[bins]
        q_r = bt._round_to_dtype_f32(qp.astype(jnp.float32), E16_.dtype)
        scores = jnp.einsum("qd,qkbd->qkb", q_r, slabs.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        return jnp.mean(scores, keepdims=True)[:1, :1], bins[:1, :1]

    def s4(Eq, sc, E16_, qq):
        return bt.twopass_topk_int8_master_raw(
            Eq, sc, E16_, cnt, qq, k, br, bw, interp)

    def s5(Eq, sc, E16_, qq):
        return bt.twopass_topk_int8_master_raw(
            Eq, sc, E16_, cnt, qq, k, br, bw, interp, kernel_rescan=True)

    QS = jnp.asarray(rng.standard_normal((M_HI, Q, d)).astype(np.float32))
    np.asarray(jnp.sum(QS))

    def slope_time(raw_fn):
        @functools.partial(jax.jit, static_argnames=("m",))
        def chain(Eq, sc, E16_, qs, m):
            def step(carry, qq):
                v, _ = raw_fn(Eq, sc, E16_, qq + carry * 1e-9)
                return jnp.mean(v.astype(jnp.float32)), None
            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        f = lambda m: float(np.asarray(chain(E_q, scales_flat, E16, QS, m)))
        f(M_LO)
        f(M_HI)
        ts = {M_LO: [], M_HI: []}
        for _ in range(4):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter()
                f(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)

    out = {"rows": N, "Q": Q, "bin_width": bw, "kb": kb}
    stages = [("s1_pass1", s1), ("s2_groupsel", s2), ("s3_selectbins", s3),
              ("s4a_gather", s4a), ("s4b_gather_einsum", s4b),
              ("s4_full_xla_pass2", s4), ("s5_full_kernel_pass2", s5)]
    for name, fn in stages:
        if not on_tpu and name in ("s1_pass1", "s2_groupsel", "s3_selectbins"):
            continue  # interpret-mode stages are meaninglessly slow on CPU
        dt = slope_time(fn)
        out[name] = {"ms": round(dt * 1e3, 3), "qps": round(Q / dt, 1)}
        note(f"{name}: {out[name]}")

    # correctness: s5 must match s4 exactly (same bins, same scores)
    v4, i4 = jax.jit(s4)(E_q, scales_flat, E16, qj)
    v5, i5 = jax.jit(s5)(E_q, scales_flat, E16, qj)
    agree = bool(np.array_equal(np.asarray(i4), np.asarray(i5)))
    _, gtids = jax.jit(functools.partial(exact_topk, k=k))(Ej, cnt, qj)
    gtids = np.asarray(gtids)
    i5n = np.asarray(i5)
    rec5 = float(np.mean(
        [len(set(gtids[i]) & set(i5n[i])) / k for i in range(Q)]))
    out["s5_ids_match_s4"] = agree
    out["s5_recall_at_10"] = round(rec5, 4)
    note(f"s5 ids==s4: {agree}, recall {rec5:.4f}")

    out["backend"] = jax.default_backend()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
