#!/usr/bin/env python3
"""Measure the mixed int8 two-pass (master pass-2) vs the r3 refine
chain at 1M x 384, Q=256.

The r3 int8 TIER path (twopass_topk_int8_raw at kf=20 + master refine)
measured 3.03 ms at Q=256 (84.5k QPS) because kf widens pass-2 bin
traffic (kb 23 vs 13) AND adds a (Q, kf) row gather.  The mixed path
reads k+1+margin+extra master slabs in pass 2 directly.  This sweeps
``extra_bins`` for the recall/QPS trade and times the refine chain on
the same data for an apples-to-apples comparison.

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

    from modular_rag_system_tpu.ops.binmax_topk import (
        int8_refine_kf,
        refine_against_master,
        twopass_topk_int8_master_raw,
        twopass_topk_int8_raw,
        twopass_topk_raw,
    )
    from modular_rag_system_tpu.ops.exact import exact_topk
    from modular_rag_system_tpu.ops.fused_topk import _use_interpret
    from modular_rag_system_tpu.ops.quantize import quantize_rows

    on_tpu = jax.default_backend() == "tpu"
    N = 1_048_576 if on_tpu else 65_536
    d, Q, k = 384, (256 if on_tpu else 64), 10
    M_LO, M_HI = (4, 68) if on_tpu else (2, 4)
    bw = 32

    def note(m):
        print(f"[i8m] {m}", file=sys.stderr, flush=True)

    @jax.jit
    def gen_corpus(key):
        e = jax.random.normal(key, (N, d), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    Ej = gen_corpus(jax.random.PRNGKey(0))
    E16 = Ej.astype(jnp.bfloat16)
    E_q, scales = quantize_rows(Ej)
    rng = np.random.default_rng(0)
    qh = rng.standard_normal((Q, d)).astype(np.float32)
    qh /= np.linalg.norm(qh, axis=1, keepdims=True)
    qj = jnp.asarray(qh)
    cnt = jnp.int32(N)
    interp = _use_interpret()
    note("corpus + int8 copy ready")

    _, gt = jax.jit(functools.partial(exact_topk, k=k))(Ej, cnt, qj)
    gt = np.asarray(gt)
    note("ground truth done")

    def recall_of(ids):
        ids = np.asarray(ids)
        return float(np.mean(
            [len(set(gt[i]) & set(ids[i])) / k for i in range(Q)]))

    kf = int8_refine_kf(k, N)

    def chain_path(E_q, sc, E16, qq):
        v, r = twopass_topk_int8_raw(E_q, sc, cnt, qq, kf, 4096, bw, interp)
        return refine_against_master(E16, qq, r, k, cand_vals=v)

    def mixed_path(extra):
        def f(E_q, sc, E16, qq):
            return twopass_topk_int8_master_raw(
                E_q, sc, E16, cnt, qq, k, 4096, bw, interp,
                extra_bins=extra)
        return f

    QS = jnp.asarray(rng.standard_normal((M_HI, Q, d)).astype(np.float32))
    np.asarray(jnp.sum(QS))

    def slope_time(raw_fn):
        @functools.partial(jax.jit, static_argnames=("m",))
        def chain(E_q, sc, E16, qs, m):
            def step(carry, qq):
                v, _ = raw_fn(E_q, sc, E16, qq + carry * 1e-9)
                return jnp.mean(v), None
            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        f = lambda m: float(np.asarray(chain(E_q, scales, E16, QS, m)))
        f(M_LO)
        f(M_HI)
        ts = {M_LO: [], M_HI: []}
        for _ in range(4):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter()
                f(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)

    out = {"rows": N, "Q": Q, "bin_width": bw}

    _, ids = jax.jit(chain_path)(E_q, scales, E16, qj)
    rec = recall_of(ids)
    dt = slope_time(chain_path) if on_tpu else float("nan")
    out["refine_chain"] = {"recall_at_10": round(rec, 4),
                          "ms": round(dt * 1e3, 3),
                          "qps": round(Q / dt, 1) if on_tpu else None}
    note(f"refine chain: {out['refine_chain']}")

    out["mixed"] = []
    for extra in (0, 2, 6):
        f = mixed_path(extra)
        _, ids = jax.jit(f)(E_q, scales, E16, qj)
        rec = recall_of(ids)
        dt = slope_time(f) if on_tpu else float("nan")
        row = {"extra_bins": extra, "recall_at_10": round(rec, 4),
               "ms": round(dt * 1e3, 3),
               "qps": round(Q / dt, 1) if on_tpu else None}
        out["mixed"].append(row)
        note(f"mixed extra={extra}: {row}")

    # bf16 exact reference on the same data
    def bf16_path(E_q, sc, E16, qq):
        return twopass_topk_raw(E16, cnt, qq, k, 4096, bw, interp)

    if on_tpu:
        dt = slope_time(bf16_path)
        out["bf16_exact"] = {"ms": round(dt * 1e3, 3),
                             "qps": round(Q / dt, 1)}

    out["backend"] = jax.default_backend()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
