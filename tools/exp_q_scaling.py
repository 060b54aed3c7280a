#!/usr/bin/env python3
"""Q-scaling of the reworked two-pass kernels (r3.3 selection tails).

Round 2 measured QPS *regressing* past Q=256 because bin selection and
the pass-2 tail scaled with Q on expensive paths.  With the r3.3
positional-top_k tails both stages scale linearly at a much lower
slope while pass-1's corpus stream AMORTIZES over Q, so throughput
should now climb with batch size.  This measures bf16-exact and
int8-mixed end to end at Q in {256, 512, 1024} on 1M x 384.

Prints one JSON line {path_Q: {ms, qps}} + recall checks at Q=256.
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
    N = 1_048_576 if on_tpu else 16_384
    d, k, br, bw = 384, 10, 4096, 32
    if len(sys.argv) > 1:
        QS_LIST = tuple(int(a) for a in sys.argv[1:] if a.isdigit())
        skip_recall = "norecall" in sys.argv
    else:
        QS_LIST = (256, 512, 1024) if on_tpu else (128,)
        skip_recall = False
    M_LO, M_HI = (4, 36) if on_tpu else (2, 4)
    interp = _use_interpret()

    def note(m):
        print(f"[qscale] {m}", file=sys.stderr, flush=True)

    @jax.jit
    def gen_corpus(key):
        e = jax.random.normal(key, (N, d), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    Ej = gen_corpus(jax.random.PRNGKey(0))
    E16 = Ej.astype(jnp.bfloat16)
    E_q, scales = quantize_rows(Ej)
    scales_flat = scales.reshape(-1)
    cnt = jnp.int32(N)
    rng = np.random.default_rng(0)
    note("corpus ready")

    def bf16_path(E, sc, qq):
        return bt.twopass_topk_raw(E, cnt, qq, k, br, bw, interp)

    def int8_path(Eq_sc, E, qq):
        Eq, sc = Eq_sc
        return bt.twopass_topk_int8_master_raw(Eq, sc, E, cnt, qq, k, br,
                                               bw, interp)

    out = {"rows": N, "dim": d}

    def slope_time(fn, a1, a2, Q):
        QS = jnp.asarray(
            rng.standard_normal((M_HI, Q, d)).astype(np.float32))

        @functools.partial(jax.jit, static_argnames=("m",))
        def chain(x1, x2, qs, m):
            def step(carry, qq):
                v, _ = fn(x1, x2, qq + carry * 1e-9)
                return jnp.mean(v.astype(jnp.float32)), None
            c, _ = jax.lax.scan(step, 0.0, qs[:m])
            return c

        f = lambda m: float(np.asarray(chain(a1, a2, QS, m)))
        f(M_LO); f(M_HI)
        ts = {M_LO: [], M_HI: []}
        for _ in range(4):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter(); f(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)

    for Q in QS_LIST:
        dt = slope_time(bf16_path, E16, None, Q)
        out[f"bf16_q{Q}"] = {"ms": round(dt * 1e3, 3),
                             "qps": round(Q / dt, 1)}
        note(f"bf16 Q={Q}: {out[f'bf16_q{Q}']}")
        dt = slope_time(int8_path, (E_q, scales_flat), E16, Q)
        out[f"int8_q{Q}"] = {"ms": round(dt * 1e3, 3),
                             "qps": round(Q / dt, 1)}
        note(f"int8 Q={Q}: {out[f'int8_q{Q}']}")

    # recall + exactness at Q=256 (or the CPU Q)
    if skip_recall:
        out["backend"] = jax.default_backend()
        print(json.dumps(out))
        return 0
    Q = QS_LIST[0]
    qh = rng.standard_normal((Q, d)).astype(np.float32)
    qh /= np.linalg.norm(qh, axis=1, keepdims=True)
    qj = jnp.asarray(qh)
    _, gt = jax.jit(functools.partial(exact_topk, k=k))(E16, cnt, qj)
    gt = np.asarray(gt)
    # operands as jit ARGUMENTS, never closures (remote-compile 413)
    _, ids_bf = jax.jit(lambda E, qq: bf16_path(E, None, qq))(E16, qj)
    _, ids_i8 = jax.jit(
        lambda Eq, sc, E, qq: int8_path((Eq, sc), E, qq)
    )(E_q, scales_flat, E16, qj)
    out["bf16_exact_ids_match"] = bool(np.array_equal(np.asarray(ids_bf), gt))
    rec = float(np.mean([len(set(gt[i]) & set(np.asarray(ids_i8)[i])) / k
                         for i in range(Q)]))
    out["int8_recall_at_10"] = round(rec, 4)
    note(f"bf16 ids==exact: {out['bf16_exact_ids_match']}, "
         f"int8 recall {rec:.4f}")
    out["backend"] = jax.default_backend()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
