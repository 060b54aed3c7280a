#!/usr/bin/env python3
"""block_rows sweep for the int8 mixed two-pass at 1M x 384.

docs/kernels.md records pass-1 int8 at 0.69 ms (Q=256) = ~580-640 GB/s
effective vs the ~750 GB/s the bf16 pass-1 sustains — ~20% off its own
roofline.  The only untried knob is the grid tile: block_rows sets the
per-step DMA size (4096 x 384 int8 = 1.5 MB) and the grid length, so a
bigger tile amortizes per-step overhead (fewer grid steps, larger DMAs)
until VMEM or pipelining loses.  This sweeps block_rows for pass-1
alone AND the full mixed path, chained-scan slope timing.

Usage: PYTHONPATH=... python tools/exp_int8_pass1_sweep.py
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
    from modular_rag_system_tpu.ops.fused_topk import _max_block_rows, _use_interpret
    from modular_rag_system_tpu.ops.quantize import quantize_rows

    on_tpu = jax.default_backend() == "tpu"
    N = 1_048_576 if on_tpu else 16_384
    d, Q, k = 384, (256 if on_tpu else 64), 10
    M_LO, M_HI = (4, 68) if on_tpu else (2, 4)
    bw = 32
    interp = _use_interpret()

    def note(m):
        print(f"[sweep] {m}", file=sys.stderr, flush=True)

    note(f"corpus on device ({N}x{d})")

    @jax.jit
    def gen(key):
        e = jax.random.normal(key, (N, d), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    Ej = gen(jax.random.PRNGKey(0))
    E16 = Ej.astype(jnp.bfloat16)
    E_q, scales = quantize_rows(Ej)
    cnt = jnp.int32(N)
    rng = np.random.default_rng(0)
    QS = jnp.asarray(rng.standard_normal((M_HI, Q, d)).astype(np.float32))
    np.asarray(jnp.sum(QS))

    def slope(fn, *ops):
        # NOTE: the corpus rides as an explicit jit ARGUMENT — a closure
        # would embed it as an HLO constant and the remote compile
        # service rejects the body (HTTP 413; see bench.py's NOTE)
        @functools.partial(jax.jit, static_argnames=("m",))
        def chain(ops, qs, m):
            def step(carry, qq):
                v = fn(ops, qq + carry * 1e-9)
                return jnp.mean(v), None

            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        f = lambda m: float(np.asarray(chain(ops, QS, m)))
        f(M_LO)
        f(M_HI)
        ts = {M_LO: [], M_HI: []}
        for _ in range(4):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter()
                f(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)

    nb = N // bw
    scales_bins = scales.reshape(nb, bw)
    max_br = _max_block_rows(d, jnp.int8)
    note(f"max block_rows for int8 d={d}: {max_br}")
    out = {"N": N, "Q": Q, "bin_width": bw, "backend": jax.default_backend(),
           "max_block_rows_int8": int(max_br), "sweep": {}}

    for br in (2048, 4096, 8192, 16384, 32768):
        if br > min(max_br, N):
            continue

        def pass1(ops, qq, br=br):
            Eq_, sb_ = ops
            qmax = jnp.maximum(jnp.max(jnp.abs(qq), axis=1, keepdims=True),
                               1e-12)
            q_i8 = jnp.clip(jnp.round(qq / qmax * 127.0),
                            -127, 127).astype(jnp.int8)
            q_scale = (qmax / 127.0).reshape(1, Q)
            return bt.binmax_int8_call(Eq_, sb_, q_i8, q_scale,
                                       br, bw, interp)

        def mixed(ops, qq, br=br):
            Eq_, sc_, Em_ = ops
            v, _ = bt.twopass_topk_int8_master_raw(
                Eq_, sc_, Em_, cnt, qq, k, br, bw, interp)
            return v

        dt1 = slope(pass1, E_q, scales_bins)
        dt_full = slope(mixed, E_q, scales, E16)
        gbps = N * d / dt1 / 1e9
        out["sweep"][br] = {
            "pass1_ms": round(dt1 * 1e3, 3),
            "pass1_gbps": round(gbps, 1),
            "full_ms": round(dt_full * 1e3, 3),
            "full_qps": round(Q / dt_full, 1),
        }
        note(f"br={br}: pass1 {dt1*1e3:.3f} ms ({gbps:.0f} GB/s), "
             f"full {dt_full*1e3:.3f} ms ({Q/dt_full/1e3:.1f}k QPS)")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
