#!/usr/bin/env python3
"""Dense vs Pallas memory-efficient attention at long sequence lengths.

Measures the full encoder forward (MiniLM-L6 shape, bf16) at
L in {512, 1024, 2048} with both attention impls, plus correctness of
the flash path vs dense on the same params.  The dense path
materializes (B, H, L, L) scores through HBM; the kernel keeps each
query block's row in VMEM (ops/flash_attention.py).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from modular_rag_system_tpu.models.encoder import MiniLMEncoder

    on_tpu = jax.default_backend() == "tpu"
    out = {"backend": jax.default_backend(), "sweep": {}}
    B = 64 if on_tpu else 4
    reps = 8 if on_tpu else 1
    lengths = (512, 1024, 2048) if on_tpu else (64,)

    def note(m):
        print(f"[flash] {m}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    # the capability case: at B=256, L=2048 the dense path's NAIVE
    # score shape is 256*12*2048^2*2 B = 25.8 GB — measured, it does
    # NOT OOM (XLA fuses the attention memory-efficiently) and dense
    # is ~40% faster there; kept as the measured-envelope data point
    cases = [(B, L) for L in lengths] + ([(256, 2048)] if on_tpu else [])
    for B_c, L in cases:
        kw = dict(dim=384, max_seq_len=L, batch_size=B_c, num_layers=6,
                  num_heads=12, mlp_dim=1536, vocab_size=30522,
                  dtype="bfloat16" if on_tpu else "float32")
        dense = MiniLMEncoder(**kw)
        flash = MiniLMEncoder(**kw, attention_impl="flash",
                              params=dense.params)
        ids = rng.integers(5, 30000, (B_c, L)).astype(np.int32)
        n_tok = rng.integers(L // 2, L, B_c)
        mask = (np.arange(L)[None, :] < n_tok[:, None]).astype(np.int32)
        idsj, maskj = jnp.asarray(ids), jnp.asarray(mask)

        res = {}
        e_ref = None
        for name, enc in (("dense", dense), ("flash", flash)):
            try:
                e = np.asarray(enc._apply(enc.params, idsj, maskj))
                t0 = time.perf_counter()
                for _ in range(reps):
                    e = enc._apply(enc.params, idsj, maskj)
                np.asarray(e)
                dt = (time.perf_counter() - t0) / reps
                res[name] = {"ms": round(dt * 1e3, 2),
                             "seq_per_s": round(B_c / dt, 1)}
                if name == "dense":
                    e_ref = np.asarray(e)
                elif e_ref is not None:
                    err = float(np.abs(np.asarray(e) - e_ref).max())
                    res["max_abs_diff"] = round(err, 5)
            except Exception as exc:  # OOM expected for dense at big L*B
                res[name] = {"error": str(exc).splitlines()[0][:120]}
        out["sweep"][f"B{B_c}_L{L}"] = res
        note(f"B={B_c} L={L}: {res}")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
