"""Headline benchmark: QPS/chip at recall@10 on a 1M-chunk corpus.

This measures BASELINE.json config 3: a compressed HBM-resident index
(bf16) searched by the two-pass binmax Pallas kernel
(``ops/binmax_topk.py``).  Recall is reported against TWO ground
truths (docs/kernels.md, scoring precision contract): exact search
over the STORED bf16 index (the kernels' exactness contract —
validated 1.0 in-run) and a true-f32 oracle over the source vectors
(measures what bf16 storage itself costs, ~0.989 on this corpus).

``vs_baseline`` compares against the CPU brute-force cosine scan — the
faithful stand-in for the reference's search path
(``ollama_rag_system.py:454-525``: per-row Python/numpy cosine; our CPU
baseline is numpy BLAS matmul + argpartition over the SAME full corpus,
which is strictly FASTER than the reference's loop, so the reported
speedup is a lower bound).  The CPU time is measured on a 1/8 subset and
scaled linearly (documented extrapolation; brute force is linear in N).

Timing method: M kernel invocations are chained inside ONE jit program
(``lax.scan`` with a data dependency between steps) and wall time is the
slope between M=4 and M=68 runs.  The constant per-dispatch relay
round-trip (which varies ~26 ms in this environment) cancels in the
difference, so the slope is pure device time per batch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import functools
import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from modular_rag_system_tpu.ops.binmax_topk import twopass_topk_raw
    from modular_rag_system_tpu.ops.exact import exact_topk
    from modular_rag_system_tpu.ops.fused_topk import _use_interpret, fused_topk_raw

    on_tpu = jax.default_backend() == "tpu"
    N = 1_048_576 if on_tpu else 65_536
    # Q=256 is the throughput-optimal serving batch (measured: 112k QPS
    # vs 88k at Q=128, flattening above); Q=128 is also reported for
    # comparability with round 1
    d, Q, k = 384, (256 if on_tpu else 128), 10
    Q1 = 128
    M_LO, M_HI = (4, 68) if on_tpu else (2, 6)

    rng = np.random.default_rng(0)
    q = rng.standard_normal((Q, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    # corpus is generated ON DEVICE: uploading 1.6 GB through the host
    # relay can take tens of minutes when the tunnel is congested, and
    # the CPU baseline below times an independent same-shape matrix
    # (brute-force matmul cost is data-independent)
    note(f"generating corpus on device ({N}x{d})")

    @jax.jit
    def gen_corpus(key):
        e = jax.random.normal(key, (N, d), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    Ej = gen_corpus(jax.random.PRNGKey(0))
    E16 = Ej.astype(jnp.bfloat16)
    qj = jnp.asarray(q)
    cnt = jnp.int32(N)
    interp = _use_interpret()
    # distinct query batches per chain step (identical inputs could let
    # the compiler or relay dedupe work)
    QS = jnp.asarray(rng.standard_normal((M_HI, Q, d)).astype(np.float32))
    np.asarray(jnp.sum(QS))  # force residency

    # NOTE: the corpus must be an explicit jit ARGUMENT everywhere —
    # closing over it embeds it as an HLO constant, and the remote
    # compile service rejects the ~800 MB request body (HTTP 413)
    def kernel_twopass(E, qq):
        return twopass_topk_raw(E, cnt, qq, k, 4096 if on_tpu else 2048,
                                32, interp)

    def kernel_fused(E, qq):
        return fused_topk_raw(E, cnt, qq, k, 2048, interp)

    @functools.partial(jax.jit, static_argnames=("m", "which"))
    def chain(E, QS, m, which):
        def step(carry, qq):
            fn = kernel_twopass if which == "twopass" else kernel_fused
            v, _ = fn(E, qq + carry * 1e-9)  # data dependency serializes
            return jnp.mean(v), None

        carry, _ = jax.lax.scan(step, 0.0, QS[:m])
        return carry

    def slope_time(which, qs):
        note(f"compiling {which} chains (Q={qs.shape[1]})")
        f = lambda m: float(np.asarray(chain(E16, qs, m, which)))
        f(M_LO)
        f(M_HI)  # compile both
        note(f"timing {which}")
        ts = {M_LO: [], M_HI: []}
        for _ in range(4):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter()
                f(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)

    dt = slope_time("twopass", QS)
    qps = Q / dt
    if on_tpu:
        QS1 = QS[:, :Q1]
        dt128 = slope_time("twopass", QS1)
        fused_dt = slope_time("fused", QS1)
        # int8 TIER path at the serving batch Q=256: mixed two-pass —
        # int8 x int8 MXU pass-1 selects bins, pass-2 rescans the bf16
        # MASTER slabs (r3.2) — similarities master-exact, recall
        # bounded by pass-1 bin coverage (measured 1.0 at the default
        # margin on this corpus; tools/exp_int8_mixed.py)
        from modular_rag_system_tpu.ops.binmax_topk import (
            twopass_topk_int8_master_raw,
        )
        from modular_rag_system_tpu.ops.quantize import quantize_rows

        E_q, scales = quantize_rows(Ej)

        def int8_tier(Eq, sc, E16, qq):
            # block_rows=8192: int8 tiles are 1 byte/elem so the bigger
            # DMA fits VMEM and measures faster (677 vs 642 GB/s pass-1,
            # tools/exp_int8_pass1_sweep.py)
            return twopass_topk_int8_master_raw(Eq, sc, E16, cnt, qq, k,
                                                8192, 32, interp)

        @functools.partial(jax.jit, static_argnames=("m",))
        def chain_i8(Eq, sc, E16, qs, m):
            def step(carry, qq):
                v, _ = int8_tier(Eq, sc, E16, qq + carry * 1e-9)
                return jnp.mean(v), None

            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        note("compiling int8 chains (Q=256, refine)")
        fi8 = lambda m: float(np.asarray(chain_i8(E_q, scales, E16, QS, m)))
        fi8(M_LO)
        fi8(M_HI)
        note("timing int8")
        ts8 = {M_LO: [], M_HI: []}
        for _ in range(4):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter()
                fi8(m)
                ts8[m].append(time.perf_counter() - t0)
        dt_i8 = (min(ts8[M_HI]) - min(ts8[M_LO])) / (M_HI - M_LO)
    else:
        QS1, dt128, fused_dt, dt_i8 = QS, dt, dt, dt

    note("recall check vs exact search")
    # --- recall, two ground truths -------------------------------------
    # 1. CONTRACT recall: exact top-k over the STORED bf16 index (what
    #    any search over this index can possibly return) — the kernels'
    #    exactness claim is against this.
    # 2. f32-ORACLE recall: exact top-k over the f32 source vectors at
    #    Precision.HIGHEST — measures what storing bf16 itself costs.
    #    (The TPU default would silently compute 1-pass bf16 products
    #    here, which is why r2 reported "1.0 vs exact f32": the GT was
    #    bf16-noisy.  See docs/kernels.md, scoring precision contract.)
    from modular_rag_system_tpu.ops.binmax_topk import _round_to_dtype_f32

    vals, ids = jax.jit(kernel_twopass)(E16, qj)
    # the contract rounds q to the store dtype too (validated: 256/256
    # result rows bit-identical to the kernel on this corpus)
    q16 = _round_to_dtype_f32(qj, jnp.bfloat16)
    _, sids = exact_topk(E16, cnt, q16, k)  # stored-data contract GT
    ev, eids = exact_topk(Ej, cnt, qj, k)  # f32 oracle (HIGHEST)
    sids = np.asarray(sids)
    eids = np.asarray(eids)
    gids = np.asarray(ids)
    recall = float(
        np.mean([len(set(sids[i]) & set(gids[i])) / k for i in range(Q)])
    )
    recall_oracle = float(
        np.mean([len(set(eids[i]) & set(gids[i])) / k for i in range(Q)])
    )
    if on_tpu:
        _, i8ids = jax.jit(int8_tier)(E_q, scales, E16, qj)
        i8ids = np.asarray(i8ids)
        recall_i8 = float(np.mean(
            [len(set(sids[i]) & set(i8ids[i])) / k for i in range(Q)]))
        recall_i8_oracle = float(np.mean(
            [len(set(eids[i]) & set(i8ids[i])) / k for i in range(Q)]))
    else:
        recall_i8, recall_i8_oracle = recall, recall_oracle

    # --- semantic quality: recall CURVE vs distractor hardness --------
    # (VERDICT r2 item 9) one in-bench fine-tune + eval per hardness
    # level of the paraphrase corpus: zero query/doc word overlap
    # (lexical baselines ~chance) with shared alias/paraphrase word
    # pools whose size shrinks with hardness (near-alias distractors).
    # The SCALAR reported is the mean over the curve — for it to
    # saturate at 1.0 every level must saturate, so the metric stays
    # strictly between chance and 1.0 and can catch regressions.
    # train_frac=0.4: only 40% of (entity, relation) combinations are
    # seen in training, so the eval demands compositional
    # generalization — at 0.8 the trained encoder saturates every
    # hardness (measured r3.4); the doc-side word pools (synth.py)
    # additionally make distractor docs near-duplicates of the gold.
    sem_levels = (0.6, 0.8, 0.95)
    sem_train_frac = 0.4
    sem_curve = {}
    try:
        import random as _random

        from modular_rag_system_tpu.models.encoder import MiniLMEncoder
        from modular_rag_system_tpu.models.synth import (
            make_paraphrase_corpus,
            recall_at_k,
        )
        from modular_rag_system_tpu.models.train import ContrastiveTrainer
        from modular_rag_system_tpu.parallel.mesh import make_train_mesh

        for sem_h in sem_levels:
            note(f"semantic eval (hardness {sem_h})")
            if on_tpu:
                sem_kw = dict(dim=384, max_seq_len=16, batch_size=256,
                              num_layers=4, num_heads=12, mlp_dim=1536,
                              vocab_size=30522, dtype="float32")
                sem_steps, sem_batch = 300, 128
                sem_corpus = make_paraphrase_corpus(
                    n_entities=40, n_relations=25, seed=0, hardness=sem_h,
                    train_frac=sem_train_frac)
            else:
                sem_kw = dict(dim=128, max_seq_len=12, batch_size=64,
                              num_layers=2, num_heads=4, mlp_dim=256,
                              vocab_size=4096, dtype="float32")
                sem_steps, sem_batch = 120, 64
                sem_corpus = make_paraphrase_corpus(
                    n_entities=12, n_relations=8, seed=0, hardness=sem_h,
                    train_frac=sem_train_frac)
            sem_enc = MiniLMEncoder(**sem_kw)
            sem_mesh = make_train_mesh(1, 1)
            sem_tr = ContrastiveTrainer(sem_enc, sem_mesh,
                                        learning_rate=1e-3)
            sem_pairs = list(zip(
                sem_corpus.train_queries,
                [sem_corpus.docs[i] for i in sem_corpus.train_doc_idx]))
            srng = _random.Random(1)
            for _ in range(sem_steps):
                sample = [sem_pairs[srng.randrange(len(sem_pairs))]
                          for _ in range(sem_batch)]
                sem_tr.step([a for a, _ in sample], [b for _, b in sample])
            sem_tr.sync_encoder()
            sem_curve[str(sem_h)] = round(recall_at_k(sem_enc, sem_corpus,
                                                      k), 4)
        sem_recall = round(sum(sem_curve.values()) / len(sem_curve), 4)
        sem_hardness = (f"mean over {list(sem_levels)} at "
                        f"train_frac={sem_train_frac}")
    except Exception as exc:  # pragma: no cover - keep bench robust
        note(f"semantic eval failed: {exc}")
        sem_recall, sem_hardness = None, None

    # --- CPU baseline: numpy brute force on a subset, scaled ----------
    sub = N // 8
    E_sub = rng.standard_normal((sub, d)).astype(np.float32)
    E_sub /= np.linalg.norm(E_sub, axis=1, keepdims=True)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        scores = q @ E_sub.T
        part = np.argpartition(-scores, k, axis=1)[:, :k]
    cpu_dt_sub = (time.perf_counter() - t0) / reps
    cpu_dt_full = cpu_dt_sub * (N / sub)  # brute force is linear in N
    cpu_qps = Q / cpu_dt_full

    # headline: the int8 TIER path (int8 pass-1 + master-slab pass-2) —
    # master-exact scores, recall 1.0 at the default margin, and the
    # fastest serving config at 1M x 384 (r3.3: 163.8k QPS vs 126.6k
    # bf16-exact at Q=256; Q>256 batches chunk in-trace so the rate
    # holds at any batch size — tools/exp_q_scaling.py)
    head_qps, head_dt, head_recall = (
        (Q / dt_i8, dt_i8, recall_i8) if on_tpu else (qps, dt, recall))
    result = {
        "metric": "QPS/chip at recall@10, 1M-chunk int8-tier "
                  "(master-exact mixed two-pass) index"
        if on_tpu
        else "QPS at recall@10 (CPU smoke, 64k chunks)",
        "value": round(head_qps, 1),
        "unit": "QPS",
        "vs_baseline": round(head_qps / cpu_qps, 1),
        "recall_at_10": round(head_recall, 4),
        "recall_vs_f32_oracle": round(
            recall_i8_oracle if on_tpu else recall_oracle, 4),
        "p50_batch_ms": round(head_dt * 1000, 3),
        "corpus": N,
        "dim": d,
        "query_batch": Q,
        "cpu_baseline_qps": round(cpu_qps, 2),
        "bf16_exact_q256_qps": round(qps, 1),
        "bf16_exact_recall_at_10": round(recall, 4),
        "bf16_exact_recall_vs_f32_oracle": round(recall_oracle, 4),
        "q128_qps": round(Q1 / dt128, 1),
        "int8_q256_qps": round(Q / dt_i8, 1),
        "int8_recall_at_10": round(recall_i8, 4),
        "semantic_recall_at_10": sem_recall,
        "semantic_hardness": sem_hardness,
        "semantic_recall_curve": sem_curve or None,
        "singlepass_q128_qps": round(Q1 / fused_dt, 1),
        "effective_gbps": round(N * d * 2 / dt / 1e9, 1),
        "int8_effective_gbps": round(N * d * 1 / dt_i8 / 1e9, 1),
        "timing": "chained-scan slope (relay RTT cancels)",
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
