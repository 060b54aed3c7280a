"""Headline benchmark: QPS/chip at recall@10 on a 1M-chunk corpus.

This measures BASELINE.json config 3 (int8-tier mixed two-pass search,
``ops/binmax_topk.py``) plus, budget permitting, config 4 (10M-row
IVF2, ``ops/ivf2.py``) and the named f32-exact tier.

Restructured for round 4 (VERDICT r3 item 1 — the r3 bench timed out
mid-compile and captured nothing):

* **Staged emission.**  A COMPLETE headline JSON line is printed to
  stdout as soon as the first timed stage finishes; every later stage
  prints a superseding line with more fields (the driver parses the
  tail).  A timeout now loses only unfinished stages, never the run.
* **Persistent compilation cache** (``.jax_cache/``, verified working
  on this backend: 0.72 s -> 0.01 s re-compile), so reruns skip the
  ~10-30 s remote XLA compiles that killed the r3 run.
* **Wall-clock budget** (``BENCH_BUDGET_S``, default 1200 s): each
  stage is gated on remaining budget and skipped gracefully.
* The three in-bench contrastive fine-tunes moved OUT to
  ``benchmarks/semantic_eval.py``; the bench instead reports the
  hand-written EXTERNAL eval (``models/external_eval.py``, VERDICT r3
  item 3 — data path never touches ``models/synth.py``) and cites the
  last measured synthetic curve.
* The 10M IVF2 stage warm-starts its cluster build from
  ``.bench_cache/ivf10m_warm.npz`` (written on the first run) — the
  snapshot-restore code path (``ops/ivf2.py`` warm_start), 3 s fill
  vs 45 s cold k-means.

Recall ground truths (docs/kernels.md, scoring precision contract):
every recall field names its GT inline — ``recall_at_10`` is against
exact search over the STORED bf16 index (the kernels' exactness
contract), ``recall_vs_f32_oracle`` against a Precision.HIGHEST scan
of the f32 source vectors (measures what bf16 storage costs, ~0.989
on this corpus).

``vs_baseline`` compares against a CPU brute-force scan — numpy BLAS
matmul + argpartition over the same corpus (measured on a 1/8 subset,
scaled linearly), strictly FASTER than the reference's per-row Python
cosine loop (``ollama_rag_system.py:454-525``), so the reported
speedup is a lower bound.

Timing: M kernel invocations chained inside ONE jit (``lax.scan`` with
a data dependency); wall time slope between M=4 and M=68 runs — the
constant per-dispatch relay round-trip (~26 ms here) cancels.
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))
WARM_PATH = os.path.join(REPO, ".bench_cache", "ivf10m_warm.npz")
WARM14_PATH = os.path.join(REPO, ".bench_cache", "ivf14m_warm.npz")

RESULT: dict = {}
_stages: list = []


def left() -> float:
    return BUDGET_S - (time.time() - T0)


def note(msg: str) -> None:
    print(f"[bench] t={time.time() - T0:6.1f}s {msg}", file=sys.stderr,
          flush=True)


def emit(stage: str) -> None:
    """Print the CURRENT full result as one JSON line (superseding any
    earlier line; the driver parses the tail)."""
    _stages.append(stage)
    RESULT["stages_done"] = list(_stages)
    RESULT["elapsed_s"] = round(time.time() - T0, 1)
    print(json.dumps(RESULT), flush=True)


def main() -> int:
    import jax

    # persistent compile cache: the remote XLA service costs ~10-30 s
    # per program; cached reruns skip all of it (VERDICT r3 item 1b)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from modular_rag_system_tpu.ops.binmax_topk import (
        _round_to_dtype_f32,
        twopass_topk_int8_master_raw,
        twopass_topk_raw,
    )
    from modular_rag_system_tpu.ops.exact import exact_topk
    from modular_rag_system_tpu.ops.fused_topk import _use_interpret
    from modular_rag_system_tpu.ops.quantize import quantize_rows

    on_tpu = jax.default_backend() == "tpu"
    N = 1_048_576 if on_tpu else 65_536
    # Q=256 is the throughput-optimal serving batch (measured r2/r3;
    # larger batches chunk in-trace so the rate holds at any size)
    d, Q, k = 384, (256 if on_tpu else 128), 10
    M_LO, M_HI = (4, 68) if on_tpu else (2, 6)
    interp = _use_interpret()

    rng = np.random.default_rng(0)

    # ---------------- stage 0: relay fetch-channel warmup -------------
    # the FIRST device->host fetch of a process pays a large, variable
    # channel-establishment cost in this environment (measured 125-565 s
    # while cached compiles and uploads stay instant; a pending fetch
    # also blocks every other RPC, so it cannot be overlapped).  Pay it
    # up front on a tiny array so every later stage runs unimpeded and
    # the cost is visible in the log as its own line.
    note("warming relay fetch channel (first device->host fetch)")
    np.asarray(jnp.zeros((8,), jnp.float32))
    note("fetch channel ready")

    # ---------------- setup: corpus + int8 + CPU baseline -------------
    # corpus AND query batches are generated ON DEVICE: pushing bulk
    # host data through the relay can take minutes when it is congested
    note(f"generating corpus on device ({N}x{d})")

    @jax.jit
    def gen_corpus(key):
        e = jax.random.normal(key, (N, d), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    @jax.jit
    def gen_queries(key):
        e = jax.random.normal(key, (M_HI, Q, d), jnp.float32)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

    Ej = gen_corpus(jax.random.PRNGKey(0))
    E16 = Ej.astype(jnp.bfloat16)
    cnt = jnp.int32(N)
    E_q, scales = quantize_rows(Ej)
    # distinct query batches per chain step (identical inputs could let
    # the compiler or relay dedupe work); qj = recall/baseline batch
    QS = gen_queries(jax.random.PRNGKey(1))
    qj = QS[0]
    jax.block_until_ready(E_q)
    q = np.asarray(qj)  # host copy for the CPU baseline (fetch is warm)

    # CPU baseline: numpy brute force on a 1/8 subset, scaled linearly
    sub = N // 8
    E_sub = rng.standard_normal((sub, d)).astype(np.float32)
    E_sub /= np.linalg.norm(E_sub, axis=1, keepdims=True)
    t0 = time.perf_counter()
    for _ in range(3):
        scores = q @ E_sub.T
        np.argpartition(-scores, k, axis=1)[:, :k]
    cpu_dt_full = (time.perf_counter() - t0) / 3 * (N / sub)
    cpu_qps = Q / cpu_dt_full
    del E_sub, scores

    # NOTE: the corpus must be an explicit jit ARGUMENT everywhere —
    # closing over it embeds it as an HLO constant and the remote
    # compile service rejects the ~800 MB request body (HTTP 413)
    def kernel_twopass(E, qq):
        return twopass_topk_raw(E, cnt, qq, k, 4096 if on_tpu else 2048,
                                32, interp)

    def int8_tier(Eq, sc, E16, qq):
        # block_rows=8192: int8 tiles are 1 byte/elem so the bigger DMA
        # fits VMEM and measures faster (tools/exp_int8_pass1_sweep.py)
        return twopass_topk_int8_master_raw(Eq, sc, E16, cnt, qq, k,
                                            8192, 32, interp)

    def slope_time(fn, label, reps=4):
        """Chained-scan slope between M_LO and M_HI (RTT cancels)."""
        note(f"compiling {label} chains")
        f = lambda m: float(np.asarray(fn(m)))
        f(M_LO)
        f(M_HI)
        note(f"timing {label}")
        ts = {M_LO: [], M_HI: []}
        for _ in range(reps):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter()
                f(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)

    # ---------------- stage: recall (1M, both ground truths) ----------
    note("recall checks vs exact search (stored-bf16 contract + f32 oracle)")
    # the contract rounds q to the store dtype too (validated r3:
    # 256/256 result rows bit-identical to the kernel on this corpus)
    q16 = _round_to_dtype_f32(qj, jnp.bfloat16)
    _, sids = exact_topk(E16, cnt, q16, k)  # stored-data contract GT
    _, eids = exact_topk(Ej, cnt, qj, k)    # f32 oracle (HIGHEST)
    sids, eids = np.asarray(sids), np.asarray(eids)

    def recall_of(ids, gt):
        return float(np.mean(
            [len(set(gt[i]) & set(ids[i])) / k for i in range(Q)]))

    if on_tpu:
        _, i8ids = jax.jit(int8_tier)(E_q, scales, E16, qj)
        i8ids = np.asarray(i8ids)
        recall_i8 = recall_of(i8ids, sids)
        recall_i8_oracle = recall_of(i8ids, eids)
    _, tpids = jax.jit(kernel_twopass)(E16, qj)
    tpids = np.asarray(tpids)
    recall_tp = recall_of(tpids, sids)
    recall_tp_oracle = recall_of(tpids, eids)
    if not on_tpu:
        recall_i8, recall_i8_oracle = recall_tp, recall_tp_oracle

    # ---------------- stage: int8 timing (THE headline) ---------------
    if on_tpu:
        @functools.partial(jax.jit, static_argnames=("m",))
        def chain_i8(Eq, sc, E16, qs, m):
            def step(carry, qq):
                v, _ = int8_tier(Eq, sc, E16, qq + carry * 1e-9)
                return jnp.mean(v), None

            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        dt_head = slope_time(lambda m: chain_i8(E_q, scales, E16, QS, m),
                             f"int8 (Q={Q}, mixed two-pass)")
        head_recall, head_recall_oracle = recall_i8, recall_i8_oracle
    else:
        @functools.partial(jax.jit, static_argnames=("m",))
        def chain_tp(E, qs, m):
            def step(carry, qq):
                v, _ = kernel_twopass(E, qq + carry * 1e-9)
                return jnp.mean(v), None

            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        dt_head = slope_time(lambda m: chain_tp(E16, QS, m),
                             f"twopass (Q={Q})")
        head_recall, head_recall_oracle = recall_tp, recall_tp_oracle

    RESULT.update({
        "metric": ("QPS/chip at recall@10, 1M-chunk int8-tier "
                   "(master-exact mixed two-pass) index" if on_tpu
                   else "QPS at recall@10 (CPU smoke, 64k chunks)"),
        "value": round(Q / dt_head, 1),
        "unit": "QPS",
        "vs_baseline": round(Q / dt_head / cpu_qps, 1),
        "recall_at_10": round(head_recall, 4),
        "recall_gt": "exact search over the stored bf16 index "
                     "(kernel exactness contract, docs/kernels.md)",
        "recall_vs_f32_oracle": round(head_recall_oracle, 4),
        "p50_batch_ms": round(dt_head * 1000, 3),
        "corpus": N,
        "dim": d,
        "query_batch": Q,
        "cpu_baseline_qps": round(cpu_qps, 2),
        # bytes/element follows the branch actually timed: int8 head on
        # TPU (1 B), bf16 twopass head on the CPU-smoke path (2 B)
        ("int8_effective_gbps" if on_tpu else "head_effective_gbps_bf16"):
            round(N * d * (1 if on_tpu else 2) / dt_head / 1e9, 1),
        "timing": "chained-scan slope (relay RTT cancels)",
        "budget_s": BUDGET_S,
        "backend": jax.default_backend(),
    })
    emit("int8_1m")

    # ---------------- stage: bf16 exact tier (r2 comparability) -------
    if on_tpu and left() > 90:
        @functools.partial(jax.jit, static_argnames=("m",))
        def chain_tp(E, qs, m):
            def step(carry, qq):
                v, _ = kernel_twopass(E, qq + carry * 1e-9)
                return jnp.mean(v), None

            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        dt_tp = slope_time(lambda m: chain_tp(E16, QS, m),
                           f"bf16 exact twopass (Q={Q})")
        RESULT.update({
            "bf16_exact_q256_qps": round(Q / dt_tp, 1),
            "bf16_exact_recall_at_10": round(recall_tp, 4),
            "bf16_exact_recall_vs_f32_oracle": round(recall_tp_oracle, 4),
            "effective_gbps": round(N * d * 2 / dt_tp / 1e9, 1),
        })
        emit("bf16_exact_1m")
    elif on_tpu:
        note(f"skipping bf16 exact stage (left={left():.0f}s)")

    # ---------------- stage: f32 exact named config (VERDICT r3 #6) ---
    # the store_dtype="f32" tier: recall 1.0 vs the f32 oracle BY
    # CONSTRUCTION — names the QPS cost of true-1.0 oracle recall
    if on_tpu and left() > 90:
        def kernel_f32(E, qq):
            return exact_topk(E, cnt, qq, k)

        @functools.partial(jax.jit, static_argnames=("m",))
        def chain_f32(E, qs, m):
            def step(carry, qq):
                v, _ = kernel_f32(E, qq + carry * 1e-9)
                return jnp.mean(v), None

            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        dt_f32 = slope_time(lambda m: chain_f32(Ej, QS, m),
                            f"f32 exact (Q={Q}, Precision.HIGHEST)")
        RESULT.update({
            "f32_exact_q256_qps": round(Q / dt_f32, 1),
            "f32_exact_recall_vs_f32_oracle": 1.0,
        })
        emit("f32_exact_1m")
    elif on_tpu:
        note(f"skipping f32 exact stage (left={left():.0f}s)")

    # ---------------- stage: external semantic eval -------------------
    # hand-written 96-pair Q->passage set; data path never touches
    # models/synth.py (VERDICT r3 item 3).  The synthetic curve is NOT
    # re-trained in-bench (r3's three fine-tunes are what blew the
    # budget) — benchmarks/semantic_eval.py measures it; last run cited.
    if left() > 60:
        note("external semantic eval (hand-written 304-pair set)")
        try:
            from modular_rag_system_tpu.config import RAGConfig
            from modular_rag_system_tpu.models import build_encoder
            from modular_rag_system_tpu.models.default_ckpt import (
                try_build_default_encoder,
            )
            from modular_rag_system_tpu.models.external_eval import (
                load_external_qa,
                recall_at_k_external,
                recall_at_k_legacy96,
                wilson_interval,
            )
            from modular_rag_system_tpu.models.fake import FeatureHashEncoder

            n_eval = len(load_external_qa()[1])
            # the SHIPPED default path (hybrid dense+lexical when the
            # default config enables it — what a user's engine embeds
            # with out of the box)
            shipped = build_encoder(RAGConfig())
            ext = recall_at_k_external(shipped, k=k)
            lo, hi = wilson_interval(ext, n_eval)
            RESULT.update({
                "semantic_recall_external": round(ext, 4),
                "semantic_external_n": n_eval,
                "semantic_external_ci95": [round(lo, 4), round(hi, 4)],
                "semantic_external_encoder": getattr(
                    shipped, "name", type(shipped).__name__),
                "semantic_external_note":
                    f"hand-written {n_eval}-pair eval (assets/eval/"
                    "external_qa.json), shipped default encoder; never "
                    f"touches models/synth.py; chance@10 = "
                    f"{round(10 / n_eval, 4)}",
                "semantic_external_hash_baseline": round(
                    recall_at_k_external(FeatureHashEncoder(dim=d), k=k),
                    4),
                # the 96-item pool exactly as round 4 measured it
                # (fixed instrument; r4 default encoder scored 0.2292)
                "semantic_recall_external_legacy96": round(
                    recall_at_k_legacy96(shipped, k=k), 4),
            })
            # dense-only ablation (the bundled checkpoint without the
            # lexical half) — names what each component contributes
            dense = try_build_default_encoder(RAGConfig())
            if dense is not None:
                RESULT["semantic_external_dense_only"] = round(
                    recall_at_k_external(dense, k=k), 4)
        except Exception as exc:  # pragma: no cover - keep bench robust
            note(f"external semantic eval failed: {exc}")
        RESULT["semantic_recall_curve_synthetic"] = {
            "note": "measured by benchmarks/semantic_eval.py (moved out "
                    "of bench.py, VERDICT r3 item 1c); r3 run: mean "
                    "0.986 over hardness (0.6, 0.8, 0.95) at "
                    "train_frac=0.4",
        }
        emit("semantic_external")
    else:
        note(f"skipping external semantic eval (left={left():.0f}s)")

    # ---------------- stage: 10M IVF2 (VERDICT r3 item 4) -------------
    warm_ok = os.path.exists(WARM_PATH)
    if on_tpu and left() > (150 if warm_ok else 280):
        note("10M IVF2 stage: freeing 1M corpus")
        del Ej, E16, E_q, scales, QS, qj
        try:
            ivf_stage_10m(jax, jnp, rng, interp, k, warm_ok)
        except Exception as exc:  # pragma: no cover - keep bench robust
            note(f"ivf 10M stage failed: {exc}")
            RESULT["ivf_10m_error"] = str(exc)[:300]
        emit("ivf_10m")
    elif on_tpu:
        note(f"skipping 10M IVF stage (left={left():.0f}s, "
             f"warm={warm_ok})")

    # ---------------- stage: 14.7M int4 capacity (VERDICT r4 item 4) --
    # README's capacity headline, driver-verified: the int4 residual
    # fine copy halves fine bytes vs int8, fitting 14x2^20 rows on one
    # chip (11.27 GB bf16 master + ~3.1 GB fine).  Mirrors
    # tools/exp_capacity_14m.py with warm-startable clustering.
    warm14_ok = os.path.exists(WARM14_PATH)
    if on_tpu and left() > (200 if warm14_ok else 330):
        try:
            int4_stage_14m(jax, jnp, interp, k, warm14_ok)
        except Exception as exc:  # pragma: no cover - keep bench robust
            note(f"int4 14M stage failed: {exc}")
            RESULT["int4_error"] = str(exc)[:300]
        emit("int4_14m")
    elif on_tpu:
        note(f"skipping 14.7M int4 stage (left={left():.0f}s, "
             f"warm={warm14_ok})")

    RESULT["complete"] = True
    emit("final")
    return 0


def ivf_stage_10m(jax, jnp, rng, interp, k, warm_ok):
    """10.49M-row IVF2 on one chip: build (warm-started from
    .bench_cache when available — the snapshot-restore path), then time
    nprobe=1 and nprobe=2 and report recall vs the exact bf16 GT."""
    import functools

    from modular_rag_system_tpu.ops.binmax_topk import twopass_topk_raw
    from modular_rag_system_tpu.ops.ivf2 import IVF2, ivf2_search_core

    N, d, Q, C = 10_485_760, 384, 256, 8192
    n_centers = N // 1024
    sigma = 0.35 / np.sqrt(d)
    M_LO, M_HI = 4, 20
    GEN = 1_048_576

    # centers generated ON DEVICE (a 15.7 MB host upload can take
    # minutes on a congested relay); deterministic keys keep the warm
    # clustering file valid across runs
    @jax.jit
    def gen_centers(key):
        c = jax.random.normal(key, (n_centers, d), jnp.float32)
        return c / jnp.linalg.norm(c, axis=1, keepdims=True)

    centers_dev = gen_centers(jax.random.PRNGKey(42))

    @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(2,))
    def gen_chunk(key, n, buf, offset):
        k1, k2 = jax.random.split(key)
        assign = jax.random.randint(k1, (n,), 0, n_centers)
        x = centers_dev[assign] + sigma * jax.random.normal(k2, (n, d))
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return jax.lax.dynamic_update_slice(
            buf, x.astype(jnp.bfloat16), (offset, 0))

    t0 = time.perf_counter()
    E = jnp.zeros((N, d), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    for off in range(0, N, GEN):
        key, sub = jax.random.split(key)
        E = gen_chunk(sub, min(GEN, N - off), E, off)
    jax.block_until_ready(E)
    note(f"10M corpus generated in {time.perf_counter() - t0:.0f}s")

    # corpus_version ties the cached clustering to the EXACT generator
    # above — stale labels for a different corpus would silently build a
    # wrong clustering (degraded coverage) instead of erroring
    CORPUS_VERSION = 2  # v2: centers + queries device-generated
    warm = None
    if warm_ok:
        try:
            with np.load(WARM_PATH) as z:
                cv = (int(z["corpus_version"])
                      if "corpus_version" in z.files else 0)
                if (int(z["n"]) == N and int(z["d"]) == d
                        and int(z["c"]) == C and cv == CORPUS_VERSION):
                    warm = (z["centroids"], z["labels"])
                else:
                    note("warm file is for a different corpus; cold build")
        except Exception as exc:
            note(f"warm file unreadable ({exc}); cold build")
    t0 = time.perf_counter()
    ivf = IVF2.build(E, N, n_clusters=C, iters=6, fine_dtype="int8",
                     seed_batch=16384, balance=1.5, warm_start=warm)
    jax.block_until_ready(ivf.E_c3)
    build_s = time.perf_counter() - t0
    note(f"ivf2 build {build_s:.0f}s (warm={warm is not None})")
    if warm is None:
        try:
            os.makedirs(os.path.dirname(WARM_PATH), exist_ok=True)
            np.savez(WARM_PATH, n=N, d=d, c=C,
                     corpus_version=CORPUS_VERSION,
                     centroids=np.asarray(ivf.centroids, np.float32),
                     labels=ivf.labels_host())
            note("saved warm-start clustering for future runs")
        except Exception as exc:
            note(f"warm save failed: {exc}")

    @jax.jit
    def gen_query_batches(key):
        k1, k2 = jax.random.split(key)
        assign = jax.random.randint(k1, (M_HI, Q), 0, n_centers)
        x = (centers_dev[assign]
             + sigma * jax.random.normal(k2, (M_HI, Q, d), jnp.float32))
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    QS = gen_query_batches(jax.random.PRNGKey(43))
    q = QS[0]
    jax.block_until_ready(QS)
    cnt = jnp.int32(N)

    # exact GT via the streaming two-pass kernel (a (Q, N) f32 score
    # matrix at this scale would be 10 GB and OOM HBM)
    gt = jax.jit(functools.partial(twopass_topk_raw, k=k, block_rows=4096,
                                   bin_width=64, interpret=interp))
    _, eids = gt(E, cnt, q)
    eids = np.asarray(eids)
    note("10M exact ground truth done")

    def slope(chain_fn, label):
        f = lambda m: float(np.asarray(chain_fn(m)))
        note(f"compiling {label}")
        f(M_LO)
        f(M_HI)
        note(f"timing {label}")
        ts = {M_LO: [], M_HI: []}
        for _ in range(3):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter()
                f(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)

    U = 4
    curve = []
    for nprobe in (1, 2):
        L = ivf.slots_for_nprobe(nprobe)
        L = ((L + U - 1) // U) * U
        core = functools.partial(ivf2_search_core, k=k, nprobe=nprobe,
                                 L=L, tail_max=0, U=U, interpret=interp)

        @functools.partial(jax.jit, static_argnames=("m",))
        def chain_ivf(E, Ec, sc, perm, cents, bs, nb, cn, qs, m,
                      core=core):
            def step(carry, qq):
                v, _ = core(E, Ec, sc, perm, cents, bs, nb, cn, cnt, cnt,
                            qq + carry * 1e-9)
                return jnp.mean(v), None

            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        dt = slope(
            lambda m: chain_ivf(E, ivf.E_c3, ivf.scales3, ivf.perm,
                                ivf.centroids, ivf.blk_start, ivf.nblk,
                                ivf.counts, QS, m),
            f"ivf2 nprobe={nprobe} (L={L})")
        _, ids = jax.jit(core)(E, ivf.E_c3, ivf.scales3, ivf.perm,
                               ivf.centroids, ivf.blk_start, ivf.nblk,
                               ivf.counts, cnt, cnt, q)
        ids = np.asarray(ids)
        rec = float(np.mean(
            [len(set(eids[i]) & set(ids[i])) / k for i in range(Q)]))
        curve.append({"nprobe": nprobe, "qps": round(Q / dt, 1),
                      "recall_at_10": round(rec, 4)})
        note(f"nprobe={nprobe}: {Q / dt:.0f} QPS @ recall {rec:.4f}")
        if left() < 45 and nprobe == 1:
            note("budget low; stopping ivf sweep after nprobe=1")
            break

    RESULT.update({
        "ivf_10m_rows": N,
        "ivf_10m_qps": curve[0]["qps"],
        "ivf_10m_recall": curve[0]["recall_at_10"],
        "ivf_10m_nprobe": curve[0]["nprobe"],
        "ivf_10m_curve": curve,
        "ivf_10m_build_s": round(build_s, 1),
        "ivf_10m_build_warm": warm is not None,
        "ivf_10m_recall_gt": "exact twopass over the stored bf16 "
                             "master at 10.49M rows",
    })


def int4_stage_14m(jax, jnp, interp, k, warm_ok):
    """14,680,064-row int4-fine IVF2 on one chip: build (warm-started
    when the cached clustering matches), nprobe=1 timing at the
    adaptive refine_extra default and at extra=300, recall vs the exact
    bf16-master two-pass GT."""
    import functools

    from modular_rag_system_tpu.ops.binmax_topk import twopass_topk_raw
    from modular_rag_system_tpu.ops.ivf2 import IVF2, ivf2_search_core

    N, d, Q, C = 14 * (1 << 20), 384, 256, 8192
    n_centers = N // 1024
    sigma = 0.35 / np.sqrt(d)
    M_LO, M_HI = 4, 20
    GEN = 1_048_576
    CORPUS_VERSION = 1  # 14M generator below (device-generated, seed 7)

    @jax.jit
    def gen_centers(key):
        c = jax.random.normal(key, (n_centers, d), jnp.float32)
        return c / jnp.linalg.norm(c, axis=1, keepdims=True)

    centers_dev = gen_centers(jax.random.PRNGKey(7))

    @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(2,))
    def gen_chunk(key, n, buf, offset):
        k1, k2 = jax.random.split(key)
        assign = jax.random.randint(k1, (n,), 0, n_centers)
        x = centers_dev[assign] + sigma * jax.random.normal(k2, (n, d))
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return jax.lax.dynamic_update_slice(
            buf, x.astype(jnp.bfloat16), (offset, 0))

    t0 = time.perf_counter()
    E = jnp.zeros((N, d), jnp.bfloat16)
    key = jax.random.PRNGKey(70)
    for off in range(0, N, GEN):
        key, sub = jax.random.split(key)
        E = gen_chunk(sub, min(GEN, N - off), E, off)
    jax.block_until_ready(E)
    note(f"14.7M corpus generated in {time.perf_counter() - t0:.0f}s")

    warm = None
    if warm_ok:
        try:
            with np.load(WARM14_PATH) as z:
                cv = (int(z["corpus_version"])
                      if "corpus_version" in z.files else 0)
                if (int(z["n"]) == N and int(z["d"]) == d
                        and int(z["c"]) == C and cv == CORPUS_VERSION):
                    warm = (z["centroids"], z["labels"])
                else:
                    note("14M warm file is for a different corpus; cold")
        except Exception as exc:
            note(f"14M warm file unreadable ({exc}); cold build")
    t0 = time.perf_counter()
    ivf = IVF2.build(E, N, n_clusters=C, iters=6, fine_dtype="int4",
                     seed_batch=16384, balance=1.5, warm_start=warm)
    jax.block_until_ready(ivf.E_c3)
    build_s = time.perf_counter() - t0
    fine_gb = ivf.E_c3.size * ivf.E_c3.dtype.itemsize / 1e9
    note(f"int4 build {build_s:.0f}s (warm={warm is not None}); "
         f"fine {fine_gb:.2f} GB")
    if warm is None:
        try:
            os.makedirs(os.path.dirname(WARM14_PATH), exist_ok=True)
            np.savez(WARM14_PATH, n=N, d=d, c=C,
                     corpus_version=CORPUS_VERSION,
                     centroids=np.asarray(ivf.centroids, np.float32),
                     labels=ivf.labels_host())
            note("saved 14M warm-start clustering for future runs")
        except Exception as exc:
            note(f"14M warm save failed: {exc}")

    @jax.jit
    def gen_queries(key):
        k1, k2 = jax.random.split(key)
        assign = jax.random.randint(k1, (M_HI, Q), 0, n_centers)
        x = (centers_dev[assign]
             + sigma * jax.random.normal(k2, (M_HI, Q, d), jnp.float32))
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    QS = gen_queries(jax.random.PRNGKey(71))
    q = QS[0]
    jax.block_until_ready(QS)
    cnt = jnp.int32(N)

    gt = jax.jit(functools.partial(twopass_topk_raw, k=k, block_rows=4096,
                                   bin_width=64, interpret=interp))
    _, eids = gt(E, cnt, q)
    eids = np.asarray(eids)
    note("14.7M exact ground truth done")

    def slope(chain_fn, label):
        f = lambda m: float(np.asarray(chain_fn(m)))
        note(f"compiling {label}")
        f(M_LO)
        f(M_HI)
        ts = {M_LO: [], M_HI: []}
        for _ in range(3):
            for m in (M_LO, M_HI):
                t0 = time.perf_counter()
                f(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[M_HI]) - min(ts[M_LO])) / (M_HI - M_LO)

    U = 4
    curve = []
    for nprobe, extra in ((1, None), (1, 300)):
        L = ivf.slots_for_nprobe(nprobe)
        L = ((L + U - 1) // U) * U
        core = functools.partial(ivf2_search_core, k=k, nprobe=nprobe,
                                 L=L, tail_max=0, U=U, interpret=interp,
                                 refine_extra=extra)

        @functools.partial(jax.jit, static_argnames=("m",))
        def chain(E, Ec, sc, perm, cents, bs, nb, cn, qs, m, core=core):
            def step(carry, qq):
                v, _ = core(E, Ec, sc, perm, cents, bs, nb, cn, cnt, cnt,
                            qq + carry * 1e-9)
                return jnp.mean(v), None

            carry, _ = jax.lax.scan(step, 0.0, qs[:m])
            return carry

        dt = slope(
            lambda m: chain(E, ivf.E_c3, ivf.scales3, ivf.perm,
                            ivf.centroids, ivf.blk_start, ivf.nblk,
                            ivf.counts, QS, m),
            f"int4 nprobe={nprobe} extra={extra} (L={L})")
        _, ids = jax.jit(core)(E, ivf.E_c3, ivf.scales3, ivf.perm,
                               ivf.centroids, ivf.blk_start, ivf.nblk,
                               ivf.counts, cnt, cnt, q)
        ids = np.asarray(ids)
        rec = float(np.mean(
            [len(set(eids[i]) & set(ids[i])) / k for i in range(Q)]))
        curve.append({"nprobe": nprobe, "refine_extra": extra,
                      "qps": round(Q / dt, 1),
                      "recall_at_10": round(rec, 4)})
        note(f"int4 nprobe={nprobe} extra={extra}: {Q / dt:.0f} QPS "
             f"@ recall {rec:.4f}")
        if left() < 60:
            note("budget low; stopping int4 sweep")
            break

    RESULT.update({
        "int4_rows": N,
        "int4_master_gb": round(N * d * 2 / 1e9, 2),
        "int4_fine_gb": round(fine_gb, 2),
        "int4_build_s": round(build_s, 1),
        "int4_build_warm": warm is not None,
        "int4_qps": curve[0]["qps"],
        "int4_recall": curve[0]["recall_at_10"],
        "int4_curve": curve,
        "int4_recall_gt": "exact twopass over the stored bf16 master "
                          "at 14,680,064 rows",
    })


if __name__ == "__main__":
    raise SystemExit(main())
