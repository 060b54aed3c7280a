"""Pallas fused dot-product + streaming top-k (SURVEY §7 step 5).

One kernel replaces the reference's entire search inner loop
(``ollama_rag_system.py:454-525``): for each corpus tile the MXU computes
``q @ tile.T`` in VMEM and a vectorized K-step selection folds the tile's
scores into a running (Q, K) top-k held in VMEM scratch across grid steps
(the TPU grid is sequential, so scratch persists).  The full (Q, N) score
matrix never exists — HBM traffic is exactly one read of the index tile
stream, which is the bandwidth speed-of-light for exact search.

Design notes:

* selection is exact: K iterations of (max, tie-break by smallest global
  id, invalidate) over the tile scores augmented with the running top-k.
  Deterministic tie-breaking by global id keeps multi-shard merges stable
  (SURVEY §7 hard part (e)).
* the int8 variant reads a per-row-quantized index (int8 values + f32
  row scales): int8 x int8 matmuls run on the MXU at 4x less HBM traffic,
  rescaled to f32 before selection (hard part (b)).
* rows at global index >= count (the live prefix) are masked to -inf, so
  the growable index's spare capacity never pollutes results.

On non-TPU backends the kernel runs in interpret mode (tests use the
virtual CPU mesh; numerics are identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")
_BIG_I32 = np.int32(2**31 - 1)


def _use_interpret() -> bool:
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform != "tpu"
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
def _select_topk(aug_scores, aug_ids, k: int):
    """Exact top-k over the augmented (Q, B+K) candidates.

    Returns (vals (Q, k), ids (Q, k)), sorted descending; ties broken by
    smallest global id.  Pure vectorized ops (VPU-friendly, no sort).
    """
    out_vals = []
    out_ids = []
    for _ in range(k):
        m = jnp.max(aug_scores, axis=1, keepdims=True)  # (Q, 1)
        is_max = aug_scores == m
        # among tied maxima pick the smallest global id
        sel_id = jnp.min(
            jnp.where(is_max, aug_ids, _BIG_I32), axis=1, keepdims=True
        )  # (Q, 1)
        out_vals.append(m)
        out_ids.append(sel_id)
        # invalidate exactly the selected candidate
        aug_scores = jnp.where(is_max & (aug_ids == sel_id), _NEG_INF, aug_scores)
    return (
        jnp.concatenate(out_vals, axis=1),
        jnp.concatenate(out_ids, axis=1).astype(jnp.int32),
    )


# positional-selection dispatch bound: at or below this k the iterative
# argmax selection replaces lax.top_k (measured crossover ~100 passes on
# serving-width buffers; 64 keeps headroom — see _iter_topk)
_ITER_SELECT_MAX = 64


def _iter_topk(flat, kk: int):
    """Exact top-kk of ``flat`` (Q, n) by kk passes of (max, argmax,
    mask) under ``lax.scan``: each pass is two VPU row reductions plus a
    masked write where ``lax.top_k`` pays a sort network over every
    lane.  Measured (tools/exp_ivf2_tail_opt.py + /tmp sel sweeps,
    Q=256): 6.3x top_k at n=2048/kk=20 (0.056 vs 0.351 ms), 9x at
    n=448/kk=10, and the core of the r3.10 ``select_bins`` restructure.
    Cost is linear in kk AND n, so callers gate on _ITER_SELECT_MAX and
    keep top_k for wide-k refills.

    Semantics match ``lax.top_k`` exactly: descending values, ties by
    lowest index (argmax returns the first tied lane; picked lanes drop
    to -inf, so an exhausted buffer yields -inf/lane-0 pairs — callers
    filter non-finite rows, same as top_k's -inf tail).  Unlike the
    unrolled ``_select_topk`` above this selects by POSITION (no id
    plane) and scans instead of unrolling — half the per-pass ops."""
    Q, n = flat.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (Q, n), 1)

    def step(fc, _):
        p = jnp.argmax(fc, axis=1)
        v = jnp.max(fc, axis=1)
        fc = jnp.where(iota == p[:, None], _NEG_INF, fc)
        return fc, (v, p)

    _, (vs, ps) = jax.lax.scan(step, flat, None, length=kk)
    return vs.T, ps.T


def _topk_positional(flat, kk: int):
    """``lax.top_k`` semantics, dispatched to ``_iter_topk`` at serving
    k — both return (vals desc, positions) with lowest-index ties."""
    if kk <= _ITER_SELECT_MAX:
        return _iter_topk(flat, kk)
    return jax.lax.top_k(flat, kk)


def _bin_reduce(scores, gids, bin_width):
    """Optional per-tile candidate reduction: max over bins of
    ``bin_width`` lanes (must be a multiple of 128 — Mosaic only supports
    lane-preserving shape casts).  Cuts the K-step selection width by
    ``bin_width``x at a tiny recall cost (two true top-k rows in the SAME
    bin of the SAME tile shadow each other): measured recall@10 = 0.9977
    on 1M random rows at bin_width=256, +44% QPS.  ``None`` = exact."""
    if bin_width is None:
        return scores, gids
    Q, B = scores.shape
    nb = B // bin_width
    s3 = scores.reshape(Q, nb, bin_width)
    cand = jnp.max(s3, axis=2)
    g3 = gids.reshape(Q, nb, bin_width)
    cand_ids = jnp.min(
        jnp.where(s3 == cand[:, :, None], g3, _BIG_I32), axis=2
    )
    return cand, cand_ids


# public alias: the same exact selection is reused for the cross-shard
# top-k merge (parallel/sharded.py) — identical tie-breaking everywhere.
def select_topk(scores, ids, k: int):
    return _select_topk(scores, ids, k)


def _fused_kernel(count_ref, q_ref, e_ref, vals_ref, ids_ref, run_vals, run_ids, *, k: int, block_rows: int, bin_width):
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, _NEG_INF)
        run_ids[:] = jnp.full_like(run_ids, _BIG_I32)

    tile = e_ref[:]  # (B, d) f32 or bf16 (the bf16 index tier halves HBM
    # traffic with recall ~= 1; no in-kernel conversion needed — bf16 is
    # the MXU's native dtype)
    q = q_ref[:].astype(tile.dtype)  # (Q, d)
    scores = jax.lax.dot_general(
        q, tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, B)
    Q = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (Q, block_rows), 1)
    gids = col + i * block_rows
    count = count_ref[0, 0]
    scores = jnp.where(gids < count, scores, _NEG_INF)

    # NOTE: a skip-merge fast path (only run selection when
    # any(tile_max > running_min)) was tried here with both pl.when and
    # lax.cond, and a rolled fori_loop selection; all three hang the
    # Mosaic compiler on this toolchain.  The unconditional unrolled
    # selection below is the known-good formulation.
    scores, gids = _bin_reduce(scores, gids, bin_width)
    aug_scores = jnp.concatenate([run_vals[:], scores], axis=1)
    aug_ids = jnp.concatenate([run_ids[:], gids], axis=1)
    vals, ids = _select_topk(aug_scores, aug_ids, k)
    run_vals[:] = vals
    run_ids[:] = ids

    @pl.when(i == nsteps - 1)
    def _():
        vals_ref[:] = run_vals[:]
        ids_ref[:] = run_ids[:]


def fused_topk_raw(E, count, q, k: int, block_rows: int, interpret: bool, bin_width=None):
    """Traceable (non-jit) fused top-k for composition inside jit/shard_map.

    ``q`` rows must already be padded to a sublane multiple of 8 and
    ``E.shape[0]`` must divide by ``block_rows``.
    """
    cap, d = E.shape
    Q = q.shape[0]
    grid = cap // block_rows
    _check_bin_width(bin_width, block_rows)
    kernel = functools.partial(_fused_kernel, k=k, block_rows=block_rows, bin_width=bin_width)
    vals, ids = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count (1,)
            pl.BlockSpec((Q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Q, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Q, k), jnp.float32),
            pltpu.VMEM((Q, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * cap * d,
            bytes_accessed=cap * d * 4 + Q * d * 4 + 2 * Q * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(count.reshape(1, 1), q, E)
    return vals, ids


def _check_bin_width(bin_width, block_rows):
    if bin_width is None:
        return
    if bin_width % 128 or block_rows % bin_width:
        raise ValueError(
            f"bin_width must be a multiple of 128 dividing block_rows "
            f"({block_rows}); got {bin_width}"
        )


_fused_topk_jit = jax.jit(
    fused_topk_raw, static_argnames=("k", "block_rows", "interpret", "bin_width")
)


def fused_topk(E, count, q, k: int, block_rows: int = 1024, bin_width=None):
    """Fused exact top-k over the live prefix of E.

    Args mirror ``ops.exact.exact_topk``; q rows are padded to the f32
    sublane multiple (8) and k results are computed exactly.
    """
    cap, d = E.shape
    Q = q.shape[0]
    block_rows = min(block_rows, cap, _max_block_rows(d, E.dtype))
    if cap % block_rows:
        raise ValueError(f"capacity {cap} not divisible by block_rows {block_rows}")
    Qp = _round_up(Q, 8)
    if Qp != Q:
        q = jnp.pad(q, ((0, Qp - Q), (0, 0)))
    vals, ids = _fused_topk_jit(
        E, jnp.asarray(count, jnp.int32), q, k, block_rows, _use_interpret(),
        bin_width,
    )
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals[:Q], ids[:Q]


def _max_block_rows(d: int, dtype) -> int:
    """Largest pow2 tile fitting the ~16MB VMEM budget with double

    buffering plus headroom for q/scores/scratch."""
    itemsize = jnp.dtype(dtype).itemsize
    budget = 10 * 1024 * 1024  # leave ~6MB headroom
    rows = budget // (2 * d * itemsize)
    p = 1
    while p * 2 <= rows:
        p *= 2
    return max(p, 256)


# ---------------------------------------------------------------------------
# int8 variant: per-row-quantized index
def _fused_kernel_int8(count_ref, q_ref, e_ref, scale_ref, vals_ref, ids_ref, run_vals, run_ids, *, k: int, block_rows: int, bin_width):
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        run_vals[:] = jnp.full_like(run_vals, _NEG_INF)
        run_ids[:] = jnp.full_like(run_ids, _BIG_I32)

    # int8 tiles are read from HBM (4x less traffic than f32) and widened
    # to bf16 in VMEM: bf16 represents all ints in [-127, 127] exactly, so
    # the dequantized row direction is preserved bit-exactly — and the
    # matmul runs on the MXU (a true int8 dot_general gets emulated on the
    # VPU by Mosaic, ~20x slower).  Queries stay bf16 (no query-side
    # quantization: it only added error and an extra dispatch).
    q = q_ref[:]  # (Q, d) bf16
    tile = e_ref[:].astype(jnp.bfloat16)  # (B, d)
    iscores = jax.lax.dot_general(
        q, tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, B) f32: q . int_row, exact in the int factor
    # scales come in lane-packed (1, B) layout — a (B, 1) block would be
    # padded to 128 lanes per row and cost 128x the VMEM bandwidth
    row_scale = scale_ref[:]  # (1, B) f32
    scores = iscores * row_scale
    Q = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (Q, block_rows), 1)
    gids = col + i * block_rows
    count = count_ref[0, 0]
    scores = jnp.where(gids < count, scores, _NEG_INF)

    # NOTE: a skip-merge fast path (only run selection when
    # any(tile_max > running_min)) was tried here with both pl.when and
    # lax.cond, and a rolled fori_loop selection; all three hang the
    # Mosaic compiler on this toolchain.  The unconditional unrolled
    # selection below is the known-good formulation.
    scores, gids = _bin_reduce(scores, gids, bin_width)
    aug_scores = jnp.concatenate([run_vals[:], scores], axis=1)
    aug_ids = jnp.concatenate([run_ids[:], gids], axis=1)
    vals, ids = _select_topk(aug_scores, aug_ids, k)
    run_vals[:] = vals
    run_ids[:] = ids

    @pl.when(i == nsteps - 1)
    def _():
        vals_ref[:] = run_vals[:]
        ids_ref[:] = run_ids[:]


def fused_topk_int8_raw(E_q, scales_lanes, count, q, k: int, block_rows: int, interpret: bool, bin_width=None):
    """Traceable int8 fused top-k (see ``fused_topk_raw``); ``scales_lanes``

    is the lane-packed (1, capacity) f32 scale row."""
    cap, d = E_q.shape
    Q = q.shape[0]
    grid = cap // block_rows
    q_bf16 = q.astype(jnp.bfloat16)
    _check_bin_width(bin_width, block_rows)
    kernel = functools.partial(_fused_kernel_int8, k=k, block_rows=block_rows, bin_width=bin_width)
    vals, ids = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count
            pl.BlockSpec((Q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Q, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Q, k), jnp.float32),
            pltpu.VMEM((Q, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * cap * d,
            bytes_accessed=cap * d + cap * 4 + Q * d + 2 * Q * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(count.reshape(1, 1), q_bf16, E_q, scales_lanes)
    return vals, ids


_fused_topk_int8_jit = jax.jit(
    fused_topk_int8_raw, static_argnames=("k", "block_rows", "interpret", "bin_width")
)


def fused_topk_int8(E_q, scales, count, q, k: int, block_rows: int = 1024, bin_width=None):
    """int8-index fused top-k.

    ``E_q`` (capacity, d) int8 with per-row ``scales`` (capacity, 1) f32
    (from ``ops.quantize.quantize_rows``).  Queries are quantized
    symmetrically per-row inside the jit; scores are rescaled to f32
    before selection, so returned scores approximate the f32 inner
    products.
    """
    cap, d = E_q.shape
    Q = q.shape[0]
    block_rows = min(block_rows, cap)
    if cap % block_rows:
        raise ValueError(f"capacity {cap} not divisible by block_rows {block_rows}")
    Qp = _round_up(Q, 16)  # bf16 sublane multiple
    if Qp != Q:
        q = jnp.pad(q, ((0, Qp - Q), (0, 0)))
    vals, ids = _fused_topk_int8_jit(
        E_q, scales.reshape(1, cap), jnp.asarray(count, jnp.int32), q, k,
        block_rows, _use_interpret(), bin_width,
    )
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals[:Q], ids[:Q]


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "bin_width", "interpret"))
def _exact_binned_jit(E, count, q, k: int, block_rows: int, bin_width: int, interpret: bool):
    # pass 1: binned kernel -> the top-k BIN WINNERS (one max per bin)
    vals, ids = fused_topk_raw(E, count, q, k, block_rows, interpret,
                               bin_width=bin_width)
    Q = q.shape[0]
    # The winners' bins form a superset container of the true top-k:
    # every element >= the kth-largest bin-max lives in a bin whose max
    # also beats it, and at most k distinct bins can hold such maxima.
    bins = jnp.where(ids >= 0, ids // bin_width, 0)  # (Q, k)
    base = bins * bin_width
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bin_width), 2)
    rid = base[:, :, None] + offs  # (Q, k, bw)
    rid_flat = rid.reshape(Q, k * bin_width)
    rows = E[rid_flat]  # (Q, k*bw, d) gather
    scores = jnp.einsum("qd,qnd->qn", q.astype(rows.dtype), rows,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(rid_flat < count, scores, -jnp.inf)
    # Mask duplicate row ids (the same bin can be selected for more than
    # one winner, and top_k would then return a row twice): keep only the
    # first occurrence of each rid per query.
    order = jnp.argsort(rid_flat, axis=1)
    rid_sorted = jnp.take_along_axis(rid_flat, order, axis=1)
    first = jnp.concatenate(
        [jnp.ones((Q, 1), bool), rid_sorted[:, 1:] != rid_sorted[:, :-1]], axis=1
    )
    # scatter 'first' back to original positions
    inv = jnp.argsort(order, axis=1)
    keep = jnp.take_along_axis(first, inv, axis=1)
    scores = jnp.where(keep, scores, -jnp.inf)
    fvals, pos = jax.lax.top_k(scores, k)
    sel = jnp.take_along_axis(rid_flat, pos, axis=1)
    sel = jnp.where(jnp.isfinite(fvals), sel, -1)
    return fvals, sel.astype(jnp.int32)


def exact_binned_topk(E, count, q, k: int, block_rows: int = 4096,
                      bin_width: int = 512):
    """EXACT top-k at near-binned cost: binned pass for candidate bins,

    then an exact rescan of just those k bins (k * bin_width rows per
    query).  Correctness: the k largest bin-maxima bins contain every
    element >= the kth-largest element (each such element's own bin-max
    ties or beats it, and k maxima bound k bins)."""
    cap, d = E.shape
    Q = q.shape[0]
    block_rows = min(block_rows, cap, _max_block_rows(d, E.dtype))
    _check_bin_width(bin_width, block_rows)
    Qp = _round_up(Q, 8)
    if Qp != Q:
        q = jnp.pad(q, ((0, Qp - Q), (0, 0)))
    vals, ids = _exact_binned_jit(
        E, jnp.asarray(count, jnp.int32), q, k, block_rows, bin_width,
        _use_interpret(),
    )
    return vals[:Q], ids[:Q]
