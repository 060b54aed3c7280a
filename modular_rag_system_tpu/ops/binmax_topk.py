"""Two-pass exact top-k: bin-max streaming kernel + candidate-bin rescan.

This is the bandwidth-optimal redesign of ``ops.fused_topk`` (the round-1
kernel kept a running (Q, K) selection in VMEM scratch and paid a large
per-tile VPU cost for it — measured ~24% of HBM roofline at 1M x 384).
Replacing the reference's brute-force scoring loop
(``ollama_rag_system.py:454-525``) end to end:

* **Pass 1** (``_binmax_kernel``): stream corpus tiles through the MXU and
  reduce each tile's scores to one max per ``bin_width`` consecutive rows.
  No iota, no id tracking, no running selection — the kernel body is a
  matmul plus one sublane max-reduce, so the stream runs at HBM speed
  (measured 742-753 GB/s on v5e at 1M x 384 bf16 vs ~820 GB/s peak).
* **Bin selection** (plain XLA): mask dead bins (entirely past ``count``)
  to -inf, force the one count-straddling bin to +inf (its binmax mixes
  live and garbage rows, so it must always be rescanned), and take the
  top-(k+1) bins per query.
* **Pass 2**: gather the winning bins as contiguous (bin_width, d) slabs
  (sorted ascending) and rescore exactly; the final top-k is ONE
  positional ``lax.top_k`` whose lowest-position tie-break equals the
  smallest-global-id tie order (keeps multi-shard merges stable).

Exactness: the k largest bin-maxima bins contain every row whose score
ties or beats the kth-largest — each such row's own bin-max ties or beats
it, and k maxima bound k bins.  ``jax.lax.top_k`` breaks bin-score ties by
lowest bin index (= lowest global ids), which is exactly the order the
smallest-id row tie-break needs, and the k+1st slot absorbs the forced
straddle bin.  Pass-2 scores are recomputed from the same bf16 operands
(queries are explicitly rounded to bf16 via bit ops XLA cannot elide), so
they differ from pass-1 scores only by f32 accumulation order (~1 ulp);
measured ids match the single-pass kernel bit-exactly on random, tied,
and partial-count corpora.

Measured end to end (v5e, 1M x 384 bf16, k=10, chained-scan slope
timing): Q=128 1.48 ms -> 86.5k QPS (545 GB/s effective) and Q=256
2.27 ms -> 112.8k QPS, vs 3.16 ms / 40.5k QPS for the round-1
single-pass kernel; int8 variant 120k QPS at recall 0.989; 10.5M rows
exact at 12.2 ms / 10.5k QPS (659 GB/s).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modular_rag_system_tpu.ops.fused_topk import (
    _max_block_rows,
    _round_up,
    _select_topk,
    _topk_positional,
    _use_interpret,
    fused_topk,
)

_NEG_INF = float("-inf")

# Pass-1 emits bins on sublanes, queries on lanes -> Q must pad to the
# lane width.  Pass-2 slab traffic is Q * (k+1) * bin_width * d bytes, so
# small real Q still pays the 128-query gather; at default params that is
# ~35 MB (~0.1 ms) — negligible next to the pass-1 corpus stream.
_LANE = 128

# Extra candidate bins beyond the k+1 the exactness argument needs.  The
# argument assumes pass-1 (Pallas dot) and pass-2 (XLA einsum) f32
# accumulations agree bit-for-bit; measured they do, but a 1-ulp
# accumulation-order divergence at the kth-bin boundary would silently
# drop a true top-k row.  One margin bin absorbs any single boundary
# flip (each additional ulp-tied bin is another independent ~ulp
# coincidence) at ~9% extra pass-2 slab traffic for k=10 (ADVICE r2).
_MARGIN_BINS = 1

# Bin-selection group size for the two-level pruned top-k below.  512
# was tuned for the all-top_k r3.3 design; the r3.10 re-sweep with the
# iterative-argmax selection at both levels moved the optimum to 128
# (level-2 width kg*G drops 8192 -> 2048, squarely in _iter_topk's
# winning regime): select_bins over (256, 32768) measured 0.449 ->
# 0.115 ms, and 1.66 -> 1.36 over (256, 163840), ids identical.
_GROUP = 128
_SUB = 32

# Throughput-optimal query-batch size.  Per-query cost grows
# SUPER-linearly past it (measured int8-mixed at 1M x 384: 6.1 us/query
# at Q=256, 7.2 at Q=512, 7.7 at Q=1024 — tools/exp_q_scaling.py), so
# larger batches are split into _CHUNK_Q-query chunks inside the traced
# program with lax.map (one compile, on-device loop): Q=1024 then runs
# at Q=256's 164k QPS instead of 130k.
_CHUNK_Q = 256


def _chunked_q(raw_fn, q, Q: int, k: int):
    """Split a padded (Qp, d) query batch into _CHUNK_Q chunks and run
    ``raw_fn`` (a self-call of the caller) over them with ``lax.map``.
    Returns None if Qp doesn't chunk evenly (caller runs unchunked)."""
    Qp = _round_up(Q, _LANE)
    if Qp <= _CHUNK_Q or Qp % _CHUNK_Q:
        return None
    if Qp != Q:
        q = jnp.pad(q, ((0, Qp - Q), (0, 0)))
    qc = q.reshape(Qp // _CHUNK_Q, _CHUNK_Q, q.shape[1])
    vals, ids = jax.lax.map(raw_fn, qc)
    return vals.reshape(Qp, k)[:Q], ids.reshape(Qp, k)[:Q]


# Dead bins (entirely past ``count``) get a strictly-DECREASING finite
# ramp instead of a flat -inf: every selection stage then sees distinct
# values, so both ``lax.top_k`` and the iterative argmax return DISTINCT
# bin ids even when fewer than kb live bins exist.  (A flat -inf tail
# makes the iterative selection repeat lane 0 — argmax over all-equal
# lanes — and a duplicated LIVE bin would duplicate real rows in pass 2;
# caught by test_twopass_count_smaller_than_k at count=4 < k.)  The ramp
# top sits ~32 orders of magnitude below any real f32 dot product and
# steps by 2e32 (> the f32 ulp at 1.5e38), staying finite and distinct
# for nb up to ~1M bins.
_DEAD_TOP = np.float32(-1.0e38)
_DEAD_STEP = np.float32(2.0e32)


def _mask_bins(binmax, count, nb: int, bin_width: int):
    """Dead/straddle handling shared by the three two-pass routes:
    the straddle bin is forced to +inf (it holds the live/dead boundary
    and must always be rescanned), dead bins to the distinct decreasing
    ramp above (lowest-id dead bin ranks first, mirroring top_k's
    lowest-position -inf tie order)."""
    bin_base = jnp.arange(nb, dtype=jnp.int32) * bin_width
    dead = bin_base >= count
    straddle = (bin_base < count) & (bin_base + bin_width > count)
    ramp = _DEAD_TOP - jnp.arange(nb, dtype=jnp.float32) * _DEAD_STEP
    bm = jnp.where(dead[None, :], ramp[None, :], binmax)
    return jnp.where(straddle[None, :], jnp.inf, bm)


def select_bins(bm, kb: int):
    """Exact top-``kb`` bins of ``bm`` (Qp, nb), ties by LOWEST bin id.

    Direct ``lax.top_k`` over nb = cap/bin_width bins is the stage that
    made end-to-end QPS regress with Q (measured 0.45 ms of the 2.4 ms
    Q=256 batch at 1M rows).  Two levels:

    1. group maxima (nb/_GROUP groups) -> top-(kb+2) groups, SORTED by
       group id.
    2. positional top-kb over the gathered kg * _GROUP candidates,
       mapped back to global bin ids arithmetically.

    Exactness under ties (the r3.3 redesign, A/B'd in
    ``tools/exp_select_bins.py``): because the surviving groups are
    sorted ascending, candidate POSITIONS ascend in global bin id, and
    positional top-k breaks value ties by lowest position — which is
    then exactly the lowest-bin-id tie order.  At level 1 the same
    holds in natural group order: a group tied at the kb-th boundary
    value with a lower id contains a lower-id bin at that value, which
    the lowest-id tie order ranks into the true top-kb first, so every
    boundary-tied group that matters wins its tie (the +2 margin is
    kept as a belt anyway).

    Both levels dispatch through ``_topk_positional``: at serving kb
    the iterative argmax selection (scan of max/argmax/mask — HALF the
    per-pass ops of the unrolled id-plane ``_select_topk`` the r3.3
    A/B rejected) beats the sort-unit top_k once the level-2 width is
    in the low thousands, which is exactly where _GROUP=128 puts it.
    r3.10 re-sweep at Qp=256 (ids identical, ties included):
    nb=32768 0.449 -> 0.115 ms, nb=163840 1.66 -> 1.36 ms; wide-k
    refills (kb > _ITER_SELECT_MAX) keep top_k at both levels.
    """
    Qp, nb = bm.shape
    if nb % _GROUP or nb // _GROUP <= kb + 2:
        _, bins = _topk_positional(bm, kb)
        return bins
    G = nb // _GROUP
    g3 = bm.reshape(Qp, G, _GROUP)
    gmax = jnp.max(g3, axis=2)
    kg = min(kb + 2, G)
    _, gsel = _topk_positional(gmax, kg)  # (Qp, kg)
    gsel = jnp.sort(gsel, axis=1)  # ascending id -> exact tie order below
    cand_v = jnp.take_along_axis(g3, gsel[:, :, None], axis=1)
    _, pos = _topk_positional(cand_v.reshape(Qp, kg * _GROUP), kb)
    return jnp.take_along_axis(gsel, pos // _GROUP, axis=1) * _GROUP \
        + pos % _GROUP


def _sorted_slab_ids(bins, bin_width: int):
    """Sort candidate bins ascending and expand to per-row global ids.

    With ascending bins, ``rid_flat`` ascends with candidate POSITION, so
    a plain ``lax.top_k`` over the rescored candidates (ties -> lowest
    position) IS the lowest-global-id tie order — replacing the k-pass
    iterative ``_select_topk`` tail (measured 0.843 -> 0.694 ms for the
    full pass 2 at Qp=256/kb=14, tools/exp_select_bins.py)."""
    bins = jnp.sort(bins, axis=1)
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bin_width), 2)
    rid_flat = ((bins * bin_width)[:, :, None] + offs).reshape(
        bins.shape[0], bins.shape[1] * bin_width)
    return bins, rid_flat


def _topk_by_position(scores, rid_flat, k: int):
    """Top-k of ``scores`` with ids from ``rid_flat`` (must ascend along
    positions — see ``_sorted_slab_ids``); ties by lowest global id.
    Dispatches to the iterative selection at serving k (the kb*bw-wide
    pass-2 tail measured 0.113 -> ~0 ms at 10M/bw=64, 0.015 -> 0.002
    at 1M/bw=32)."""
    vals, pos = _topk_positional(scores, k)
    return vals, jnp.take_along_axis(rid_flat, pos, axis=1)


def _round_to_dtype_f32(x, dtype):
    """f32 -> nearest value representable in ``dtype``, returned as f32.

    For bf16 this uses bit ops XLA cannot elide — a plain
    ``astype(bf16).astype(f32)`` round-trip gets simplified away, silently
    de-synchronizing pass-2 scores from the in-kernel bf16 cast."""
    if jnp.dtype(dtype) != jnp.bfloat16:
        return x
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rounded = u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    return jax.lax.bitcast_convert_type(
        rounded & jnp.uint32(0xFFFF0000), jnp.float32
    )


def _binmax_kernel(q_ref, e_ref, out_ref, *, bin_width: int):
    tile = e_ref[:]  # (B, d)
    q = q_ref[:].astype(tile.dtype)  # (Q, d)
    # scores transposed (B, Q): bins reduce over sublanes, so the output
    # block keeps Q on lanes (lane-preserving — Mosaic rejects lane casts)
    scores = jax.lax.dot_general(
        tile, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    B, Q = scores.shape
    out_ref[:] = jnp.max(scores.reshape(B // bin_width, bin_width, Q), axis=1)


def binmax_call(E, q, block_rows: int, bin_width: int, interpret: bool):
    """(cap, d) x (Q, d) -> (nb, Q) per-bin score maxima, nb = cap/bin_width."""
    cap, d = E.shape
    Q = q.shape[0]
    grid = cap // block_rows
    nb_tile = block_rows // bin_width
    nb = cap // bin_width
    kern = functools.partial(_binmax_kernel, bin_width=bin_width)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((Q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb_tile, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, Q), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * cap * d,
            bytes_accessed=cap * d * E.dtype.itemsize + nb * Q * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, E)


def _check_params(cap: int, block_rows: int, bin_width: int):
    if cap % block_rows:
        raise ValueError(f"capacity {cap} not divisible by block_rows {block_rows}")
    if block_rows % bin_width or bin_width % 8:
        raise ValueError(
            f"bin_width must be a multiple of 8 dividing block_rows "
            f"({block_rows}); got {bin_width}"
        )


def _rescan_kernel(bins_ref, count_ref, q_ref, *rest, kb: int, bin_width: int,
                   k: int):
    """Pass-2 rescan, one query per grid step: DMA exactly this query's
    candidate bins (scalar-prefetched block indices), rescore on the MXU
    with the SAME q-cast as pass 1, select top-k in VMEM.

    Measured 727 GB/s DMA / 0.42 ms full at Q=128 x 11 x 128-row bins —
    an earlier benchmark deemed this design "pathologically slow" (30 ms)
    because it closed over the corpus, shipping it as an HLO constant;
    with E as a proper operand the kernel is DMA-bound.  End to end it
    only beats the XLA slab gather at Q=512+ (see twopass_topk_raw).

    Mosaic requires block sublanes of 8+ (or the full array dim), so the
    per-query row is extracted from the full (Q, d) q block via a
    one-hot matmul, and outputs are (Q, k) blocks accumulated with a
    row-select where (both patterns measured in the 0.42 ms figure)."""
    tiles = rest[:kb]
    vals_ref, ids_ref = rest[kb], rest[kb + 1]
    i = pl.program_id(0)
    Q, d = q_ref.shape

    @pl.when(i == 0)
    def _():
        vals_ref[:] = jnp.full_like(vals_ref, _NEG_INF)
        ids_ref[:] = jnp.full_like(ids_ref, -1)

    # extract query row i (dynamic sublane slicing is unsupported; a
    # (1, Q) x (Q, d) one-hot dot is MXU-cheap)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)
    onehot = (rows == i).astype(q_ref.dtype)
    qi = jax.lax.dot_general(
        onehot, q_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, d) f32
    count = count_ref[0]
    scs = []
    gds = []
    for j in range(kb):
        tile = tiles[j][:]  # (bin_width, d)
        s = jax.lax.dot_general(
            qi.astype(tile.dtype), tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, bw)
        base = bins_ref[i, j] * bin_width
        gid = base + jax.lax.broadcasted_iota(jnp.int32, (1, bin_width), 1)
        scs.append(jnp.where(gid < count, s, _NEG_INF))
        gds.append(gid)
    vals, ids = _select_topk(
        jnp.concatenate(scs, axis=1), jnp.concatenate(gds, axis=1), k
    )  # (1, k)
    rowsel = jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0) == i
    vals_ref[:] = jnp.where(rowsel, jnp.broadcast_to(vals, (Q, k)), vals_ref[:])
    ids_ref[:] = jnp.where(rowsel, jnp.broadcast_to(ids, (Q, k)), ids_ref[:])


def rescan_call(E, bins, count, q, k: int, bin_width: int, interpret: bool):
    """(cap, d) x per-query bins (Q, kb) -> exact (vals, ids) (Q, k)."""
    cap, d = E.shape
    Q, kb = bins.shape
    kern = functools.partial(_rescan_kernel, kb=kb, bin_width=bin_width, k=k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Q,),
        in_specs=[
            pl.BlockSpec((Q, d), lambda i, b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((bin_width, d),
                         functools.partial(
                             lambda j, i, b, c: (b[i, j], 0), jj),
                         memory_space=pltpu.VMEM)
            for jj in range(kb)
        ],
        out_specs=(
            pl.BlockSpec((Q, k), lambda i, b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, k), lambda i, b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    vals, ids = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * kb * bin_width * d,
            bytes_accessed=Q * kb * bin_width * d * E.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bins, count.reshape(1), q, *([E] * kb))
    return vals, ids


def twopass_topk_raw(E, count, q, k: int, block_rows: int, bin_width: int,
                     interpret: bool, kernel_rescan: bool = False):
    """Traceable exact two-pass top-k (composes inside jit / shard_map).

    ``E`` (cap, d) f32 or bf16; ``count`` i32 live-prefix length; ``q``
    (Q, d) f32, any Q (padded to the 128-lane multiple internally).
    Returns (vals (Q, k) f32, ids (Q, k) i32), ties broken by smallest id.
    ``kernel_rescan`` selects the Pallas pass-2 instead of the default
    XLA slab gather.  Measured end to end (1M x 384 bf16) the two are a
    wash at Q<=256 (kernel 113.2k vs slab 112.8k QPS at Q=256; slab wins
    at Q=128) and the kernel gains ~10% only at Q=512+ (116.4k vs
    105.2k), so the simpler slab gather is the default.
    """
    cap, d = E.shape
    Q = q.shape[0]
    _check_params(cap, block_rows, bin_width)
    chunked = _chunked_q(
        lambda qq: twopass_topk_raw(E, count, qq, k, block_rows, bin_width,
                                    interpret, kernel_rescan),
        q, Q, k)
    if chunked is not None:
        return chunked
    Qp = _round_up(Q, _LANE)
    if Qp != Q:
        q = jnp.pad(q, ((0, Qp - Q), (0, 0)))
    nb = cap // bin_width

    binmax = binmax_call(E, q, block_rows, bin_width, interpret).T  # (Qp, nb)
    bm = _mask_bins(binmax, count, nb, bin_width)
    kb = min(k + 1 + _MARGIN_BINS, nb)
    bins = select_bins(bm, kb)  # (Qp, kb), distinct per row

    if kernel_rescan:
        count32 = jnp.asarray(count, jnp.int32)
        vals, ids = rescan_call(E, bins, count32, q, k, bin_width, interpret)
        return vals[:Q], ids[:Q]

    bins, rid_flat = _sorted_slab_ids(bins, bin_width)
    # slab-granularity gather: contiguous (bin_width, d) blocks DMA far
    # faster than per-row gathers (measured 84 GB/s vs ~20 GB/s)
    slabs = E.reshape(nb, bin_width, d)[bins]  # (Qp, kb, bw, d)
    q_r = _round_to_dtype_f32(q.astype(jnp.float32), E.dtype)
    # score in the STORE dtype with f32 accumulation: q_r is exactly
    # representable in E.dtype and an 8-bit x 8-bit bf16 product is
    # exact in f32, so values match the f32 einsum bit for bit.
    # DELIBERATELY default precision: pass 1's Mosaic dot computes
    # bf16 products (TPU default) even on f32 stores, and the
    # exactness argument requires pass 1 and pass 2 to share ONE
    # scoring space.  The tier's similarity contract is therefore
    # bf16-product/f32-accumulate in EVERY store dtype; true-f32
    # scoring is the exact tier's job (ops/exact.py HIGHEST)
    scores = jnp.einsum(
        "qd,qkbd->qkb", q_r.astype(E.dtype), slabs,
        preferred_element_type=jnp.float32,
    ).reshape(Qp, kb * bin_width)
    scores = jnp.where(rid_flat < count, scores, _NEG_INF)
    vals, ids = _topk_by_position(scores, rid_flat, k)
    return vals[:Q], ids[:Q]


_twopass_jit = jax.jit(
    twopass_topk_raw,
    static_argnames=("k", "block_rows", "bin_width", "interpret",
                     "kernel_rescan"),
)


# ---------------------------------------------------------------------------
# int8 variant: 4x less pass-1 HBM traffic than f32 (2x vs bf16) AND 2x
# the MXU rate.  The round-1 single-pass int8 kernel LOST to bf16 (27.5k
# vs 31k QPS) because the per-tile selection VPU cost dominated; with
# selection gone the stream is traffic-bound at small Q.  At Q >= 256
# the bf16 matmul itself hits the MXU roofline (measured 179 TFLOP/s ~
# v5e bf16 peak at Q=256), so the QUERY is quantized too and the dot
# runs int8 x int8 -> int32 at the 2x int8 MXU rate; the per-(row,query)
# dequant then happens in the f32 epilogue before the bin reduce.
def _binmax_int8_kernel(q_ref, qscale_ref, e_ref, scale_ref, out_ref, *,
                        bin_width: int):
    tile = e_ref[:]  # (B, d) int8
    q = q_ref[:]  # (Q, d) int8
    scores = jax.lax.dot_general(
        tile, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, Q) exact int32
    B, Q = scores.shape
    nb_tile = B // bin_width
    # scales arrive bin-major (nb_tile, bin_width) so the per-row scale
    # broadcasts over the Q lanes without a 128x-padded (B, 1) block
    s3 = (scores.astype(jnp.float32).reshape(nb_tile, bin_width, Q)
          * scale_ref[:][:, :, None] * qscale_ref[:][None, :, :])
    out_ref[:] = jnp.max(s3, axis=1)


def binmax_int8_call(E_q, scales_bins, q_i8, q_scale, block_rows: int,
                     bin_width: int, interpret: bool):
    """(cap, d) int8 x (Q, d) int8 queries -> (nb, Q) per-bin maxima of
    the DEQUANTIZED scores; ``scales_bins`` is (nb, bin_width) f32 and
    ``q_scale`` (1, Q) f32 per-query scales."""
    cap, d = E_q.shape
    Q = q_i8.shape[0]
    grid = cap // block_rows
    nb_tile = block_rows // bin_width
    nb = cap // bin_width
    kern = functools.partial(_binmax_int8_kernel, bin_width=bin_width)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((Q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_tile, bin_width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb_tile, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, Q), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * cap * d,
            bytes_accessed=cap * d + cap * 4 + nb * Q * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_i8, q_scale, E_q, scales_bins)


def twopass_topk_int8_raw(E_q, scales, count, q, k: int, block_rows: int,
                          bin_width: int, interpret: bool):
    """Traceable int8 two-pass top-k.

    ``E_q`` (cap, d) int8 with per-row ``scales`` (cap,) or (cap, 1) f32
    (``ops.quantize.quantize_rows``); ``q`` (Q, d) f32.  Same contract as
    ``twopass_topk_raw``; scores approximate the f32 inner products with
    per-row quantization error (recall ~0.999 at d=384)."""
    cap, d = E_q.shape
    Q = q.shape[0]
    _check_params(cap, block_rows, bin_width)
    chunked = _chunked_q(
        lambda qq: twopass_topk_int8_raw(E_q, scales, count, qq, k,
                                         block_rows, bin_width, interpret),
        q, Q, k)
    if chunked is not None:
        return chunked
    Qp = _round_up(Q, _LANE)
    if Qp != Q:
        q = jnp.pad(q, ((0, Qp - Q), (0, 0)))
    nb = cap // bin_width
    # quantize the QUERY per row for the int8 x int8 MXU path; pass-1
    # only selects bins (pass 2 rescores with the f32 query), so the
    # extra query rounding is absorbed by the straddle + margin bins
    qmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-12)
    q_i8 = jnp.clip(jnp.round(q / qmax * 127.0), -127, 127).astype(jnp.int8)
    q_scale = (qmax / 127.0).reshape(1, Qp)
    scales_bins = scales.reshape(nb, bin_width)

    binmax = binmax_int8_call(
        E_q, scales_bins, q_i8, q_scale, block_rows, bin_width, interpret
    ).T  # (Qp, nb)
    bm = _mask_bins(binmax, count, nb, bin_width)
    # pass-1 ranks bins with a QUANTIZED query while pass-2 (and the
    # single-pass kernel this is a drop-in for) scores the f32 query:
    # query-quantization error can mis-rank bins by ~0.3-0.5% relative —
    # the same error class the mixed path covers — so scan the same
    # extra bins, not just the ulp-level _MARGIN_BINS
    kb = min(k + 1 + _MARGIN_BINS + _INT8_MIXED_EXTRA_BINS, nb)
    bins = select_bins(bm, kb)

    bins, rid_flat = _sorted_slab_ids(bins, bin_width)
    slabs = E_q.reshape(nb, bin_width, d)[bins]  # (Qp, kb, bw, d) int8
    sl_scale = scales_bins[bins]  # (Qp, kb, bw)
    q_r = _round_to_dtype_f32(q.astype(jnp.float32), jnp.bfloat16)
    scores = jnp.einsum(
        "qd,qkbd->qkb", q_r, slabs.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * sl_scale
    scores = scores.reshape(Qp, kb * bin_width)
    scores = jnp.where(rid_flat < count, scores, _NEG_INF)
    vals, ids = _topk_by_position(scores, rid_flat, k)
    return vals[:Q], ids[:Q]


_twopass_int8_jit = jax.jit(
    twopass_topk_int8_raw,
    static_argnames=("k", "block_rows", "bin_width", "interpret"),
)


# Coverage margin for the mixed path below: int8 pass-1 bin maxima can
# MIS-RANK bins by the row-quantization error (~0.3-0.5% relative at
# d=384) — not the ulp-level flips _MARGIN_BINS absorbs — so it scans a
# few extra bins.  Measured at 1M x 384 (tools/exp_int8_mixed.py):
# extra=2 already reaches the refine path's recall at ~25% more pass-2
# traffic than the exact-bf16 pass 2.
_INT8_MIXED_EXTRA_BINS = 2


def twopass_topk_int8_master_raw(E_q, scales, E_master, count, q, k: int,
                                 block_rows: int, bin_width: int,
                                 interpret: bool,
                                 extra_bins: int = _INT8_MIXED_EXTRA_BINS,
                                 kernel_rescan: bool = False):
    """Mixed two-pass: int8 pass-1 selects bins, pass-2 rescans the
    MASTER matrix — returned scores are master-exact.

    Replaces the r3 ``twopass_topk_int8_raw(kf) + refine_against_master``
    tier path: that chain paid kf-widened pass-2 slab traffic (kb scales
    with kf) PLUS a separate (Q, kf) row gather.  Here pass 2 reads the
    (k + 1 + margin + ``extra_bins``) master slabs directly, so the
    refine stage disappears and recall is bounded only by pass-1 bin
    COVERAGE (int8 binmax ranking), measured ~0.995 at 1M x 384 vs
    0.9941 for the refine chain — at ~1.5x its throughput.

    ``E_master`` is the tier's master matrix (bf16 or f32 — the same
    array the engine already keeps for snapshots/re-embeds, so the mixed
    path costs no extra HBM).  Same contract as ``twopass_topk_raw``
    otherwise; exactness caveat: scores are exact, the top-k SET is
    approximate (no k+1-bin guarantee across two scoring systems)."""
    cap, d = E_q.shape
    Q = q.shape[0]
    _check_params(cap, block_rows, bin_width)
    chunked = _chunked_q(
        lambda qq: twopass_topk_int8_master_raw(
            E_q, scales, E_master, count, qq, k, block_rows, bin_width,
            interpret, extra_bins, kernel_rescan),
        q, Q, k)
    if chunked is not None:
        return chunked
    Qp = _round_up(Q, _LANE)
    if Qp != Q:
        q = jnp.pad(q, ((0, Qp - Q), (0, 0)))
    nb = cap // bin_width
    qmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-12)
    q_i8 = jnp.clip(jnp.round(q / qmax * 127.0), -127, 127).astype(jnp.int8)
    q_scale = (qmax / 127.0).reshape(1, Qp)
    scales_bins = scales.reshape(nb, bin_width)

    binmax = binmax_int8_call(
        E_q, scales_bins, q_i8, q_scale, block_rows, bin_width, interpret
    ).T  # (Qp, nb)
    bm = _mask_bins(binmax, count, nb, bin_width)
    kb = min(k + 1 + _MARGIN_BINS + extra_bins, nb)
    bins = select_bins(bm, kb)

    if kernel_rescan:
        # Pallas pass-2: per-query scalar-prefetched slab DMAs from the
        # MASTER at streaming bandwidth (same kernel as the exact path's
        # optional rescan; scores use the identical in-kernel q cast)
        count32 = jnp.asarray(count, jnp.int32)
        vals, ids = rescan_call(E_master, bins, count32, q, k, bin_width,
                                interpret)
        return vals[:Q], ids[:Q]

    bins, rid_flat = _sorted_slab_ids(bins, bin_width)
    slabs = E_master.reshape(nb, bin_width, d)[bins]  # (Qp, kb, bw, d)
    q_r = _round_to_dtype_f32(q.astype(jnp.float32), E_master.dtype)
    # store-dtype scoring with f32 accumulation — bit-identical to the
    # f32 einsum for bf16 operands (see twopass_topk_raw); HIGHEST on
    # f32 masters for true-f32 products (see ops/exact.py)
    scores = jnp.einsum(
        "qd,qkbd->qkb", q_r.astype(E_master.dtype), slabs,
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST
                   if E_master.dtype == jnp.float32 else None),
    ).reshape(Qp, kb * bin_width)
    scores = jnp.where(rid_flat < count, scores, _NEG_INF)
    vals, ids = _topk_by_position(scores, rid_flat, k)
    return vals[:Q], ids[:Q]


def twopass_topk_int8(E_q, scales, count, q, k: int, block_rows: int = 4096,
                      bin_width=None):
    """int8-index two-pass top-k; drop-in for
    ``ops.fused_topk.fused_topk_int8`` at ~4x the throughput (120k QPS
    at 1M x 384, recall@10 0.989 vs exact f32)."""
    from modular_rag_system_tpu.ops.fused_topk import fused_topk_int8

    cap, d = E_q.shape
    if bin_width is None:
        bin_width = auto_bin_width(cap)
    if cap < _MIN_TWOPASS_CAP or cap // bin_width < k + 1:
        return fused_topk_int8(E_q, scales, count, q, k)
    # budget as bf16: the kernel widens the int8 tile to bf16 in VMEM
    block_rows = min(block_rows, cap, _max_block_rows(d, jnp.bfloat16))
    vals, ids = _twopass_int8_jit(
        E_q, scales, jnp.asarray(count, jnp.int32), q, k, block_rows,
        bin_width, _use_interpret(),
    )
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals, ids

# below this corpus size the two-pass setup (bin top-k + slab gather for
# 128 padded queries) costs more than simply streaming the whole corpus
# through the single-pass kernel
_MIN_TWOPASS_CAP = 8192


_BIG_I32 = np.int32(2**31 - 1)


def refine_against_master(E, q, rows, k: int, cand_vals=None):
    """Rescore candidate ``rows`` (Q, kf) against the master matrix and
    return the exact top-k among them (ties by smallest id).

    The int8 tier over-selects kf = k + m candidates by quantized score,
    then this tiny (Q, kf) row gather re-ranks them in the master's
    precision — recall is then bounded by candidate COVERAGE, not by
    int8 rounding, and returned similarities match the exact tiers'.

    ``cand_vals``: the candidates' kernel scores.  When kf exceeds the
    live row count the fused kernel pads its tail with id 0 at -inf —
    without the mask below those slots would be rescored to row 0's
    REAL master score and duplicate it in the output (caught round 5 by
    the hybrid fused-parity test at count == k)."""
    if cand_vals is not None:
        rows = jnp.where(jnp.isfinite(cand_vals), rows, -1)
    safe = jnp.maximum(rows, 0)
    cand = E[safe].astype(jnp.float32)  # (Q, kf, d) — tiny
    # q rounds to the master dtype so similarities match the exact
    # tiers' scoring convention bit-for-bit (see _round_to_dtype_f32)
    q_r = _round_to_dtype_f32(q.astype(jnp.float32), E.dtype)
    scores = jnp.einsum("qd,qcd->qc", q_r, cand,
                        preferred_element_type=jnp.float32,
                        precision=(jax.lax.Precision.HIGHEST
                                   if E.dtype == jnp.float32 else None))
    scores = jnp.where(rows >= 0, scores, _NEG_INF)
    ids = jnp.where(rows >= 0, rows, _BIG_I32)
    vals, out = _select_topk(scores, ids, k)
    return vals, jnp.where(jnp.isfinite(vals), out, -1).astype(jnp.int32)


# extra candidates the int8 tier over-selects for the master rescore;
# skipped at deep-refill k where the unrolled select would not pay
_REFINE_EXTRA_MAX = 32
_REFINE_K_MAX = 128


def int8_refine_kf(k: int, count: int) -> int:
    if k > _REFINE_K_MAX:
        return k
    return min(k + min(k, _REFINE_EXTRA_MAX), max(count, 1))


def auto_bin_width(cap: int) -> int:
    """Capacity-scaled bin width: bw=32 wins up to a few million rows
    (pass-2 slab traffic dominates); at 10M+ the per-query bin top-k
    over cap/bw bins dominates and bw=64 wins (measured: 1M bw=32
    86.5k QPS vs bw=64 71.5k; 10.5M bw=64 10.5k QPS vs bw=32 9.6k)."""
    return 32 if cap <= 4_194_304 else 64


def twopass_topk(E, count, q, k: int, block_rows: int = 4096,
                 bin_width=None):
    """Exact top-k over the live prefix of E via the two-pass kernel.

    Drop-in for ``ops.fused_topk.fused_topk`` (same contract, same
    tie-break) at ~2.1x the throughput; small corpora delegate to the
    single-pass kernel where the two-pass fixed cost doesn't pay."""
    cap, d = E.shape
    if bin_width is None:
        bin_width = auto_bin_width(cap)
    if cap < _MIN_TWOPASS_CAP or cap // bin_width < k + 1:
        return fused_topk(E, count, q, k, block_rows=block_rows)
    block_rows = min(block_rows, cap, _max_block_rows(d, E.dtype))
    vals, ids = _twopass_jit(
        E, jnp.asarray(count, jnp.int32), q, k, block_rows, bin_width,
        _use_interpret(),
    )
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    return vals, ids
