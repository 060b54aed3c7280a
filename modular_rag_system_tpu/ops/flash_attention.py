"""Memory-efficient (flash-style) self-attention for the encoder.

The hook SURVEY §5 names for long-context encoders: the reference
handled long inputs purely by chunking (``embedding_pipeline.py:72-329``)
and its encoders never exceeded 512 tokens, so dense attention was fine.
This framework keeps chunking as the retrieval strategy, but a
long-context encoder variant (``embedding.attention_impl="flash"``)
lets whole documents embed as ONE sequence when an operator wants
document-level vectors.

Why a kernel: the dense path streams the (B, H, L, L) score tensor
through HBM (XLA fuses it memory-efficiently enough not to OOM — a
naive 25.8 GB score shape at B=256, L=2048 runs fine, see
docs/kernels.md — but the traffic is still O(L^2) per head).  This
kernel keeps each query block's score row strictly in VMEM:

  grid (B*H, L/blk_q); per step DMA one q block + the full K/V for that
  head (L <= a few k tokens: K+V at dh_p=128 is L * 512 B — 2 MB at
  L=4096) and compute softmax(q K^T) V with the scores (blk_q, L) f32
  living only in VMEM.  O(L) HBM traffic instead of O(L^2).

Numerics match ``flax.linen.dot_product_attention`` (the dense path):
f32 score accumulation, masked positions at a large FINITE negative
(flax semantics — all-pad rows softmax to uniform instead of NaN), f32
softmax, bf16 probs x V on the MXU.  Head dim pads to the 128 lane
width (zeros change nothing: padded q/k columns contribute 0 to scores,
padded v columns are dropped).

No separate running-max rescan pass is needed at these lengths — the
full score row fits VMEM — so this is the one-pass "memory-efficient"
form of flash attention; a blockwise-K variant only pays past
L ~ 32k (score row 16 MB), far beyond any sentence-encoder use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9  # flax's finite masked-score value (not -inf: all-pad rows
# must softmax to uniform, not NaN — NaN would poison the mean pool)
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mea_kernel(q_ref, kt_ref, v_ref, pad_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (blk_q, dh_p)
    kt = kt_ref[0]  # (dh_p, Lp) — K arrives PRE-TRANSPOSED so the MXU
    # feeds both dots in natural layout (an in-kernel transpose of a
    # (Lp, dh_p) tile per grid step measured ~1.5x slower end to end)
    v = v_ref[0]  # (Lp, dh_p)
    pad = pad_ref[0]  # (1, Lp) f32 1=live
    s = jax.lax.dot_general(
        q, kt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (blk_q, Lp) f32 — VMEM only, never HBM
    s = jnp.where(pad > 0.5, s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def mea_attention(q, k, v, pad_mask, *, interpret: bool = False,
                  blk_q: int = 512):
    """softmax(q k^T / sqrt(dh)) v with key padding, O(L) HBM traffic.

    ``q``/``k``/``v``: (B, L, H, dh) in the model dtype;
    ``pad_mask``: (B, L) 1=live.  Returns (B, L, H, dh).
    """
    B, L, H, dh = q.shape
    scale = 1.0 / (dh ** 0.5)
    dh_p = _round_up(dh, _LANE)
    Lp = _round_up(L, _LANE)
    blk_q = min(blk_q, Lp)
    # the grid must cover every query row: round Lp up to a blk_q
    # multiple so a non-divisible tail (e.g. L=600 -> Lp=640 with
    # blk_q=512) gets its own block instead of being silently dropped
    # (uninitialized output rows poison the mean pool with NaN)
    Lp = _round_up(Lp, blk_q)
    nq = Lp // blk_q

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, L, dh)
        return jnp.pad(x, ((0, 0), (0, Lp - L), (0, dh_p - dh)))

    qf, vf = prep(q), prep(v)
    kt = jnp.swapaxes(prep(k), 1, 2)  # (B*H, dh_p, Lp)
    padf = jnp.pad(pad_mask.astype(jnp.float32),
                   ((0, 0), (0, Lp - L))).reshape(B, 1, Lp)

    kern = functools.partial(_mea_kernel, scale=scale)
    out = pl.pallas_call(
        kern,
        grid=(B * H, nq),
        in_specs=[
            pl.BlockSpec((1, blk_q, dh_p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh_p, Lp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, dh_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lp), lambda i, j: (i // H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, dh_p), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, dh_p), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lp * Lp * dh_p,
            bytes_accessed=(B * H * Lp * dh_p * q.dtype.itemsize * 3
                            + B * H * Lp * dh_p * q.dtype.itemsize),
            transcendentals=B * H * Lp * Lp,
        ),
        interpret=interpret,
    )(qf, kt, vf, padf)
    out = out[:, :L, :dh].reshape(B, H, L, dh)
    return jnp.transpose(out, (0, 2, 1, 3))


def flash_attention_fn(pad_mask, interpret: bool = False):
    """``flax.linen.MultiHeadDotProductAttention(attention_fn=...)``
    adapter: same call signature as ``nn.dot_product_attention`` but
    routed through the Pallas kernel; the (B, L) key-padding row mask
    arrives by closure so the (B, 1, L, L) boolean mask tensor the
    dense path builds is never materialized."""

    def fn(query, key, value, bias=None, mask=None, **_ignored):
        assert bias is None and mask is None, (
            "flash attention takes padding via pad_mask, not bias/mask"
        )
        return mea_attention(query, key, value, pad_mask,
                             interpret=interpret)

    return fn
