"""Per-row symmetric int8 quantization for the HBM index.

Per-row absmax scales keep recall high (each embedding row uses the full
int8 range regardless of its norm), and f32 accumulation/rescale happens
after the int8 MXU matmul (SURVEY §7 hard part (b)).

Index quantization runs as plain XLA (it executes once per index refresh,
not per query); the per-query quantization reuses the same jitted path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def quantize_rows_jit(x: jax.Array):
    """(N, d) f32 -> ((N, d) int8, (N, 1) f32 scales).

    Symmetric absmax: q = round(x / scale), scale = absmax / 127.
    Zero rows get scale 0 (dequantizes to exactly 0 — deleted rows stay
    dead).
    """
    # compute in f32 whatever the store dtype: the convert fuses into the
    # elementwise pipeline, and incremental updates (which quantize f32
    # batch values) then agree bit-for-bit with full rebuilds from a bf16 E
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_rows(x: jax.Array):
    return quantize_rows_jit(x)


@jax.jit
def dequantize_rows(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale


# ---------------------------------------------------------------------------
# int4 row-pair packing for the IVF fine copy (ops/ivf2.py fine_dtype
# "int4").  Two LOGICAL rows share each stored byte along the SUBLANE
# axis: byte (b, r, j) of a packed (nb, SLAB//2, d) block holds row r's
# dim j in the high nibble and row r + SLAB//2's dim j in the low
# nibble.  Packing rows (not dims) keeps the lane width at d, so the
# in-kernel unpack is two arithmetic shifts + one sublane concat and the
# MXU dot shape is identical to the int8 path's — while the slab DMA
# moves HALF the bytes (the fine stage's measured bottleneck,
# benchmarks/README.md "IVF2").  Scales stay per logical row (absmax/7:
# symmetric, zero rows stay exactly dead).

def quantize_int4_blocks(rows: jax.Array, nb: int, slab: int):
    """(nb*slab, d) f32 -> ((nb, slab//2, d) int8 packed, (nb, slab) f32
    scales).  Traceable; ``slab`` must be even."""
    x = rows.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = absmax / 7.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe), -7, 7).astype(jnp.int32)
    q3 = q.reshape(nb, slab, -1)
    hi, lo = q3[:, : slab // 2], q3[:, slab // 2:]
    # hi<<4 in [-112, 112]; OR-ing the low nibble keeps it in int8 range
    packed = ((hi << 4) | (lo & 0xF)).astype(jnp.int8)
    return packed, scale.reshape(nb, slab)


def unpack_int4_blocks(packed: jax.Array, scales: jax.Array) -> jax.Array:
    """Inverse of ``quantize_int4_blocks`` -> (nb, slab, d) f32."""
    t = packed.astype(jnp.int32)
    hi = (t >> 4).astype(jnp.float32)
    lo = ((t << 28) >> 28).astype(jnp.float32)
    full = jnp.concatenate([hi, lo], axis=1)
    return full * scales[..., None]
