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
