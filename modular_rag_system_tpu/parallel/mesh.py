"""Device-mesh helpers.

The same code path serves a single chip (degenerate 1-device mesh) and a
v5e-8 slice (SURVEY §7 step 6); tests use 8 virtual CPU devices.  The
reference has no distributed layer at all (SURVEY §2.7) — its only
"communication backend" was HTTP to localhost Ollama — so this module's
contract comes from the BASELINE north star: index rows sharded over the
mesh ``index`` axis, per-shard top-k merged over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_devices() -> list:
    """Devices of the active platform.

    Honors ``jax_default_device`` (the test harness steers it to the
    virtual CPU mesh while the real TPU backend stays registered).
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        return list(jax.devices(dev.platform))
    return list(jax.devices())


def make_index_mesh(
    n_shards: Optional[int] = None,
    axis: str = "index",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over ``n_shards`` devices for index-row sharding."""
    devices = list(devices if devices is not None else default_devices())
    n = n_shards or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} shards but only {len(devices)} devices")
    return Mesh(np.array(devices[:n]), (axis,))


def make_hierarchical_index_mesh(
    n_slices: int,
    chips_per_slice: int,
    devices: Optional[Sequence[jax.Device]] = None,
    dcn_axis: str = "dcn",
    ici_axis: str = "ici",
) -> Mesh:
    """2-D (slice, chip) mesh for multi-slice deployments.

    Index rows shard over BOTH axes; the top-k merge is hierarchical:
    chips within a slice merge over ICI first, then only k candidates
    per slice cross the (much slower) DCN axis.  On single-slice
    hardware / the CPU test mesh the axes are logical, but the merge
    structure — and its DCN traffic bound of k x n_slices — is the one
    a real multi-slice pod uses.
    """
    devices = list(devices if devices is not None else default_devices())
    need = n_slices * chips_per_slice
    if need > len(devices):
        raise ValueError(f"mesh {n_slices}x{chips_per_slice} > {len(devices)} devices")
    arr = np.array(devices[:need]).reshape(n_slices, chips_per_slice)
    return Mesh(arr, (dcn_axis, ici_axis))


def make_train_mesh(
    data: int,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """2-D (data, model) mesh for the contrastive training step."""
    devices = list(devices if devices is not None else default_devices())
    if data * model > len(devices):
        raise ValueError(f"mesh {data}x{model} > {len(devices)} devices")
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (data_axis, model_axis))


def shard_rows(mesh: Mesh, axis: str = "index") -> NamedSharding:
    """Sharding for a (shards, rows_per_shard, d) physical index array."""
    return NamedSharding(mesh, P(axis, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
