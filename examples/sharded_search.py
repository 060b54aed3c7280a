#!/usr/bin/env python3
"""Mesh-sharded search demo: same code path from 1 chip to a v5e-8 slice.

Shards index rows across every available device, runs per-shard fused
top-k and merges candidates over the interconnect — then verifies the
results equal a single-device exact search.

Run (virtual 8-device mesh on CPU):
  JAX_PLATFORMS=cpu PYTHONPATH= \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/sharded_search.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from modular_rag_system_tpu.index import DeviceIndex
from modular_rag_system_tpu.parallel.mesh import default_devices, make_index_mesh
from modular_rag_system_tpu.parallel.sharded import ShardedIndex


def main() -> None:
    devices = default_devices()
    mesh = make_index_mesh(len(devices))
    print(f"index mesh: {len(devices)} shard(s) on {devices[0].platform}")

    rng = np.random.default_rng(0)
    N, d = 65536, 128
    E = rng.standard_normal((N, d)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    q = rng.standard_normal((8, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    sharded = ShardedIndex(dim=d, mesh=mesh, tier="fused", block_rows=512)
    sharded.add(E)
    t0 = time.perf_counter()
    scores, rows = sharded.search(q, 10)
    print(f"sharded search: {1000*(time.perf_counter()-t0):.1f} ms "
          f"(first call includes compile)")

    single = DeviceIndex(dim=d, tier="exact")
    single.add(E)
    _, ref_rows = single.search(q, 10)
    assert (rows == ref_rows).all(), "sharded != single-device!"
    print("sharded results identical to single-device exact search")
    print("top hit per query:", rows[:, 0].tolist())


if __name__ == "__main__":
    main()
