"""Multi-process cluster self-check (round 5, VERDICT r4 item 3).

Runnable as a module — every process of a cluster executes the same
program (SPMD), e.g. a 2-process x 4-device CPU cluster on one machine:

    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
        python -m modular_rag_system_tpu.parallel.mh_check 0 2 127.0.0.1:9876 &
    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
        python -m modular_rag_system_tpu.parallel.mh_check 1 2 127.0.0.1:9876

Checks, in order (each prints a grep-able marker):
  1. ``jax.distributed.initialize`` bring-up via
     ``parallel.multihost.initialize_multihost`` — process/device counts.
  2. A cross-process REDUCTION: a global array sharded over all
     processes' devices is summed under jit; the result can only be
     right if data moved across the process boundary.    -> MH_PSUM_OK
  3. ``apply_multihost_defaults``: ``index_shards`` = global device
     count and ``dcn_slices`` = process count (the branch only a real
     multi-process run can take).                         -> MH_DEFAULTS_OK
  4. A tiny ShardedIndex add + search over the GLOBAL mesh with
     identical host data in every process (the SPMD ingest contract,
     docs/scaling.md) — exact self-retrieval across shards
     that live on another process's devices.              -> MH_SHARDED_OK

On success the last line is ``MH_CHECK_OK pid=<i>``.  Used by
``tests/test_multihost.py::test_multihost_two_process_cluster`` and by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import sys


def run_check(process_id: int, num_processes: int, coordinator: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from modular_rag_system_tpu.parallel.multihost import (
        apply_multihost_defaults,
        global_device_grid,
        initialize_multihost,
        is_initialized,
    )

    initialize_multihost(coordinator=coordinator,
                         num_processes=num_processes,
                         process_id=process_id)
    assert is_initialized()
    assert jax.process_count() == num_processes, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = jax.device_count()
    assert n_global == n_local * num_processes, (n_local, n_global)

    grid = global_device_grid(jax.devices())
    assert grid.shape == (num_processes, n_local), grid.shape

    # 2. cross-process reduction
    mesh = Mesh(np.array(grid).reshape(-1), ("i",))
    x_local = np.full((n_local,), float(process_id + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("i")), x_local, global_shape=(n_global,))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    expect = float(n_local * sum(range(1, num_processes + 1)))
    val = float(np.asarray(jax.device_get(total)))
    assert val == expect, (val, expect)
    print(f"MH_PSUM_OK pid={process_id} sum={val}", flush=True)

    # 3. mesh defaults from the global grid (dcn_slices = n processes)
    from modular_rag_system_tpu.config import RAGConfig

    cfg = RAGConfig()
    apply_multihost_defaults(cfg)
    assert cfg.mesh.index_shards == n_global, cfg.mesh.index_shards
    if num_processes > 1:
        assert cfg.mesh.dcn_slices == num_processes, cfg.mesh.dcn_slices
    print(f"MH_DEFAULTS_OK pid={process_id} shards={cfg.mesh.index_shards} "
          f"dcn={cfg.mesh.dcn_slices}", flush=True)

    # 4. sharded index across the process boundary (SPMD ingest:
    # identical host data in every process — docs/scaling.md)
    from modular_rag_system_tpu.parallel.mesh import make_index_mesh
    from modular_rag_system_tpu.parallel.sharded import ShardedIndex

    idx = ShardedIndex(dim=16, mesh=make_index_mesh(n_global), capacity=64)
    rng = np.random.RandomState(0)
    mat = rng.randn(48, 16).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    idx.add(mat)
    scores, rows = idx.search(mat[:2], 3)
    rows = np.asarray(rows)
    assert rows[0, 0] == 0 and rows[1, 0] == 1, rows[:2]
    assert float(np.asarray(scores)[0, 0]) > 0.99
    print(f"MH_SHARDED_OK pid={process_id}", flush=True)

    print(f"MH_CHECK_OK pid={process_id}", flush=True)


def spawn_two_process_cluster(devices_per_proc: int = 4,
                              timeout: float = 240.0,
                              repo_dir: str | None = None) -> list:
    """Launch BOTH processes of a 2-process CPU cluster running this
    module and wait for them.  Returns [(rc, stdout, stderr), ...];
    raises RuntimeError if either process fails or misses MH_CHECK_OK.

    The single harness shared by ``tests/test_multihost.py`` and
    ``__graft_entry__.dryrun_multichip`` (they previously duplicated
    the port-pick/env-scrub/Popen logic — round-5 review finding)."""
    import os
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    # drop PYTHONPATH: this container's sitecustomize eagerly claims
    # the TPU grant, which serializes (or wedges) concurrent processes
    env.pop("PYTHONPATH", None)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices_per_proc}",
    })
    cwd = repo_dir or os.getcwd()
    procs = [
        subprocess.Popen(
            [_sys.executable, "-m",
             "modular_rag_system_tpu.parallel.mh_check",
             str(pid), "2", f"127.0.0.1:{port}"],
            env=env, cwd=cwd, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in (0, 1)
    ]
    results = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            results.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in results:
        if rc != 0 or "MH_CHECK_OK" not in out:
            raise RuntimeError(
                f"2-process cluster check failed (rc={rc}):\n"
                f"{out[-1500:]}\n{err[-2000:]}")
    return results


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 3:
        print("usage: python -m modular_rag_system_tpu.parallel.mh_check "
              "<process_id> <num_processes> <coordinator host:port>",
              file=sys.stderr)
        return 2
    run_check(int(argv[0]), int(argv[1]), argv[2])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
